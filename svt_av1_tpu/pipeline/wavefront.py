"""Wavefront-batched intra encoder: the TPU-shaped encode pass.

Replaces the reference's per-SB sequential EncDec loop with the SURVEY.md
§7.1 design: blocks on each anti-diagonal have no mutual prediction
dependencies, so every wave is one *batched* tensor step (mode decision +
transform + quant + recon for all blocks of the diagonal at once), followed
by a separate sequential syntax pass (entropy stage) that emits the
precomputed decisions through the native range coder.

Produces bit-identical streams to ``pipeline.intra.IntraFrameEncoder`` (the
per-block oracle) — enforced by tests. The per-wave compute function is
backend-pluggable: batched NumPy (host) or the jitted device step.

Conformance note on edge extensions: the currently-enabled intra modes read
only above[0:bw] / left[0:bh], so prediction is independent of the
above-right/bottom-left extension contents; directional modes will need the
spec's coding-order availability rules (7.11.2) before enabling.
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.bitstream import obu
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy import coeff as coeff_syntax
from svt_av1_tpu.entropy import modes as mode_syntax
from svt_av1_tpu.entropy.cdf import FrameContext
from svt_av1_tpu.entropy.ctx import TileContexts
from svt_av1_tpu.ops import intra as intra_ops
from svt_av1_tpu.ops import intra_dir
from svt_av1_tpu.ops import quant as quant_ops
from svt_av1_tpu.ops import transforms as tx_ops
from svt_av1_tpu.pipeline import avail, common, md
from svt_av1_tpu.pipeline.intra import make_symbol_writer
from svt_av1_tpu.utils.blocks import (DC_PRED, DCT_DCT, MODE_TO_TXFM,
                                      PARTITION_NONE, PARTITION_SPLIT,
                                      get_scan)


class WavefrontIntraEncoder:
    """Batched-wave keyframe encoder (fixed square partition)."""

    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        self.seq = obu.SequenceHeader(width=cfg.width, height=cfg.height,
                                      bit_depth=cfg.bit_depth,
                                      enable_cdef=cfg.enable_cdef,
                                      enable_restoration=cfg.enable_restoration,
                                      enable_intra_edge_filter=(
                                          cfg.enable_intra_edge_filter),
                                      film_grain_params_present=(
                                          cfg.film_grain_strength > 0
                                          or cfg.film_grain_params
                                          is not None),
                                      color_primaries=cfg.color_primaries,
                                      transfer_characteristics=(
                                          cfg.transfer_characteristics),
                                      matrix_coefficients=(
                                          cfg.matrix_coefficients),
                                      color_range=cfg.color_range,
                                      **obu.order_hint_fields(
                                          cfg.enable_tmvp))
        self.order_hint = 0           # set by the driver (display index)
        self.lr_rinfos = None
        self.mi_cols = self.seq.mi_cols
        self.mi_rows = self.seq.mi_rows
        self.qp = quant_ops.make_quant_params(cfg.base_q_idx,
                                              bit_depth=cfg.bit_depth)
        from svt_av1_tpu.pipeline import rd
        self.lam = rd.rd_lambda(cfg.base_q_idx, cfg.bit_depth)

    # --- batched wave compute (host numpy backend) ----------------------------
    def _wave_compute(self, plane: int, xs, ys, size: int, cands,
                      htr, hbl, forced=None, cfl_luma=None, qp=None,
                      lam=None, qv=None, lamv=None, ftype=None):
        """All blocks of one wave: mode decision + T/Q/IQ/recon.
        cands: [(mode, angle_delta)] candidate list; htr/hbl: [B]
        above-right / bottom-left availability. ``forced``: (modes [B],
        deltas [B]) to reuse instead of deciding (the V plane reuses the
        uv choice made on U — one shared chroma mode). ``cfl_luma``:
        co-located luma recon [B, 2s, 2s] (chroma planes, CfL-eligible).
        Returns (modes [B], deltas [B], qcoeff [B,ch,cw], eob [B],
        alphas [B])."""
        cfg = self.cfg
        bw, bh = common.leaf_wh(size)
        recon = self.recon[plane]
        src = self.src[plane]
        max_w, max_h = self.max_wh[plane]
        ha, hl = ys > 0, xs > 0
        above1, left1 = intra_ops.prepare_edges_av1(
            recon, xs, ys, bw, bh, ha, hl, htr, hbl,
            bd=cfg.bit_depth, max_w=max_w, max_h=max_h)
        srcs = np.stack([src[y:y + bh, x:x + bw]
                         for x, y in zip(xs, ys)]).astype(np.int64)
        kw = {}
        if cfg.enable_intra_edge_filter and ftype is not None:
            # per-lane filt_type + real-sample counts for the normative
            # intra edge filter (spec numPx = Min(w, MaxX - x + 1) ...)
            n_top = np.clip(np.asarray(max_w) - xs, 0, bw)
            n_left = np.clip(np.asarray(max_h) - ys, 0, bh)
            kw["edge"] = (np.asarray(ftype, dtype=np.int32), n_top,
                          n_left)
        if cfg.backend == "device":
            from svt_av1_tpu.ops.device_md import decide_block_batch_dev
            decide = decide_block_batch_dev
            kw.update(qv=qv, lamv=lamv)
        else:
            decide = md.decide_block_batch
        best, deltas, qcoeff, eob, recon_blocks, _, alphas, tts = \
            decide(
                plane, srcs, above1, left1, ha, hl, cands,
                self.qp if qp is None else qp, size,
                self.lam if lam is None else lam,
                bd=cfg.bit_depth, nfl=cfg.nfl, forced=forced,
                cfl_luma=cfl_luma,
                tx_search=(plane == 0 and cfg.enable_tx_type_search
                           and cfg.base_q_idx > 0),
                rdoq=cfg.enable_rdoq, **kw)
        for i, (x, y) in enumerate(zip(xs, ys)):
            recon[y:y + bh, x:x + bw] = recon_blocks[i]
        return best, deltas, qcoeff, eob, alphas, tts

    # --- adaptive quantization (QPM) ------------------------------------------
    DELTA_Q_RES = 2  # coded deltas step 1 << 2 = 4 qindex units

    def _qp_for(self, qidx: int):
        """Quant params + lambda for one SB qindex (cached)."""
        if not hasattr(self, "_qp_cache"):
            self._qp_cache = {}
        if qidx not in self._qp_cache:
            from svt_av1_tpu.pipeline import rd
            self._qp_cache[qidx] = (
                quant_ops.make_quant_params(qidx,
                                            bit_depth=self.cfg.bit_depth),
                rd.rd_lambda(qidx, self.cfg.bit_depth))
        return self._qp_cache[qidx]

    def _variance_qmap(self, y_padded) -> np.ndarray:
        """Per-SB qindex from local variance (the reference's
        SourceBasedOperations/QPM: flat areas get finer quantization,
        busy areas coarser; Av1QpModulationLcu EbCodingLoop.c:2222).
        Offsets are multiples of 1 << DELTA_Q_RES so every SB-to-SB
        delta is codable."""
        from svt_av1_tpu.pipeline import analysis
        prev = getattr(self, "aq_prev_luma", None)
        return analysis.variance_qmap(y_padded, self.seq.sb_rows,
                                      self.seq.sb_cols,
                                      self.cfg.base_q_idx,
                                      self.DELTA_Q_RES, prev_y=prev,
                                      classes=getattr(self, "_classes",
                                                      None))

    def _write_delta_q(self, mi_row, mi_col, size, skip) -> None:
        """Per-SB qindex delta at the first block of the SB (spec
        5.11.5: a full-SB skip block codes nothing and leaves the
        running qindex unchanged)."""
        if self.qmap_t is None or not self._read_deltas:
            return
        self._read_deltas = False
        if size == 64 and skip:
            return
        from svt_av1_tpu.entropy import delta as delta_syntax
        target = int(self.qmap_t[mi_row // 16, mi_col // 16])
        d = (target - self.cur_qindex) >> self.DELTA_Q_RES
        delta_syntax.write_delta_qindex(self.w, self.fc, d)
        self.cur_qindex = delta_syntax.apply_delta(self.cur_qindex, d,
                                                   self.DELTA_Q_RES)
        assert self.cur_qindex == target

    # --- leaf enumeration + dependency waves ----------------------------------
    def _fixed_leaf_sizes(self, target: int):
        """Uniform partition leaf map {(mi_row, mi_col): size}, with the
        edge-split rule the emit pass uses."""
        sizes = {}

        def rec(mi_row, mi_col, psize):
            if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
                return
            hbs = psize >> 3
            crosses = not ((mi_row + hbs) < self.mi_rows
                           and (mi_col + hbs) < self.mi_cols)
            if psize > target or (crosses and psize > 8):
                half = psize >> 1
                rec(mi_row, mi_col, half)
                rec(mi_row, mi_col + hbs, half)
                rec(mi_row + hbs, mi_col, half)
                rec(mi_row + hbs, mi_col + hbs, half)
            else:
                sizes[(mi_row, mi_col)] = psize

        for sb_y in range(0, self.sb_rows_t * 16, 16):
            for sb_x in range(0, self.sb_cols_t * 16, 16):
                rec(sb_y, sb_x, 64)
        return sizes

    def _leaves(self):
        """Leaf blocks (mi_row, mi_col, (w, h)) in coding order
        (square leaves normalized to tuples)."""
        raw = common.leaves_in_coding_order(self.leaf_sizes, self.mi_rows,
                                            self.mi_cols, self.sb_rows_t,
                                            self.sb_cols_t)
        return [(r, c, common.leaf_wh(v)) for r, c, v in raw]

    @staticmethod
    def _dependency_waves(leaves, mi_cols, mi_rows):
        """Topological wave index per leaf: a leaf waits for every
        earlier-coded leaf its extended above row / left column strips can
        read — 2x the block dimension, covering the above-right /
        bottom-left reference extensions (longest-path layering). Later
        leaves in the strips are spec-unavailable (replicated), so only
        earlier ones (j < i in coding order) become dependencies."""
        idx_map = np.full((mi_rows, mi_cols), -1, dtype=np.int64)
        for i, (r, c, wh) in enumerate(leaves):
            mw, mh = wh[0] >> 2, wh[1] >> 2
            idx_map[r:r + mh, c:c + mw] = i
        wave = np.zeros(len(leaves), dtype=np.int64)
        for i, (r, c, wh) in enumerate(leaves):
            mw, mh = wh[0] >> 2, wh[1] >> 2
            w = 0
            if r > 0:
                deps = idx_map[r - 1, c:min(c + 2 * mw, mi_cols)]
                deps = deps[(deps >= 0) & (deps < i)]
                if len(deps):
                    w = max(w, int(wave[deps].max()) + 1)
            if c > 0:
                deps = idx_map[r:min(r + 2 * mh, mi_rows), c - 1]
                deps = deps[(deps >= 0) & (deps < i)]
                if len(deps):
                    w = max(w, int(wave[deps].max()) + 1)
            wave[i] = w
        return wave

    # --- main ------------------------------------------------------------------
    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """Compute + syntax in one call; encode_compute/package_syntax
        split them so a streaming encoder can run the keyframe's host
        entropy off the compute thread (the keyframe analogue of
        InterFrameEncoder.encode_compute/encode_syntax)."""
        recon = self.encode_compute(y, u, v)
        tu, stats = self.package_syntax()
        return tu, recon, stats

    def encode_compute(self, y: np.ndarray, u: np.ndarray,
                       v: np.ndarray):
        cfg = self.cfg
        frame_src = common.pad_frame_planes(y, u, v, dtype=np.int32)
        frame_recon = [np.zeros(p.shape, dtype=common.pixel_dtype(cfg.bit_depth))
                       for p in frame_src]
        frame_mi_rows, frame_mi_cols = self.mi_rows, self.mi_cols

        self.tile_log2 = obu.clamp_tile_log2(self.seq, cfg.tile_cols_log2,
                                             cfg.tile_rows_log2)
        rects = common.tile_rects(self.seq.sb_cols, self.seq.sb_rows,
                                  frame_mi_cols, frame_mi_rows,
                                  *self.tile_log2)
        self.qmap = None
        if cfg.adaptive_quantization == 1:
            # variance AQ; under TPL AQ (=2) the keyframe codes flat —
            # its quality boost comes from keyframe qp-scaling, and the
            # TPL redistribution applies to the inter frames that
            # reference it (EbInitialRateControlProcess.c:954)
            from svt_av1_tpu.pipeline import analysis
            self._classes = analysis.content_classes(
                frame_src[0], frame_src[1], frame_src[2],
                self.seq.sb_rows, self.seq.sb_cols, cfg.bit_depth)
            self.qmap = self._variance_qmap(frame_src[0])
        tile_states = []
        frame_leaves = {}
        frame_skip = np.zeros((frame_mi_rows, frame_mi_cols), dtype=bool)
        self._tile_count = len(rects)
        # multi-tile device path: per-tile analyses DEFER into one fused
        # frame program whose scan steps batch every tile's wave lanes —
        # the wavefront critical path is the max tile wave count, not
        # the sum over tiles (the reference's segment parallelism shape)
        self._defer_tiles = [] if (cfg.backend == "device"
                                   and len(rects) > 1
                                   and self.qmap is None
                                   and not common.edge_filter_active(cfg)
                                   and not getattr(self, "_no_defer",
                                                   False)) else None
        for rect in rects:
            mi_r0, mi_c0, mi_rs, mi_cs, sb_rs, sb_cs = rect
            self._enter_tile(frame_src, frame_recon, rect)
            self._analyze_tile()
            st = {k: getattr(self, k) for k in
                  ("src", "recon", "mi_rows", "mi_cols", "sb_rows_t",
                   "sb_cols_t", "max_wh", "leaf_sizes", "leaf_index",
                   "y_mode", "uv_mode", "y_delta", "uv_delta", "alpha_u",
                   "alpha_v", "qcoeff", "eobs", "y_tx_type",
                   "qmap_t")}
            st["rect"] = rect
            tile_states.append(st)
            for (r, c), s in self.leaf_sizes.items():
                frame_leaves[(r + mi_r0, c + mi_c0)] = s
        if self._defer_tiles:
            from svt_av1_tpu.ops import device_tile
            from svt_av1_tpu.utils.trace import span
            with span("intra_tiles_fused", tiles=len(self._defer_tiles)):
                frame_recon = device_tile.run_tiles_fused(
                    self, self._defer_tiles, frame_src, frame_recon,
                    common.intra_candidates(cfg))
        self._defer_tiles = None
        for st in tile_states:          # deferred eobs land above
            mi_r0, mi_c0 = st["rect"][0], st["rect"][1]
            for (r, c), s in st["leaf_sizes"].items():
                li = st["leaf_index"][(r, c)]
                if st["eobs"][:, li].sum() == 0:
                    lw, lh = common.leaf_wh(s)
                    frame_skip[r + mi_r0:r + mi_r0 + (lh >> 2),
                               c + mi_c0:c + mi_c0 + (lw >> 2)] = True

        self.mi_rows, self.mi_cols = frame_mi_rows, frame_mi_cols
        import jax
        if isinstance(frame_recon[0], jax.Array):
            pass                        # already device-resident planes
        elif len(rects) == 1 and isinstance(self.recon[0], jax.Array):
            # single-tile device path: the fused tile program kept the
            # recon on device — the filters chain consumes it there
            frame_recon = self.recon
        self.src, self.recon = frame_src, frame_recon
        self.leaf_sizes = frame_leaves
        recon = self._package_compute(frame_src, frame_recon,
                                      frame_leaves, frame_skip,
                                      tile_states)
        # _package_compute may leave tile views bound; restore the whole
        # padded frame (GOP ref slots read enc.recon)
        self.src, self.recon = frame_src, frame_recon
        return recon

    def _enter_tile(self, frame_src, frame_recon, rect) -> None:
        self._cur_rect = rect
        mi_r0, mi_c0, mi_rs, mi_cs, sb_rs, sb_cs = rect
        y0, x0 = mi_r0 * 4, mi_c0 * 4
        ph, pw = sb_rs * 64, sb_cs * 64
        self.src = [frame_src[0][y0:y0 + ph, x0:x0 + pw],
                    frame_src[1][y0 // 2:(y0 + ph) // 2,
                                 x0 // 2:(x0 + pw) // 2],
                    frame_src[2][y0 // 2:(y0 + ph) // 2,
                                 x0 // 2:(x0 + pw) // 2]]
        self.recon = [frame_recon[0][y0:y0 + ph, x0:x0 + pw],
                      frame_recon[1][y0 // 2:(y0 + ph) // 2,
                                     x0 // 2:(x0 + pw) // 2],
                      frame_recon[2][y0 // 2:(y0 + ph) // 2,
                                     x0 // 2:(x0 + pw) // 2]]
        self.mi_rows, self.mi_cols = mi_rs, mi_cs
        self.sb_rows_t, self.sb_cols_t = sb_rs, sb_cs
        self.qmap_t = None
        if self.qmap is not None:
            sr, sc = mi_r0 // 16, mi_c0 // 16
            self.qmap_t = self.qmap[sr:sr + sb_rs, sc:sc + sb_cs]

    def _analyze_tile(self) -> None:
        cfg = self.cfg
        self.max_wh = [(self.mi_cols * 4, self.mi_rows * 4),
                       (self.mi_cols * 2, self.mi_rows * 2),
                       (self.mi_cols * 2, self.mi_rows * 2)]

        cands = common.intra_candidates(cfg)
        from svt_av1_tpu.utils.trace import span
        if cfg.fixed_partition_size is not None:
            self.leaf_sizes = self._fixed_leaf_sizes(cfg.fixed_partition_size)
        else:
            from svt_av1_tpu.pipeline import rd
            with span("intra_partition_dp"):
                self.leaf_sizes = rd.choose_partition(
                    np.asarray(self.src[0],
                               dtype=common.pixel_dtype(cfg.bit_depth)),
                    cfg, self.mi_cols,
                    self.mi_rows)
        leaves = self._leaves()
        waves = self._dependency_waves(leaves, self.mi_cols, self.mi_rows)
        n = len(leaves)
        self.leaf_index = {(r, c): i for i, (r, c, s) in enumerate(leaves)}
        self.y_mode = np.zeros(n, dtype=np.int32)
        self.uv_mode = np.zeros(n, dtype=np.int32)
        self.y_delta = np.zeros(n, dtype=np.int32)
        self.uv_delta = np.zeros(n, dtype=np.int32)
        self.alpha_u = np.zeros(n, dtype=np.int64)
        self.alpha_v = np.zeros(n, dtype=np.int64)
        self.qcoeff = [[None] * n, [None] * n, [None] * n]
        self.eobs = np.zeros((3, n), dtype=np.int32)
        self.y_tx_type = np.zeros(n, dtype=np.int32)
        # neighbor-smoothness maps driving the intra edge filter's
        # filt_type (reference get_filt_type over the left/top modes;
        # tile-local like every availability rule). Luma at mi
        # granularity, chroma at chroma-4px (= 2-mi) granularity.
        self._sm_y = np.zeros((self.mi_rows, self.mi_cols), dtype=bool)
        self._sm_uv = np.zeros(((self.mi_rows + 1) >> 1,
                                (self.mi_cols + 1) >> 1), dtype=bool)

        if cfg.backend == "device" and not common.edge_filter_active(cfg):
            from svt_av1_tpu.ops import device_tile
            if getattr(self, "_defer_tiles", None) is not None:
                meta = device_tile.tile_lane_meta(self, cands)
                if meta is not None:
                    # lanes join the frame-batched multi-tile program
                    self._defer_tiles.append(meta)
                    return None
            with span("intra_tile_fused"):
                if device_tile.analyze_tile_fused(self, cands):
                    return None  # whole tile as one fused device program
                if device_tile.analyze_tile_fused_mixed(self, cands):
                    return None  # mixed-size leaf map, still one program

        larr = np.array([(r, c, wh[0], wh[1]) for r, c, wh in leaves],
                        dtype=np.int64)
        vab_all = [avail.leaf_vert_ab(
            self.leaf_sizes, r, c, wh[0] >> 2, wh[1] >> 2,
            self.mi_rows, self.mi_cols) for r, c, wh in leaves]
        htr_all = np.array([avail.has_top_right_wh(
            r, c, wh[0] >> 2, wh[1] >> 2, self.mi_cols, vert_ab=vab)
            for (r, c, wh), vab in zip(leaves, vab_all)])
        hbl_all = np.array([avail.has_bottom_left_wh(
            r, c, wh[0] >> 2, wh[1] >> 2, self.mi_rows, vert_ab=vab)
            for (r, c, wh), vab in zip(leaves, vab_all)])
        shape_key = larr[:, 2] * 1000 + larr[:, 3]
        edge_on = common.edge_filter_active(cfg)
        # device path: per-block qindex is a traced operand, so one
        # dispatch per (wave, shape) covers every AQ group
        aq_collapse = cfg.backend == "device" and self.qmap_t is not None
        for wv in range(int(waves.max()) + 1 if n else 0):
            in_wave = np.nonzero(waves == wv)[0]
            for sk in np.unique(shape_key[in_wave]):
                sids = in_wave[shape_key[in_wave] == sk]
                bw, bh = int(sk) // 1000, int(sk) % 1000
                if self.qmap_t is None:
                    qgroups = [(None, sids)]
                elif aq_collapse:
                    qgroups = [("vec", sids)]
                else:
                    qv = self.qmap_t[larr[sids, 0] // 16,
                                     larr[sids, 1] // 16]
                    qgroups = [(int(q), sids[qv == q])
                               for q in np.unique(qv)]
                for qidx, ids in qgroups:
                    if len(ids) == 0:
                        continue
                    qvec = lamv = None
                    if qidx == "vec":
                        qp, lam = None, None
                        qvec = self.qmap_t[larr[ids, 0] // 16,
                                           larr[ids, 1] // 16]
                        lamv = np.array([self._qp_for(int(q))[1]
                                         for q in qvec])
                    else:
                        qp, lam = (None, None) if qidx is None \
                            else self._qp_for(qidx)
                    xs = larr[ids, 1] * 4
                    ys = larr[ids, 0] * 4
                    htr, hbl = htr_all[ids], hbl_all[ids]
                    fty = ftuv = None
                    if edge_on:
                        fty = _ftype_from(self._sm_y, larr[ids, 0],
                                          larr[ids, 1])
                        ftuv = _ftype_from(self._sm_uv,
                                           larr[ids, 0] >> 1,
                                           larr[ids, 1] >> 1)
                    best, bdel, qc, eo, _, ytt = self._wave_compute(
                        0, xs, ys, (bw, bh), cands, htr, hbl, qp=qp,
                        lam=lam, qv=qvec, lamv=lamv, ftype=fty)
                    if edge_on:
                        _mark_smooth(self._sm_y, larr, ids, best,
                                     bw >> 2, bh >> 2)
                    self.y_mode[ids] = best
                    self.y_delta[ids] = bdel
                    self.eobs[0, ids] = eo
                    self.y_tx_type[ids] = ytt
                    cfl_luma = None
                    if bw <= 32 and bh <= 32:  # cfl_allowed
                        cfl_luma = np.stack([
                            self.recon[0][y:y + bh, x:x + bw]
                            for x, y in zip(xs, ys)])
                    bestc, cdel, qcc, eoc, au, _ = self._wave_compute(
                        1, xs >> 1, ys >> 1, (bw >> 1, bh >> 1), cands,
                        htr, hbl, cfl_luma=cfl_luma, qp=qp, lam=lam,
                        qv=qvec, lamv=lamv, ftype=ftuv)
                    if edge_on:
                        _mark_smooth(self._sm_uv, larr, ids, bestc,
                                     max(1, bw >> 3), max(1, bh >> 3),
                                     half=True)
                    self.uv_mode[ids] = bestc
                    self.uv_delta[ids] = cdel
                    self.alpha_u[ids] = au
                    self.eobs[1, ids] = eoc
                    _, _, qcv, eov, av, _ = self._wave_compute(
                        2, xs >> 1, ys >> 1, (bw >> 1, bh >> 1), cands,
                        htr, hbl, forced=(bestc, cdel), cfl_luma=cfl_luma,
                        qp=qp, lam=lam, qv=qvec, lamv=lamv, ftype=ftuv)
                    self.alpha_v[ids] = av
                    self.eobs[2, ids] = eov
                    for k, i in enumerate(ids):
                        self.qcoeff[0][i] = qc[k]
                        self.qcoeff[1][i] = qcc[k]
                        self.qcoeff[2][i] = qcv[k]

        return None  # decisions stored on self; syntax runs after filters

    def _package_compute(self, frame_src, frame_recon, frame_leaves,
                         frame_skip, tile_states):
        """Filter stages (device-async) + display crop. Syntax inputs
        are parked on ``self._pkg`` for ``package_syntax`` — which may
        run later on the encoder's entropy worker, off the compute
        thread (the keyframe analogue of InterFrameEncoder's
        encode_compute/encode_syntax split)."""
        cfg = self.cfg
        from svt_av1_tpu.utils.trace import span
        lf_levels = (0, 0, 0, 0)
        if cfg.enable_dlf:
            from svt_av1_tpu.ops import dlf
            with span("dlf"):
                if cfg.backend == "device":
                    from svt_av1_tpu.ops import device as dev_ops
                    lf_levels = dev_ops.dlf_search_apply_dev(
                        frame_recon, frame_src, frame_leaves,
                        self.mi_rows, self.mi_cols, cfg.base_q_idx,
                        cfg.bit_depth)
                else:
                    lf_levels = dlf.pick_levels(
                        frame_recon, frame_src, frame_leaves,
                        self.mi_rows, self.mi_cols, cfg.base_q_idx,
                        cfg.bit_depth)
                    dlf.loop_filter_frame(frame_recon, frame_leaves,
                                          self.mi_rows, self.mi_cols,
                                          lf_levels, bd=cfg.bit_depth)
        lr_bounds = None
        if cfg.enable_restoration:
            from svt_av1_tpu.ops import restoration as rst_ops
            lr_bounds = []
            for p in range(3):
                ss = 1 if p else 0
                Hp = (cfg.height + ss) >> ss
                Wp = (cfg.width + ss) >> ss
                lr_bounds.append(rst_ops.save_deblock_boundary_lines(
                    frame_recon[p][:Hp, :Wp], Hp, ss))
        cdef_kw = {}
        self.cdef_idx_map = None
        if cfg.enable_cdef:
            from svt_av1_tpu.ops import cdef as cdef_ops
            skip8 = frame_skip[0::2, 0::2] & frame_skip[0::2, 1::2] \
                & frame_skip[1::2, 0::2] & frame_skip[1::2, 1::2]
            with span("cdef"):
                if cfg.backend == "device":
                    from svt_av1_tpu.ops import device_cdef
                    idx_map, y_str, uv_str, damping = \
                        device_cdef.cdef_search_apply_dev(
                            frame_recon, frame_src, skip8, self.mi_rows,
                            self.mi_cols, cfg.base_q_idx, cfg.bit_depth)
                else:
                    idx_map, y_str, uv_str, damping = cdef_ops.cdef_search(
                        frame_recon, frame_src, skip8, self.mi_rows,
                        self.mi_cols, cfg.base_q_idx, cfg.bit_depth)
                    cdef_ops.cdef_frame(frame_recon, skip8, idx_map, y_str,
                                        uv_str, damping, self.mi_rows,
                                        self.mi_cols, cfg.bit_depth)
            self.cdef_idx_map = idx_map
            cdef_kw = dict(cdef_damping=damping, cdef_bits=2,
                           cdef_y_strengths=y_str, cdef_uv_strengths=uv_str)
        lr_kw = {}
        if cfg.enable_restoration:
            from svt_av1_tpu.ops import restoration as rst_ops
            from svt_av1_tpu.pipeline import lr_search
            with span("lr"):
                if cfg.backend == "device":
                    self.lr_rinfos = lr_search.search_restoration_dev(
                        frame_recon, frame_src, lr_bounds, cfg.width,
                        cfg.height, cfg.bit_depth, cfg.base_q_idx,
                        self.lam)
                else:
                    self.lr_rinfos = lr_search.search_restoration(
                        frame_recon, frame_src, lr_bounds, cfg.width,
                        cfg.height, cfg.bit_depth, cfg.base_q_idx,
                        self.lam)
                    rst_ops.loop_restoration_filter_frame(
                        frame_recon, self.lr_rinfos, lr_bounds, cfg.width,
                        cfg.height, cfg.bit_depth)
            lr_kw = dict(lr_params=(
                tuple(ri.frame_restoration_type for ri in self.lr_rinfos),
                self.lr_rinfos[0].unit_size, self.lr_rinfos[1].unit_size))
        fg = None
        if self.seq.film_grain_params_present:
            from svt_av1_tpu.ops import grain as grain_ops
            fg = grain_ops.resolved_params(cfg)
        recon = [frame_recon[0][:cfg.height, :cfg.width],
                 frame_recon[1][:(cfg.height + 1) // 2,
                                :(cfg.width + 1) // 2],
                 frame_recon[2][:(cfg.height + 1) // 2,
                                :(cfg.width + 1) // 2]]
        if fg is not None:
            from svt_av1_tpu.ops import grain as grain_ops
            recon = grain_ops.apply_grain(recon, fg, cfg.bit_depth)
        self._pkg = dict(tile_states=tile_states, lf_levels=lf_levels,
                         cdef_kw=cdef_kw, lr_kw=lr_kw, fg=fg,
                         frame_src=frame_src, frame_recon=frame_recon)
        return recon

    def package_syntax(self):
        """Per-tile syntax + OBU assembly from the state parked by
        _package_compute. Runs per-tile entropy coding and returns
        (tu_bytes, stats); sets self.final_entropy."""
        cfg = self.cfg
        from svt_av1_tpu.utils.trace import span
        pkg = self._pkg
        tile_states = pkg["tile_states"]
        lf_levels = pkg["lf_levels"]
        cdef_kw = pkg["cdef_kw"]
        lr_kw = pkg["lr_kw"]
        fg = pkg["fg"]
        # syntax pass per tile (entropy stage runs after the filter stages,
        # mirroring the reference pipeline order)
        payloads = []
        for ti, st in enumerate(tile_states):
            for k, v in st.items():
                if k != "rect":
                    setattr(self, k, v)
            self.tile_mi_off = (st["rect"][0], st["rect"][1])
            with span("entropy"):
                payloads.append(self._syntax_pass())
            if ti == 0:
                # context_update_tile_id = 0: the state a decoder saves
                # into every slot this key frame refreshes (spec 6.8.2;
                # adapted unless frame-end update is disabled below)
                tile0_fc = self.fc
        no_end_update = cfg.disable_cdf_update or cfg.error_resilient
        fh = obu.FrameHeader(order_hint=self.order_hint,
                             base_q_idx=cfg.base_q_idx,
                             disable_cdf_update=cfg.disable_cdf_update,
                             disable_frame_end_update_cdf=no_end_update,
                             loop_filter_levels=lf_levels,
                             tile_cols_log2=self.tile_log2[0],
                             tile_rows_log2=self.tile_log2[1],
                             delta_q_present=(self.qmap is not None),
                             delta_q_res=self.DELTA_Q_RES,
                             film_grain=fg, **cdef_kw, **lr_kw)
        from svt_av1_tpu.entropy import mv as mv_syntax
        self.final_entropy = (
            FrameContext(cfg.base_q_idx) if no_end_update else tile0_fc,
            mv_syntax.NmvContext())
        md_obus = b""
        if cfg.content_light is not None:
            md_obus += obu.write_metadata_hdr_cll(*cfg.content_light)
        if cfg.mastering_display is not None:
            md_obus += obu.write_metadata_hdr_mdcv(*cfg.mastering_display)
        tu = (obu.temporal_delimiter_obu()
              + obu.write_sequence_header_obu(self.seq)
              + md_obus
              + obu.write_frame_obu(self.seq, fh, payloads))
        # per-tile syntax re-bound self.src/recon to tile views; restore
        # the whole padded frame (GOP ref slots read enc.recon)
        self.src = pkg["frame_src"]
        self.recon = pkg["frame_recon"]
        tb = sum(len(t) for t in payloads)
        return tu, {"tile_bytes": tb, "tu_bytes": len(tu)}

    # --- sequential syntax pass ---------------------------------------------------
    def _syntax_pass(self) -> bytes:
        cfg = self.cfg
        self.fc = FrameContext(cfg.base_q_idx)
        self.w = make_symbol_writer(cfg.native_entropy,
                                    cfg.disable_cdf_update)
        self.ctxs = TileContexts(self.mi_cols, self.mi_rows)
        self._cdef_written = set()
        from svt_av1_tpu.entropy import lr as lr_syntax
        self.lr_ref = [lr_syntax.LrRefState() for _ in range(3)]
        self.cur_qindex = cfg.base_q_idx
        for sb_y in range(0, self.sb_rows_t * 16, 16):
            for sb_x in range(0, self.sb_cols_t * 16, 16):
                self._read_deltas = self.qmap_t is not None
                self._write_lr(sb_y, sb_x)
                self._emit_partition(sb_y, sb_x, 64)
        return self.w.done()

    def _write_lr(self, mi_row, mi_col) -> None:
        from svt_av1_tpu.entropy import lr as lr_syntax
        off = getattr(self, "tile_mi_off", (0, 0))
        lr_syntax.write_sb_units(self.w, self.fc, self.lr_rinfos,
                                 self.lr_ref, mi_row + off[0],
                                 mi_col + off[1], self.cfg.width,
                                 self.cfg.height)

    def _emit_partition(self, mi_row, mi_col, psize) -> None:
        if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
            return
        bsize = common.square_bsize(psize)
        hbs = psize >> 3
        half = psize >> 1
        partition, leaves = common.infer_partition(
            self.leaf_sizes, mi_row, mi_col, psize, self.mi_rows,
            self.mi_cols)
        mode_syntax.write_partition(self.w, self.fc, self.ctxs, partition,
                                    bsize, mi_row, mi_col,
                                    self.mi_cols, self.mi_rows)
        if partition == PARTITION_SPLIT:
            self._emit_partition(mi_row, mi_col, half)
            self._emit_partition(mi_row, mi_col + hbs, half)
            self._emit_partition(mi_row + hbs, mi_col, half)
            self._emit_partition(mi_row + hbs, mi_col + hbs, half)
            return
        # per-leaf emission + partition-context update over each leaf's
        # own extent (the reference writes partition_context_lookup per
        # coded block, EbEntropyCoding.c:4762; for equal-size leaves this
        # equals the old one-shot parent update)
        for r, c, wh in leaves:
            self._emit_block(r, c, wh[0] if wh[0] == wh[1] else wh)
            self.ctxs.update_partition_ctx(r, c, common.rect_bsize(*wh),
                                           common.rect_bsize(*wh))

    def _write_cdef_idx(self, mi_row, mi_col, skip) -> None:
        """cdef_idx literal at the first non-skip block of each 64x64
        (spec read_cdef mirror)."""
        if getattr(self, "cdef_idx_map", None) is None or skip:
            return
        off = getattr(self, "tile_mi_off", (0, 0))
        sbr = (mi_row + off[0]) // 16
        sbc = (mi_col + off[1]) // 16
        if (sbr, sbc) not in self._cdef_written:
            self._cdef_written.add((sbr, sbc))
            self.w.write_literal(int(self.cdef_idx_map[sbr, sbc]), 2)

    def _emit_block(self, mi_row, mi_col, size) -> None:
        cfg = self.cfg
        x, y = mi_col * 4, mi_row * 4
        li = self.leaf_index[(mi_row, mi_col)]
        bw, bh = common.leaf_wh(size)
        bsize = common.rect_bsize(bw, bh)
        cw, ch = bw >> 1, bh >> 1
        y_mode = int(self.y_mode[li])
        uv_mode = int(self.uv_mode[li])
        tx_y = common.tx_size_for_rect(bw, bh, 0)
        tx_uv = common.tx_size_for_rect(cw, ch, 1)
        tt_u = common.chroma_tx_type(uv_mode, tx_uv, False)
        skip = int(self.eobs[:, li].sum() == 0)

        mode_syntax.write_skip(self.w, self.fc, self.ctxs, skip,
                               mi_row, mi_col)
        self._write_cdef_idx(mi_row, mi_col, skip)
        self._write_delta_q(mi_row, mi_col,
                            size if bw == bh else 0, skip)
        mode_syntax.write_intra_luma_mode_kf(self.w, self.fc, self.ctxs,
                                             y_mode, mi_row, mi_col)
        if intra_dir.is_directional(y_mode):
            mode_syntax.write_angle_delta(self.w, self.fc, y_mode,
                                          int(self.y_delta[li]))
        alpha_u = int(self.alpha_u[li])
        alpha_v = int(self.alpha_v[li])
        if uv_mode == 13 and alpha_u == 0 and alpha_v == 0:
            uv_mode = 0  # alpha-(0,0) CfL == DC prediction; code as DC
        mode_syntax.write_intra_chroma_mode(self.w, self.fc, uv_mode,
                                            y_mode, bw <= 32 and bh <= 32)
        if uv_mode == 13:
            from svt_av1_tpu.ops import cfl as cfl_ops
            cfl_ops.write_cfl_alphas(self.w, self.fc, alpha_u, alpha_v)
        if intra_dir.is_directional(uv_mode):
            mode_syntax.write_angle_delta(self.w, self.fc, uv_mode,
                                          int(self.uv_delta[li]))
        self.ctxs.set_mi(mi_row, mi_col, bsize, y_mode, skip)

        tt_y = int(self.y_tx_type[li])
        plane_info = [(0, x, y, tx_y, tt_y, y_mode, bsize),
                      (1, x >> 1, y >> 1, tx_uv, tt_u, uv_mode,
                       common.rect_bsize(cw, ch)),
                      (2, x >> 1, y >> 1, tx_uv, tt_u, uv_mode,
                       common.rect_bsize(cw, ch))]
        for p, px, py, ts, tt, m, pb in plane_info:
            x4, y4 = px >> 2, py >> 2
            if skip:
                self.ctxs.update_txb_ctx(p, x4, y4, ts, 0)
                continue
            skip_ctx, sign_ctx = self.ctxs.txb_ctx(p, pb, ts, x4, y4)
            cul = coeff_syntax.write_coeffs_txb(
                self.w, self.fc, common.resolve_qc(self.qcoeff[p][li]),
                ts, tt,
                plane_type=int(p > 0), txb_skip_ctx=skip_ctx,
                dc_sign_ctx=sign_ctx, intra_dir=m,
                base_qindex=cfg.base_q_idx)
            self.ctxs.update_txb_ctx(p, x4, y4, ts, cul)


def encode_keyframe_wavefront(y, u, v, cfg: EncoderConfig):
    return WavefrontIntraEncoder(cfg).encode(y, u, v)


def _ftype_from(sm: np.ndarray, rows: np.ndarray,
                cols: np.ndarray) -> np.ndarray:
    """Per-lane filt_type from a smoothness map (reference
    get_filt_type: above/left neighbor smooth -> 1; unavailable
    neighbors count as non-smooth)."""
    above = np.where(rows > 0, sm[np.maximum(rows - 1, 0), cols], False)
    left = np.where(cols > 0, sm[rows, np.maximum(cols - 1, 0)], False)
    return (above | left).astype(np.int32)


def _mark_smooth(sm: np.ndarray, larr: np.ndarray, ids: np.ndarray,
                 modes: np.ndarray, mw: int, mh: int,
                 half: bool = False) -> None:
    """Record SMOOTH-family decisions into a smoothness map over each
    block's unit extent (``half``: chroma map at 2-mi granularity)."""
    from svt_av1_tpu.ops import intra_dir
    for k, i in enumerate(ids):
        if intra_dir.is_smooth_mode(int(modes[k])):
            r0, c0 = int(larr[i, 0]), int(larr[i, 1])
            if half:
                r0, c0 = r0 >> 1, c0 >> 1
            sm[r0:r0 + mh, c0:c0 + mw] = True
