"""Low-delay P frame encoder (single reference, BASELINE config 2).

The TPU-shaped inter encode: unlike intra, inter prediction has NO
in-frame dependency, so ME, mode decision, transform and reconstruction run
fully batched over all blocks of the frame (one tensor program — the
reference needs its wavefront machinery here, we don't; SURVEY.md §2.2).
Only the syntax pass is sequential: it walks coding order, builds the
ref-MV stack from coded state (``pipeline.mvp``), canonicalizes each
block's MV into NEAREST/NEAR/GLOBAL/NEWMV, and emits bits.

Reference equivalents: MotionEstimationKernel (EbMotionEstimationProcess.c),
EncDec inter path (EbCodingLoop.c), write_modes_b inter syntax
(EbEntropyCoding.c:1724ff).
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.bitstream import obu
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy import coeff as coeff_syntax
from svt_av1_tpu.entropy import inter_modes
from svt_av1_tpu.entropy import modes as mode_syntax
from svt_av1_tpu.entropy import mv as mv_syntax
from svt_av1_tpu.entropy.cdf import FrameContext
from svt_av1_tpu.entropy.ctx import TileContexts
from svt_av1_tpu.utils.trace import span
from svt_av1_tpu.ops import mc, me
from svt_av1_tpu.ops import quant as quant_ops
from svt_av1_tpu.ops import transforms as tx_ops
from svt_av1_tpu.pipeline import common, md, mvp
from svt_av1_tpu.pipeline.intra import make_symbol_writer
from svt_av1_tpu.pipeline.mvp import (GLOBALMV, LAST_FRAME, NEARESTMV,
                                      NEARMV, NEWMV)
from svt_av1_tpu.utils.blocks import (DC_PRED, DCT_DCT, PARTITION_NONE,
                                      PARTITION_SPLIT, get_scan)


_ref_cache: dict = {}

_PendingQC = common.PendingQC
resolve_qc = common.resolve_qc


def _padded_ref(planes, valid_hw=None):
    """Padded reference planes + HME pyramid, cached per recon object:
    a slot's recon is padded/decimated once when written, not once per
    frame that reads it. Device-resident slots (jax planes) are prepared
    by one on-device program (device_inter.ref_prep_dev) — the reference
    pixels never cross the tunnel at all; host slots keep the NumPy
    path + upload-once cache. ``valid_hw``: (vh, vw) decoder-visible
    luma core when planes carry bucket-pad bands."""
    import jax
    key = id(planes[0])
    ent = _ref_cache.get(key)
    if ent is not None and ent[0] is planes[0]:
        return ent[1], ent[2]
    if isinstance(planes[0], jax.Array):
        from svt_av1_tpu.ops import device_inter as di
        padded, pyr = di.ref_prep_dev(planes, valid_hw=valid_hw)
    else:
        vy = None if valid_hw is None else valid_hw
        vc = None if valid_hw is None else (vy[0] // 2, vy[1] // 2)
        padded = [mc.pad_reference(p, valid_hw=(vy if i == 0 else vc))
                  for i, p in enumerate(planes)]
        pyr = me.build_pyramid(padded[0])
    if len(_ref_cache) >= 24:
        for k in list(_ref_cache)[:8]:
            del _ref_cache[k]
    _ref_cache[key] = (planes[0], padded, pyr)
    return padded, pyr


def clamp_mvs_batch(mvs, xs, ys, bw, bh, plane_w, plane_h, ss: int = 0):
    """Vectorized mc.clamp_mv_for_padding over a batch (1/8-pel units)."""
    margin = (mc.REF_PAD - 5) << (2 + ss)
    xa = np.asarray(xs, dtype=np.int64)
    ya = np.asarray(ys, dtype=np.int64)
    r = np.clip(mvs[:, 0], -(ya << (2 + ss)) - margin,
                ((plane_h - ya - bh) << (2 + ss)) + margin)
    c = np.clip(mvs[:, 1], -(xa << (2 + ss)) - margin,
                ((plane_w - xa - bw) << (2 + ss)) + margin)
    return np.stack([r, c], axis=1)


class InterFrameEncoder:
    def __init__(self, cfg: EncoderConfig, seq: obu.SequenceHeader):
        self.cfg = cfg
        self.seq = seq
        self.mi_cols = seq.mi_cols
        self.mi_rows = seq.mi_rows
        self.qp = quant_ops.make_quant_params(cfg.base_q_idx,
                                              bit_depth=cfg.bit_depth)
        # tile grid (uniform spacing, spec 5.9.15): tile columns cut the
        # intra-flip wavefront critical path and parallelize host
        # entropy — the reference's segment parallelism
        # (EbCdefProcess.c:469-473, EbEntropyCodingProcess.c:362)
        self.tile_log2 = obu.clamp_tile_log2(seq, cfg.tile_cols_log2,
                                             cfg.tile_rows_log2)
        self.tile_rects_v = common.tile_rects(
            seq.sb_cols, seq.sb_rows, self.mi_cols, self.mi_rows,
            *self.tile_log2)
        from svt_av1_tpu.pipeline import rd
        self.lam = rd.rd_lambda(cfg.base_q_idx, cfg.bit_depth)

    def _tile_local_coords(self, rs, cs):
        """Per-block tile-local (r, c) + tile mi dims for availability
        clipping (spec 7.10.2: out-of-tile neighbors are unavailable).
        One SB-indexed lookup table per frame; tiles are SB-aligned so
        position-within-SB terms are offset-invariant."""
        lut = getattr(self, "_tile_lut", None)
        if lut is None:
            sbr_n, sbc_n = self.seq.sb_rows, self.seq.sb_cols
            t = [np.zeros((sbr_n, sbc_n), np.int64) for _ in range(4)]
            for (mi_r0, mi_c0, mi_rs, mi_cs, sb_rs, sb_cs) \
                    in self.tile_rects_v:
                sl = (slice(mi_r0 // 16, mi_r0 // 16 + sb_rs),
                      slice(mi_c0 // 16, mi_c0 // 16 + sb_cs))
                t[0][sl], t[1][sl] = mi_r0, mi_c0
                t[2][sl], t[3][sl] = mi_rs, mi_cs
            lut = self._tile_lut = t
        rs = np.asarray(rs, dtype=np.int64)
        cs = np.asarray(cs, dtype=np.int64)
        sr, sc = rs // 16, cs // 16
        return (rs - lut[0][sr, sc], cs - lut[1][sr, sc],
                lut[2][sr, sc], lut[3][sr, sc])

    def encode(self, y, u, v, ref_planes, alt_planes=None,
               refresh_frame_flags: int = 0x01,
               ref_frame_idx=(0,) * 7, show_frame: bool = True,
               extra_refs=None, init_entropy=None, prev_gm=None):
        """ref_planes: past reference recon [Y, U, V] (padded dims);
        alt_planes: optional future reference; extra_refs: additional
        named references {ref_id: planes} (GOLDEN/LAST2/BWDREF/ALTREF2 —
        the multi-reference lists the reference builds per picture in
        Av1GenerateRpsInfo, EbPictureDecisionProcess.c:516). Blocks pick
        the best single ref by RD, plus the best (fwd, bwd) compound
        pair when both directions exist.

        init_entropy: (FrameContext, NmvContext) saved by the primary
        reference (slot ref_frame_idx[0] = LAST) — when given and the
        config is not error-resilient, the frame codes primary_ref_frame
        = 0 and starts from these CDFs (spec 6.8.2 load_cdfs). prev_gm:
        that slot's saved gm_trans (prediction base for gm params).
        After encode, ``self.final_entropy`` holds the state a decoder
        saves for this frame's refresh slots.
        Returns (tu, recon(padded)).

        Split into ``encode_compute`` (ME/MD/recon/filters — the recon is
        final after this) and ``encode_syntax`` (entropy + OBU assembly)
        so a driver can overlap this frame's host entropy with the next
        frame's device compute (the reference overlaps its EC stage the
        same way via process pools, EbEncHandle.c:1056)."""
        self.encode_compute(y, u, v, ref_planes, alt_planes,
                            refresh_frame_flags, ref_frame_idx,
                            show_frame, extra_refs)
        tu = self.encode_syntax(init_entropy, prev_gm)
        return tu, self.recon

    def encode_compute(self, y, u, v, ref_planes, alt_planes=None,
                       refresh_frame_flags: int = 0x01,
                       ref_frame_idx=(0,) * 7, show_frame: bool = True,
                       extra_refs=None):
        """Decision + reconstruction + in-loop filters; leaves syntax
        inputs on self for ``encode_syntax``. self.recon is final."""
        cfg = self.cfg
        self.src = common.pad_frame_planes(y, u, v, dtype=np.int32)
        self.recon = [np.zeros(p.shape, dtype=common.pixel_dtype(cfg.bit_depth))
                      for p in self.src]
        from svt_av1_tpu.entropy.inter_modes import (ALTREF_FRAME,
                                                     BWDREF_FRAME)
        self.refs = {}
        self.ref_pyrs = {}
        vhw = (self.seq.sb_rows * 64, self.seq.sb_cols * 64)
        self.refs[LAST_FRAME], self.ref_pyrs[LAST_FRAME] = \
            _padded_ref(ref_planes, vhw)
        if alt_planes is not None:
            self.refs[ALTREF_FRAME], self.ref_pyrs[ALTREF_FRAME] = \
                _padded_ref(alt_planes, vhw)
        for rid, planes in (extra_refs or {}).items():
            if rid not in self.refs and planes is not None:
                self.refs[rid], self.ref_pyrs[rid] = _padded_ref(planes,
                                                                 vhw)
        self.fwd_refs = sorted(r for r in self.refs if r < BWDREF_FRAME)
        self.bwd_refs = sorted(r for r in self.refs if r >= BWDREF_FRAME)
        self.src_pyr = me.src_pyramid(self.src[0])

        if cfg.fixed_partition_size is None:
            from svt_av1_tpu.pipeline import rd as rd_mod
            with span("inter_partition_dp"):
                self.leaf_sizes = rd_mod.choose_partition_inter(
                    y, self.refs[LAST_FRAME][0], cfg, self.mi_cols,
                    self.mi_rows, ref_pyr=self.ref_pyrs[LAST_FRAME],
                    src_pyr=self.src_pyr)
        else:
            self.leaf_sizes = common.fixed_leaf_sizes(
                self.mi_rows, self.mi_cols, self.seq.sb_rows,
                self.seq.sb_cols, cfg.fixed_partition_size)
        leaves = common.leaves_in_coding_order(
            self.leaf_sizes, self.mi_rows, self.mi_cols, self.seq.sb_rows,
            self.seq.sb_cols)
        n = len(leaves)
        self.leaf_index = {(r, c): i for i, (r, c, s) in enumerate(leaves)}
        self.mvs = np.zeros((n, 2), dtype=np.int64)
        self.block_ref = np.full(n, LAST_FRAME, dtype=np.int32)
        self.qcoeff = [[None] * n, [None] * n, [None] * n]
        self.eobs = np.zeros((3, n), dtype=np.int32)
        self.block_is_inter = np.ones(n, dtype=bool)
        self.intra_mode = np.zeros(n, dtype=np.int32)
        self.y_tx_type = np.zeros(n, dtype=np.int32)
        self.inter_cost = np.zeros(n, dtype=np.int64)
        self.block_comp = np.zeros(n, dtype=bool)
        self.mvs1 = np.zeros((n, 2), dtype=np.int64)
        self.intra_uv_cfl = np.zeros(n, dtype=bool)
        self.intra_alpha_u = np.zeros(n, dtype=np.int64)
        self.intra_alpha_v = np.zeros(n, dtype=np.int64)
        self.comp_ref0 = np.full(n, LAST_FRAME, dtype=np.int32)
        self.comp_ref1 = np.zeros(n, dtype=np.int32)
        self.interp_f = np.zeros(n, dtype=np.int32)
        self.reference_select = bool(self.fwd_refs and self.bwd_refs)

        self.qmap = None
        if cfg.adaptive_quantization:
            tq = getattr(self, "tpl_qmap", None)
            if cfg.adaptive_quantization == 2 and tq is not None:
                # MV-propagated TPL offsets from the GOP lookahead
                # window, anchored on this frame's own base qindex; an
                # all-zero map codes no deltas at all
                if np.any(tq):
                    self.qmap = np.clip(cfg.base_q_idx + tq,
                                        1, 255).astype(np.int32)
            else:
                from svt_av1_tpu.pipeline import analysis
                classes = analysis.content_classes(
                    self.src[0], self.src[1], self.src[2],
                    self.seq.sb_rows, self.seq.sb_cols, cfg.bit_depth)
                self.qmap = analysis.variance_qmap(
                    self.src[0], self.seq.sb_rows, self.seq.sb_cols,
                    cfg.base_q_idx, self.DELTA_Q_RES,
                    prev_y=getattr(self, "aq_prev_luma", None),
                    classes=classes)
        leaves = [(r, c, common.leaf_wh(v)) for r, c, v in leaves]
        larr = np.array([(r, c, wh[0], wh[1]) for r, c, wh in leaves],
                        dtype=np.int64)
        shape_key = larr[:, 2] * 1000 + larr[:, 3]
        # device backend: ONE fused dispatch per shape group (ME + RD +
        # compound + both chroma planes, per-block traced qindex), every
        # group issued before any result is fetched so the tunnel round
        # trips overlap. Host _full_loop takes scalar quantizer params,
        # so the host backend keeps the per-(shape, AQ-group) loop.
        fused = (cfg.backend == "device"
                 and not cfg.enable_tx_type_search
                 and not cfg.enable_interp_filter_search)
        if fused:
            batches = []
            for sk in np.unique(shape_key):
                sids = np.nonzero(shape_key == sk)[0]
                wh = (int(sk) // 1000, int(sk) % 1000)
                qvec = None if self.qmap is None else \
                    self.qmap[larr[sids, 0] // 16, larr[sids, 1] // 16]
                batches.append((larr[sids], sids, wh, qvec))
            with span("inter_blocks"):
                self._encode_blocks_fused(batches)
        else:
            for sk in np.unique(shape_key):
                sids = np.nonzero(shape_key == sk)[0]
                wh = (int(sk) // 1000, int(sk) % 1000)
                if self.qmap is None:
                    qgroups = [(None, sids)]
                else:
                    qv = self.qmap[larr[sids, 0] // 16,
                                   larr[sids, 1] // 16]
                    qgroups = [(int(q), sids[qv == q])
                               for q in np.unique(qv)]
                for qidx, ids in qgroups:
                    if len(ids):
                        with span("inter_blocks"):
                            self._encode_blocks(larr[ids], ids, wh,
                                                qidx=qidx)
        if cfg.intra_in_inter:
            with span("intra_flip"):
                self._intra_flip_pass(leaves)
        self._estimate_gm()

        lf_levels = (0, 0, 0, 0)
        if cfg.enable_dlf:
            from svt_av1_tpu.ops import dlf
            with span("dlf"):
                if cfg.backend == "device":
                    from svt_av1_tpu.ops import device as dev_ops
                    lf_levels = dev_ops.dlf_search_apply_dev(
                        self.recon, self.src, self.leaf_sizes,
                        self.mi_rows, self.mi_cols, cfg.base_q_idx,
                        cfg.bit_depth)
                else:
                    lf_levels = dlf.pick_levels(
                        self.recon, self.src, self.leaf_sizes,
                        self.mi_rows, self.mi_cols, cfg.base_q_idx,
                        cfg.bit_depth)
                    dlf.loop_filter_frame(self.recon, self.leaf_sizes,
                                          self.mi_rows, self.mi_cols,
                                          lf_levels, bd=cfg.bit_depth)
        self.lr_rinfos = None
        lr_bounds = None
        if cfg.enable_restoration:
            import jax
            from svt_av1_tpu.ops import restoration as rst_ops
            lr_bounds = []
            for p in range(3):
                ss = 1 if p else 0
                Hp = (cfg.height + ss) >> ss
                Wp = (cfg.width + ss) >> ss
                if isinstance(self.recon[p], jax.Array):
                    from svt_av1_tpu.ops import device_lr
                    lr_bounds.append(device_lr.deblock_bounds_dev(
                        self.recon[p], Hp, Wp, ss))
                else:
                    lr_bounds.append(rst_ops.save_deblock_boundary_lines(
                        self.recon[p][:Hp, :Wp], Hp, ss))
        cdef_kw = {}
        self.cdef_idx_map = None
        if cfg.enable_cdef:
            from svt_av1_tpu.ops import cdef as cdef_ops
            frame_skip = np.zeros((self.mi_rows, self.mi_cols), dtype=bool)
            for (r, c), s in self.leaf_sizes.items():
                li = self.leaf_index[(r, c)]
                if self.eobs[:, li].sum() == 0:
                    lw, lh = common.leaf_wh(s)
                    frame_skip[r:r + (lh >> 2), c:c + (lw >> 2)] = True
            skip8 = frame_skip[0::2, 0::2] & frame_skip[0::2, 1::2] \
                & frame_skip[1::2, 0::2] & frame_skip[1::2, 1::2]
            with span("cdef"):
                if cfg.backend == "device":
                    from svt_av1_tpu.ops import device_cdef
                    idx_map, y_str, uv_str, damping = \
                        device_cdef.cdef_search_apply_dev(
                            self.recon, self.src, skip8, self.mi_rows,
                            self.mi_cols, cfg.base_q_idx, cfg.bit_depth)
                else:
                    idx_map, y_str, uv_str, damping = cdef_ops.cdef_search(
                        self.recon, self.src, skip8, self.mi_rows,
                        self.mi_cols, cfg.base_q_idx, cfg.bit_depth)
                    cdef_ops.cdef_frame(self.recon, skip8, idx_map, y_str,
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
                        self.recon, self.src, lr_bounds, cfg.width,
                        cfg.height, cfg.bit_depth, cfg.base_q_idx,
                        self.lam)
                else:
                    self.lr_rinfos = lr_search.search_restoration(
                        self.recon, self.src, lr_bounds, cfg.width,
                        cfg.height, cfg.bit_depth, cfg.base_q_idx,
                        self.lam)
                    rst_ops.loop_restoration_filter_frame(
                        self.recon, self.lr_rinfos, lr_bounds, cfg.width,
                        cfg.height, cfg.bit_depth)
            lr_kw = dict(lr_params=(
                tuple(ri.frame_restoration_type for ri in self.lr_rinfos),
                self.lr_rinfos[0].unit_size, self.lr_rinfos[1].unit_size))
        self._lf_levels = lf_levels
        self._cdef_kw = cdef_kw
        self._lr_kw = lr_kw
        self._show_frame = show_frame
        self._refresh_frame_flags = refresh_frame_flags
        self._ref_frame_idx = tuple(ref_frame_idx)
        return self.recon

    def encode_syntax(self, init_entropy=None, prev_gm=None) -> bytes:
        """Entropy coding + OBU assembly for the computed frame. Pure
        host work over state left by ``encode_compute`` — safe to run on
        a worker thread while the next frame's compute proceeds (the
        recon/filters do not depend on it)."""
        cfg = self.cfg
        carry = (not cfg.error_resilient) and init_entropy is not None
        self.init_entropy = init_entropy if carry else None
        # frame-level MVP state: each tile codes through a clipped view
        # (spatial scans stop at tile bounds, writes stitch into the
        # frame arrays); TMVP projections are shared slices
        fstate = mvp.MvpState(self.mi_rows, self.mi_cols)
        tc_ = getattr(self, "tmvp_ctx", None)
        if tc_ is not None and tc_["use"]:
            fstate.tpl = tc_["tpl"]
            fstate.rel_dist = tc_["rel_dist"]
            fstate.sign_bias = tc_["sign_bias"]
        self.frame_mvp_state = fstate
        frame_dims = (self.mi_rows, self.mi_cols)
        frame_leaves = self.leaf_sizes
        frame_index = self.leaf_index
        payloads = []
        for ti, rect in enumerate(self.tile_rects_v):
            payloads.append(self._syntax_pass(rect, fstate,
                                              frame_leaves, frame_index))
            if ti == 0:
                # context_update_tile_id = 0 (spec 6.8.2): tile 0's
                # frame-end adapted state is what decoders save
                tile0_entropy = (self.fc, self.nmv)
        self.mi_rows, self.mi_cols = frame_dims
        self.leaf_sizes, self.leaf_index = frame_leaves, frame_index
        self.fc, self.nmv = tile0_entropy
        fg = None
        if self.seq.film_grain_params_present:
            from svt_av1_tpu.ops import grain as grain_ops
            fg = grain_ops.resolved_params(cfg)
        gm_tuple = tuple(self.gm_mv.get(ref, (0, 0))
                         for ref in range(1, 8))
        no_end_update = cfg.disable_cdf_update or cfg.error_resilient
        tc = getattr(self, "tmvp_ctx", None) or {}
        fh = obu.FrameHeader(frame_type=obu.INTER_FRAME,
                             gm_trans=gm_tuple,
                             order_hint=tc.get("order_hint", 0),
                             use_ref_frame_mvs=tc.get("use", False),
                             ref_order_hints=tc.get("ref_order_hints",
                                                    (0,) * 8),
                             error_resilient=cfg.error_resilient,
                             primary_ref_frame=(0 if carry
                                                else obu.PRIMARY_REF_NONE),
                             prev_gm_trans=(prev_gm if carry and prev_gm
                                            else ((0, 0),) * 7),
                             disable_frame_end_update_cdf=no_end_update,
                             reference_select=self.reference_select,
                             delta_q_present=(self.qmap is not None),
                             interp_filter_switchable=(
                                 cfg.enable_interp_filter_search),
                             delta_q_res=self.DELTA_Q_RES,
                             film_grain=fg,
                             base_q_idx=cfg.base_q_idx,
                             disable_cdf_update=cfg.disable_cdf_update,
                             loop_filter_levels=self._lf_levels,
                             show_frame=self._show_frame,
                             refresh_frame_flags=self._refresh_frame_flags,
                             ref_frame_idx=self._ref_frame_idx,
                             tile_cols_log2=self.tile_log2[0],
                             tile_rows_log2=self.tile_log2[1],
                             **self._cdef_kw, **self._lr_kw)
        # the state a decoder saves into this frame's refresh slots
        # (spec: frame-end adapted CDFs unless end-update is disabled,
        # in which case the frame's starting state)
        if no_end_update:
            self.final_entropy = (
                (init_entropy[0].copy(), init_entropy[1].copy())
                if carry else (FrameContext(cfg.base_q_idx),
                               mv_syntax.NmvContext()))
        else:
            self.final_entropy = (self.fc, self.nmv)
        return (obu.temporal_delimiter_obu()
                + obu.write_frame_obu(self.seq, fh, payloads))

    # --- batched ME + coding -------------------------------------------------
    def _ref_candidates(self, ref, xs, ys, size, srcs, tx_size,
                        qp=None, lam=None):
        """ME + full-loop RD for one reference; returns per-candidate
        (cost, mv, qc, eo, rec) folded to the best."""
        cfg = self.cfg
        qp = self.qp if qp is None else qp
        lam = self.lam if lam is None else lam
        refp = self.refs[ref]
        bw, bh = common.leaf_wh(size)
        if cfg.backend == "device":
            from svt_av1_tpu.ops import device_inter as di
            return di.ref_candidates_dev(self.ref_pyrs[ref],
                                         self.src_pyr, xs, ys, size, qp,
                                         lam, bd=cfg.bit_depth,
                                         rdoq=cfg.enable_rdoq)
        int_mvs, _ = me.fullpel_search(refp[0], self.src[0], xs, ys, size,
                                       ref_pyr=self.ref_pyrs[ref],
                                       src_pyr=self.src_pyr)
        mvs, _ = me.subpel_refine(refp[0], self.src[0], xs, ys, size,
                                  int_mvs, bd=cfg.bit_depth)
        zero = np.zeros_like(mvs)
        plane_w, plane_h = self.src[0].shape[1], self.src[0].shape[0]
        b = len(xs)
        cands = [clamp_mvs_batch(c, xs, ys, bw, bh, plane_w, plane_h)
                 for c in (mvs, zero)]
        lamq = md.lam_to_q(lam)
        rlq = lamq if (cfg.enable_rdoq and qp.qindex > 0) else None
        best = None
        for cand in cands:
            pred = mc.mc_block_batch(refp[0], xs, ys, cand, bw, bh,
                                     bd=cfg.bit_depth).astype(np.int64)
            qc, eo, rec, dist, rate = md._full_loop(
                srcs, pred, np.zeros(b, dtype=np.int32), tx_size, size,
                qp, cfg.bit_depth, rdoq_lam_q=rlq)
            # q9 MV-rate floor: 2 bits + 0.5 for a nonzero MV
            mv_bits = (2 << md.RATE_Q) \
                + 256 * (np.abs(cand).sum(axis=1) > 0)
            cost = md.rdcost(dist, lamq, rate + mv_bits)
            if best is None:
                best = [cost, cand.copy(), qc, eo, rec]
            else:
                bt = cost < best[0]
                best[0] = np.where(bt, cost, best[0])
                best[1] = np.where(bt[:, None], cand, best[1])
                best[2] = np.where(bt[:, None, None], qc, best[2])
                best[3] = np.where(bt, eo, best[3])
                best[4] = np.where(bt[:, None, None], rec, best[4])
        return best

    def _me_rd_pruned(self, xs, ys, srcs, size, tx_size, qp, lam,
                      refs_order, qv=None, lamv=None):
        """Host ME+RD with SAD-based reference preselection (the
        reference's ME candidate pruning): full-pel HME runs on every
        ref, but sub-pel refinement and the full RD loop run only on the
        per-block winners — the overall best ref plus the per-direction
        winners feeding compound. Cuts the multi-ref cost from R full RD
        passes to ~1 plus compound."""
        cfg = self.cfg
        bw, bh = size
        b = len(xs)
        dev = cfg.backend == "device"
        plane_w, plane_h = self.src[0].shape[1], self.src[0].shape[0]
        if dev:
            # ONE fused program for the whole multi-ref ME+RD stage
            # (full-pel over every ref, sub-pel, clamp, winner RD) —
            # per-ref round trips through the tunnel cost ~60 ms each
            from svt_av1_tpu.ops import device_inter as di
            sads, refined_a, best_all, cost, mv_arr, qc, eo, rec = \
                di.me_rd_multi_dev([self.ref_pyrs[r] for r in refs_order],
                                   self.src_pyr, xs, ys, (bw, bh), qp,
                                   lam, bd=cfg.bit_depth,
                                   rdoq=cfg.enable_rdoq, qv=qv,
                                   lamv=lamv)
            chosen_ref = np.asarray(refs_order,
                                    dtype=np.int32)[best_all]
            fsel = bsel = None
            if self.reference_select:
                fidx = [refs_order.index(r) for r in self.fwd_refs]
                bidx = [refs_order.index(r) for r in self.bwd_refs]
                fsel = np.argmin(sads[fidx], axis=0)
                bsel = np.argmin(sads[bidx], axis=0)
            refined = {r: refined_a[i]
                       for i, r in enumerate(refs_order)}
            chosen = [cost, mv_arr, qc, eo, rec]
            return chosen_ref, chosen, refined, fsel, bsel
        fullpel = {}
        for r in refs_order:
            fullpel[r] = me.fullpel_search(
                self.refs[r][0], self.src[0], xs, ys, (bw, bh),
                ref_pyr=self.ref_pyrs[r], src_pyr=self.src_pyr)
        sads = np.stack([fullpel[r][1] for r in refs_order])
        best_all = np.argmin(sads, axis=0)
        need = {r: best_all == i for i, r in enumerate(refs_order)}
        fsel = bsel = None
        if self.reference_select:
            fidx = [refs_order.index(r) for r in self.fwd_refs]
            bidx = [refs_order.index(r) for r in self.bwd_refs]
            fsel = np.argmin(sads[fidx], axis=0)
            bsel = np.argmin(sads[bidx], axis=0)
            for j, r in enumerate(self.fwd_refs):
                need[r] |= fsel == j
            for j, r in enumerate(self.bwd_refs):
                need[r] |= bsel == j
        refined = {r: np.zeros((b, 2), dtype=np.int64)
                   for r in refs_order}
        for r in refs_order:
            sel = np.nonzero(need[r])[0]
            if len(sel) == 0:
                continue
            mv8, _ = me.subpel_refine(self.refs[r][0], self.src[0],
                                      xs[sel], ys[sel], (bw, bh),
                                      fullpel[r][0][sel],
                                      bd=cfg.bit_depth)
            refined[r][sel] = clamp_mvs_batch(mv8, xs[sel], ys[sel], bw,
                                              bh, plane_w, plane_h)
        # single-ref RD on the overall winner: {refined MV, zero MV}
        cdw, cdh = common.coded_dims(tx_size)
        lamq = md.lam_to_q(lam)
        cost = np.full(b, np.iinfo(np.int64).max)
        mv_arr = np.zeros((b, 2), dtype=np.int64)
        qc = np.zeros((b, cdh, cdw), dtype=np.int32)
        eo = np.zeros(b, dtype=np.int32)
        rec = np.zeros((b, bh, bw), dtype=np.int64)
        chosen_ref = np.full(b, refs_order[0], dtype=np.int32)
        for i, r in enumerate(refs_order):
            sel = np.nonzero(best_all == i)[0]
            if len(sel) == 0:
                continue
            chosen_ref[sel] = r
            zero = np.zeros((len(sel), 2), dtype=np.int64)
            for cand in (refined[r][sel], zero):
                pred = mc.mc_block_batch(self.refs[r][0], xs[sel],
                                         ys[sel], cand, bw, bh,
                                         bd=cfg.bit_depth) \
                    .astype(np.int64)
                qs, es, rs, dist, rate = md._full_loop(
                    srcs[sel], pred, np.zeros(len(sel), dtype=np.int32),
                    tx_size, (bw, bh), qp, cfg.bit_depth,
                    rdoq_lam_q=(lamq if (cfg.enable_rdoq
                                         and qp.qindex > 0) else None))
                mv_bits = (2 << md.RATE_Q) \
                    + 256 * (np.abs(cand).sum(axis=1) > 0)
                cs = md.rdcost(dist, lamq, rate + mv_bits)
                bt = cs < cost[sel]
                sub = sel[bt]
                cost[sub] = cs[bt]
                mv_arr[sub] = cand[bt]
                qc[sub], eo[sub], rec[sub] = qs[bt], es[bt], rs[bt]
        chosen = [cost, mv_arr, qc, eo, rec]
        return chosen_ref, chosen, refined, fsel, bsel

    def _compound_pairs(self, fsel, bsel, pmvs, xs, ys, srcs, size,
                        tx_size, qp, lam, comp_f, comp_b, qv=None,
                        lamv=None):
        """Batched bidirectional compound coding, grouped by the distinct
        (fwd, bwd) ref pairs the per-block direction winners form.
        pmvs: {ref: [B, 2] refined MVs}. Fills comp_f/comp_b in place;
        returns per-block (cost, qc, eo, rec, mv0, mv1)."""
        cfg = self.cfg
        bw, bh = size
        b = len(xs)
        cdw, cdh = common.coded_dims(tx_size)
        cost = np.full(b, np.iinfo(np.int64).max)
        qc = np.zeros((b, cdh, cdw), dtype=np.int32)
        eo = np.zeros(b, dtype=np.int32)
        rec = np.zeros((b, bh, bw), dtype=np.int64)
        mv0a = np.zeros((b, 2), dtype=np.int64)
        mv1a = np.zeros((b, 2), dtype=np.int64)
        if cfg.backend == "device":
            # every block's own (fwd, bwd) pair in ONE program: the
            # pair indices gather from a stacked ref bank
            from svt_av1_tpu.ops import device_inter as di
            refs_order = sorted(self.refs)
            pos = {r: i for i, r in enumerate(refs_order)}
            fmvs = np.stack([pmvs[f] for f in self.fwd_refs])
            bmvs = np.stack([pmvs[r] for r in self.bwd_refs])
            ar = np.arange(b)
            mv0a = fmvs[fsel, ar]
            mv1a = bmvs[bsel, ar]
            fref = np.asarray([pos[f] for f in self.fwd_refs])[fsel]
            bref_i = np.asarray([pos[r] for r in self.bwd_refs])[bsel]
            qc_, eo_, rec_, cost_ = di.compound_multi_dev(
                [[self.refs[r][0] for r in refs_order]], [self.src[0]],
                xs, ys, mv0a, mv1a, fref, bref_i, (bw, bh), qp, lam,
                bd=cfg.bit_depth, ss=0, rdoq=cfg.enable_rdoq, qv=qv,
                lamv=lamv)
            cost[:] = cost_.astype(np.int64)
            qc[:] = qc_.astype(np.int32)
            eo[:] = eo_.astype(np.int32)
            rec[:] = rec_.astype(np.int64)
            comp_f[:] = np.asarray(self.fwd_refs)[fsel]
            comp_b[:] = np.asarray(self.bwd_refs)[bsel]
            return cost, qc, eo, rec, mv0a.astype(np.int64), \
                mv1a.astype(np.int64)
        for fi, f in enumerate(self.fwd_refs):
            for bi, bref in enumerate(self.bwd_refs):
                sub = np.nonzero((fsel == fi) & (bsel == bi))[0]
                if len(sub) == 0:
                    continue
                mv0 = pmvs[f][sub]
                mv1 = pmvs[bref][sub]
                c0 = mc.mc_block_batch_conv(
                    self.refs[f][0], xs[sub], ys[sub], mv0, bw, bh,
                    bd=cfg.bit_depth)
                c1 = mc.mc_block_batch_conv(
                    self.refs[bref][0], xs[sub], ys[sub], mv1, bw,
                    bh, bd=cfg.bit_depth)
                pred_c = mc.compound_average(c0, c1, cfg.bit_depth) \
                    .astype(np.int64)
                qs, es, rs, dist, rate = md._full_loop(
                    srcs[sub], pred_c,
                    np.zeros(len(sub), dtype=np.int32), tx_size,
                    (bw, bh), qp, cfg.bit_depth,
                    rdoq_lam_q=(md.lam_to_q(lam)
                                if (cfg.enable_rdoq and qp.qindex > 0)
                                else None))
                mv_bits = (3 << md.RATE_Q) \
                    + 256 * ((np.abs(mv0).sum(axis=1) > 0)
                             .astype(np.int64)
                             + (np.abs(mv1).sum(axis=1) > 0))
                cs = md.rdcost(dist, md.lam_to_q(lam),
                               rate + mv_bits)
                cost[sub], qc[sub], eo[sub], rec[sub] = cs, qs, es, rs
                mv0a[sub], mv1a[sub] = mv0, mv1
                comp_f[sub], comp_b[sub] = f, bref
        return cost, qc, eo, rec, mv0a, mv1a

    def _winner_preds(self, xs, ys, size, mvs, refs_arr, comp_sel,
                      comp_f, comp_b, mvs1, ftype=0):
        """Recompute the winning MC prediction per block (single ref or
        compound average) — the exact pred a decoder forms, needed by
        the encode-pass tx sweep. ftype: scalar or [B] interp filter."""
        cfg = self.cfg
        bw, bh = common.leaf_wh(size)
        b = len(xs)
        ftv = np.broadcast_to(np.asarray(ftype), (b,))
        preds = np.zeros((b, bh, bw), dtype=np.int64)
        singles = ~comp_sel
        for ref in np.unique(np.asarray(refs_arr)[singles]) \
                if singles.any() else []:
            m = singles & (refs_arr == ref)
            preds[m] = mc.mc_block_batch(
                self.refs[int(ref)][0], xs[m], ys[m], mvs[m], bw, bh,
                ss=0, bd=cfg.bit_depth, ftype=ftv[m]).astype(np.int64)
        if comp_sel.any():
            pairs = {(int(f), int(bb)) for f, bb in
                     zip(comp_f[comp_sel], comp_b[comp_sel])}
            for f, bb in pairs:
                m = comp_sel & (comp_f == f) & (comp_b == bb)
                c0 = mc.mc_block_batch_conv(
                    self.refs[f][0], xs[m], ys[m], mvs[m], bw, bh,
                    bd=cfg.bit_depth, ftype=ftv[m])
                c1 = mc.mc_block_batch_conv(
                    self.refs[bb][0], xs[m], ys[m], mvs1[m], bw, bh,
                    bd=cfg.bit_depth, ftype=ftv[m])
                preds[m] = mc.compound_average(
                    c0, c1, cfg.bit_depth).astype(np.int64)
        return preds

    DELTA_Q_RES = 2

    def _leaf_vert_a(self, mi_row: int, mi_col: int, s4: int,
                     h4: int) -> bool:
        """Square member of a PARTITION_VERT_A parent (MVP top-right
        adjust, reference EbAdaptiveMotionVectorPrediction.c:882)."""
        from svt_av1_tpu.pipeline import avail
        from svt_av1_tpu.utils.blocks import PARTITION_VERT_A
        return avail.leaf_square_tshape(
            self.leaf_sizes, mi_row, mi_col, s4, h4, self.mi_rows,
            self.mi_cols) == PARTITION_VERT_A

    def _qp_for(self, qidx):
        if qidx is None:
            return self.qp, self.lam
        if not hasattr(self, "_qp_cache"):
            self._qp_cache = {}
        if qidx not in self._qp_cache:
            from svt_av1_tpu.pipeline import rd
            self._qp_cache[qidx] = (
                quant_ops.make_quant_params(qidx,
                                            bit_depth=self.cfg.bit_depth),
                rd.rd_lambda(qidx, self.cfg.bit_depth))
        return self._qp_cache[qidx]

    def _encode_blocks_fused(self, batches) -> None:
        """Device path: one fused program per shape group covers the
        whole multi-ref ME+RD+compound+chroma chain (twin of
        _encode_blocks' device branch — same integer decisions, same
        fold order, byte-identical streams). All groups are dispatched
        before any result is fetched; one batched device_get drains the
        tunnel once instead of 3x per shape.

        batches: [(blocks larr, ids, (bw, bh), qvec-or-None)]."""
        import jax
        from svt_av1_tpu.ops import device_inter as di
        cfg = self.cfg
        refs_order = sorted(self.refs)
        pdt = common.pixel_dtype(cfg.bit_depth)
        rec_dev = tuple(jax.device_put(p.astype(pdt))
                        for p in self.recon)
        issued = []
        with span("fused_issue", groups=len(batches)):
            self._fused_issue(batches, rec_dev, refs_order, issued, di)
        rec_dev = self._fused_rec_dev
        # the frame recon stays on device (flip/DLF/refs consume it
        # there); only the small decision outputs cross the tunnel now.
        # The (big) coefficient tensors are async-prefetched and resolved
        # lazily on the entropy thread (_PendingQC), overlapping their
        # download with the next frame's compute.
        self.recon = list(rec_dev)
        with span("fused_small_fetch"):
            small = jax.device_get([
                [outs[i] for i in (0, 1, 2, 3, 4, 5, 6, 8, 10, 12)]
                for outs, *_ in issued])
        # start the big coefficient copies only AFTER the small fetch —
        # the tunnel serves transfers in order, so queueing MBs of
        # coefficients first would stall the decision outputs behind them
        for j, (outs, b, *_rest) in enumerate(issued):
            outs = list(outs)
            issued[j] = (outs, b) + tuple(_rest)
            for i in (7, 9, 11):
                outs[i] = outs[i][:b]
                outs[i].copy_to_host_async()
        fwd_ids = np.asarray(self.fwd_refs or [LAST_FRAME])
        bwd_ids = np.asarray(self.bwd_refs or [0])
        for sm, (outs, b, ids, wh, xs, ys) in zip(small, issued):
            (cost, mv0, mv1, pos_c, comp, fsel, bsel, eo, eou, eov) = \
                [np.asarray(o)[:b] for o in sm]
            chosen_ref = np.asarray(refs_order)[pos_c.astype(np.int64)]
            self.mvs[ids] = mv0.astype(np.int64)
            self.block_ref[ids] = chosen_ref
            self.eobs[0, ids] = eo
            self.inter_cost[ids] = cost
            if self.reference_select:
                self.mvs1[ids] = np.where(comp[:, None],
                                          mv1.astype(np.int64), 0)
                self.block_comp[ids] = comp
                self.comp_ref0[ids] = np.where(
                    comp, fwd_ids[fsel.astype(np.int64)], LAST_FRAME)
                self.comp_ref1[ids] = np.where(
                    comp, bwd_ids[bsel.astype(np.int64)], 0)
            self.eobs[1, ids] = eou
            self.eobs[2, ids] = eov
            for plane, oi in ((0, 7), (1, 9), (2, 11)):
                pend = _PendingQC(outs[oi])
                for k, i in enumerate(ids):
                    self.qcoeff[plane][i] = (pend, k)

    def _fused_issue(self, batches, rec_dev, refs_order, issued, di):
        """Dispatch every shape-group program (compile-or-enqueue only —
        no fetches)."""
        cfg = self.cfg
        pos = {r: i for i, r in enumerate(refs_order)}
        fwd_pos = tuple(pos[r] for r in self.fwd_refs) \
            if self.reference_select else ()
        bwd_pos = tuple(pos[r] for r in self.bwd_refs) \
            if self.reference_select else ()
        for blocks, ids, wh, qvec in batches:
            qp, lam = self._qp_for(None)
            lamv = None
            if qvec is not None:
                lamv = np.array([self._qp_for(int(q))[1] for q in qvec])
            xs = blocks[:, 1] * 4
            ys = blocks[:, 0] * 4
            rec_dev, outs, b = di.shape_group_issue(
                rec_dev,
                [self.ref_pyrs[r] for r in refs_order],
                [self.refs[r][1] for r in refs_order],
                [self.refs[r][2] for r in refs_order],
                self.src_pyr, self.src[1], self.src[2], xs, ys, wh,
                qp, lam, fwd_pos, bwd_pos, bd=cfg.bit_depth,
                rdoq=cfg.enable_rdoq, qv=qvec, lamv=lamv)
            issued.append((outs, b, ids, wh, xs, ys))
        self._fused_rec_dev = rec_dev

    def _encode_blocks(self, blocks, ids, size, qidx=None,
                       qvec=None) -> None:
        """qidx: scalar AQ qindex for the whole batch (host groups);
        qvec: per-block qindex array (device path — one dispatch covers
        every AQ group, quantizer params are traced operands)."""
        cfg = self.cfg
        qp, lam = self._qp_for(qidx)
        lamv = None
        if qvec is not None:
            lamv = np.array([self._qp_for(int(q))[1] for q in qvec])
        bw, bh = common.leaf_wh(size)
        xs = blocks[:, 1] * 4
        ys = blocks[:, 0] * 4
        b = len(ids)
        cw, ch = bw >> 1, bh >> 1
        srcs = np.stack([self.src[0][yy:yy + bh, xx:xx + bw]
                         for xx, yy in zip(xs, ys)]).astype(np.int64)
        tx_size = common.tx_size_for_rect(bw, bh, 0)

        refs_order = sorted(self.refs)
        with span("me_rd"):
            chosen_ref, chosen, pmvs, fsel, bsel = \
                self._me_rd_pruned(xs, ys, srcs, (bw, bh), tx_size, qp,
                                   lam, refs_order, qv=qvec, lamv=lamv)

        comp_sel = np.zeros(b, dtype=bool)
        comp_f = np.full(b, LAST_FRAME, dtype=np.int32)
        comp_b = np.zeros(b, dtype=np.int32)
        if self.reference_select:
            with span("compound"):
                cost, qc, eo, rec, mv0a, mv1a = self._compound_pairs(
                    fsel, bsel, pmvs, xs, ys, srcs, (bw, bh), tx_size,
                    qp, lam, comp_f, comp_b, qv=qvec, lamv=lamv)
            comp_sel = cost < chosen[0]
            chosen[0] = np.where(comp_sel, cost, chosen[0])
            chosen[1] = np.where(comp_sel[:, None], mv0a, chosen[1])
            chosen[2] = np.where(comp_sel[:, None, None], qc, chosen[2])
            chosen[3] = np.where(comp_sel, eo, chosen[3])
            chosen[4] = np.where(comp_sel[:, None, None], rec, chosen[4])
            chosen_ref = np.where(comp_sel, comp_f, chosen_ref)
            self.mvs1[ids] = np.where(comp_sel[:, None], mv1a, 0)
            self.block_comp[ids] = comp_sel
            self.comp_ref0[ids] = np.where(comp_sel, comp_f, LAST_FRAME)
            self.comp_ref1[ids] = np.where(comp_sel, comp_b, 0)
        if cfg.enable_interp_filter_search:
            # per-block REGULAR/SMOOTH/SHARP selection on the winner
            # (reference interpolation filter search in the inter MD
            # loop, EbInterPrediction.c:3523): SSE argmin over the 3
            # filter sets, then an exact full-loop recode of the blocks
            # that left REGULAR. Host math for both backends — the
            # streams stay byte-identical across them.
            with span("interp_filter_search"):
                self._interp_filter_select(
                    ids, xs, ys, srcs, (bw, bh), tx_size, chosen,
                    chosen_ref, comp_sel, comp_f, comp_b, qp, lam,
                    qvec, lamv)
        if cfg.enable_tx_type_search:
            # encode-pass TX-type sweep on the winning prediction
            # (ref: encode_pass_tx_search EbCodingLoop.c:516); runs on
            # host for both backends — same ints, identical streams
            with span("inter_tx_search"):
                preds = self._winner_preds(xs, ys, (bw, bh), chosen[1],
                                           chosen_ref, comp_sel, comp_f,
                                           comp_b, self.mvs1[ids],
                                           ftype=self.interp_f[ids])
                self.y_tx_type[ids] = md.inter_tx_search(
                    srcs, preds, chosen[0], chosen[2], chosen[3],
                    chosen[4], tx_size, (bw, bh), qp, cfg.bit_depth, lam,
                    rdoq=cfg.enable_rdoq)
        self.mvs[ids] = chosen[1]
        self.block_ref[ids] = chosen_ref
        self.eobs[0, ids] = chosen[3]
        self.inter_cost[ids] = chosen[0]
        for k, i in enumerate(ids):
            self.qcoeff[0][i] = chosen[2][k]
            yy, xx = int(ys[k]), int(xs[k])
            self.recon[0][yy:yy + bh, xx:xx + bw] = chosen[4][k]

        # chroma: MC with the chosen MV/ref (or compound pair), DCT residual
        tx_uv = common.tx_size_for_rect(cw, ch, 1)
        cpairs = []
        if np.any(comp_sel):
            pf, pb_ = self.comp_ref0[ids], self.comp_ref1[ids]
            cpairs = [(f, bb) for f, bb in
                      {(int(f), int(bb))
                       for f, bb in zip(pf[comp_sel], pb_[comp_sel])}]
        # inter chroma inherits the luma tx type (spec 8.3.2), demoted
        # to DCT when luma coded no coefficients or outside the chroma
        # set; all-DCT when the sweep is off
        ctts = np.zeros(b, dtype=np.int32)
        if cfg.enable_tx_type_search:
            luma_tt = np.where(chosen[3] > 0, self.y_tx_type[ids], 0)
            ctts = np.array([common.chroma_tx_type_inter(
                int(t), tx_uv, False) for t in luma_tt], dtype=np.int32)
        dev_chroma = cfg.backend == "device" \
            and not cfg.enable_tx_type_search \
            and not cfg.enable_interp_filter_search
        if dev_chroma:
            # one fused call codes U+V for every single-ref block; the
            # (rare) compound pairs follow per pair
            from svt_av1_tpu.ops import device_inter as di
            cxs, cys = xs >> 1, ys >> 1
            cdw, cdh = common.coded_dims(tx_uv)
            ref_pos = {r: i for i, r in enumerate(refs_order)}
            ridx = np.array([ref_pos[int(r)] for r in chosen_ref],
                            dtype=np.int64)
            outs = di.chroma_multi_dev(
                [self.refs[r][1] for r in refs_order],
                [self.refs[r][2] for r in refs_order],
                self.src[1], self.src[2], cxs, cys, chosen[1], ridx,
                (cw, ch), qp, bd=cfg.bit_depth, lam=lam,
                rdoq=cfg.enable_rdoq, qv=qvec, lamv=lamv)
            outs = [o.copy() for o in outs]
            csel = np.nonzero(comp_sel)[0]
            if len(csel):
                # compound blocks' U+V in one call (per-block pairs)
                idx0 = np.array([ref_pos[int(r)]
                                 for r in self.comp_ref0[ids][csel]],
                                dtype=np.int64)
                idx1 = np.array([ref_pos[int(r)]
                                 for r in self.comp_ref1[ids][csel]],
                                dtype=np.int64)
                comp = di.compound_multi_dev(
                    [[self.refs[r][1] for r in refs_order],
                     [self.refs[r][2] for r in refs_order]],
                    [self.src[1], self.src[2]],
                    cxs[csel], cys[csel], chosen[1][csel],
                    self.mvs1[ids][csel], idx0, idx1, (cw, ch), qp,
                    lam, bd=cfg.bit_depth, ss=1,
                    rdoq=cfg.enable_rdoq,
                    qv=None if qvec is None else qvec[csel],
                    lamv=None if lamv is None else lamv[csel])
                for pi in range(2):
                    outs[3 * pi][csel] = comp[3 * pi]
                    outs[3 * pi + 1][csel] = comp[3 * pi + 1]
                    outs[3 * pi + 2][csel] = comp[3 * pi + 2]
            for pi, plane in enumerate((1, 2)):
                qc, eo, rec = outs[3 * pi], outs[3 * pi + 1], \
                    outs[3 * pi + 2]
                self.eobs[plane, ids] = eo
                for k, i in enumerate(ids):
                    self.qcoeff[plane][i] = qc[k]
                    yy, xx = int(cys[k]), int(cxs[k])
                    self.recon[plane][yy:yy + ch, xx:xx + cw] = rec[k]
            return
        for plane in (1, 2):
            cxs, cys = xs >> 1, ys >> 1
            srcs_c = np.stack([
                self.src[plane][yy:yy + ch, xx:xx + cw]
                for xx, yy in zip(cxs, cys)]).astype(np.int64)
            pred = np.empty((b, ch, cw), dtype=np.int64)
            ftv = self.interp_f[ids]
            for ref in refs_order:
                sel = np.nonzero((chosen_ref == ref) & ~comp_sel)[0]
                if len(sel) == 0:
                    continue
                pred[sel] = mc.mc_block_batch(
                    self.refs[ref][plane], cxs[sel], cys[sel],
                    chosen[1][sel], cw, ch, ss=1,
                    bd=cfg.bit_depth, ftype=ftv[sel]).astype(np.int64)
            for f, bref in cpairs:
                csel = np.nonzero(comp_sel
                                  & (self.comp_ref0[ids] == f)
                                  & (self.comp_ref1[ids] == bref))[0]
                if len(csel) == 0:
                    continue
                cc0 = mc.mc_block_batch_conv(
                    self.refs[f][plane], cxs[csel],
                    cys[csel], chosen[1][csel], cw, ch, ss=1,
                    bd=cfg.bit_depth, ftype=ftv[csel])
                cc1 = mc.mc_block_batch_conv(
                    self.refs[bref][plane], cxs[csel], cys[csel],
                    self.mvs1[ids][csel], cw, ch, ss=1,
                    bd=cfg.bit_depth, ftype=ftv[csel])
                pred[csel] = mc.compound_average(cc0, cc1,
                                                 cfg.bit_depth)
            # plane_type=1: the trim LUT must match the device chroma
            # builders (dist/rate outputs are discarded here)
            qc, eo, rec, _, _ = md._full_loop(
                srcs_c, pred, ctts, tx_uv, (cw, ch), qp,
                cfg.bit_depth, plane_type=1,
                rdoq_lam_q=(md.lam_to_q(lam)
                            if (cfg.enable_rdoq and qp.qindex > 0)
                            else None))
            self.eobs[plane, ids] = eo
            for k, i in enumerate(ids):
                self.qcoeff[plane][i] = qc[k]
                yy, xx = int(cys[k]), int(cxs[k])
                self.recon[plane][yy:yy + ch, xx:xx + cw] = rec[k]


    def _interp_filter_select(self, ids, xs, ys, srcs, size, tx_size,
                              chosen, chosen_ref, comp_sel, comp_f,
                              comp_b, qp, lam, qvec=None, lamv=None):
        """Per-block switchable-filter decision on the ME/compound
        winner: form the 3 candidate predictions (single-ref MC or
        compound average), pick the luma-SSE argmin (first-min — REGULAR
        wins ties, and integer MVs cost nothing since phase-0 taps are
        identical across sets), then re-run the exact full loop for the
        sparse set of blocks that switched so qc/eob/recon/cost match
        what the decoder reconstructs."""
        cfg = self.cfg
        bw, bh = size
        b = len(xs)
        mvs0 = chosen[1]
        mvs1 = self.mvs1[ids]
        preds = []
        sses = []
        for f in range(mc.SWITCHABLE_FILTERS):
            pred = np.zeros((b, bh, bw), dtype=np.int64)
            singles = ~comp_sel
            if singles.any():
                for ref in np.unique(np.asarray(chosen_ref)[singles]):
                    m = singles & (chosen_ref == ref)
                    pred[m] = mc.mc_block_batch(
                        self.refs[int(ref)][0], xs[m], ys[m], mvs0[m],
                        bw, bh, bd=cfg.bit_depth,
                        ftype=f).astype(np.int64)
            if comp_sel.any():
                pairs = {(int(ff), int(bb)) for ff, bb in
                         zip(comp_f[comp_sel], comp_b[comp_sel])}
                for ff, bb in pairs:
                    m = comp_sel & (comp_f == ff) & (comp_b == bb)
                    c0 = mc.mc_block_batch_conv(
                        self.refs[ff][0], xs[m], ys[m], mvs0[m], bw, bh,
                        bd=cfg.bit_depth, ftype=f)
                    c1 = mc.mc_block_batch_conv(
                        self.refs[bb][0], xs[m], ys[m], mvs1[m], bw, bh,
                        bd=cfg.bit_depth, ftype=f)
                    pred[m] = mc.compound_average(
                        c0, c1, cfg.bit_depth).astype(np.int64)
            preds.append(pred)
            sses.append(((srcs - pred) ** 2).sum(axis=(1, 2)))
        # rate-aware pick: leaving REGULAR must buy ~2 bits of SSE (the
        # adapted symbol's typical cost) — pure SSE argmin overspends on
        # filter flips that die after quantization
        lamq_vec = np.full(b, md.lam_to_q(lam), dtype=np.int64) \
            if lamv is None else np.asarray(
                [md.lam_to_q(lv) for lv in lamv], dtype=np.int64)
        costs = [md.rdcost(sse_f, lamq_vec,
                           0 if f == 0 else (2 << md.RATE_Q))
                 for f, sse_f in enumerate(sses)]
        ftype = np.argmin(np.stack(costs), axis=0).astype(np.int32)
        self.interp_f[ids] = ftype
        redo = np.nonzero(ftype != 0)[0]
        if len(redo) == 0:
            return
        pred_stack = np.stack(preds)
        qgroups = [(None, redo)] if qvec is None else \
            [(int(q), redo[qvec[redo] == q])
             for q in np.unique(qvec[redo])]
        for qi, sel in qgroups:
            if len(sel) == 0:
                continue
            qp_i, lam_i = (qp, lam) if qi is None else self._qp_for(qi)
            lamq = md.lam_to_q(lam_i)
            pred_sel = pred_stack[ftype[sel], sel]
            qc, eo, rec, dist, rate = md._full_loop(
                srcs[sel], pred_sel, np.zeros(len(sel), dtype=np.int32),
                tx_size, size, qp_i, cfg.bit_depth,
                rdoq_lam_q=(lamq if (cfg.enable_rdoq
                                     and qp_i.qindex > 0) else None))
            nz0 = (np.abs(mvs0[sel]).sum(axis=1) > 0).astype(np.int64)
            nz1 = (np.abs(mvs1[sel]).sum(axis=1) > 0).astype(np.int64)
            mv_bits = np.where(comp_sel[sel],
                               (3 << md.RATE_Q) + 256 * (nz0 + nz1),
                               (2 << md.RATE_Q) + 256 * nz0)
            chosen[0][sel] = md.rdcost(dist, lamq, rate + mv_bits)
            chosen[2][sel] = qc
            chosen[3][sel] = eo
            chosen[4][sel] = rec

    # --- global motion estimation ---------------------------------------------
    def _estimate_gm(self) -> None:
        """Translation-only global motion from the decided MV field: the
        modal MV per reference becomes that ref's gm when it dominates
        (the role of SetGlobalMotionField's translation-only model,
        EbModeDecisionConfigurationProcess.c:317 — applied post-decision
        here: gm only changes *signaling*, blocks whose MV equals gm
        code as GLOBALMV)."""
        from collections import Counter
        self.gm_mv = {}
        for ref in self.refs:
            sel = [i for i in range(len(self.block_is_inter))
                   if self.block_is_inter[i] and not self.block_comp[i]
                   and int(self.block_ref[i]) == ref]
            if len(sel) < 4:
                continue
            counts = Counter((int(self.mvs[i, 0]), int(self.mvs[i, 1]))
                             for i in sel)
            mv, cnt = counts.most_common(1)[0]
            if mv == (0, 0) or cnt < max(4, len(sel) // 4):
                continue
            if abs(mv[0]) > 511 or abs(mv[1]) > 511 \
                    or mv[0] % 2 or mv[1] % 2:
                continue
            self.gm_mv[ref] = mv

    # --- intra-in-inter (sequential, coding order) ---------------------------

    def _intra_flip_pass(self, leaves) -> None:
        """Re-decide poorly-predicted blocks as intra (the reference's MD
        evaluates intra candidates inside inter frames,
        EbModeDecisionProcess intra candidate injection).

        Two phases (TPU-shaped: one big batched decision, sparse exact
        tail): the *decision* pass evaluates every candidate block x mode
        in one batched full loop against the inter reconstruction (an
        open-loop approximation — a flipped neighbor may later change the
        edge pixels); the *exact* pass then re-codes only the accepted
        flips sequentially in coding order with true final edges, so the
        reconstruction matches what the decoder reproduces bit-for-bit."""
        from svt_av1_tpu.pipeline import avail, md
        cfg = self.cfg
        costs = self.inter_cost
        thr = np.median(costs) * 1.2 + 1.0
        mode_bits = 6 << md.RATE_Q  # is_inter + y/uv mode signaling
        cand = []
        for (r, c, size) in leaves:
            li = self.leaf_index[(r, c)]
            _bw, _bh = common.leaf_wh(size)
            # evaluate when clearly worse than the frame's typical block
            # OR in absolute terms (~1 bit/px of estimated cost — a full
            # scene change makes every block bad, so a relative rule
            # alone never fires); 512 matches the q9 cost scale
            abs_thr = self._qp_for(None)[1] * (_bw * _bh) * 32.0
            if costs[li] <= thr and costs[li] <= abs_thr:
                continue
            cand.append((r, c, size, li))
        if not cand:
            return
        with span("flip_decision", n=len(cand)):
            flips = self._flip_decision_batch(cand, mode_bits)
        if not flips:
            return
        waves = self._flip_waves(flips)
        with span("flip_apply", n=len(flips), waves=len(waves)):
            if cfg.backend == "device":
                from svt_av1_tpu.ops import device_tile as dt
                if dt.flip_apply_fused(self, waves):
                    return
            self._materialize_recon()
            for wave in waves:
                self._flip_apply_wave(wave)

    def _materialize_recon(self) -> None:
        """Fetch device-resident recon planes to host numpy (rare
        fallback paths only — the device pipeline keeps them resident)."""
        import jax
        if any(isinstance(p, jax.Array) for p in self.recon):
            self.recon = [np.asarray(p) for p in self.recon]

    def _flip_waves(self, flips):
        """Dependency waves over accepted flips; tiles are layered
        independently (intra edges never cross a tile bound) and merged
        by wave index, so one scan step batches every tile's lanes —
        the critical path divides by the tile-column count."""
        if len(self.tile_rects_v) > 1:
            by_tile = {}
            for f in flips:
                lut = getattr(self, "_tile_lut", None)
                if lut is None:
                    self._tile_local_coords([0], [0])
                    lut = self._tile_lut
                key = (int(lut[0][f[0] // 16, f[1] // 16]),
                       int(lut[1][f[0] // 16, f[1] // 16]))
                by_tile.setdefault(key, []).append(f)
            merged = []
            for tf in by_tile.values():
                for w, wave in enumerate(self._flip_waves_one(tf)):
                    while len(merged) <= w:
                        merged.append([])
                    merged[w].extend(wave)
            return merged
        return self._flip_waves_one(flips)

    def _flip_waves_one(self, flips):
        """Dependency waves over accepted flips: a flip depends on any
        earlier-coding-order flip whose rect intersects its intra edge
        bands (above row incl. top-right reach 2*bw and the top-left
        pixel; left column incl. bottom-left reach 2*bh). Same-wave flips
        cannot see each other's pixels, so each wave recodes as one
        batch while exactly reproducing sequential coding-order edges."""
        cell = {}
        wave_of = []
        waves = []
        for k, (r, c, size, li, m) in enumerate(flips):
            bw, bh = common.leaf_wh(size)
            w4, h4 = bw >> 2, bh >> 2
            w = 0
            if r > 0:
                for cc in range(max(c - 1, 0),
                                min(c + 2 * w4 + 1, self.mi_cols)):
                    j = cell.get((r - 1, cc))
                    if j is not None:
                        w = max(w, wave_of[j] + 1)
            if c > 0:
                for rr in range(r, min(r + 2 * h4 + 1, self.mi_rows)):
                    j = cell.get((rr, c - 1))
                    if j is not None:
                        w = max(w, wave_of[j] + 1)
            wave_of.append(w)
            for rr in range(r, min(r + h4, self.mi_rows)):
                for cc in range(c, min(c + w4, self.mi_cols)):
                    cell[(rr, cc)] = k
            if w == len(waves):
                waves.append([])
            waves[w].append(flips[k])
        return waves

    def _flip_apply_wave(self, wave) -> None:
        """Recode one wave of accepted flips with true edges, batched per
        (block shape, qindex, mode) group: luma full loop with the chosen
        mode, then the chroma mode-vs-CfL choice."""
        from svt_av1_tpu.ops import cfl as cfl_ops
        from svt_av1_tpu.ops import intra as intra_ops
        from svt_av1_tpu.pipeline import avail, md
        cfg = self.cfg
        groups = {}
        for e in wave:
            r, c, size, li, m = e
            qidx = None if self.qmap is None \
                else int(self.qmap[r // 16, c // 16])
            groups.setdefault((common.leaf_wh(size), qidx, m),
                              []).append(e)
        for ((bw, bh), qidx, m), es in groups.items():
            qp, lam = self._qp_for(qidx)
            lamq = md.lam_to_q(lam)
            tx_y = common.tx_size_for_rect(bw, bh, 0)
            rs = np.array([e[0] for e in es])
            cs = np.array([e[1] for e in es])
            lis = np.array([e[3] for e in es])
            xs, ys = cs * 4, rs * 4
            b = len(es)
            lr_, lc_, trs, tcs = self._tile_local_coords(rs, cs)
            ha = lr_ > 0
            hl = lc_ > 0
            vab = avail.leaf_vert_ab_flags(self.leaf_sizes, rs, cs,
                                           bw >> 2, bh >> 2,
                                           self.mi_rows, self.mi_cols)
            htr = avail.has_top_right_wh_vec(lr_, lc_, bw >> 2, bh >> 2,
                                             tcs, vert_ab=vab)
            hbl = avail.has_bottom_left_wh_vec(lr_, lc_, bw >> 2, bh >> 2,
                                               trs, vert_ab=vab)
            # edge replication clamps at the TILE right/bottom edge
            # (decoded samples never cross a tile bound, spec 7.11.2)
            mxw = (cs - lc_ + tcs) * 4
            mxh = (rs - lr_ + trs) * 4
            above1, left1 = intra_ops.prepare_edges_av1(
                self.recon[0], xs, ys, bw, bh, ha, hl, htr, hbl,
                bd=cfg.bit_depth, max_w=mxw, max_h=mxh)
            iy = np.asarray(ys)[:, None, None] \
                + np.arange(bh)[None, :, None]
            ix = np.asarray(xs)[:, None, None] \
                + np.arange(bw)[None, None, :]
            srcs = self.src[0][iy, ix].astype(np.int64)
            pred = intra_ops.predict_any(
                m, 0, above1, left1, bw, bh, ha, hl,
                bd=cfg.bit_depth).astype(np.int64)
            qc, eo, rec, _, _ = md._full_loop(
                srcs, pred, np.zeros(b, dtype=np.int32), tx_y, (bw, bh),
                qp, cfg.bit_depth,
                rdoq_lam_q=(lamq if (cfg.enable_rdoq and qp.qindex > 0)
                            else None))
            self.block_is_inter[lis] = False
            self.intra_mode[lis] = m
            self.eobs[0, lis] = eo
            for k, li in enumerate(lis):
                self.qcoeff[0][li] = qc[k]
                y, x = int(ys[k]), int(xs[k])
                self.recon[0][y:y + bh, x:x + bw] = rec[k]
            # chroma: luma mode vs CfL candidate (cfl_allowed <= 32x32)
            cw2, ch2 = bw >> 1, bh >> 1
            tx_uv = common.tx_size_for_rect(cw2, ch2, 1)
            cxs, cys = xs >> 1, ys >> 1
            cfl_ok = bw <= 32 and bh <= 32
            ac = None
            if cfl_ok:
                luma = np.stack([
                    self.recon[0][y:y + bh, x:x + bw]
                    for x, y in zip(xs, ys)]).astype(np.int64)
                ac = cfl_ops.luma_ac_420(luma)
            results = {}
            for p in (1, 2):
                a1, l1 = intra_ops.prepare_edges_av1(
                    self.recon[p], cxs, cys, cw2, ch2, ha, hl, htr, hbl,
                    bd=cfg.bit_depth, max_w=mxw >> 1, max_h=mxh >> 1)
                srcs_c = np.stack([
                    self.src[p][y:y + ch2, x:x + cw2]
                    for x, y in zip(cxs, cys)]).astype(np.int64)
                predc = intra_ops.predict_any(
                    m, 0, a1, l1, cw2, ch2, ha, hl,
                    bd=cfg.bit_depth).astype(np.int64)
                tt_u = common.chroma_tx_type(m, tx_uv, False)
                qcp, eop, recp, dist, rate = md._full_loop(
                    srcs_c, predc, np.full(b, tt_u, dtype=np.int32),
                    tx_uv, (cw2, ch2), qp, cfg.bit_depth,
                    rdoq_lam_q=(lamq if (cfg.enable_rdoq
                                         and qp.qindex > 0) else None))
                res = {"mode": (qcp, eop, recp,
                                md.rdcost(dist, lamq, rate))}
                if cfl_ok:
                    dc = intra_ops.predict(
                        0, a1[:, 1:], l1[:, 1:], a1[:, 0], cw2, ch2,
                        have_above=ha, have_left=hl, bd=cfg.bit_depth)
                    alpha = cfl_ops.fit_alpha(ac, srcs_c, dc)
                    cpred = cfl_ops.predict(dc, ac, alpha,
                                            bd=cfg.bit_depth)
                    qc2, eo2, rec2, dist2, rate2 = md._full_loop(
                        srcs_c, cpred.astype(np.int64),
                        np.zeros(b, dtype=np.int32), tx_uv, (cw2, ch2),
                        qp, cfg.bit_depth,
                        rdoq_lam_q=(lamq if (cfg.enable_rdoq
                                             and qp.qindex > 0)
                                    else None))
                    res["cfl"] = (qc2, eo2, rec2,
                                  md.rdcost(dist2, lamq,
                                            rate2 + (4 << md.RATE_Q)),
                                  alpha)
                results[p] = res
            if cfl_ok and "cfl" in results[1]:
                cost_mode = results[1]["mode"][3] + results[2]["mode"][3]
                cost_cfl = results[1]["cfl"][3] + results[2]["cfl"][3]
                use_cfl = (cost_cfl < cost_mode) \
                    & ~((results[1]["cfl"][4] == 0)
                        & (results[2]["cfl"][4] == 0))
            else:
                use_cfl = np.zeros(b, dtype=bool)
            self.intra_uv_cfl[lis] = use_cfl
            for p in (1, 2):
                mode_r = results[p]["mode"]
                cfl_r = results[p].get("cfl")
                for k, li in enumerate(lis):
                    sel = cfl_r if use_cfl[k] else mode_r
                    self.qcoeff[p][li] = sel[0][k]
                    self.eobs[p, li] = sel[1][k]
                    y, x = int(cys[k]), int(cxs[k])
                    self.recon[p][y:y + ch2, x:x + cw2] = sel[2][k]
            au = np.where(use_cfl, results[1].get(
                "cfl", (0, 0, 0, 0, np.zeros(b, np.int64)))[4], 0)
            av = np.where(use_cfl, results[2].get(
                "cfl", (0, 0, 0, 0, np.zeros(b, np.int64)))[4], 0)
            self.intra_alpha_u[lis] = au
            self.intra_alpha_v[lis] = av

    def _flip_decision_batch(self, cand, mode_bits):
        """Batched open-loop intra-vs-inter decision over all candidate
        blocks: returns [(r, c, size, li, best_mode)] for accepted flips,
        in coding order."""
        from svt_av1_tpu.ops import intra as intra_ops
        from svt_av1_tpu.pipeline import avail, md
        cfg = self.cfg
        cand_modes = tuple(cfg.intra_modes) or (0,)
        if cfg.enable_intra_edge_filter:
            # flip predictions bypass the intra edge filter process;
            # keep only process-exempt modes (non-directional + exact
            # V/H at delta 0) so signaled streams stay decoder-exact
            cand_modes = tuple(m for m in cand_modes
                               if m in (0, 1, 2, 9, 10, 11, 12)) or (0,)
        lane_qidx = [None if self.qmap is None
                     else int(self.qmap[r // 16, c // 16])
                     for (r, c, size, li) in cand]
        qps = {qi: self._qp_for(qi)
               for qi in set(lane_qidx)}
        dev_ok = cfg.backend == "device"
        if dev_ok and cfg.enable_rdoq and any(
                qps[qi][0].qindex == 0 for qi in set(lane_qidx)):
            dev_ok = False  # host path gates RDOQ per-lane at qindex 0
        groups = {}
        for k, (r, c, size, li) in enumerate(cand):
            gk = common.leaf_wh(size) if dev_ok \
                else (common.leaf_wh(size), lane_qidx[k])
            groups.setdefault(gk, []).append(k)
        flips = [None] * len(cand)
        pending = []
        for gk, ks in groups.items():
            (bw, bh) = gk if dev_ok else gk[0]
            if dev_ok:
                qv = np.array([qps[lane_qidx[k]][0].qindex for k in ks],
                              np.int32)
                lams = [qps[lane_qidx[k]][1] for k in ks]
                lamqs = np.array([md.lam_to_q(lv) for lv in lams],
                                 np.int64)
                qp, lam = qps[lane_qidx[ks[0]]]
            else:
                qp, lam = qps[gk[1]]
                lamqs = np.int64(md.lam_to_q(lam))
            tx_y = common.tx_size_for_rect(bw, bh, 0)
            rs = np.array([cand[k][0] for k in ks])
            cs = np.array([cand[k][1] for k in ks])
            xs, ys = cs * 4, rs * 4
            lr_, lc_, trs, tcs = self._tile_local_coords(rs, cs)
            ha = lr_ > 0
            hl = lc_ > 0
            vab = avail.leaf_vert_ab_flags(self.leaf_sizes, rs, cs,
                                           bw >> 2, bh >> 2,
                                           self.mi_rows, self.mi_cols)
            htr = avail.has_top_right_wh_vec(lr_, lc_, bw >> 2, bh >> 2,
                                             tcs, vert_ab=vab)
            hbl = avail.has_bottom_left_wh_vec(lr_, lc_, bw >> 2, bh >> 2,
                                               trs, vert_ab=vab)
            # tile right/bottom pixel bounds for edge replication (the
            # decision must price exactly the edges the recode uses)
            mxw = (cs - lc_ + tcs) * 4
            mxh = (rs - lr_ + trs) * 4
            b = len(ks)
            if dev_ok:
                # dispatch-only: sources, edges (from the device-resident
                # recon) and candidate-mode predictions all form ON
                # device; fetch after every group is in flight
                import jax
                from svt_av1_tpu.ops import device_inter as di
                rec_y = self.recon[0]
                if not isinstance(rec_y, jax.Array):
                    rec_y = jax.device_put(rec_y)
                    self.recon[0] = rec_y
                outs, _ = di.flip_decision_issue(
                    self.src[0], rec_y, xs, ys, ha, hl, htr, hbl,
                    cand_modes, (bw, bh), qp, lam, mxw, mxh,
                    bd=cfg.bit_depth,
                    rdoq=cfg.enable_rdoq, qv=qv, lamv=lams)
                pending.append((outs, b, ks, lamqs))
                continue
            self._materialize_recon()
            above1, left1 = intra_ops.prepare_edges_av1(
                self.recon[0], xs, ys, bw, bh, ha, hl, htr, hbl,
                bd=cfg.bit_depth, max_w=mxw, max_h=mxh)
            iy = np.asarray(ys)[:, None, None] \
                + np.arange(bh)[None, :, None]
            ix = np.asarray(xs)[:, None, None] \
                + np.arange(bw)[None, None, :]
            srcs = self.src[0][iy, ix].astype(np.int64)
            best_cost = np.full(b, np.iinfo(np.int64).max)
            best_mode = np.zeros(b, dtype=np.int64)
            for m in cand_modes:
                preds = intra_ops.predict_any(
                    m, 0, above1, left1, bw, bh, ha, hl,
                    bd=cfg.bit_depth).astype(np.int64)
                _, _, _, dist, rate = md._full_loop(
                    srcs, preds, np.zeros(b, dtype=np.int32), tx_y,
                    (bw, bh), qp, cfg.bit_depth,
                    rdoq_lam_q=(int(lamqs) if (cfg.enable_rdoq
                                               and qp.qindex > 0)
                                else None))
                cost_m = md.rdcost(dist, lamqs, rate + mode_bits)
                bt = cost_m < best_cost
                best_cost = np.where(bt, cost_m, best_cost)
                best_mode = np.where(bt, m, best_mode)
            self._flip_accept(cand, ks, best_cost, best_mode, flips)
        for outs, b, ks, lamqs in pending:
            import jax
            vals = jax.device_get(outs)
            best_cost = np.full(b, np.iinfo(np.int64).max)
            best_mode = np.zeros(b, dtype=np.int64)
            for mi, m in enumerate(cand_modes):
                dist = np.asarray(vals[2 * mi][:b], np.int64)
                rate = np.asarray(vals[2 * mi + 1][:b], np.int64)
                cost_m = md.rdcost(dist, lamqs, rate + mode_bits)
                bt = cost_m < best_cost
                best_cost = np.where(bt, cost_m, best_cost)
                best_mode = np.where(bt, m, best_mode)
            self._flip_accept(cand, ks, best_cost, best_mode, flips)
        return [f for f in flips if f is not None]

    def _flip_accept(self, cand, ks, best_cost, best_mode, flips):
        for j, k in enumerate(ks):
            li = cand[k][3]
            if best_cost[j] < self.inter_cost[li]:
                flips[k] = cand[k] + (int(best_mode[j]),)

    # --- sequential syntax pass (one call per tile) --------------------------
    def _syntax_pass(self, rect=None, fstate=None, frame_leaves=None,
                     frame_index=None) -> bytes:
        """Entropy-code one tile. Per spec 6.10.2/decode_tile, every
        tile starts from the frame's initial CDFs, fresh neighbor
        contexts, base_q_idx, and fresh LR predictors; block data is
        looked up through a tile-local leaf index into the frame-level
        decision arrays."""
        cfg = self.cfg
        if rect is None:                     # single-tile convenience
            rect = self.tile_rects_v[0]
            frame_leaves = self.leaf_sizes
            frame_index = self.leaf_index
        mi_r0, mi_c0, mi_rs, mi_cs, sb_rs, sb_cs = rect
        self.tile_mi_off = (mi_r0, mi_c0)
        self.mi_rows, self.mi_cols = mi_rs, mi_cs
        if len(self.tile_rects_v) == 1:
            self.leaf_sizes, self.leaf_index = frame_leaves, frame_index
        else:
            self.leaf_sizes = {}
            self.leaf_index = {}
            for (r, c), s in frame_leaves.items():
                if mi_r0 <= r < mi_r0 + mi_rs \
                        and mi_c0 <= c < mi_c0 + mi_cs:
                    self.leaf_sizes[(r - mi_r0, c - mi_c0)] = s
                    self.leaf_index[(r - mi_r0, c - mi_c0)] = \
                        frame_index[(r, c)]
        init = getattr(self, "init_entropy", None)
        if init is not None:
            self.fc = init[0].copy()
            self.nmv = init[1].copy()
        else:
            self.fc = FrameContext(cfg.base_q_idx)
            self.nmv = mv_syntax.NmvContext()
        self.w = make_symbol_writer(cfg.native_entropy,
                                    cfg.disable_cdf_update)
        self.ctxs = TileContexts(self.mi_cols, self.mi_rows)
        if fstate is None:
            fstate = self.frame_mvp_state
        self.mvp_state = fstate.tile_view(mi_r0, mi_c0, mi_rs, mi_cs)
        self._cdef_written = set()
        from svt_av1_tpu.entropy import lr as lr_syntax
        self.lr_ref = [lr_syntax.LrRefState() for _ in range(3)]
        self.cur_qindex = cfg.base_q_idx
        for sb_y in range(0, sb_rs * 16, 16):
            for sb_x in range(0, sb_cs * 16, 16):
                self._read_deltas = self.qmap is not None
                lr_syntax.write_sb_units(self.w, self.fc, self.lr_rinfos,
                                         self.lr_ref, sb_y + mi_r0,
                                         sb_x + mi_c0,
                                         cfg.width, cfg.height)
                self._emit_partition(sb_y, sb_x, 64)
        return self.w.done()

    def _write_delta_q(self, mi_row, mi_col, size, skip) -> None:
        """Per-SB delta qindex (spec 5.11.5; QPM write side)."""
        if self.qmap is None or not self._read_deltas:
            return
        self._read_deltas = False
        if size == 64 and skip:
            return
        from svt_av1_tpu.entropy import delta as delta_syntax
        target = int(self.qmap[(mi_row + self.tile_mi_off[0]) // 16,
                               (mi_col + self.tile_mi_off[1]) // 16])
        d = (target - self.cur_qindex) >> self.DELTA_Q_RES
        delta_syntax.write_delta_qindex(self.w, self.fc, d)
        self.cur_qindex = delta_syntax.apply_delta(self.cur_qindex, d,
                                                   self.DELTA_Q_RES)
        assert self.cur_qindex == target

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
        # per-leaf emission + context update over each leaf's own extent
        # (reference EbEntropyCoding.c:4762 writes per coded block)
        for r, c, wh in leaves:
            self._emit_block(r, c, wh[0] if wh[0] == wh[1] else wh)
            self.ctxs.update_partition_ctx(r, c, common.rect_bsize(*wh),
                                           common.rect_bsize(*wh))

    def _emit_block(self, mi_row, mi_col, size) -> None:
        cfg = self.cfg
        li = self.leaf_index[(mi_row, mi_col)]
        mv = (int(self.mvs[li, 0]), int(self.mvs[li, 1]))
        skip = int(self.eobs[:, li].sum() == 0)
        bw, bh = common.leaf_wh(size)
        bsize = common.rect_bsize(bw, bh)
        s4 = bw >> 2
        h4 = bh >> 2

        # inter_frame_mode_info order (spec 5.11.15): skip, is_inter, refs,
        # mode, drl, mv
        ref = int(self.block_ref[li])
        mode_syntax.write_skip(self.w, self.fc, self.ctxs, skip,
                               mi_row, mi_col)
        if self.cdef_idx_map is not None and not skip:
            sbr = (mi_row + self.tile_mi_off[0]) // 16
            sbc = (mi_col + self.tile_mi_off[1]) // 16
            if (sbr, sbc) not in self._cdef_written:
                self._cdef_written.add((sbr, sbc))
                self.w.write_literal(int(self.cdef_idx_map[sbr, sbc]), 2)
        self._write_delta_q(mi_row, mi_col,
                            size if bw == bh else 0, skip)
        if not self.block_is_inter[li]:
            self._emit_intra_block(mi_row, mi_col, size, li, skip)
            return
        inter_modes.write_is_inter(self.w, self.fc, self.mvp_state,
                                   mi_row, mi_col, 1)
        if self.block_comp[li]:
            self._emit_compound_tail(mi_row, mi_col, size, li, skip)
            return
        if self.reference_select:
            inter_modes.write_comp_inter(self.w, self.fc, self.mvp_state,
                                         mi_row, mi_col, 0)
        inter_modes.write_single_ref(self.w, self.fc, self.mvp_state,
                                     mi_row, mi_col, ref)
        gm_mv = self.gm_mv.get(ref, (0, 0))
        res = mvp.find_mv_stack(self.mvp_state, mi_row, mi_col, s4, ref,
                                gm_mv=gm_mv, h4=h4,
                                vert_a=self._leaf_vert_a(mi_row, mi_col,
                                                         s4, h4))
        if res.count >= 1 and mv == res.ref_list[0]:
            mode = NEARESTMV
        elif res.count >= 2 and mv == res.ref_list[1]:
            mode = NEARMV
        elif mv == gm_mv:
            mode = GLOBALMV
        else:
            mode = NEWMV
        inter_modes.write_inter_mode(self.w, self.fc, mode, res)
        inter_modes.write_drl_idx(self.w, self.fc, mode, 0, res)
        if mode == NEWMV:
            pred = res.stack[0][0] if res.count > 1 else res.ref_list[0]
            mv_syntax.write_mv(self.w, self.nmv, mv[0] - pred[0],
                               mv[1] - pred[1])
        f_coded = 0
        if cfg.enable_interp_filter_search:
            if inter_modes.needs_interp_filter(mode, bw, bh,
                                               gm_mv != (0, 0)):
                f_coded = int(self.interp_f[li])
                inter_modes.write_interp_filter(
                    self.w, self.fc, self.mvp_state, mi_row, mi_col,
                    ref, False, f_coded)
            # else the decoder assumes REGULAR — only reachable with a
            # zero gm MV, where phase-0 MC is filter-independent

        self.ctxs.set_mi(mi_row, mi_col, bsize, DC_PRED, skip)
        self.mvp_state.set_block(mi_row, mi_col, s4, ref, mv, mode,
                                 h4=h4)
        self.mvp_state.interp[mi_row:mi_row + h4,
                              mi_col:mi_col + s4] = f_coded

        cw, ch = bw >> 1, bh >> 1
        x, y = mi_col * 4, mi_row * 4
        tx_y = common.tx_size_for_rect(bw, bh, 0)
        tx_uv = common.tx_size_for_rect(cw, ch, 1)
        plane_info = [(0, x, y, tx_y, bsize),
                      (1, x >> 1, y >> 1, tx_uv,
                       common.rect_bsize(cw, ch)),
                      (2, x >> 1, y >> 1, tx_uv,
                       common.rect_bsize(cw, ch))]
        ltt = int(self.y_tx_type[li])
        ctt = common.chroma_tx_type_inter(
            ltt if self.eobs[0, li] > 0 else DCT_DCT, tx_uv, False)
        for p, px, py, ts, pb in plane_info:
            x4, y4 = px >> 2, py >> 2
            if skip:
                self.ctxs.update_txb_ctx(p, x4, y4, ts, 0)
                continue
            skip_ctx, sign_ctx = self.ctxs.txb_ctx(p, pb, ts, x4, y4)
            cul = coeff_syntax.write_coeffs_txb(
                self.w, self.fc, resolve_qc(self.qcoeff[p][li]), ts,
                ltt if p == 0 else ctt,
                plane_type=int(p > 0), txb_skip_ctx=skip_ctx,
                dc_sign_ctx=sign_ctx, is_inter=True,
                base_qindex=cfg.base_q_idx)
            self.ctxs.update_txb_ctx(p, x4, y4, ts, cul)

    def _emit_compound_tail(self, mi_row, mi_col, size, li, skip) -> None:
        """Compound (fwd, bwd) block syntax after skip/cdef/is_inter
        (spec 5.11.25 compound branch). Modes used: NEAREST_NEARESTMV /
        GLOBAL_GLOBALMV / NEW_NEWMV with DRL 0."""
        from svt_av1_tpu.pipeline.mvp import (GLOBAL_GLOBALMV,
                                              NEAR_NEARMV,
                                              NEAREST_NEARESTMV,
                                              NEAREST_NEWMV,
                                              NEW_NEARESTMV, NEW_NEWMV)
        cfg = self.cfg
        bw, bh = common.leaf_wh(size)
        bsize = common.rect_bsize(bw, bh)
        s4 = bw >> 2
        h4 = bh >> 2
        ref0 = int(self.comp_ref0[li])
        ref1 = int(self.comp_ref1[li])
        mv0 = (int(self.mvs[li, 0]), int(self.mvs[li, 1]))
        mv1 = (int(self.mvs1[li, 0]), int(self.mvs1[li, 1]))
        inter_modes.write_comp_inter(self.w, self.fc, self.mvp_state,
                                     mi_row, mi_col, 1)
        inter_modes.write_comp_refs(self.w, self.fc, self.mvp_state,
                                    mi_row, mi_col, ref0, ref1)
        gm_pair = (self.gm_mv.get(ref0, (0, 0)),
                   self.gm_mv.get(ref1, (0, 0)))
        res = mvp.find_mv_stack_comp(self.mvp_state, mi_row, mi_col, s4,
                                     ref0, ref1,
                                     gm=gm_pair, h4=h4,
                                     vert_a=self._leaf_vert_a(
                                         mi_row, mi_col, s4, h4))
        pair = (mv0, mv1)
        if res.count >= 1 and pair == res.ref_list[0]:
            mode = NEAREST_NEARESTMV
        elif res.count >= 2 and pair == res.ref_list[1]:
            mode = NEAR_NEARMV
        elif pair == gm_pair:
            mode = GLOBAL_GLOBALMV
        elif res.count >= 1 and mv0 == res.ref_list[0][0]:
            mode = NEAREST_NEWMV      # only the backward component is new
        elif res.count >= 1 and mv1 == res.ref_list[0][1]:
            mode = NEW_NEARESTMV
        else:
            mode = NEW_NEWMV
        inter_modes.write_inter_compound_mode(self.w, self.fc, mode, res)
        inter_modes.write_drl_idx(self.w, self.fc, mode, 0, res)
        pred = res.stack[0][0] if res.count > 1 else res.ref_list[0]
        if mode in (NEW_NEWMV, NEW_NEARESTMV):
            mv_syntax.write_mv(self.w, self.nmv, mv0[0] - pred[0][0],
                               mv0[1] - pred[0][1])
        if mode in (NEW_NEWMV, NEAREST_NEWMV):
            mv_syntax.write_mv(self.w, self.nmv, mv1[0] - pred[1][0],
                               mv1[1] - pred[1][1])
        f_coded = 0
        if cfg.enable_interp_filter_search:
            if inter_modes.needs_interp_filter(
                    mode, bw, bh, gm_pair[0] != (0, 0),
                    gm_pair[1] != (0, 0)):
                f_coded = int(self.interp_f[li])
                inter_modes.write_interp_filter(
                    self.w, self.fc, self.mvp_state, mi_row, mi_col,
                    ref0, True, f_coded)
        self.ctxs.set_mi(mi_row, mi_col, bsize, DC_PRED, skip)
        self.mvp_state.set_block(mi_row, mi_col, s4, ref0, mv0,
                                 mode, ref1=ref1, mv1=mv1, h4=h4)
        self.mvp_state.interp[mi_row:mi_row + h4,
                              mi_col:mi_col + s4] = f_coded
        cw, ch = bw >> 1, bh >> 1
        x, y = mi_col * 4, mi_row * 4
        tx_y = common.tx_size_for_rect(bw, bh, 0)
        tx_uv = common.tx_size_for_rect(cw, ch, 1)
        plane_info = [(0, x, y, tx_y, bsize),
                      (1, x >> 1, y >> 1, tx_uv,
                       common.rect_bsize(cw, ch)),
                      (2, x >> 1, y >> 1, tx_uv,
                       common.rect_bsize(cw, ch))]
        ltt = int(self.y_tx_type[li])
        ctt = common.chroma_tx_type_inter(
            ltt if self.eobs[0, li] > 0 else DCT_DCT, tx_uv, False)
        for p, px, py, ts, pb in plane_info:
            x4, y4 = px >> 2, py >> 2
            if skip:
                self.ctxs.update_txb_ctx(p, x4, y4, ts, 0)
                continue
            skip_ctx, sign_ctx = self.ctxs.txb_ctx(p, pb, ts, x4, y4)
            cul = coeff_syntax.write_coeffs_txb(
                self.w, self.fc, resolve_qc(self.qcoeff[p][li]), ts,
                ltt if p == 0 else ctt,
                plane_type=int(p > 0), txb_skip_ctx=skip_ctx,
                dc_sign_ctx=sign_ctx, is_inter=True,
                base_qindex=cfg.base_q_idx)
            self.ctxs.update_txb_ctx(p, x4, y4, ts, cul)

    def _emit_intra_block(self, mi_row, mi_col, size, li, skip) -> None:
        """Intra block syntax inside an inter frame (spec 5.11.19):
        is_inter=0, y mode via the size-group y_mode CDF, chroma mode,
        then intra-style coefficient coding."""
        from svt_av1_tpu.ops import intra_dir
        cfg = self.cfg
        m = int(self.intra_mode[li])
        bw, bh = common.leaf_wh(size)
        bsize = common.rect_bsize(bw, bh)
        inter_modes.write_is_inter(self.w, self.fc, self.mvp_state,
                                   mi_row, mi_col, 0)
        mode_syntax.write_intra_luma_mode_if(self.w, self.fc,
                                             max(bw, bh), m)
        if intra_dir.is_directional(m):
            mode_syntax.write_angle_delta(self.w, self.fc, m, 0)
        cfl_allowed = bw <= 32 and bh <= 32
        uv_mode = 13 if self.intra_uv_cfl[li] else m
        mode_syntax.write_intra_chroma_mode(self.w, self.fc, uv_mode, m,
                                            cfl_allowed)
        if uv_mode == 13:
            from svt_av1_tpu.ops import cfl as cfl_ops
            cfl_ops.write_cfl_alphas(self.w, self.fc,
                                     int(self.intra_alpha_u[li]),
                                     int(self.intra_alpha_v[li]))
        elif intra_dir.is_directional(uv_mode):
            mode_syntax.write_angle_delta(self.w, self.fc, uv_mode, 0)
        self.ctxs.set_mi(mi_row, mi_col, bsize, m, skip)
        self.mvp_state.set_block(mi_row, mi_col, bw >> 2,
                                 mvp.INTRA_FRAME, (0, 0), 0, h4=bh >> 2)
        cw, ch = bw >> 1, bh >> 1
        x, y = mi_col * 4, mi_row * 4
        tx_y = common.tx_size_for_rect(bw, bh, 0)
        tx_uv = common.tx_size_for_rect(cw, ch, 1)
        tt_u = common.chroma_tx_type(uv_mode, tx_uv, False)
        plane_info = [(0, x, y, tx_y, DCT_DCT, bsize),
                      (1, x >> 1, y >> 1, tx_uv, tt_u,
                       common.rect_bsize(cw, ch)),
                      (2, x >> 1, y >> 1, tx_uv, tt_u,
                       common.rect_bsize(cw, ch))]
        for p, px, py, ts, tt, pb in plane_info:
            x4, y4 = px >> 2, py >> 2
            if skip:
                self.ctxs.update_txb_ctx(p, x4, y4, ts, 0)
                continue
            skip_ctx, sign_ctx = self.ctxs.txb_ctx(p, pb, ts, x4, y4)
            cul = coeff_syntax.write_coeffs_txb(
                self.w, self.fc, resolve_qc(self.qcoeff[p][li]), ts, tt,
                plane_type=int(p > 0), txb_skip_ctx=skip_ctx,
                dc_sign_ctx=sign_ctx, intra_dir=m if p == 0 else uv_mode,
                base_qindex=cfg.base_q_idx)
            self.ctxs.update_txb_ctx(p, x4, y4, ts, cul)
