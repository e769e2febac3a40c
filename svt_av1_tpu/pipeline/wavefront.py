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
from svt_av1_tpu.ops import quant as quant_ops
from svt_av1_tpu.ops import transforms as tx_ops
from svt_av1_tpu.pipeline import common
from svt_av1_tpu.pipeline.intra import make_symbol_writer
from svt_av1_tpu.utils.blocks import (DC_PRED, DCT_DCT, MODE_TO_TXFM,
                                      PARTITION_NONE, PARTITION_SPLIT,
                                      get_scan)


class WavefrontIntraEncoder:
    """Batched-wave keyframe encoder (fixed square partition)."""

    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        self.seq = obu.SequenceHeader(width=cfg.width, height=cfg.height,
                                      bit_depth=cfg.bit_depth)
        self.mi_cols = self.seq.mi_cols
        self.mi_rows = self.seq.mi_rows
        self.qp = quant_ops.make_quant_params(cfg.base_q_idx,
                                              bit_depth=cfg.bit_depth)

    # --- batched wave compute (host numpy backend) ----------------------------
    def _wave_compute(self, plane: int, xs, ys, size: int, modes: tuple,
                      forced_modes=None):
        """All blocks of one wave: mode decision + T/Q/IQ/recon.
        ``forced_modes``: [B] mode values to use instead of deciding (the V
        plane reuses the uv mode chosen on U — one shared chroma mode).
        Returns (best_modes [B] as mode values, qcoeff [B,ch,cw], eob [B])."""
        cfg = self.cfg
        recon = self.recon[plane]
        src = self.src[plane]
        max_w, max_h = self.max_wh[plane]
        b = len(xs)
        above, left, tl = intra_ops.prepare_edges(
            recon, xs, ys, size, size, bd=cfg.bit_depth,
            max_w=max_w, max_h=max_h)
        ha, hl = ys > 0, xs > 0
        srcs = np.stack([src[y:y + size, x:x + size]
                         for x, y in zip(xs, ys)]).astype(np.int32)
        if forced_modes is None:
            preds = np.stack([
                intra_ops.predict(m, above, left, tl, size, size,
                                  have_above=ha, have_left=hl,
                                  bd=cfg.bit_depth)
                for m in modes])                              # [M,B,s,s]
            costs = np.sum((srcs[None] - preds).astype(np.int64) ** 2,
                           axis=(2, 3))                       # [M,B]
            best = np.asarray(modes)[np.argmin(costs, axis=0)]
            bsel = preds[np.argmin(costs, axis=0), np.arange(b)]
        else:
            best = np.asarray(forced_modes)
            bsel = np.empty((b, size, size), dtype=np.int32)
            for m in np.unique(best):
                sel = best == m
                bsel[sel] = intra_ops.predict(
                    int(m), above[sel], left[sel], tl[sel], size, size,
                    have_above=ha[sel], have_left=hl[sel], bd=cfg.bit_depth)

        tx_size = common.tx_size_for_block(size, plane)
        cw, ch_ = common.coded_dims(tx_size)
        log_scale = quant_ops.tx_scale(tx_size)
        qcoeff = np.zeros((b, ch_, cw), dtype=np.int32)
        eob = np.zeros(b, dtype=np.int32)
        recon_blocks = np.empty((b, size, size), dtype=recon.dtype)

        # group by derived tx type (chroma derives from mode; luma is DCT)
        if plane == 0:
            tts = np.zeros(b, dtype=np.int32)
        else:
            tts = np.array([common.chroma_tx_type(int(m), tx_size, False)
                            for m in best])
        resid = srcs - bsel
        for tt in np.unique(tts):
            sel = np.nonzero(tts == tt)[0]
            coeffs = tx_ops.forward_tx2d(resid[sel], int(tt), size, size)
            coded = coeffs[:, :ch_, :cw].reshape(len(sel), -1)
            scan = get_scan(tx_size, int(tt))
            qc, dq, eo = quant_ops.quantize(coded, scan, self.qp, log_scale)
            qcoeff[sel] = qc.reshape(-1, ch_, cw)
            eob[sel] = eo
            full = np.zeros((len(sel), size, size), dtype=np.int64)
            full[:, :ch_, :cw] = dq.reshape(-1, ch_, cw)
            r = tx_ops.inverse_tx2d(full, int(tt), size, size,
                                    bd=cfg.bit_depth)
            recon_blocks[sel] = tx_ops.recon_add(bsel[sel], r,
                                                 bd=cfg.bit_depth)
        for i, (x, y) in enumerate(zip(xs, ys)):
            recon[y:y + size, x:x + size] = recon_blocks[i]
        return best, qcoeff, eob

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

        for sb_y in range(0, self.seq.sb_rows * 16, 16):
            for sb_x in range(0, self.seq.sb_cols * 16, 16):
                rec(sb_y, sb_x, 64)
        return sizes

    def _leaves(self):
        """Leaf blocks (mi_row, mi_col, size) in coding order from
        ``self.leaf_sizes``."""
        out = []

        def rec(mi_row, mi_col, psize):
            if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
                return
            if self.leaf_sizes.get((mi_row, mi_col)) == psize:
                out.append((mi_row, mi_col, psize))
                return
            hbs = psize >> 3
            half = psize >> 1
            rec(mi_row, mi_col, half)
            rec(mi_row, mi_col + hbs, half)
            rec(mi_row + hbs, mi_col, half)
            rec(mi_row + hbs, mi_col + hbs, half)

        for sb_y in range(0, self.seq.sb_rows * 16, 16):
            for sb_x in range(0, self.seq.sb_cols * 16, 16):
                rec(sb_y, sb_x, 64)
        return out

    @staticmethod
    def _dependency_waves(leaves, mi_cols, mi_rows):
        """Topological wave index per leaf: a leaf waits for every leaf its
        above row / left column touches (longest-path layering). Handles
        mixed block sizes (edge splits today, partition RD later)."""
        idx_map = np.full((mi_rows, mi_cols), -1, dtype=np.int64)
        for i, (r, c, s) in enumerate(leaves):
            m = s >> 2
            idx_map[r:r + m, c:c + m] = i
        wave = np.zeros(len(leaves), dtype=np.int64)
        for i, (r, c, s) in enumerate(leaves):
            m = s >> 2
            w = 0
            if r > 0:
                deps = idx_map[r - 1, c:min(c + m, mi_cols)]
                if len(deps):
                    w = max(w, int(wave[deps].max()) + 1)
            if c > 0:
                deps = idx_map[r:min(r + m, mi_rows), c - 1]
                if len(deps):
                    w = max(w, int(wave[deps].max()) + 1)
            wave[i] = w
        return wave

    # --- main ------------------------------------------------------------------
    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        cfg = self.cfg
        self.src = [common.pad_to_multiple(y, 64).astype(np.int32),
                    common.pad_to_multiple(u, 32).astype(np.int32),
                    common.pad_to_multiple(v, 32).astype(np.int32)]
        self.recon = [np.zeros(p.shape, dtype=np.uint8) for p in self.src]
        self.max_wh = [(self.mi_cols * 4, self.mi_rows * 4),
                       (self.mi_cols * 2, self.mi_rows * 2),
                       (self.mi_cols * 2, self.mi_rows * 2)]

        modes = cfg.intra_modes
        if cfg.fixed_partition_size is not None:
            self.leaf_sizes = self._fixed_leaf_sizes(cfg.fixed_partition_size)
        else:
            from svt_av1_tpu.pipeline import rd
            self.leaf_sizes = rd.choose_partition(y, cfg, self.mi_cols,
                                                  self.mi_rows)
        leaves = self._leaves()
        waves = self._dependency_waves(leaves, self.mi_cols, self.mi_rows)
        n = len(leaves)
        self.leaf_index = {(r, c): i for i, (r, c, s) in enumerate(leaves)}
        self.y_mode = np.zeros(n, dtype=np.int32)
        self.uv_mode = np.zeros(n, dtype=np.int32)
        self.qcoeff = [[None] * n, [None] * n, [None] * n]
        self.eobs = np.zeros((3, n), dtype=np.int32)

        larr = np.array([(r, c, s) for r, c, s in leaves], dtype=np.int64)
        for wv in range(int(waves.max()) + 1 if n else 0):
            in_wave = np.nonzero(waves == wv)[0]
            for size in np.unique(larr[in_wave, 2]):
                ids = in_wave[larr[in_wave, 2] == size]
                size = int(size)
                xs = larr[ids, 1] * 4
                ys = larr[ids, 0] * 4
                csize = size >> 1
                best, qc, eo = self._wave_compute(0, xs, ys, size, modes)
                self.y_mode[ids] = best
                self.eobs[0, ids] = eo
                bestc, qcc, eoc = self._wave_compute(1, xs >> 1, ys >> 1,
                                                     csize, modes)
                self.uv_mode[ids] = bestc
                self.eobs[1, ids] = eoc
                _, qcv, eov = self._wave_compute(2, xs >> 1, ys >> 1, csize,
                                                 modes, forced_modes=bestc)
                self.eobs[2, ids] = eov
                for k, i in enumerate(ids):
                    self.qcoeff[0][i] = qc[k]
                    self.qcoeff[1][i] = qcc[k]
                    self.qcoeff[2][i] = qcv[k]

        tile = self._syntax_pass()
        fh = obu.FrameHeader(base_q_idx=cfg.base_q_idx,
                             disable_cdf_update=cfg.disable_cdf_update)
        tu = (obu.temporal_delimiter_obu()
              + obu.write_sequence_header_obu(self.seq)
              + obu.write_frame_obu(self.seq, fh, [tile]))
        recon = [self.recon[0][:cfg.height, :cfg.width],
                 self.recon[1][:(cfg.height + 1) // 2, :(cfg.width + 1) // 2],
                 self.recon[2][:(cfg.height + 1) // 2, :(cfg.width + 1) // 2]]
        return tu, recon, {"tile_bytes": len(tile), "tu_bytes": len(tu)}

    # --- sequential syntax pass ---------------------------------------------------
    def _syntax_pass(self) -> bytes:
        cfg = self.cfg
        self.fc = FrameContext(cfg.base_q_idx)
        self.w = make_symbol_writer(cfg.native_entropy,
                                    cfg.disable_cdf_update)
        self.ctxs = TileContexts(self.mi_cols, self.mi_rows)
        for sb_y in range(0, self.seq.sb_rows * 16, 16):
            for sb_x in range(0, self.seq.sb_cols * 16, 16):
                self._emit_partition(sb_y, sb_x, 64)
        return self.w.done()

    def _emit_partition(self, mi_row, mi_col, psize) -> None:
        if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
            return
        bsize = common.square_bsize(psize)
        hbs = psize >> 3
        if self.leaf_sizes.get((mi_row, mi_col)) == psize:
            partition = PARTITION_NONE
        else:
            partition = PARTITION_SPLIT
        mode_syntax.write_partition(self.w, self.fc, self.ctxs, partition,
                                    bsize, mi_row, mi_col,
                                    self.mi_cols, self.mi_rows)
        if partition == PARTITION_SPLIT:
            half = psize >> 1
            self._emit_partition(mi_row, mi_col, half)
            self._emit_partition(mi_row, mi_col + hbs, half)
            self._emit_partition(mi_row + hbs, mi_col, half)
            self._emit_partition(mi_row + hbs, mi_col + hbs, half)
        else:
            self._emit_block(mi_row, mi_col, psize)
            self.ctxs.update_partition_ctx(mi_row, mi_col, bsize, bsize)

    def _emit_block(self, mi_row, mi_col, size) -> None:
        cfg = self.cfg
        x, y = mi_col * 4, mi_row * 4
        li = self.leaf_index[(mi_row, mi_col)]
        bsize = common.square_bsize(size)
        csize = size >> 1
        y_mode = int(self.y_mode[li])
        uv_mode = int(self.uv_mode[li])
        tx_y = common.tx_size_for_block(size, 0)
        tx_uv = common.tx_size_for_block(csize, 1)
        tt_u = common.chroma_tx_type(uv_mode, tx_uv, False)
        skip = int(self.eobs[:, li].sum() == 0)

        mode_syntax.write_skip(self.w, self.fc, self.ctxs, skip,
                               mi_row, mi_col)
        mode_syntax.write_intra_luma_mode_kf(self.w, self.fc, self.ctxs,
                                             y_mode, mi_row, mi_col)
        mode_syntax.write_intra_chroma_mode(self.w, self.fc, uv_mode,
                                            y_mode, size <= 32)
        self.ctxs.set_mi(mi_row, mi_col, bsize, y_mode, skip)

        plane_info = [(0, x, y, tx_y, DCT_DCT, y_mode, bsize),
                      (1, x >> 1, y >> 1, tx_uv, tt_u, uv_mode,
                       common.square_bsize(csize)),
                      (2, x >> 1, y >> 1, tx_uv, tt_u, uv_mode,
                       common.square_bsize(csize))]
        for p, px, py, ts, tt, m, pb in plane_info:
            x4, y4 = px >> 2, py >> 2
            if skip:
                self.ctxs.update_txb_ctx(p, x4, y4, ts, 0)
                continue
            skip_ctx, sign_ctx = self.ctxs.txb_ctx(p, pb, ts, x4, y4)
            cul = coeff_syntax.write_coeffs_txb(
                self.w, self.fc, self.qcoeff[p][li], ts, tt,
                plane_type=int(p > 0), txb_skip_ctx=skip_ctx,
                dc_sign_ctx=sign_ctx, intra_dir=m,
                base_qindex=cfg.base_q_idx)
            self.ctxs.update_txb_ctx(p, x4, y4, ts, cul)


def encode_keyframe_wavefront(y, u, v, cfg: EncoderConfig):
    return WavefrontIntraEncoder(cfg).encode(y, u, v)
