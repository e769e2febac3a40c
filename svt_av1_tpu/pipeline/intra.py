"""All-intra keyframe encoder: the first end-to-end slice (SURVEY.md §7.3).

Re-expresses the reference's EncDec + EntropyCoding + Packetization stages
(``EbCodingLoop.c:2726`` AV1EncodePass, ``EbEntropyCoding.c:4896``
write_modes_b, ``EbPacketizationProcess.c:51``) for intra frames as a single
sequential coding walk: per superblock in raster order, per block in z-order —
predict from reconstruction, transform/quantize, emit syntax, reconstruct.

This host-Python version is the correctness oracle; the batched device path
(wavefront diagonals scored on TPU) replaces the per-block math behind the
same syntax layer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from svt_av1_tpu.bitstream import obu
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy import coeff as coeff_syntax
from svt_av1_tpu.entropy import modes as mode_syntax
from svt_av1_tpu.entropy.cdf import FrameContext
from svt_av1_tpu.entropy.ctx import TileContexts
from svt_av1_tpu.entropy.writer import SymbolWriter


def make_symbol_writer(native_entropy: bool, disable_cdf_update: bool):
    if native_entropy:
        from svt_av1_tpu import native as native_mod
        if native_mod.available():
            from svt_av1_tpu.entropy.cwriter import NativeSymbolWriter
            return NativeSymbolWriter(disable_cdf_update=disable_cdf_update)
    return SymbolWriter(disable_cdf_update=disable_cdf_update)
from svt_av1_tpu.ops import intra as intra_ops
from svt_av1_tpu.ops import intra_dir
from svt_av1_tpu.ops import quant as quant_ops
from svt_av1_tpu.ops import transforms as tx_ops
from svt_av1_tpu.pipeline import avail, common
from svt_av1_tpu.utils.blocks import (DC_PRED, DCT_DCT, PARTITION_NONE,
                                      PARTITION_SPLIT, get_scan)


@dataclasses.dataclass
class BlockCode:
    """Everything needed to emit + reconstruct one coded block."""
    y_mode: int = DC_PRED
    uv_mode: int = DC_PRED
    skip: int = 0


class IntraFrameEncoder:
    """Encodes one shown keyframe as a single tile."""

    def __init__(self, cfg: EncoderConfig):
        assert not cfg.enable_cdef and not cfg.enable_restoration \
            and not cfg.adaptive_quantization \
            and (cfg.fixed_partition_size is not None
                 or not cfg.enable_rect_partitions), \
            "oracle encoder covers the square pre-filter flat-QP " \
            "pipeline; use the wavefront encoder for CDEF/LR/AQ/rect"
        self.cfg = cfg
        self.seq = obu.SequenceHeader(width=cfg.width, height=cfg.height,
                                      bit_depth=cfg.bit_depth,
                                      enable_cdef=cfg.enable_cdef,
                                      enable_intra_edge_filter=(
                                          cfg.enable_intra_edge_filter),
                                      film_grain_params_present=(
                                          cfg.film_grain_strength > 0),
                                      **obu.order_hint_fields(
                                          cfg.enable_tmvp))
        self.order_hint = 0           # set by the driver (display index)
        self.mi_cols = self.seq.mi_cols
        self.mi_rows = self.seq.mi_rows
        self.qp = quant_ops.make_quant_params(cfg.base_q_idx,
                                              bit_depth=cfg.bit_depth)
        from svt_av1_tpu.pipeline import rd
        self.lam = rd.rd_lambda(cfg.base_q_idx, cfg.bit_depth)

    # --- public -----------------------------------------------------------------
    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """Returns (temporal_unit_bytes, recon_planes (cropped), stats)."""
        cfg = self.cfg
        src = [common.pad_to_multiple(y, 64),
               common.pad_to_multiple(u, 32),
               common.pad_to_multiple(v, 32)]
        self.src = [p.astype(np.int32) for p in src]
        self.recon = [np.zeros_like(p, dtype=common.pixel_dtype(cfg.bit_depth))
                      for p in src]
        self.fc = FrameContext(cfg.base_q_idx)
        self.w = make_symbol_writer(cfg.native_entropy,
                                    cfg.disable_cdf_update)
        self.ctxs = TileContexts(self.mi_cols, self.mi_rows)
        # spec maxX/maxY clamp: readable sample area per plane
        self.max_wh = [(self.mi_cols * 4, self.mi_rows * 4),
                       (self.mi_cols * 2, self.mi_rows * 2),
                       (self.mi_cols * 2, self.mi_rows * 2)]
        # filt_type smoothness maps (intra edge filter; coding order
        # guarantees neighbors are decided before their dependents)
        self._sm_y = np.zeros((self.mi_rows, self.mi_cols), dtype=bool)
        self._sm_uv = np.zeros(((self.mi_rows + 1) >> 1,
                                (self.mi_cols + 1) >> 1), dtype=bool)

        self.leaf_sizes = {}
        for sb_y in range(0, self.seq.sb_rows * 16, 16):
            for sb_x in range(0, self.seq.sb_cols * 16, 16):
                self._code_partition(sb_y, sb_x, 64)

        tile = self.w.done()
        lf_levels = (0, 0, 0, 0)
        if cfg.enable_dlf:
            from svt_av1_tpu.ops import dlf
            lf_levels = dlf.pick_levels(self.recon, self.src,
                                        self.leaf_sizes, self.mi_rows,
                                        self.mi_cols, cfg.base_q_idx,
                                        cfg.bit_depth)
            dlf.loop_filter_frame(self.recon, self.leaf_sizes, self.mi_rows,
                                  self.mi_cols, lf_levels,
                                  bd=cfg.bit_depth)
        fg = None
        if cfg.film_grain_strength > 0:
            from svt_av1_tpu.ops import grain as grain_ops
            fg = grain_ops.default_params(cfg.film_grain_strength,
                                          cfg.film_grain_seed)
        fh = obu.FrameHeader(order_hint=self.order_hint,
                             base_q_idx=cfg.base_q_idx,
                             disable_cdf_update=cfg.disable_cdf_update,
                             disable_frame_end_update_cdf=(
                                 cfg.disable_cdf_update
                                 or cfg.error_resilient),
                             loop_filter_levels=lf_levels,
                             reduced_tx_set=False, film_grain=fg)
        tu = (obu.temporal_delimiter_obu()
              + obu.write_sequence_header_obu(self.seq)
              + obu.write_frame_obu(self.seq, fh, [tile]))
        recon = [self.recon[0][:cfg.height, :cfg.width],
                 self.recon[1][:(cfg.height + 1) // 2, :(cfg.width + 1) // 2],
                 self.recon[2][:(cfg.height + 1) // 2, :(cfg.width + 1) // 2]]
        if fg is not None:
            from svt_av1_tpu.ops import grain as grain_ops
            recon = grain_ops.apply_grain(recon, fg, cfg.bit_depth)
        stats = {"tile_bytes": len(tile), "tu_bytes": len(tu)}
        return tu, recon, stats

    # --- partition walk -----------------------------------------------------------
    def _code_partition(self, mi_row: int, mi_col: int, size: int) -> None:
        if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
            return
        bsize = common.square_bsize(size)
        hbs = size >> 3  # half block in mi units
        has_rows = (mi_row + hbs) < self.mi_rows
        has_cols = (mi_col + hbs) < self.mi_cols
        target = self.cfg.fixed_partition_size or 16
        crosses = not (has_rows and has_cols)
        if size > target or (crosses and size > 8):
            partition = PARTITION_SPLIT
        else:
            partition = PARTITION_NONE
        mode_syntax.write_partition(self.w, self.fc, self.ctxs, partition,
                                    bsize, mi_row, mi_col,
                                    self.mi_cols, self.mi_rows)
        if partition == PARTITION_SPLIT:
            half = size >> 1
            self._code_partition(mi_row, mi_col, half)
            self._code_partition(mi_row, mi_col + hbs, half)
            self._code_partition(mi_row + hbs, mi_col, half)
            self._code_partition(mi_row + hbs, mi_col + hbs, half)
        else:
            self._code_block(mi_row, mi_col, size)
            self.ctxs.update_partition_ctx(mi_row, mi_col, bsize, bsize)
            self.leaf_sizes[(mi_row, mi_col)] = size

    # --- block coding ---------------------------------------------------------------
    def _decide_plane(self, plane: int, x: int, y: int, size: int,
                      htr: bool, hbl: bool, forced=None, cfl_luma=None,
                      ftype=0):
        """Mode decision + coding for one plane of one block via the shared
        kernel (pipeline.md) so all backends decide identically."""
        from svt_av1_tpu.pipeline import md
        recon = self.recon[plane]
        max_w, max_h = self.max_wh[plane]
        ha = np.array([y > 0])
        hl = np.array([x > 0])
        above1, left1 = intra_ops.prepare_edges_av1(
            recon, np.array([x]), np.array([y]), size, size, ha, hl,
            np.array([htr]), np.array([hbl]), bd=self.cfg.bit_depth,
            max_w=max_w, max_h=max_h)
        srcs = self.src[plane][y:y + size, x:x + size][None]
        edge = None
        if self.cfg.enable_intra_edge_filter:
            edge = (np.array([ftype], dtype=np.int32),
                    np.array([np.clip(max_w - x, 0, size)]),
                    np.array([np.clip(max_h - y, 0, size)]))
        return md.decide_block_batch(
            plane, srcs, above1, left1, ha, hl,
            common.intra_candidates(self.cfg), self.qp, size, self.lam,
            bd=self.cfg.bit_depth, nfl=self.cfg.nfl, forced=forced,
            cfl_luma=cfl_luma,
            tx_search=(plane == 0 and self.cfg.enable_tx_type_search
                       and self.cfg.base_q_idx > 0),
            rdoq=self.cfg.enable_rdoq, edge=edge)

    def _code_block(self, mi_row: int, mi_col: int, size: int) -> None:
        x, y = mi_col * 4, mi_row * 4
        bsize = common.square_bsize(size)
        htr = avail.has_top_right(mi_row, mi_col, size >> 2, self.mi_cols)
        hbl = avail.has_bottom_left(mi_row, mi_col, size >> 2, self.mi_rows)
        csize = size >> 1
        cx, cy = x >> 1, y >> 1

        r2, c2 = mi_row >> 1, mi_col >> 1
        fy = int((mi_row > 0 and self._sm_y[mi_row - 1, mi_col])
                 or (mi_col > 0 and self._sm_y[mi_row, mi_col - 1]))
        fuv = int((r2 > 0 and self._sm_uv[r2 - 1, c2])
                  or (c2 > 0 and self._sm_uv[r2, c2 - 1]))
        ym, yd, qy, ey, ry, _, _, ytt = self._decide_plane(0, x, y, size,
                                                           htr, hbl,
                                                           ftype=fy)
        # luma recon must land before the chroma decisions (CfL reads it)
        self.recon[0][y:y + size, x:x + size] = ry[0]
        cfl_luma = None
        if size <= 32:
            cfl_luma = self.recon[0][y:y + size, x:x + size][None]
        um, ud, qu, eu, ru, _, au, _ = self._decide_plane(
            1, cx, cy, csize, htr, hbl, cfl_luma=cfl_luma, ftype=fuv)
        _, _, qv, ev, rv, _, av, _ = self._decide_plane(
            2, cx, cy, csize, htr, hbl, forced=(um, ud),
            cfl_luma=cfl_luma, ftype=fuv)
        y_mode, y_delta = int(ym[0]), int(yd[0])
        uv_mode, uv_delta = int(um[0]), int(ud[0])
        if intra_dir.is_smooth_mode(y_mode):
            self._sm_y[mi_row:mi_row + (size >> 2),
                       mi_col:mi_col + (size >> 2)] = True
        if intra_dir.is_smooth_mode(uv_mode):
            self._sm_uv[r2:r2 + max(1, size >> 3),
                        c2:c2 + max(1, size >> 3)] = True
        alpha_u, alpha_v = int(au[0]), int(av[0])
        if uv_mode == 13 and alpha_u == 0 and alpha_v == 0:
            uv_mode = 0  # alpha-(0,0) CfL == DC prediction; code as DC
        skip = int(ey[0] == 0 and eu[0] == 0 and ev[0] == 0)

        tx_y = common.tx_size_for_block(size, 0)
        tx_uv = common.tx_size_for_block(csize, 1)
        tt_u = common.chroma_tx_type(uv_mode, tx_uv, False)

        # mode info (intra_frame_mode_info order, spec 5.11.10)
        mode_syntax.write_skip(self.w, self.fc, self.ctxs, skip,
                               mi_row, mi_col)
        mode_syntax.write_intra_luma_mode_kf(self.w, self.fc, self.ctxs,
                                             y_mode, mi_row, mi_col)
        if intra_dir.is_directional(y_mode):
            mode_syntax.write_angle_delta(self.w, self.fc, y_mode, y_delta)
        mode_syntax.write_intra_chroma_mode(self.w, self.fc, uv_mode,
                                            y_mode, size <= 32)
        if uv_mode == 13:
            from svt_av1_tpu.ops import cfl as cfl_ops
            cfl_ops.write_cfl_alphas(self.w, self.fc, alpha_u, alpha_v)
        if intra_dir.is_directional(uv_mode):
            mode_syntax.write_angle_delta(self.w, self.fc, uv_mode,
                                          uv_delta)
        self.ctxs.set_mi(mi_row, mi_col, bsize, y_mode, skip)

        plane_info = [(0, x, y, size, tx_y, int(ytt[0]), y_mode, qy[0],
                       ry[0], bsize),
                      (1, cx, cy, csize, tx_uv, tt_u, uv_mode, qu[0], ru[0],
                       common.square_bsize(csize)),
                      (2, cx, cy, csize, tx_uv, tt_u, uv_mode, qv[0], rv[0],
                       common.square_bsize(csize))]
        for p, px, py, ps, ts, tt, m, qc, rec, pb in plane_info:
            x4, y4 = px >> 2, py >> 2
            self.recon[p][py:py + ps, px:px + ps] = rec
            if skip:
                self.ctxs.update_txb_ctx(p, x4, y4, ts, 0)
                continue
            skip_ctx, sign_ctx = self.ctxs.txb_ctx(p, pb, ts, x4, y4)
            cul = coeff_syntax.write_coeffs_txb(
                self.w, self.fc, qc, ts, tt, plane_type=int(p > 0),
                txb_skip_ctx=skip_ctx, dc_sign_ctx=sign_ctx, intra_dir=m,
                base_qindex=self.cfg.base_q_idx)
            self.ctxs.update_txb_ctx(p, x4, y4, ts, cul)

def encode_keyframe(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                    cfg: EncoderConfig):
    return IntraFrameEncoder(cfg).encode(y, u, v)
