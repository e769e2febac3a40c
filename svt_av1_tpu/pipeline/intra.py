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
from svt_av1_tpu.ops import quant as quant_ops
from svt_av1_tpu.ops import transforms as tx_ops
from svt_av1_tpu.pipeline import common
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
        self.cfg = cfg
        self.seq = obu.SequenceHeader(width=cfg.width, height=cfg.height,
                                      bit_depth=cfg.bit_depth)
        self.mi_cols = self.seq.mi_cols
        self.mi_rows = self.seq.mi_rows
        self.qp = quant_ops.make_quant_params(cfg.base_q_idx,
                                              bit_depth=cfg.bit_depth)

    # --- public -----------------------------------------------------------------
    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """Returns (temporal_unit_bytes, recon_planes (cropped), stats)."""
        cfg = self.cfg
        src = [common.pad_to_multiple(y, 64),
               common.pad_to_multiple(u, 32),
               common.pad_to_multiple(v, 32)]
        self.src = [p.astype(np.int32) for p in src]
        self.recon = [np.zeros_like(p, dtype=np.uint8) for p in src]
        self.fc = FrameContext(cfg.base_q_idx)
        self.w = make_symbol_writer(cfg.native_entropy,
                                    cfg.disable_cdf_update)
        self.ctxs = TileContexts(self.mi_cols, self.mi_rows)
        # spec maxX/maxY clamp: readable sample area per plane
        self.max_wh = [(self.mi_cols * 4, self.mi_rows * 4),
                       (self.mi_cols * 2, self.mi_rows * 2),
                       (self.mi_cols * 2, self.mi_rows * 2)]

        for sb_y in range(0, self.seq.sb_rows * 16, 16):
            for sb_x in range(0, self.seq.sb_cols * 16, 16):
                self._code_partition(sb_y, sb_x, 64)

        tile = self.w.done()
        fh = obu.FrameHeader(base_q_idx=cfg.base_q_idx,
                             disable_cdf_update=cfg.disable_cdf_update,
                             reduced_tx_set=False)
        tu = (obu.temporal_delimiter_obu()
              + obu.write_sequence_header_obu(self.seq)
              + obu.write_frame_obu(self.seq, fh, [tile]))
        recon = [self.recon[0][:cfg.height, :cfg.width],
                 self.recon[1][:(cfg.height + 1) // 2, :(cfg.width + 1) // 2],
                 self.recon[2][:(cfg.height + 1) // 2, :(cfg.width + 1) // 2]]
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
            subsize = common.square_bsize(size)
            self.ctxs.update_partition_ctx(mi_row, mi_col, bsize, subsize)

    # --- block coding ---------------------------------------------------------------
    def _choose_mode(self, plane: int, x: int, y: int, size: int) -> int:
        """Pick the intra mode minimizing prediction SSE against the source
        (open-loop stand-in for the RD fast loop,
        EbProductCodingLoop.c:1185)."""
        recon = self.recon[plane]
        max_w, max_h = self.max_wh[plane]
        above, left, tl = intra_ops.prepare_edges(
            recon, np.array([x]), np.array([y]), size, size,
            bd=self.cfg.bit_depth, max_w=max_w, max_h=max_h)
        ha = np.array([y > 0])
        hl = np.array([x > 0])
        src_blk = self.src[plane][y:y + size, x:x + size]
        best_mode, best_cost = DC_PRED, None
        for mode in self.cfg.intra_modes:
            pred = intra_ops.predict(mode, above, left, tl, size, size,
                                     have_above=ha, have_left=hl,
                                     bd=self.cfg.bit_depth)[0]
            cost = int(np.sum((src_blk - pred) ** 2))
            if best_cost is None or cost < best_cost:
                best_mode, best_cost = mode, cost
        return best_mode

    def _code_txb(self, plane: int, x: int, y: int, tx_size: int,
                  tx_type: int, mode: int, plane_bsize: int,
                  write_syntax: bool = True) -> int:
        """Predict/transform/quantize/write/reconstruct one transform block.
        Returns eob. When ``write_syntax`` is False only computes eob
        (used for the skip-flag decision dry run)."""
        tw = int(tx_ops.TX_WIDTH[tx_size])
        th = int(tx_ops.TX_HEIGHT[tx_size])
        cw, ch = common.coded_dims(tx_size)
        recon = self.recon[plane]
        max_w, max_h = self.max_wh[plane]
        above, left, tl = intra_ops.prepare_edges(
            recon, np.array([x]), np.array([y]), tw, th,
            bd=self.cfg.bit_depth, max_w=max_w, max_h=max_h)
        pred = intra_ops.predict(mode, above, left, tl, tw, th,
                                 have_above=np.array([y > 0]),
                                 have_left=np.array([x > 0]),
                                 bd=self.cfg.bit_depth)[0]
        resid = self.src[plane][y:y + th, x:x + tw] - pred
        coeffs = tx_ops.forward_tx2d(resid[None], tx_type, tw, th)[0]
        coded = coeffs[:ch, :cw].reshape(1, -1)
        scan = get_scan(tx_size, tx_type)
        log_scale = quant_ops.tx_scale(tx_size)
        qcoeff, dqcoeff, eob = quant_ops.quantize(coded, scan, self.qp,
                                                  log_scale)
        eob = int(eob[0])

        if write_syntax:
            x4, y4 = x >> 2, y >> 2
            skip_ctx, sign_ctx = self.ctxs.txb_ctx(plane, plane_bsize,
                                                   tx_size, x4, y4)
            cul = coeff_syntax.write_coeffs_txb(
                self.w, self.fc, qcoeff.reshape(ch, cw), tx_size, tx_type,
                plane_type=int(plane > 0), txb_skip_ctx=skip_ctx,
                dc_sign_ctx=sign_ctx, intra_dir=mode,
                base_qindex=self.cfg.base_q_idx)
            self.ctxs.update_txb_ctx(plane, x4, y4, tx_size, cul)
            # reconstruct
            if eob > 0:
                full = np.zeros((1, th, tw), dtype=np.int64)
                full[0, :ch, :cw] = dqcoeff.reshape(ch, cw)
                r = tx_ops.inverse_tx2d(full, tx_type, tw, th,
                                        bd=self.cfg.bit_depth)[0]
                out = tx_ops.recon_add(pred[None], r[None],
                                       bd=self.cfg.bit_depth)[0]
            else:
                out = np.clip(pred, 0, (1 << self.cfg.bit_depth) - 1) \
                    .astype(np.uint8)
            recon[y:y + th, x:x + tw] = out
        return eob

    def _code_block(self, mi_row: int, mi_col: int, size: int) -> None:
        x, y = mi_col * 4, mi_row * 4
        bsize = common.square_bsize(size)
        y_mode = self._choose_mode(0, x, y, size)
        csize = size >> 1
        cx, cy = x >> 1, y >> 1
        uv_mode = self._choose_mode(1, cx, cy, csize)
        if uv_mode not in self.cfg.intra_modes:
            uv_mode = DC_PRED

        tx_y = common.tx_size_for_block(size, 0)
        tx_uv = common.tx_size_for_block(csize, 1)
        tt_y = DCT_DCT  # tx-type search: post-MVP (encode_pass_tx_search)
        tt_u = common.chroma_tx_type(uv_mode, tx_uv, False)

        # dry run: determine skip (all eobs zero) without emitting syntax
        plane_info = [(0, x, y, tx_y, tt_y, y_mode, bsize),
                      (1, cx, cy, tx_uv, tt_u, uv_mode,
                       common.square_bsize(csize)),
                      (2, cx, cy, tx_uv, tt_u, uv_mode,
                       common.square_bsize(csize))]
        eobs = [self._code_txb(p, px, py, ts, ttp, m, pb, write_syntax=False)
                for p, px, py, ts, ttp, m, pb in plane_info]
        skip = int(all(e == 0 for e in eobs))

        # mode info (intra_frame_mode_info order, spec 5.11.10)
        mode_syntax.write_skip(self.w, self.fc, self.ctxs, skip,
                               mi_row, mi_col)
        mode_syntax.write_intra_luma_mode_kf(self.w, self.fc, self.ctxs,
                                             y_mode, mi_row, mi_col)
        cfl_allowed = size <= 32
        mode_syntax.write_intra_chroma_mode(self.w, self.fc, uv_mode,
                                            y_mode, cfl_allowed)
        self.ctxs.set_mi(mi_row, mi_col, bsize, y_mode, skip)

        if skip:
            # reconstruct prediction-only; zero the entropy contexts
            for p, px, py, ts, ttp, m, pb in plane_info:
                self._recon_pred_only(p, px, py, ts, m)
                self.ctxs.update_txb_ctx(p, px >> 2, py >> 2, ts, 0)
        else:
            for p, px, py, ts, ttp, m, pb in plane_info:
                self._code_txb(p, px, py, ts, ttp, m, pb, write_syntax=True)

    def _recon_pred_only(self, plane: int, x: int, y: int, tx_size: int,
                         mode: int) -> None:
        tw = int(tx_ops.TX_WIDTH[tx_size])
        th = int(tx_ops.TX_HEIGHT[tx_size])
        recon = self.recon[plane]
        max_w, max_h = self.max_wh[plane]
        above, left, tl = intra_ops.prepare_edges(
            recon, np.array([x]), np.array([y]), tw, th,
            bd=self.cfg.bit_depth, max_w=max_w, max_h=max_h)
        pred = intra_ops.predict(mode, above, left, tl, tw, th,
                                 have_above=np.array([y > 0]),
                                 have_left=np.array([x > 0]),
                                 bd=self.cfg.bit_depth)[0]
        recon[y:y + th, x:x + tw] = np.clip(
            pred, 0, (1 << self.cfg.bit_depth) - 1).astype(np.uint8)


def encode_keyframe(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                    cfg: EncoderConfig):
    return IntraFrameEncoder(cfg).encode(y, u, v)
