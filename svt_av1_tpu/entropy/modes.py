"""Mode / partition syntax coding (intra frames).

Reference behavior: EncodePartitionAv1 ``EbEntropyCoding.c:935``,
EncodeSkipCoeffAv1 ``:1016``, EncodeIntraLumaModeAv1 ``:1055`` /
EncodeIntraLumaModeNonKeyAv1, chroma mode ``:1160``. Encoder writers and
mirror readers live side by side and share all context derivation through
``TileContexts``.
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.entropy.ctx import TileContexts
from svt_av1_tpu.entropy.writer import SymbolReader, SymbolWriter
from svt_av1_tpu.utils.blocks import (BLOCK_8X8, BLOCK_128X128, BLOCK_WIDTH,
                                      PARTITION_HORZ, PARTITION_HORZ_4,
                                      PARTITION_HORZ_A, PARTITION_HORZ_B,
                                      PARTITION_NONE, PARTITION_SPLIT,
                                      PARTITION_VERT, PARTITION_VERT_4,
                                      PARTITION_VERT_A, PARTITION_VERT_B)

PARTITION_TYPES = 4
EXT_PARTITION_TYPES = 10
CDF_PROB_TOP = 32768


def partition_cdf_length(bsize: int) -> int:
    if bsize <= BLOCK_8X8:
        return PARTITION_TYPES
    if bsize == BLOCK_128X128:
        return EXT_PARTITION_TYPES - 2
    return EXT_PARTITION_TYPES


def _cdf_element_prob(icdf: np.ndarray, element: int) -> int:
    """Probability mass of one symbol in an inverse-CDF table
    (cdf_element_prob, EbEntropyCoding.c:902)."""
    hi = int(icdf[element - 1]) if element > 0 else CDF_PROB_TOP
    return hi - int(icdf[element])


def _gather_vert_alike(cdf: np.ndarray, bsize: int) -> np.ndarray:
    """2-symbol CDF for 'continues vertically?' at a bottom frame edge
    (partition_gather_vert_alike, EbEntropyCoding.c:922)."""
    p = CDF_PROB_TOP
    p -= _cdf_element_prob(cdf, PARTITION_VERT)
    p -= _cdf_element_prob(cdf, PARTITION_SPLIT)
    p -= _cdf_element_prob(cdf, PARTITION_HORZ_A)
    p -= _cdf_element_prob(cdf, PARTITION_VERT_A)
    p -= _cdf_element_prob(cdf, PARTITION_VERT_B)
    if bsize != BLOCK_128X128:
        p -= _cdf_element_prob(cdf, PARTITION_VERT_4)
    return np.array([CDF_PROB_TOP - p, 0, 0], dtype=np.int32)


def _gather_horz_alike(cdf: np.ndarray, bsize: int) -> np.ndarray:
    p = CDF_PROB_TOP
    p -= _cdf_element_prob(cdf, PARTITION_HORZ)
    p -= _cdf_element_prob(cdf, PARTITION_SPLIT)
    p -= _cdf_element_prob(cdf, PARTITION_HORZ_A)
    p -= _cdf_element_prob(cdf, PARTITION_HORZ_B)
    p -= _cdf_element_prob(cdf, PARTITION_VERT_A)
    if bsize != BLOCK_128X128:
        p -= _cdf_element_prob(cdf, PARTITION_HORZ_4)
    return np.array([CDF_PROB_TOP - p, 0, 0], dtype=np.int32)


def write_partition(w: SymbolWriter, fc, ctxs: TileContexts, partition: int,
                    bsize: int, mi_row: int, mi_col: int,
                    mi_cols: int, mi_rows: int) -> None:
    """mi_cols/mi_rows: coded frame extent in mi units (tile-relative)."""
    hbs = int(BLOCK_WIDTH[bsize]) >> 3  # half block, mi units
    has_rows = (mi_row + hbs) < mi_rows
    has_cols = (mi_col + hbs) < mi_cols
    ctx = ctxs.partition_ctx(mi_row, mi_col, bsize)
    if not has_rows and not has_cols:
        assert partition == PARTITION_SPLIT
        return
    if has_rows and has_cols:
        w.write_symbol(partition, fc.partition[ctx],
                       partition_cdf_length(bsize))
    elif has_cols:  # bottom edge: only vert-alike or split
        cdf = _gather_vert_alike(fc.partition[ctx].copy(), bsize)
        w.ec.encode_symbol(int(partition == PARTITION_SPLIT), cdf, 2)
    else:
        cdf = _gather_horz_alike(fc.partition[ctx].copy(), bsize)
        w.ec.encode_symbol(int(partition == PARTITION_SPLIT), cdf, 2)


def read_partition(r: SymbolReader, fc, ctxs: TileContexts, bsize: int,
                   mi_row: int, mi_col: int, mi_cols: int,
                   mi_rows: int) -> int:
    hbs = int(BLOCK_WIDTH[bsize]) >> 3
    has_rows = (mi_row + hbs) < mi_rows
    has_cols = (mi_col + hbs) < mi_cols
    ctx = ctxs.partition_ctx(mi_row, mi_col, bsize)
    if not has_rows and not has_cols:
        return PARTITION_SPLIT
    if has_rows and has_cols:
        return r.read_symbol(fc.partition[ctx], partition_cdf_length(bsize))
    if has_cols:  # bottom edge: split_or_horz (spec 5.11.4)
        cdf = _gather_vert_alike(fc.partition[ctx].copy(), bsize)
        s = r.ec.decode_symbol(cdf, 2)
        return PARTITION_SPLIT if s else PARTITION_HORZ
    cdf = _gather_horz_alike(fc.partition[ctx].copy(), bsize)
    s = r.ec.decode_symbol(cdf, 2)
    return PARTITION_SPLIT if s else PARTITION_VERT


def write_skip(w: SymbolWriter, fc, ctxs: TileContexts, skip: int,
               mi_row: int, mi_col: int) -> None:
    ctx = ctxs.skip_ctx(mi_row, mi_col)
    w.write_symbol(skip, fc.skip[ctx], 2)


def read_skip(r: SymbolReader, fc, ctxs: TileContexts, mi_row: int,
              mi_col: int) -> int:
    ctx = ctxs.skip_ctx(mi_row, mi_col)
    return r.read_symbol(fc.skip[ctx], 2)


def write_intra_luma_mode_kf(w: SymbolWriter, fc, ctxs: TileContexts,
                             mode: int, mi_row: int, mi_col: int) -> None:
    above, left = ctxs.intra_mode_ctx(mi_row, mi_col)
    w.write_symbol(mode, fc.kf_y_mode[above][left], 13)


def read_intra_luma_mode_kf(r: SymbolReader, fc, ctxs: TileContexts,
                            mi_row: int, mi_col: int) -> int:
    above, left = ctxs.intra_mode_ctx(mi_row, mi_col)
    return r.read_symbol(fc.kf_y_mode[above][left], 13)


# size_group_lookup for square blocks (reference EbDefinitions.h:1272)
_SIZE_GROUP = {4: 0, 8: 1, 16: 2, 32: 3, 64: 3}


def write_intra_luma_mode_if(w: SymbolWriter, fc, size: int,
                             mode: int) -> None:
    """Luma mode of an intra block inside an inter frame: y_mode_cdf
    indexed by size group, no neighbor ctx (reference
    EbEntropyCoding.c:1123 EncodeIntraLumaModeNonKeyAv1)."""
    w.write_symbol(mode, fc.if_y_mode[_SIZE_GROUP[size]], 13)


def read_intra_luma_mode_if(r: SymbolReader, fc, size: int) -> int:
    return r.read_symbol(fc.if_y_mode[_SIZE_GROUP[size]], 13)


MAX_ANGLE_DELTA = 3


def write_angle_delta(w: SymbolWriter, fc, mode: int, delta: int) -> None:
    """intra_angle_info (spec 5.11.42): coded for directional modes on
    blocks >= 8x8. cdf row indexed by mode - V_PRED."""
    w.write_symbol(delta + MAX_ANGLE_DELTA, fc.angle_delta[mode - 1], 7)


def read_angle_delta(r: SymbolReader, fc, mode: int) -> int:
    return r.read_symbol(fc.angle_delta[mode - 1], 7) - MAX_ANGLE_DELTA


def write_intra_chroma_mode(w: SymbolWriter, fc, uv_mode: int, y_mode: int,
                            cfl_allowed: bool) -> None:
    w.write_symbol(uv_mode, fc.uv_mode[int(cfl_allowed)][y_mode],
                   13 + int(cfl_allowed))


def read_intra_chroma_mode(r: SymbolReader, fc, y_mode: int,
                           cfl_allowed: bool) -> int:
    return r.read_symbol(fc.uv_mode[int(cfl_allowed)][y_mode],
                         13 + int(cfl_allowed))
