"""Coefficient-coding context derivation (shared by encoder and decoder).

Normative context rules of AV1 residual coding (spec 5.11.39 coeffs syntax;
reference behavior: ``EbRateDistortionCost.c:248-470`` get_nz_map_ctx /
get_br_ctx, ``EbEntropyCoding.c:224-480`` eob tokens / GetTxbCtx).

The nz/br context maps are *vectorized over all positions of a transform
block* — this is the piece that runs as a batched device op in the two-phase
entropy design.
"""

from __future__ import annotations

import functools

import numpy as np

from svt_av1_tpu.utils.blocks import (TX_16X32, TX_16X64, TX_32X16, TX_32X32,
                                      TX_32X64, TX_64X16, TX_64X32, TX_64X64,
                                      TX_CLASS_2D, TX_CLASS_HORIZ,
                                      TX_CLASS_VERT, TX_HEIGHT, TX_WIDTH,
                                      TX_SIZE_SQR, TX_SIZE_SQR_UP)

NUM_BASE_LEVELS = 2
COEFF_BASE_RANGE = 12
BR_CDF_SIZE = 4
MAX_BASE_BR_RANGE = COEFF_BASE_RANGE + NUM_BASE_LEVELS + 1  # 15
COEFF_CONTEXT_BITS = 6
COEFF_CONTEXT_MASK = 63
SIG_COEF_CONTEXTS_2D = 26

# eob class tables (reference EbEntropyCoding.c:186-222)
EOB_OFFSET_BITS = np.array([0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
EOB_GROUP_START = np.array([0, 1, 2, 3, 5, 9, 17, 33, 65, 129, 257, 513])


def adjusted_tx_size(tx_size: int) -> int:
    """64-point dims clamp to 32 for coefficient coding."""
    return {TX_64X64: TX_32X32, TX_64X32: TX_32X32, TX_32X64: TX_32X32,
            TX_16X64: TX_16X32, TX_64X16: TX_32X16}.get(tx_size, tx_size)


def txb_dims(tx_size: int):
    adj = adjusted_tx_size(tx_size)
    w, h = int(TX_WIDTH[adj]), int(TX_HEIGHT[adj])
    return w, h, int(np.log2(w))


def txs_ctx(tx_size: int) -> int:
    return (int(TX_SIZE_SQR[tx_size]) + int(TX_SIZE_SQR_UP[tx_size]) + 1) >> 1


def eob_multi_size(tx_size: int) -> int:
    w, h, _ = txb_dims(tx_size)
    return int(np.log2(w * h)) - 4


def eob_pos_token(eob: int):
    """Returns (eob_pt token, extra value). eob is 1-based."""
    t = int(np.searchsorted(EOB_GROUP_START, eob, side="right")) - 1
    return t, eob - int(EOB_GROUP_START[t])


@functools.lru_cache(maxsize=None)
def nz_map_ctx_offset_2d(w: int, h: int) -> np.ndarray:
    """TX_CLASS_2D ctx offset per raster position (reference
    av1_nz_map_ctx_offset ``EbRateDistortionCost.c:248``, generated from its
    row/col pattern; pinned against the literal table in tests)."""
    r = np.minimum(np.arange(h), 4)[:, None]
    c = np.minimum(np.arange(w), 4)[None, :]
    s = r + c
    base = np.where(s == 0, 0, np.where(s <= 1, 1, np.where(s <= 3, 6, 21)))
    if h > w:   # tall: first two rows -> 11
        base = np.where((r < 2) & (s > 0), 11, base)
    elif w > h:  # wide: first two cols -> 16
        base = np.where((c < 2) & (s > 0), 16, base)
    return base.reshape(-1)


def _padded(levels: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """levels[B, h, w] shifted by (dy, dx) with zero padding."""
    b, h, w = levels.shape
    out = np.zeros_like(levels)
    out[:, :h - dy if dy else h, :w - dx if dx else w] = \
        levels[:, dy:, dx:]
    return out


def nz_map_ctx(levels: np.ndarray, tx_size: int, tx_class: int) -> np.ndarray:
    """coeff_base context per raster position for a batch of blocks.

    levels: [B, h, w] clipped abs levels (encoder: all; decoder: causal —
    only later-scan positions are referenced, so both agree).
    Returns ctx [B, h*w].
    """
    b, h, w = levels.shape
    l3 = np.minimum(levels, 3)
    mag = _padded(l3, 0, 1) + _padded(l3, 1, 0)
    if tx_class == TX_CLASS_2D:
        mag = mag + _padded(l3, 1, 1) + _padded(l3, 0, 2) + _padded(l3, 2, 0)
    elif tx_class == TX_CLASS_VERT:
        mag = mag + _padded(l3, 2, 0) + _padded(l3, 3, 0) + _padded(l3, 4, 0)
    else:
        mag = mag + _padded(l3, 0, 2) + _padded(l3, 0, 3) + _padded(l3, 0, 4)
    ctx = np.minimum((mag + 1) >> 1, 4).reshape(b, -1)
    if tx_class == TX_CLASS_2D:
        off = nz_map_ctx_offset_2d(w, h)[None, :]
        out = ctx + off
        out[:, 0] = 0  # DC
        return out
    rr = np.arange(h)[:, None] * np.ones(w, dtype=int)[None, :]
    cc = np.ones(h, dtype=int)[:, None] * np.arange(w)[None, :]
    idx = (rr if tx_class == TX_CLASS_VERT else cc).reshape(-1)
    off = SIG_COEF_CONTEXTS_2D + 5 * np.minimum(idx, 2)
    return ctx + off[None, :]


def nz_map_ctx_at(levels: np.ndarray, pos: int, tx_size: int,
                  tx_class: int) -> int:
    """Scalar nz ctx for one raster position (decoder-side incremental)."""
    h, w = levels.shape
    r, c = pos // w, pos % w

    def lv(dy, dx):
        rr, cz = r + dy, c + dx
        return min(int(levels[rr, cz]), 3) if rr < h and cz < w else 0
    mag = lv(0, 1) + lv(1, 0)
    if tx_class == TX_CLASS_2D:
        mag += lv(1, 1) + lv(0, 2) + lv(2, 0)
    elif tx_class == TX_CLASS_VERT:
        mag += lv(2, 0) + lv(3, 0) + lv(4, 0)
    else:
        mag += lv(0, 2) + lv(0, 3) + lv(0, 4)
    ctx = min((mag + 1) >> 1, 4)
    if tx_class == TX_CLASS_2D:
        if pos == 0:
            return 0
        return ctx + int(nz_map_ctx_offset_2d(w, h)[pos])
    idx = r if tx_class == TX_CLASS_VERT else c
    return ctx + SIG_COEF_CONTEXTS_2D + 5 * min(idx, 2)


def br_ctx_at(levels: np.ndarray, pos: int, tx_class: int) -> int:
    h, w = levels.shape
    r, c = pos // w, pos % w

    def lv(dy, dx):
        rr, cz = r + dy, c + dx
        return int(levels[rr, cz]) if rr < h and cz < w else 0
    mag = lv(0, 1) + lv(1, 0)
    if tx_class == TX_CLASS_2D:
        mag += lv(1, 1)
    elif tx_class == TX_CLASS_VERT:
        mag += lv(2, 0)
    else:
        mag += lv(0, 2)
    mag = min((mag + 1) >> 1, 6)
    if pos == 0:
        return mag
    if tx_class == TX_CLASS_2D:
        return mag + (7 if (r < 2 and c < 2) else 14)
    if tx_class == TX_CLASS_VERT:
        return mag + (7 if r == 0 else 14)
    return mag + (7 if c == 0 else 14)


def eob_base_ctx(scan_idx: np.ndarray, n: int) -> np.ndarray:
    """coeff_base_eob context for the last coeff (spec: by scan position)."""
    return np.where(scan_idx == 0, 0,
                    np.where(scan_idx <= n // 8, 1,
                             np.where(scan_idx <= n // 4, 2, 3)))


def br_ctx(levels: np.ndarray, tx_class: int) -> np.ndarray:
    """coeff_br context per raster position, [B, h*w].

    levels values may exceed 3 (decoder: up to 15) — by design both encoder
    (full levels) and decoder (br-capped levels) derive identical contexts.
    """
    b, h, w = levels.shape
    mag = _padded(levels, 0, 1) + _padded(levels, 1, 0)
    if tx_class == TX_CLASS_2D:
        mag = mag + _padded(levels, 1, 1)
    elif tx_class == TX_CLASS_VERT:
        mag = mag + _padded(levels, 2, 0)
    else:
        mag = mag + _padded(levels, 0, 2)
    mag = np.minimum((mag + 1) >> 1, 6).reshape(b, -1)
    rr = (np.arange(h)[:, None] * np.ones(w, dtype=int)[None, :]).reshape(-1)
    cc = (np.ones(h, dtype=int)[:, None] * np.arange(w)[None, :]).reshape(-1)
    if tx_class == TX_CLASS_2D:
        region = np.where((rr < 2) & (cc < 2), 7, 14)
    elif tx_class == TX_CLASS_VERT:
        region = np.where(rr == 0, 7, 14)
    else:
        region = np.where(cc == 0, 7, 14)
    region = region.copy()
    region[0] = 0  # DC
    return mag + region[None, :]


def dc_sign_ctx_from_sum(dc_sign_sum: int) -> int:
    """above/left dc-sign accumulation -> context (GetTxbCtx)."""
    if dc_sign_sum > 0:
        return 2
    if dc_sign_sum < 0:
        return 1
    return 0


def txb_entropy_context(qcoeff_raster: np.ndarray, scan: np.ndarray,
                        eob: int) -> int:
    """Context byte stored in above/left arrays after coding a txb
    (av1_get_txb_entropy_context): cul_level | dc-sign field."""
    if eob == 0:
        return 0
    cul = 0
    for c in range(eob):
        cul += abs(int(qcoeff_raster[scan[c]]))
        if cul > COEFF_CONTEXT_MASK:
            break
    cul = min(COEFF_CONTEXT_MASK, cul)
    dc = int(qcoeff_raster[0])
    if dc < 0:
        cul |= 1 << COEFF_CONTEXT_BITS
    elif dc > 0:
        cul += 2 << COEFF_CONTEXT_BITS
    return cul


def skip_ctx_luma_split(top: int, left: int) -> int:
    """txb_skip ctx for luma when tx smaller than block (GetTxbCtx)."""
    skip_contexts = [[1, 2, 2, 2, 3], [1, 4, 4, 4, 5], [1, 4, 4, 4, 5],
                     [1, 4, 4, 4, 5], [1, 4, 4, 4, 6]]
    top &= COEFF_CONTEXT_MASK
    left &= COEFF_CONTEXT_MASK
    mx = min(top | left, 4)
    mn = min(min(top, left), 4)
    return skip_contexts[mn][mx]
