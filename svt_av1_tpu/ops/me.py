"""Motion estimation: batched full-pel log search + sub-pel refinement.

TPU-shaped replacement for the reference's per-SB HME/full-search loops
(``EbMotionEstimation.c:6152`` MotionEstimateLcu; SAD pyramid §3.3 of
SURVEY.md): every step evaluates a small candidate set for ALL blocks of a
frame at once (host NumPy here; device twin follows the same structure).
Sub-pel refinement evaluates MC interpolation at half/quarter positions
(the reference interpolates search regions once; at batch scale,
re-filtering candidates is the batched analogue).
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.ops import mc


def _gather_blocks(plane, xs, ys, size):
    from svt_av1_tpu.pipeline.common import leaf_wh
    bw, bh = leaf_wh(size)
    return np.stack([plane[y:y + bh, x:x + bw]
                     for x, y in zip(xs, ys)]).astype(np.int32)


def _sad_fullpel(ref_padded, srcs, xs, ys, dy, dx, size):
    b = len(xs)
    out = np.empty(b, dtype=np.int64)
    for i in range(b):
        y0 = ys[i] + dy[i] + mc.REF_PAD
        x0 = xs[i] + dx[i] + mc.REF_PAD
        win = ref_padded[y0:y0 + size, x0:x0 + size]
        out[i] = np.abs(srcs[i] - win.astype(np.int32)).sum()
    return out


def decimate2(plane: np.ndarray) -> np.ndarray:
    """2x decimation by averaging (analysis-only, like the reference's
    Decimation2D — any filter is legal since ME is non-normative)."""
    h, w = plane.shape
    h2, w2 = h & ~1, w & ~1
    p = plane[:h2, :w2].astype(np.int32)
    return ((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
             + p[1::2, 1::2] + 2) >> 2).astype(plane.dtype)


def search_offsets(radius: int) -> np.ndarray:
    """Row-major (dy, dx) grid offsets [-radius..radius]^2, [K, 2].

    The deterministic candidate order shared by the host search and its
    device twin — equal-SAD ties resolve to the first offset in this
    order on both backends."""
    r = np.arange(-radius, radius + 1)
    return np.stack(np.meshgrid(r, r, indexing="ij"),
                    axis=-1).reshape(-1, 2).astype(np.int64)


def _exhaustive(ref_padded, cur_plane, xs, ys, size, centers, radius):
    """Fully-batched exhaustive SAD around per-block centers: one
    vectorized gather+reduce per offset (no per-block Python loops).
    Tie-break: first strictly-better offset in row-major order wins
    (identical on the device twin)."""
    from svt_av1_tpu.pipeline.common import leaf_wh
    bw, bh = leaf_wh(size)
    b = len(xs)
    cur = cur_plane.astype(np.int32)
    pad = mc.REF_PAD
    centers = np.asarray(centers, dtype=np.int64)
    xa = np.asarray(xs, dtype=np.int64)
    ya = np.asarray(ys, dtype=np.int64)
    iy = ya[:, None, None] + np.arange(bh)[None, :, None]
    ix = xa[:, None, None] + np.arange(bw)[None, None, :]
    curs = cur[iy, ix].astype(np.int32)                     # [B, bh, bw]
    refp = ref_padded.astype(np.int32)
    best_cost = np.full(b, np.iinfo(np.int64).max, dtype=np.int64)
    best_mv = np.zeros((b, 2), dtype=np.int64)
    for dy, dx in search_offsets(radius):
        cy = centers[:, 0] + dy
        cx = centers[:, 1] + dx
        valid = (np.abs(cy) < pad) & (np.abs(cx) < pad)
        cyc = np.clip(cy, -pad + 1, pad - 1)
        cxc = np.clip(cx, -pad + 1, pad - 1)
        ry = iy + (cyc + pad)[:, None, None]
        rx = ix + (cxc + pad)[:, None, None]
        sad = np.abs(curs - refp[ry, rx]).sum(axis=(1, 2),
                                              dtype=np.int64)
        sad = np.where(valid, sad, np.iinfo(np.int64).max)
        better = sad < best_cost
        best_cost = np.where(better, sad, best_cost)
        best_mv[better, 0] = cy[better]
        best_mv[better, 1] = cx[better]
    return best_mv, best_cost


def build_pyramid(ref_padded):
    """(full, 1/2, 1/4) padded reference pyramid for HME (host; computed
    once per reference per frame)."""
    pad = mc.REF_PAD
    ref = ref_padded[pad:-pad, pad:-pad]
    return (ref_padded, mc.pad_reference(decimate2(ref)),
            mc.pad_reference(decimate2(decimate2(ref))))


def src_pyramid(src_plane):
    """(full, 1/2, 1/4) source pyramid (no padding needed)."""
    cur_h = decimate2(src_plane)
    return (src_plane, cur_h, decimate2(cur_h))


def fullpel_search(ref_padded, src_plane, xs, ys, size,
                   max_range: int = 24, ref_pyr=None, src_pyr=None):
    """Hierarchical full-pel search (HME-style, SURVEY.md §3.3): exhaustive
    on the 1/4-decimated plane, then refined exhaustively at 1/2 and full
    resolution around the upscaled seed. Returns ([B, 2] (dy, dx) whole
    pels, SAD)."""
    ref_padded, ref_h, ref_q = ref_pyr or build_pyramid(ref_padded)
    _, cur_h, cur_q = src_pyr or src_pyramid(src_plane)
    b = len(xs)
    xa = np.asarray(xs, dtype=np.int64)
    ya = np.asarray(ys, dtype=np.int64)
    from svt_av1_tpu.pipeline.common import leaf_wh
    bw, bh = leaf_wh(size)
    if min(bw, bh) >= 16:
        # L2: quarter resolution, exhaustive around 0
        zeros = np.zeros((b, 2), dtype=np.int64)
        mv_q, _ = _exhaustive(ref_q, cur_q, xa >> 2, ya >> 2,
                              (bw >> 2, bh >> 2), zeros,
                              max(2, max_range // 4))
        # L1: half resolution around 2x seed
        mv_h, _ = _exhaustive(ref_h, cur_h, xa >> 1, ya >> 1,
                              (bw >> 1, bh >> 1), mv_q * 2, 2)
        seed = mv_h * 2
        # L0 center check (hme_mv_center_check analogue): probe the HME
        # seed and the zero MV with one SAD each, then sweep a single
        # radius-3 window around the better center — 51 offsets instead
        # of the two full windows' 98 at equal search quality.
        zeros = np.zeros((b, 2), dtype=np.int64)
        _, c_seed = _exhaustive(ref_padded, src_plane, xa, ya, size,
                                seed, 0)
        _, c_zero = _exhaustive(ref_padded, src_plane, xa, ya, size,
                                zeros, 0)
        center = np.where((c_zero < c_seed)[:, None], zeros, seed)
        radius0 = 3
    else:
        center = np.zeros((b, 2), dtype=np.int64)
        radius0 = max(4, max_range // 2)
    mvs, cost = _exhaustive(ref_padded, src_plane, xa, ya, size,
                            center, radius0)
    # clamp so the 8-tap MC window of any refined sub-pel candidate stays
    # inside the padded reference (vectorized clamp_mv_for_padding, then
    # truncate the 1/8-pel result back to whole pels toward zero)
    H, W = src_plane.shape
    margin = (mc.REF_PAD - 5) << 2
    r8 = np.clip(mvs[:, 0] * 8, -(ya << 2) - margin,
                 ((H - ya - bh) << 2) + margin)
    c8 = np.clip(mvs[:, 1] * 8, -(xa << 2) - margin,
                 ((W - xa - bw) << 2) + margin)
    mvs = np.stack([np.sign(r8) * (np.abs(r8) // 8),
                    np.sign(c8) * (np.abs(c8) // 8)], axis=1)
    return mvs, cost


def subpel_refine(ref_padded, src_plane, xs, ys, size, int_mvs,
                  steps=(4, 2), bd: int = 8):
    """Refine full-pel MVs to quarter-pel (1/8-units, even values).
    int_mvs: [B, 2] whole-pel. Returns [B, 2] in 1/8-pel units."""
    b = len(xs)
    srcs = _gather_blocks(src_plane, xs, ys, size).astype(np.int64)
    mvs = np.asarray(int_mvs, dtype=np.int64) * 8

    from svt_av1_tpu.pipeline.common import leaf_wh
    bw, bh = leaf_wh(size)

    def cost_of(cand):
        pred = mc.mc_block_batch(ref_padded, np.asarray(xs),
                                 np.asarray(ys), cand, bw, bh, bd=bd)
        return np.sum((srcs - pred.astype(np.int64)) ** 2, axis=(1, 2))

    best_cost = cost_of(mvs)
    for step in steps:  # 4 = half pel, 2 = quarter pel (1/8 units)
        for oy, ox in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            cand = mvs + np.array([oy * step, ox * step])
            cost = cost_of(cand)
            better = cost < best_cost
            mvs = np.where(better[:, None], cand, mvs)
            best_cost = np.where(better, cost, best_cost)
    return mvs, best_cost
