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


def _exhaustive(ref_padded, cur_plane, xs, ys, size, centers, radius):
    from svt_av1_tpu.pipeline.common import leaf_wh
    bw, bh = leaf_wh(size)
    """Batched exhaustive SAD over a window per block using full-frame
    diffs + integral images (one pass per offset, O(1) per block)."""
    b = len(xs)
    cur = cur_plane.astype(np.int32)
    H, W = cur.shape
    pad = mc.REF_PAD
    best_cost = np.full(b, np.iinfo(np.int64).max, dtype=np.int64)
    best_dy = np.zeros(b, dtype=np.int64)
    best_dx = np.zeros(b, dtype=np.int64)
    centers = np.asarray(centers, dtype=np.int64)
    uniq = {}
    for cy, cx in centers:
        uniq.setdefault((int(cy), int(cx)), True)
    xa = np.asarray(xs)
    ya = np.asarray(ys)
    for (cy, cx) in uniq:
        sel = np.nonzero((centers[:, 0] == cy) & (centers[:, 1] == cx))[0]
        # direct window sums beat a full-frame integral image when the
        # blocks under this center cover a small fraction of the plane
        direct = len(sel) * bw * bh * 4 < H * W
        ys_s, xs_s = ya[sel], xa[sel]
        if direct:
            curs = np.stack([cur[y:y + bh, x:x + bw]
                             for y, x in zip(ys_s, xs_s)])
        for dy in range(cy - radius, cy + radius + 1):
            if not (-pad < dy < pad):
                continue
            for dx in range(cx - radius, cx + radius + 1):
                if not (-pad < dx < pad):
                    continue
                if direct:
                    refs = np.stack([
                        ref_padded[pad + dy + y:pad + dy + y + bh,
                                   pad + dx + x:pad + dx + x + bw]
                        for y, x in zip(ys_s, xs_s)]).astype(np.int32)
                    sad = np.abs(curs - refs).sum(axis=(1, 2)) \
                        .astype(np.int64)
                else:
                    shifted = ref_padded[pad + dy:pad + dy + H,
                                         pad + dx:pad + dx + W] \
                        .astype(np.int32)
                    d = np.abs(cur - shifted)
                    ii = np.zeros((H + 1, W + 1), dtype=np.int64)
                    ii[1:, 1:] = d.cumsum(0).cumsum(1)
                    sad = (ii[ys_s + bh, xs_s + bw] - ii[ys_s, xs_s + bw]
                           - ii[ys_s + bh, xs_s] + ii[ys_s, xs_s])
                better = sad < best_cost[sel]
                idx = sel[better]
                best_cost[idx] = sad[better]
                best_dy[idx] = dy
                best_dx[idx] = dx
    return np.stack([best_dy, best_dx], axis=1), best_cost


def fullpel_search(ref_padded, src_plane, xs, ys, size,
                   max_range: int = 24):
    """Hierarchical full-pel search (HME-style, SURVEY.md §3.3): exhaustive
    on the 1/4-decimated plane, then refined exhaustively at 1/2 and full
    resolution around the upscaled seed. Returns ([B, 2] (dy, dx) whole
    pels, SAD)."""
    pad = mc.REF_PAD
    ref = ref_padded[pad:-pad, pad:-pad]
    ref_h = mc.pad_reference(decimate2(ref))
    ref_q = mc.pad_reference(decimate2(decimate2(ref)))
    cur_h = decimate2(src_plane)
    cur_q = decimate2(cur_h)
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
    else:
        seed = np.zeros((b, 2), dtype=np.int64)
    # L0: full resolution around the HME seed, with a zero-centered
    # fallback window (hme_mv_center_check analogue)
    mv_a, cost_a = _exhaustive(ref_padded, src_plane, xa, ya, size,
                               seed, 3 if min(bw, bh) >= 16
                               else max(4, max_range // 2))
    mv_b, cost_b = _exhaustive(ref_padded, src_plane, xa, ya, size,
                               np.zeros((b, 2), dtype=np.int64), 3)
    better = cost_b < cost_a
    mvs = np.where(better[:, None], mv_b, mv_a)
    cost = np.where(better, cost_b, cost_a)
    # clamp so the 8-tap MC window of any refined sub-pel candidate stays
    # inside the padded reference
    H, W = src_plane.shape
    for i in range(b):
        r, c = mc.clamp_mv_for_padding((mvs[i, 0] * 8, mvs[i, 1] * 8),
                                       int(xa[i]), int(ya[i]), bw, bh,
                                       W, H)
        mvs[i, 0], mvs[i, 1] = (r // 8) if r >= 0 else -((-r) // 8), \
            (c // 8) if c >= 0 else -((-c) // 8)
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
