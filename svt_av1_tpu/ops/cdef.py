"""CDEF: constrained directional enhancement filter (normative).

Reference behavior: ``EbCdef.c`` — cdef_find_dir_c (:132), constrain (:103),
cdef_filter_block_c (:205), adjust_strength (:266), cdef_filter_fb (:272),
av1_cdef_frame (:470). Per spec, the filter reads from a copy of the
pre-CDEF (post-deblocking) frame with CDEF_VERY_LARGE outside the frame, so
filtering order cannot matter — which is exactly what makes CDEF
embarrassingly parallel on TPU (BASELINE: "CDEF strength search fully
parallel").

Strength search: per-64x64 choice among a signaled 4-entry strength set by
filtered-SSE vs source (cdef_seg_search analogue, batched per SB).
"""

from __future__ import annotations

import numpy as np

CDEF_VERY_LARGE = 0x4000

PRI_TAPS = ((4, 2), (3, 3))
SEC_TAPS = ((2, 1), (2, 1))

# (dy, dx) per direction, two taps (decomposed from cdef_directions :113)
DIR_OFFSETS = (
    ((-1, 1), (-2, 2)), ((0, 1), (-1, 2)), ((0, 1), (0, 2)),
    ((0, 1), (1, 2)), ((1, 1), (2, 2)), ((1, 0), (2, 1)),
    ((1, 0), (2, 0)), ((1, 0), (2, -1)),
)

_DIV_TABLE = np.array([0, 840, 420, 280, 210, 168, 140, 120, 105])


def find_dir(img: np.ndarray, coeff_shift: int):
    """Direction + variance of one 8x8 block (cdef_find_dir_c :132)."""
    x = (img.astype(np.int64) >> coeff_shift) - 128
    i = np.arange(8)[:, None] * np.ones(8, dtype=int)[None, :]
    j = np.ones(8, dtype=int)[:, None] * np.arange(8)[None, :]
    partial = np.zeros((8, 15), dtype=np.int64)
    idx = [i + j, i + j // 2, i, 3 + i - j // 2, 7 + i - j,
           3 - i // 2 + j, j, i // 2 + j]
    for d in range(8):
        np.add.at(partial[d], idx[d].reshape(-1), x.reshape(-1))
    cost = np.zeros(8, dtype=np.int64)
    cost[2] = np.sum(partial[2, :8] ** 2) * _DIV_TABLE[8]
    cost[6] = np.sum(partial[6, :8] ** 2) * _DIV_TABLE[8]
    for d in (0, 4):
        c = np.sum((partial[d, :7] ** 2 + partial[d, 14:7:-1] ** 2)
                   * _DIV_TABLE[1:8])
        c += partial[d, 7] ** 2 * _DIV_TABLE[8]
        cost[d] = c
    for d in (1, 3, 5, 7):
        c = np.sum(partial[d, 3:8] ** 2) * _DIV_TABLE[8]
        c += np.sum((partial[d, :3] ** 2 + partial[d, 10:7:-1] ** 2)
                    * _DIV_TABLE[2:8:2])
        cost[d] = c
    best_dir = int(np.argmax(cost))  # ties: argmax picks first (> in ref)
    best_cost = int(cost[best_dir])
    var = (best_cost - int(cost[(best_dir + 4) & 7])) >> 10
    return best_dir, var


def _get_msb(v: int) -> int:
    return max(0, int(v).bit_length() - 1)


def adjust_strength(strength: int, var: int) -> int:
    i = min(_get_msb(var >> 6), 12) if (var >> 6) else 0
    return (strength * (4 + i) + 8) >> 4 if var else 0


def _constrain(diff, threshold: int, damping: int):
    if not threshold:
        return np.zeros_like(diff)
    shift = max(0, damping - _get_msb(threshold))
    return np.sign(diff) * np.minimum(
        np.abs(diff), np.maximum(0, threshold - (np.abs(diff) >> shift)))


def filter_block(src: np.ndarray, y0: int, x0: int, h: int, w: int,
                 pri: int, sec: int, direction: int, pri_damping: int,
                 sec_damping: int, coeff_shift: int) -> np.ndarray:
    """Filter one block reading from the padded pre-CDEF copy ``src``
    (int32, CDEF_VERY_LARGE outside); returns the filtered [h, w] block.
    (cdef_filter_block_c :205)."""
    tap_idx = (pri >> coeff_shift) & 1
    pri_taps = PRI_TAPS[tap_idx]
    sec_taps = SEC_TAPS[tap_idx]
    x = src[y0:y0 + h, x0:x0 + w]
    s = np.zeros((h, w), dtype=np.int64)
    mx = x.copy()
    mn = x.copy()

    def tap(dy, dx):
        return src[y0 + dy:y0 + dy + h, x0 + dx:x0 + dx + w]

    for k in range(2):
        for sgn in (1, -1):
            dy, dx = DIR_OFFSETS[direction][k]
            p = tap(sgn * dy, sgn * dx)
            s += pri_taps[k] * _constrain(p - x, pri, pri_damping)
            mx = np.maximum(mx, np.where(p == CDEF_VERY_LARGE, mx, p))
            mn = np.minimum(mn, p)
            for od in (2, 6):
                dy2, dx2 = DIR_OFFSETS[(direction + od) & 7][k]
                q = tap(sgn * dy2, sgn * dx2)
                s += sec_taps[k] * _constrain(q - x, sec, sec_damping)
                mx = np.maximum(mx, np.where(q == CDEF_VERY_LARGE, mx, q))
                mn = np.minimum(mn, q)
    out = x + ((8 + s - (s < 0)) >> 4)
    return np.clip(out, mn, mx)


def _padded_copy(plane: np.ndarray, w_eff: int, h_eff: int) -> np.ndarray:
    """int32 copy with a 3px CDEF_VERY_LARGE border; samples beyond the
    coded (mi) area are also VERY_LARGE."""
    pad = 3
    out = np.full((h_eff + 2 * pad, w_eff + 2 * pad), CDEF_VERY_LARGE,
                  dtype=np.int64)
    out[pad:pad + h_eff, pad:pad + w_eff] = plane[:h_eff, :w_eff]
    return out


def strength_presets(qindex: int):
    """4-entry (y, uv) strength sets (pri*4 + sec six-bit codes), scaled
    with quality; entry 0 is always off."""
    if qindex < 80:
        y = (0, 1 * 4 + 0, 2 * 4 + 1, 4 * 4 + 1)
    elif qindex < 160:
        y = (0, 2 * 4 + 1, 4 * 4 + 1, 7 * 4 + 2)
    else:
        y = (0, 2 * 4 + 1, 5 * 4 + 2, 9 * 4 + 2)
    uv = tuple(min(63, (s // 4 // 2) * 4 + min(s % 4, 3)) for s in y)
    return y, uv


def cdef_frame(recon_planes, skip8: np.ndarray, cdef_idx: np.ndarray,
               y_strengths, uv_strengths, damping: int, mi_rows: int,
               mi_cols: int, bd: int = 8) -> None:
    """Apply CDEF in place. skip8: [h8, w8] bool (all-skip 8x8 luma units);
    cdef_idx: [sb_rows, sb_cols] int (-1 = uncoded/skipped SB)."""
    cs = bd - 8
    w_eff, h_eff = mi_cols * 4, mi_rows * 4
    srcs = [_padded_copy(recon_planes[0], w_eff, h_eff),
            _padded_copy(recon_planes[1], w_eff // 2, h_eff // 2),
            _padded_copy(recon_planes[2], w_eff // 2, h_eff // 2)]
    h8, w8 = (h_eff + 7) // 8, (w_eff + 7) // 8
    sb_rows, sb_cols = cdef_idx.shape
    for sbr in range(sb_rows):
        for sbc in range(sb_cols):
            idx = int(cdef_idx[sbr, sbc])
            if idx < 0:
                continue
            lvl = y_strengths[idx] // 4
            sec = y_strengths[idx] % 4
            sec += int(sec == 3)
            uv_lvl = uv_strengths[idx] // 4
            uv_sec = uv_strengths[idx] % 4
            uv_sec += int(uv_sec == 3)
            if lvl == 0 and sec == 0 and uv_lvl == 0 and uv_sec == 0:
                continue
            for by in range(sbr * 8, min(sbr * 8 + 8, h8)):
                for bx in range(sbc * 8, min(sbc * 8 + 8, w8)):
                    if skip8[by, bx]:
                        continue
                    d, var = find_dir(
                        srcs[0][3 + by * 8:11 + by * 8,
                                3 + bx * 8:11 + bx * 8], cs)
                    pri = adjust_strength(lvl << cs, var)
                    if (lvl << cs) == 0:
                        d = 0
                    out = filter_block(srcs[0], 3 + by * 8, 3 + bx * 8,
                                       8, 8, pri, sec << cs, d,
                                       damping + cs, damping + cs, cs)
                    yl = min(8, h_eff - by * 8)
                    xl = min(8, w_eff - bx * 8)
                    recon_planes[0][by * 8:by * 8 + yl,
                                    bx * 8:bx * 8 + xl] = \
                        np.clip(out[:yl, :xl], 0, (1 << bd) - 1)
                    if uv_lvl == 0 and uv_sec == 0:
                        continue
                    duv = d if (uv_lvl << cs) else 0
                    for p in (1, 2):
                        outc = filter_block(
                            srcs[p], 3 + by * 4, 3 + bx * 4, 4, 4,
                            uv_lvl << cs, uv_sec << cs, duv,
                            damping + cs - 1, damping + cs - 1, cs)
                        cyl = min(4, h_eff // 2 - by * 4)
                        cxl = min(4, w_eff // 2 - bx * 4)
                        recon_planes[p][by * 4:by * 4 + cyl,
                                        bx * 4:bx * 4 + cxl] = \
                            np.clip(outc[:cyl, :cxl], 0, (1 << bd) - 1)


def cdef_search(recon_planes, src_planes, skip8, mi_rows: int, mi_cols: int,
                qindex: int, bd: int = 8):
    """Choose per-SB strength indices by filtered SSE vs source.
    Returns (cdef_idx [sbr, sbc], y_strengths, uv_strengths, damping)."""
    y_str, uv_str = strength_presets(qindex)
    damping = 3 + (qindex >> 6)
    sb_rows = (mi_rows + 15) // 16
    sb_cols = (mi_cols + 15) // 16
    cdef_idx = np.full((sb_rows, sb_cols), -1, dtype=np.int32)
    w_eff, h_eff = mi_cols * 4, mi_rows * 4
    h8, w8 = (h_eff + 7) // 8, (w_eff + 7) // 8
    for sbr in range(sb_rows):
        for sbc in range(sb_cols):
            blocks = [(by, bx)
                      for by in range(sbr * 8, min(sbr * 8 + 8, h8))
                      for bx in range(sbc * 8, min(sbc * 8 + 8, w8))
                      if not skip8[by, bx]]
            if not blocks:
                continue  # all-skip SB: no cdef_idx coded
            best_i, best_sse = 0, None
            for i in range(len(y_str)):
                planes = [recon_planes[0].copy(), recon_planes[1].copy(),
                          recon_planes[2].copy()]
                one = np.full((sb_rows, sb_cols), -1, dtype=np.int32)
                one[sbr, sbc] = i
                cdef_frame(planes, skip8, one, y_str, uv_str, damping,
                           mi_rows, mi_cols, bd)
                sse = 0
                y0, x0 = sbr * 64, sbc * 64
                yl = min(64, h_eff - y0)
                xl = min(64, w_eff - x0)
                d = planes[0][y0:y0 + yl, x0:x0 + xl].astype(np.int64) \
                    - src_planes[0][y0:y0 + yl, x0:x0 + xl]
                sse += int(np.sum(d * d))
                for p in (1, 2):
                    dc = planes[p][y0 // 2:y0 // 2 + yl // 2,
                                   x0 // 2:x0 // 2 + xl // 2] \
                        .astype(np.int64) \
                        - src_planes[p][y0 // 2:y0 // 2 + yl // 2,
                                        x0 // 2:x0 // 2 + xl // 2]
                    sse += int(np.sum(dc * dc))
                if best_sse is None or sse < best_sse:
                    best_i, best_sse = i, sse
            cdef_idx[sbr, sbc] = best_i
    return cdef_idx, y_str, uv_str, damping
