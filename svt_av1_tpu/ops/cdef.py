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


def find_dir_batch(blocks: np.ndarray, coeff_shift: int):
    """Batched find_dir: [B, 8, 8] -> (dirs [B], vars [B]) — identical
    math to find_dir via one-hot projection sums."""
    B = blocks.shape[0]
    x = (blocks.astype(np.int64) >> coeff_shift) - 128
    i = np.arange(8)[:, None] * np.ones(8, dtype=int)[None, :]
    j = np.ones(8, dtype=int)[:, None] * np.arange(8)[None, :]
    idx = [i + j, i + j // 2, i, 3 + i - j // 2, 7 + i - j,
           3 - i // 2 + j, j, i // 2 + j]
    global _DIR_PROJ
    try:
        proj = _DIR_PROJ
    except NameError:
        proj = np.zeros((8, 15, 64), dtype=np.int64)
        for d in range(8):
            flat = idx[d].reshape(-1)
            for k, t in enumerate(flat):
                proj[d, t, k] = 1
        _DIR_PROJ = proj
    part = np.einsum("dtk,bk->bdt", proj, x.reshape(B, 64))
    cost = np.zeros((B, 8), dtype=np.int64)
    for d in (2, 6):
        cost[:, d] = np.sum(part[:, d, :8] ** 2, axis=1) * _DIV_TABLE[8]
    for d in (0, 4):
        c = np.sum((part[:, d, :7] ** 2 + part[:, d, 14:7:-1] ** 2)
                   * _DIV_TABLE[1:8], axis=1)
        cost[:, d] = c + part[:, d, 7] ** 2 * _DIV_TABLE[8]
    for d in (1, 3, 5, 7):
        c = np.sum(part[:, d, 3:8] ** 2, axis=1) * _DIV_TABLE[8]
        cost[:, d] = c + np.sum(
            (part[:, d, :3] ** 2 + part[:, d, 10:7:-1] ** 2)
            * _DIV_TABLE[2:8:2], axis=1)
    best = np.argmax(cost, axis=1)
    bc = np.take_along_axis(cost, best[:, None], axis=1)[:, 0]
    oc = np.take_along_axis(cost, ((best + 4) & 7)[:, None], axis=1)[:, 0]
    return best.astype(np.int32), ((bc - oc) >> 10).astype(np.int64)


def filter_blocks_batch(src: np.ndarray, ys, xs, h: int, w: int, pri,
                        sec, dirs, pri_damping: int, sec_damping: int,
                        coeff_shift: int) -> np.ndarray:
    """Batched filter_block: per-block strengths/directions, all blocks
    in one pass (identical math; src is the padded pre-CDEF copy so
    blocks are independent)."""
    B = len(ys)
    ys = np.asarray(ys)
    xs = np.asarray(xs)
    pri = np.asarray(pri, dtype=np.int64)
    sec = np.asarray(sec, dtype=np.int64)
    dirs = np.asarray(dirs, dtype=np.int64)
    Wp = src.shape[1]
    flat = src.reshape(-1).astype(np.int64)
    iy = ys[:, None, None] + np.arange(-3, h + 3)[None, :, None] + 3
    ix = xs[:, None, None] + np.arange(-3, w + 3)[None, None, :] + 3
    win = flat[(iy * Wp + ix).reshape(B, -1)].reshape(B, h + 6, w + 6)
    x = win[:, 3:3 + h, 3:3 + w]
    tap_idx = (pri >> coeff_shift) & 1
    offs = np.array(DIR_OFFSETS, dtype=np.int64)       # [8, 2, 2]
    d_off = offs[dirs]                                  # [B, 2, 2]
    pri_t = np.array(PRI_TAPS, dtype=np.int64)[tap_idx]  # [B, 2]
    sec_t = np.array(SEC_TAPS, dtype=np.int64)[tap_idx]
    s_acc = np.zeros((B, h, w), dtype=np.int64)
    mx = x.copy()
    mn = x.copy()

    def gather(dy, dx):
        gy = iy[:, 3:3 + h, :1] + dy[:, None, None]
        gx = ix[:, :1, 3:3 + w] + dx[:, None, None]
        return flat[(gy * Wp + gx).reshape(B, -1)].reshape(B, h, w)

    def constrain_arr(diff, thr, damping):
        thr = np.asarray(thr)
        shift = np.maximum(0, damping - np.where(
            thr > 0, np.floor(np.log2(np.maximum(thr, 1))), 0)
            .astype(np.int64))
        v = np.minimum(np.abs(diff),
                       np.maximum(0, thr - (np.abs(diff) >> shift)))
        return np.where(thr == 0, 0, np.sign(diff) * v)

    pb = pri[:, None, None]
    sb = sec[:, None, None]
    for k in range(2):
        pt = pri_t[:, k, None, None]
        st = sec_t[:, k, None, None]
        for sgn in (1, -1):
            p = gather(sgn * d_off[:, k, 0], sgn * d_off[:, k, 1])
            s_acc += pt * constrain_arr(p - x, pb, pri_damping)
            mx = np.maximum(mx, np.where(p == CDEF_VERY_LARGE, mx, p))
            mn = np.minimum(mn, p)
            for od in (2, 6):
                d2 = offs[(dirs + od) & 7]
                q = gather(sgn * d2[:, k, 0], sgn * d2[:, k, 1])
                s_acc += st * constrain_arr(q - x, sb, sec_damping)
                mx = np.maximum(mx, np.where(q == CDEF_VERY_LARGE, mx, q))
                mn = np.minimum(mn, q)
    out = x + ((8 + s_acc - (s_acc < 0)) >> 4)
    return np.clip(out, mn, mx)


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
    # collect every non-skip 8x8 of every coded SB with its strengths
    bys, bxs, lvls, secs, ulvls, usecs = [], [], [], [], [], []
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
                    bys.append(by)
                    bxs.append(bx)
                    lvls.append(lvl)
                    secs.append(sec)
                    ulvls.append(uv_lvl)
                    usecs.append(uv_sec)
    if not bys:
        return
    bys = np.array(bys)
    bxs = np.array(bxs)
    lvls = np.array(lvls, dtype=np.int64)
    secs = np.array(secs, dtype=np.int64)
    ulvls = np.array(ulvls, dtype=np.int64)
    usecs = np.array(usecs, dtype=np.int64)
    B = len(bys)
    blk = np.stack([srcs[0][3 + y * 8:11 + y * 8, 3 + x * 8:11 + x * 8]
                    for y, x in zip(bys, bxs)])
    dirs, var = find_dir_batch(blk, cs)
    pris = np.array([adjust_strength(int(lvls[i]) << cs, int(var[i]))
                     for i in range(B)], dtype=np.int64)
    dirs = np.where((lvls << cs) == 0, 0, dirs)
    out = filter_blocks_batch(srcs[0], bys * 8, bxs * 8, 8, 8, pris,
                              secs << cs, dirs, damping + cs,
                              damping + cs, cs)
    peak = (1 << bd) - 1
    for i in range(B):
        yl = min(8, h_eff - int(bys[i]) * 8)
        xl = min(8, w_eff - int(bxs[i]) * 8)
        recon_planes[0][bys[i] * 8:bys[i] * 8 + yl,
                        bxs[i] * 8:bxs[i] * 8 + xl] = \
            np.clip(out[i, :yl, :xl], 0, peak)
    csel = np.nonzero((ulvls > 0) | (usecs > 0))[0]
    if len(csel):
        duv = np.where((ulvls[csel] << cs) != 0, dirs[csel], 0)
        for p in (1, 2):
            outc = filter_blocks_batch(
                srcs[p], bys[csel] * 4, bxs[csel] * 4, 4, 4,
                ulvls[csel] << cs, usecs[csel] << cs, duv,
                damping + cs - 1, damping + cs - 1, cs)
            for j, i in enumerate(csel):
                cyl = min(4, h_eff // 2 - int(bys[i]) * 4)
                cxl = min(4, w_eff // 2 - int(bxs[i]) * 4)
                recon_planes[p][bys[i] * 4:bys[i] * 4 + cyl,
                                bxs[i] * 4:bxs[i] * 4 + cxl] = \
                    np.clip(outc[j, :cyl, :cxl], 0, peak)


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
    cs = bd - 8
    srcs = [_padded_copy(recon_planes[0], w_eff, h_eff),
            _padded_copy(recon_planes[1], w_eff // 2, h_eff // 2),
            _padded_copy(recon_planes[2], w_eff // 2, h_eff // 2)]
    # all non-skip blocks of the frame + their SBs
    bys, bxs, sbids = [], [], []
    for sbr in range(sb_rows):
        for sbc in range(sb_cols):
            for by in range(sbr * 8, min(sbr * 8 + 8, h8)):
                for bx in range(sbc * 8, min(sbc * 8 + 8, w8)):
                    if not skip8[by, bx]:
                        bys.append(by)
                        bxs.append(bx)
                        sbids.append(sbr * sb_cols + sbc)
    if not bys:
        return cdef_idx, y_str, uv_str, damping
    bys = np.array(bys)
    bxs = np.array(bxs)
    sbids = np.array(sbids)
    B = len(bys)
    blk = np.stack([srcs[0][3 + y * 8:11 + y * 8, 3 + x * 8:11 + x * 8]
                    for y, x in zip(bys, bxs)])
    dirs0, var = find_dir_batch(blk, cs)

    def stack_src(src_plane, yy, xx, blkdim, hmax, wmax):
        """Loop-invariant per-block source tiles + validity masks so the
        per-strength SSE is a single vectorized expression."""
        nb = len(yy)
        sb = np.zeros((nb, blkdim, blkdim), dtype=np.int64)
        mask = np.zeros((nb, blkdim, blkdim), dtype=np.int64)
        for i in range(nb):
            yl = min(blkdim, hmax - int(yy[i]) * blkdim)
            xl = min(blkdim, wmax - int(xx[i]) * blkdim)
            sb[i, :yl, :xl] = src_plane[yy[i] * blkdim:yy[i] * blkdim + yl,
                                        xx[i] * blkdim:xx[i] * blkdim + xl]
            mask[i, :yl, :xl] = 1
        return sb, mask

    src_y, mask_y = stack_src(src_planes[0], bys, bxs, 8, h_eff, w_eff)
    src_c = [stack_src(src_planes[p], bys, bxs, 4, h_eff // 2, w_eff // 2)
             for p in (1, 2)]

    def block_sse(plane_out, stacked):
        sb, mask = stacked
        d = (plane_out - sb) * mask
        return np.einsum("ijk,ijk->i", d, d)

    # unfiltered chroma SSE is strength-independent: compute once
    sse_unf_c = np.zeros(B, dtype=np.int64)
    unf_c = []
    for pi, p in enumerate((1, 2)):
        unf = np.stack([srcs[p][3 + y * 4:7 + y * 4, 3 + x * 4:7 + x * 4]
                        for y, x in zip(bys, bxs)]).astype(np.int64)
        unf = np.clip(unf, 0, (1 << bd) - 1)
        unf_c.append(unf)
        sse_unf_c += block_sse(unf, src_c[pi])

    n_sb = sb_rows * sb_cols
    totals = np.zeros((len(y_str), n_sb), dtype=np.int64)
    for i in range(len(y_str)):
        lvl = y_str[i] // 4
        sec = y_str[i] % 4
        sec += int(sec == 3)
        uv_lvl = uv_str[i] // 4
        uv_sec = uv_str[i] % 4
        uv_sec += int(uv_sec == 3)
        pris = np.array([adjust_strength(lvl << cs, int(v))
                         for v in var], dtype=np.int64)
        dd = dirs0 if (lvl << cs) else np.zeros(B, dtype=np.int64)
        out = filter_blocks_batch(srcs[0], bys * 8, bxs * 8, 8, 8, pris,
                                  np.full(B, sec << cs), dd,
                                  damping + cs, damping + cs, cs)
        out = np.clip(out, 0, (1 << bd) - 1)
        sse = block_sse(out.astype(np.int64), (src_y, mask_y))
        if uv_lvl or uv_sec:
            duv = dirs0 if (uv_lvl << cs) else np.zeros(B, dtype=np.int64)
            for pi, p in enumerate((1, 2)):
                outc = filter_blocks_batch(
                    srcs[p], bys * 4, bxs * 4, 4, 4,
                    np.full(B, uv_lvl << cs), np.full(B, uv_sec << cs),
                    duv, damping + cs - 1, damping + cs - 1, cs)
                outc = np.clip(outc, 0, (1 << bd) - 1)
                sse += block_sse(outc.astype(np.int64), src_c[pi])
        else:
            sse += sse_unf_c
        np.add.at(totals[i], sbids, sse)
    coded = np.unique(sbids)
    best = np.argmin(totals[:, coded], axis=0)
    cdef_idx.reshape(-1)[coded] = best.astype(np.int32)
    return cdef_idx, y_str, uv_str, damping
