"""Device (JAX/XLA) twin of the CDEF strength search + apply.

One jitted program per (mi dims, bit depth) covers what the host pair
``cdef.cdef_search`` + ``cdef.cdef_frame`` does in ~11 s of NumPy at
1080p: the 8x8 direction search, the filtered-SSE evaluation of all four
signaled strength presets (luma 8x8 + both chroma 4x4 planes), the
per-64x64-SB argmin, and the final filter pass with the chosen
strengths. Everything is integer math, so the returned ``cdef_idx`` map
and filtered planes are bit-identical to the host pair — the bitstream
does not change with the backend.

TPU shape: instead of gathering per-block windows (the host layout),
the whole padded plane is filtered densely per direction (static shifted
slices of the 3px VERY_LARGE-bordered copy), and each pixel selects its
block's direction from the 8 dense results. The four presets reuse the
direction/variance pass; the apply pass is free — it is a per-SB select
over the four preset outputs already computed for the SSE search.

Reference: cdef_find_dir_c/cdef_filter_block_c/cdef_seg_search
(``EbCdef.c:132,205``; segment fan-out ``EbCdefProcess.c:469`` — here the
fan-out is one dense XLA program instead of thread segments).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from svt_av1_tpu.ops import cdef as host
from svt_av1_tpu.ops.device_inter import _dput, _pix_dt

VERY_LARGE = host.CDEF_VERY_LARGE


def _msb_clip(v, kmax: int):
    """floor(log2(v)) for v >= 1, exact, clipped to kmax (0 for v == 0)."""
    ks = jnp.arange(1, kmax + 1, dtype=jnp.int64)
    return jnp.sum(v[..., None] >= (jnp.int64(1) << ks),
                   axis=-1).astype(jnp.int32)


def _constrain_j(diff, thr, damping: int):
    """Per-pixel constrain with a per-pixel threshold map (int32)."""
    shift = jnp.maximum(0, damping - _msb_clip(thr.astype(jnp.int64), 6))
    mag = jnp.minimum(jnp.abs(diff),
                      jnp.maximum(0, thr - (jnp.abs(diff) >> shift)))
    return jnp.where(thr == 0, 0, jnp.sign(diff) * mag)


@functools.lru_cache(maxsize=1)
def _dir_proj():
    """[120, 64] 0/1 projection: partial[d*15+t] = sum of block pixels on
    diagonal t of direction d (host find_dir's np.add.at as a matmul)."""
    i = np.arange(8)[:, None] * np.ones(8, dtype=int)[None, :]
    j = np.ones(8, dtype=int)[:, None] * np.arange(8)[None, :]
    idx = [i + j, i + j // 2, i, 3 + i - j // 2, 7 + i - j,
           3 - i // 2 + j, j, i // 2 + j]
    proj = np.zeros((8 * 15, 64), dtype=np.int32)
    for d in range(8):
        flat = idx[d].reshape(-1)
        for k, t in enumerate(flat):
            proj[d * 15 + t, k] = 1
    return proj


def _find_dir_dense(x8, cs: int):
    """x8: [hb, wb, 8, 8] int32 blocks from the padded copy.
    Returns (dirs [hb, wb] int32, var [hb, wb] int64)."""
    hb, wb = x8.shape[:2]
    x = ((x8 >> cs) - 128).reshape(hb * wb, 64)
    proj = jnp.asarray(_dir_proj().T)            # [64, 120]
    part = jax.lax.dot(x, proj,
                       preferred_element_type=jnp.int32)
    part = part.reshape(hb * wb, 8, 15).astype(jnp.int64)
    div = jnp.asarray(host._DIV_TABLE, dtype=jnp.int64)
    cost = jnp.zeros((hb * wb, 8), dtype=jnp.int64)
    for d in (2, 6):
        cost = cost.at[:, d].set(
            jnp.sum(part[:, d, :8] ** 2, axis=1) * div[8])
    for d in (0, 4):
        c = jnp.sum((part[:, d, :7] ** 2 + part[:, d, 14:7:-1] ** 2)
                    * div[1:8], axis=1)
        cost = cost.at[:, d].set(c + part[:, d, 7] ** 2 * div[8])
    for d in (1, 3, 5, 7):
        c = jnp.sum(part[:, d, 3:8] ** 2, axis=1) * div[8]
        cost = cost.at[:, d].set(c + jnp.sum(
            (part[:, d, :3] ** 2 + part[:, d, 10:7:-1] ** 2)
            * div[2:8:2], axis=1))
    best = jnp.argmax(cost, axis=1)
    bc = jnp.take_along_axis(cost, best[:, None], axis=1)[:, 0]
    oc = jnp.take_along_axis(cost, ((best + 4) & 7)[:, None], axis=1)[:, 0]
    return (best.astype(jnp.int32).reshape(hb, wb),
            ((bc - oc) >> 10).reshape(hb, wb))


def _filter_dense(P, Hd: int, Wd: int, pri_map, sec_map, dir_map,
                  damping, cs: int, blk: int):
    """Dense CDEF over the padded plane P ([Hd+6, Wd+6] int32).
    pri/sec/dir maps are per-pixel [Hd, Wd] int32; damping is a traced
    scalar. Returns the unclipped filtered plane [Hd, Wd] int32
    (host filter_blocks_batch over every block, fused)."""
    x = P[3:3 + Hd, 3:3 + Wd]

    def shifted(dy: int, dx: int):
        return P[3 + dy:3 + dy + Hd, 3 + dx:3 + dx + Wd]

    tap_idx = (pri_map >> cs) & 1
    pri_t = [jnp.where(tap_idx == 0, host.PRI_TAPS[0][k],
                       host.PRI_TAPS[1][k]) for k in range(2)]
    sec_t = [jnp.int32(host.SEC_TAPS[0][k]) for k in range(2)]

    out = jnp.zeros((Hd, Wd), dtype=jnp.int32)
    for d in range(8):
        s_acc = jnp.zeros((Hd, Wd), dtype=jnp.int32)
        mx = x
        mn = x
        for k in range(2):
            for sgn in (1, -1):
                dy, dx = host.DIR_OFFSETS[d][k]
                p = shifted(sgn * dy, sgn * dx)
                s_acc = s_acc + pri_t[k] * _constrain_j(p - x, pri_map,
                                                        damping)
                mx = jnp.maximum(mx, jnp.where(p == VERY_LARGE, mx, p))
                mn = jnp.minimum(mn, p)
                for od in (2, 6):
                    dy2, dx2 = host.DIR_OFFSETS[(d + od) & 7][k]
                    q = shifted(sgn * dy2, sgn * dx2)
                    s_acc = s_acc + sec_t[k] * _constrain_j(
                        q - x, sec_map, damping)
                    mx = jnp.maximum(mx, jnp.where(q == VERY_LARGE, mx, q))
                    mn = jnp.minimum(mn, q)
        od_ = jnp.clip(x + ((8 + s_acc - (s_acc < 0)) >> 4), mn, mx)
        out = jnp.where(dir_map == d, od_, out)
    return out


def _block_expand(m, blk: int, Hd: int, Wd: int):
    """[hb, wb] -> per-pixel [Hd, Wd] (each block constant)."""
    return jnp.repeat(jnp.repeat(m, blk, axis=0), blk, axis=1)


def _block_sse(out, src, mask, blk: int):
    """Per-block masked SSE: [Hd, Wd] -> [hb, wb] int64."""
    Hd, Wd = out.shape
    d = (out - src) * mask
    d = (d.astype(jnp.int64) ** 2).reshape(Hd // blk, blk,
                                           Wd // blk, blk)
    return d.sum(axis=(1, 3))


def _sec_of(code):
    s = code % 4
    return s + (s == 3)


@functools.lru_cache(maxsize=16)
def _build_cdef(mi_rows: int, mi_cols: int, shapes, bd: int):
    """shapes: ((Hy, Wy), (Hc, Wc)) of the stored recon planes."""
    cs = bd - 8
    peak = (1 << bd) - 1
    h_eff, w_eff = mi_rows * 4, mi_cols * 4
    h8, w8 = (h_eff + 7) // 8, (w_eff + 7) // 8
    sb_rows = (mi_rows + 15) // 16
    sb_cols = (mi_cols + 15) // 16
    Hd, Wd = h8 * 8, w8 * 8          # luma grid (>= h_eff/w_eff)
    Hc, Wc = h8 * 4, w8 * 4          # chroma grid

    def padded(plane, He: int, We: int, Hg: int, Wg: int):
        P = jnp.full((Hg + 6, Wg + 6), VERY_LARGE, dtype=jnp.int32)
        return P.at[3:3 + He, 3:3 + We].set(
            plane[:He, :We].astype(jnp.int32))

    def fn(y, u, v, sy, su, sv, skip8, y_str, uv_str, damping):
        Py = padded(y, h_eff, w_eff, Hd, Wd)
        Pu = padded(u, h_eff // 2, w_eff // 2, Hc, Wc)
        Pv = padded(v, h_eff // 2, w_eff // 2, Hc, Wc)
        x8 = Py[3:3 + Hd, 3:3 + Wd].reshape(h8, 8, w8, 8) \
            .transpose(0, 2, 1, 3)
        dirs, var = _find_dir_dense(x8, cs)

        # masked source tiles (valid = inside the coded area)
        ii = jnp.arange(Hd)[:, None]
        jj = jnp.arange(Wd)[None, :]
        val_y = ((ii < h_eff) & (jj < w_eff)).astype(jnp.int32)
        iic = jnp.arange(Hc)[:, None]
        jjc = jnp.arange(Wc)[None, :]
        val_c = ((iic < h_eff // 2) & (jjc < w_eff // 2)) \
            .astype(jnp.int32)
        nskip = ~skip8[:h8, :w8]
        nsk_y = _block_expand(nskip, 8, Hd, Wd).astype(jnp.int32)
        nsk_c = _block_expand(nskip, 4, Hc, Wc).astype(jnp.int32)
        srcy = jnp.zeros((Hd, Wd), jnp.int32) \
            .at[:h_eff, :w_eff].set(sy[:h_eff, :w_eff]
                                    .astype(jnp.int32))
        srcu = jnp.zeros((Hc, Wc), jnp.int32) \
            .at[:h_eff // 2, :w_eff // 2].set(
                su[:h_eff // 2, :w_eff // 2].astype(jnp.int32))
        srcv = jnp.zeros((Hc, Wc), jnp.int32) \
            .at[:h_eff // 2, :w_eff // 2].set(
                sv[:h_eff // 2, :w_eff // 2].astype(jnp.int32))

        # adjust_strength over the whole dir grid, per preset
        v6 = (var >> 6)
        adj = jnp.minimum(_msb_clip(v6, 13), 12)          # [h8, w8]
        outs_y, outs_u, outs_v, totals = [], [], [], []
        for i in range(4):
            lvl = (y_str[i] // 4) << cs
            sec = _sec_of(y_str[i]) << cs
            uvl = (uv_str[i] // 4) << cs
            uvs = _sec_of(uv_str[i]) << cs
            pri = jnp.where(var != 0,
                            (lvl * (4 + adj) + 8) >> 4, 0) \
                .astype(jnp.int32)
            pri = jnp.where(lvl == 0, 0, pri)
            dd = jnp.where(lvl != 0, dirs, 0)
            oy = _filter_dense(Py, Hd, Wd,
                               _block_expand(pri, 8, Hd, Wd),
                               jnp.full((Hd, Wd), sec, jnp.int32),
                               _block_expand(dd, 8, Hd, Wd),
                               damping + cs, cs, 8)
            oy = jnp.clip(oy, 0, peak)
            sse = _block_sse(oy, srcy, val_y * nsk_y, 8)
            duv = jnp.where(uvl != 0, dirs, 0)
            ou_ = _filter_dense(Pu, Hc, Wc,
                                jnp.full((Hc, Wc), uvl, jnp.int32),
                                jnp.full((Hc, Wc), uvs, jnp.int32),
                                _block_expand(duv, 4, Hc, Wc),
                                damping + cs - 1, cs, 4)
            ov_ = _filter_dense(Pv, Hc, Wc,
                                jnp.full((Hc, Wc), uvl, jnp.int32),
                                jnp.full((Hc, Wc), uvs, jnp.int32),
                                _block_expand(duv, 4, Hc, Wc),
                                damping + cs - 1, cs, 4)
            ou_ = jnp.clip(ou_, 0, peak)
            ov_ = jnp.clip(ov_, 0, peak)
            sse = sse + _block_sse(ou_, srcu, val_c * nsk_c, 4)
            sse = sse + _block_sse(ov_, srcv, val_c * nsk_c, 4)
            # per-SB totals (pad the 8x8-block grid to SB multiples)
            pad_r = sb_rows * 8 - h8
            pad_c = sb_cols * 8 - w8
            sse = jnp.pad(sse, ((0, pad_r), (0, pad_c)))
            totals.append(sse.reshape(sb_rows, 8, sb_cols, 8)
                          .sum(axis=(1, 3)))
            outs_y.append(oy)
            outs_u.append(ou_)
            outs_v.append(ov_)

        tot = jnp.stack(totals)                   # [4, sbr, sbc]
        nblk = jnp.pad(nskip.astype(jnp.int32),
                       ((0, sb_rows * 8 - h8), (0, sb_cols * 8 - w8))) \
            .reshape(sb_rows, 8, sb_cols, 8).sum(axis=(1, 3))
        best = jnp.argmin(tot, axis=0).astype(jnp.int32)
        idx_map = jnp.where(nblk > 0, best, -1)

        # apply = select the chosen preset per SB (skip blocks / uncoded
        # SBs / outside the coded area keep the original pixels)
        sel8 = jnp.repeat(jnp.repeat(idx_map, 8, axis=0), 8,
                          axis=1)[:h8, :w8]
        write_y = _block_expand((sel8 >= 0) & nskip, 8, Hd, Wd) \
            & (val_y > 0)
        write_c = _block_expand((sel8 >= 0) & nskip, 4, Hc, Wc) \
            & (val_c > 0)
        sel_y = _block_expand(jnp.maximum(sel8, 0), 8, Hd, Wd)
        sel_c = _block_expand(jnp.maximum(sel8, 0), 4, Hc, Wc)

        def pick(outs, sel):
            st = jnp.stack(outs)
            return jnp.take_along_axis(st, sel[None], axis=0)[0]

        pdty = y.dtype
        oy = jnp.where(write_y, pick(outs_y, sel_y).astype(pdty),
                       y[:Hd, :Wd])
        ou_ = jnp.where(write_c, pick(outs_u, sel_c).astype(pdty),
                        u[:Hc, :Wc])
        ov_ = jnp.where(write_c, pick(outs_v, sel_c).astype(pdty),
                        v[:Hc, :Wc])
        return oy, ou_, ov_, idx_map

    return jax.jit(fn)


def cdef_search_apply_dev(recon_planes, src_planes, skip8, mi_rows: int,
                          mi_cols: int, qindex: int, bd: int = 8):
    """Device twin of host cdef_search + cdef_frame (one dispatch).
    Mutates recon_planes in place; returns (cdef_idx, y_strengths,
    uv_strengths, damping) with integers identical to the host pair."""
    y_str, uv_str = host.strength_presets(qindex)
    damping = 3 + (qindex >> 6)
    h_eff, w_eff = mi_rows * 4, mi_cols * 4
    h8, w8 = (h_eff + 7) // 8, (w_eff + 7) // 8
    Hd, Wd = h8 * 8, w8 * 8
    shapes = (recon_planes[0].shape, recon_planes[1].shape)
    fn = _build_cdef(mi_rows, mi_cols, shapes, bd)
    pdt = _pix_dt(bd)
    sk = np.zeros((h8, w8), dtype=bool)
    sk[:skip8.shape[0], :skip8.shape[1]] = skip8[:h8, :w8]
    outs = fn(
        recon_planes[0].astype(pdt), recon_planes[1].astype(pdt),
        recon_planes[2].astype(pdt),
        _dput(src_planes[0], pdt), _dput(src_planes[1], pdt),
        _dput(src_planes[2], pdt),
        sk, np.asarray(y_str, np.int32), np.asarray(uv_str, np.int32),
        np.int32(damping))
    if isinstance(recon_planes[0], jax.Array):
        oy, ou, ov, idxd = outs
        recon_planes[0] = recon_planes[0].at[:Hd, :Wd].set(oy)
        recon_planes[1] = recon_planes[1].at[:Hd // 2, :Wd // 2].set(ou)
        recon_planes[2] = recon_planes[2].at[:Hd // 2, :Wd // 2].set(ov)
        idx = jax.device_get(idxd)
    else:
        oy, ou, ov, idx = jax.device_get(outs)
        recon_planes[0][:Hd, :Wd] = oy.astype(recon_planes[0].dtype)
        recon_planes[1][:Hd // 2, :Wd // 2] = \
            ou.astype(recon_planes[1].dtype)
        recon_planes[2][:Hd // 2, :Wd // 2] = \
            ov.astype(recon_planes[2].dtype)
    return np.asarray(idx, np.int32), y_str, uv_str, damping
