"""Device (JAX/XLA) twin of the inter-frame compute core.

One jitted program per block shape evaluates, for every block of a shape
group at once: hierarchical full-pel ME over the decimated pyramid
(exact twin of ``ops.me.fullpel_search`` — same row-major offset order,
same first-min tie-breaks), quarter-pel refinement, 8-tap MC, the
transform/quant full loop with integer CDF rates, and the {best-MV,
zero-MV} candidate fold. A second program codes chroma with the chosen
MVs, and a third evaluates the compound (LAST+ALT) average candidate.
qindex and lambda are traced [B] operands (``qv``/``lamqv``), never jit
keys — one compiled program serves the whole qp-scaling ladder, rate
control, and per-SB AQ. Because every op is integer, streams are
byte-identical to the host backend.

Reference equivalents: MotionEstimateLcu ``EbMotionEstimation.c:6152``,
inter full loop ``EbCodingLoop.c:552``, jnt convolve compound
``EbInterPrediction.c:290``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from svt_av1_tpu.ops import device as dev  # noqa: E402
from svt_av1_tpu.ops import mc  # noqa: E402
from svt_av1_tpu.ops import me  # noqa: E402
from svt_av1_tpu.ops.device_md import _full_loop_j, _rdcost_j  # noqa: E402
from svt_av1_tpu.pipeline import common, md  # noqa: E402

I64MAX = np.iinfo(np.int64).max


def _exhaustive_j(ref_padded, curs, iy, ix, centers, radius: int):
    """Twin of me._exhaustive: curs [B,bh,bw] int32, iy/ix gather bases,
    centers [B,2]. Returns (mv [B,2], cost [B]), preserving the host's
    row-major first-min tie-break.

    TPU shape: the (bh+2r)x(bw+2r) search window is gathered from the
    frame ONCE per block; the scan then runs ONE sequential step per dy
    ROW with all 2r+1 dx candidates evaluated as a vectorized stack of
    static slices (the former per-offset fori_loop cost (2r+1)^2
    sequential latency steps — the ME chain is latency-bound, not
    flop-bound). Row-major first-min is preserved exactly: argmin picks
    the first dx minimum inside a row, strict-< keeps the earliest dy
    across rows. Offsets whose absolute position leaves the padded frame
    are masked exactly as the host does."""
    from jax import lax
    pad = mc.REF_PAD
    refp = ref_padded.astype(jnp.int32)
    Ht, Wt = refp.shape
    b, bh, bw = curs.shape
    K = 2 * radius + 1
    # window gather (one pass over the frame)
    wy = (iy[:, :1, :1] + (centers[:, 0] - radius + pad)[:, None, None]
          + jnp.arange(bh + 2 * radius)[None, :, None])
    wx = (ix[:, :1, :1] + (centers[:, 1] - radius + pad)[:, None, None]
          + jnp.arange(bw + 2 * radius)[None, None, :])
    win = refp[jnp.clip(wy, 0, Ht - 1), jnp.clip(wx, 0, Wt - 1)]
    dxs = jnp.arange(-radius, radius + 1, dtype=jnp.int64)

    def body(kdy, carry):
        best_cost, best_mv = carry
        dy = kdy - radius
        row = lax.dynamic_slice(win, (0, kdy, 0),
                                (b, bh, bw + 2 * radius))
        cands = jnp.stack([row[:, :, dx:dx + bw] for dx in range(K)])
        sads = jnp.sum(jnp.abs(curs[None] - cands), axis=(2, 3),
                       dtype=jnp.int32).astype(jnp.int64)   # [K, B]
        cy = centers[:, 0] + dy                             # [B]
        cx = centers[:, 1][None, :] + dxs[:, None]          # [K, B]
        valid = (jnp.abs(cy)[None, :] < pad) & (jnp.abs(cx) < pad)
        sads = jnp.where(valid, sads, I64MAX)
        k = jnp.argmin(sads, axis=0)                        # first min
        row_cost = jnp.take_along_axis(sads, k[None], 0)[0]
        row_cx = jnp.take_along_axis(cx, k[None], 0)[0]
        better = row_cost < best_cost
        return (jnp.where(better, row_cost, best_cost),
                jnp.where(better[:, None],
                          jnp.stack([cy, row_cx], axis=1), best_mv))

    best_cost = jnp.full(b, I64MAX, dtype=jnp.int64)
    best_mv = jnp.zeros((b, 2), dtype=jnp.int64)
    return lax.fori_loop(0, K, body, (best_cost, best_mv))[::-1]


def _gather_curs(plane, xs, ys, bw: int, bh: int):
    iy = ys[:, None, None] + jnp.arange(bh)[None, :, None]
    ix = xs[:, None, None] + jnp.arange(bw)[None, None, :]
    return plane[iy, ix].astype(jnp.int32), iy, ix


def fullpel_search_j(ref_pyr, src_pyr, xs, ys, size, max_range: int = 24):
    """Twin of me.fullpel_search (pyramids passed in)."""
    ref_full, ref_h, ref_q = ref_pyr
    src_full, src_h, src_q = src_pyr
    bw, bh = common.leaf_wh(size)
    b = xs.shape[0]
    xs = xs.astype(jnp.int64)
    ys = ys.astype(jnp.int64)
    zero = jnp.zeros((b, 2), dtype=jnp.int64)
    if min(bw, bh) >= 16:
        cq, iyq, ixq = _gather_curs(src_q.astype(jnp.int32), xs >> 2,
                                    ys >> 2, bw >> 2, bh >> 2)
        mv_q, _ = _exhaustive_j(ref_q, cq, iyq, ixq, zero,
                                max(2, max_range // 4))
        ch, iyh, ixh = _gather_curs(src_h.astype(jnp.int32), xs >> 1,
                                    ys >> 1, bw >> 1, bh >> 1)
        mv_h, _ = _exhaustive_j(ref_h, ch, iyh, ixh, mv_q * 2, 2)
        seed = mv_h * 2
        c0, iy0, ix0 = _gather_curs(src_full.astype(jnp.int32), xs, ys,
                                    bw, bh)
        # L0 center check: one probe each at seed and zero, then a single
        # radius-3 window at the better center (twin of host me.py)
        _, c_seed = _exhaustive_j(ref_full, c0, iy0, ix0, seed, 0)
        _, c_zero = _exhaustive_j(ref_full, c0, iy0, ix0, zero, 0)
        center = jnp.where((c_zero < c_seed)[:, None], zero, seed)
        radius0 = 3
    else:
        c0, iy0, ix0 = _gather_curs(src_full.astype(jnp.int32), xs, ys,
                                    bw, bh)
        center = zero
        radius0 = max(4, max_range // 2)
    mvs, cost = _exhaustive_j(ref_full, c0, iy0, ix0, center, radius0)
    # trailing clamp (twin of the vectorized tail of fullpel_search)
    H, W = src_full.shape
    margin = (mc.REF_PAD - 5) << 2
    r8 = jnp.clip(mvs[:, 0] * 8, -(ys << 2) - margin,
                  ((H - ys - bh) << 2) + margin)
    c8 = jnp.clip(mvs[:, 1] * 8, -(xs << 2) - margin,
                  ((W - xs - bw) << 2) + margin)
    return jnp.stack([jnp.sign(r8) * (jnp.abs(r8) // 8),
                      jnp.sign(c8) * (jnp.abs(c8) // 8)], axis=1), cost


def _mc_from_window(win, off_r, off_c, frac_r, frac_c, w: int, h: int,
                    bd: int):
    """8-tap MC over a pre-gathered per-block window [B, h+9, w+9]
    (bit-exact tail of mc_block_batch_j once the global gather is
    factored out): two cheap LOCAL gathers position the (h+7, w+7)
    filter support, then the standard separable filter."""
    from svt_av1_tpu.ops import mc as mch
    b = win.shape[0]
    fx = jnp.asarray(mch._filters(w), jnp.int32)[frac_c]
    fy = jnp.asarray(mch._filters(h), jnp.int32)[frac_r]
    idx_c = off_c[:, None] + jnp.arange(w + 7)
    sub = jnp.take_along_axis(win, idx_c[:, None, :], axis=2)
    idx_r = off_r[:, None] + jnp.arange(h + 7)
    sub = jnp.take_along_axis(sub, idx_r[:, :, None], axis=1)

    offset_bits = bd + 2 * mch.FILTER_BITS - mch.ROUND0
    final_bits = 2 * mch.FILTER_BITS - mch.ROUND0 - mch.ROUND1
    subc = (1 << (offset_bits - mch.ROUND1)) \
        + (1 << (offset_bits - mch.ROUND1 - 1))
    horiz = jnp.full((b, h + 7, w), 1 << (bd + mch.FILTER_BITS - 1),
                     dtype=jnp.int32)
    for k in range(8):
        horiz = horiz + fx[:, k, None, None] * sub[:, :, k:k + w]
    horiz = (horiz + (1 << (mch.ROUND0 - 1))) >> mch.ROUND0
    vert = jnp.full((b, h, w), 1 << offset_bits, dtype=jnp.int32)
    for k in range(8):
        vert = vert + fy[:, k, None, None] * horiz[:, k:k + h]
    res = ((vert + (1 << (mch.ROUND1 - 1))) >> mch.ROUND1) - subc
    if final_bits > 0:
        res = (res + (1 << (final_bits - 1))) >> final_bits
    return jnp.clip(res, 0, (1 << bd) - 1)


def subpel_refine_j(ref_padded, src_full, xs, ys, size, int_mvs,
                    bd: int = 8, steps=(4, 2), ref_idx=None):
    """Twin of me.subpel_refine. The 9 candidate MCs share one window
    gather: candidates drift at most one integer pel from the full-pel
    center, so a [B, h+9, w+9] window covers every filter support.
    ``ref_idx``: optional [B] plane selector when ``ref_padded`` is a
    stacked [R, H, W] bank (per-block winner refinement)."""
    from svt_av1_tpu.ops import mc as mch
    bw, bh = common.leaf_wh(size)
    srcs, _, _ = _gather_curs(src_full.astype(jnp.int32), xs, ys, bw, bh)
    srcs = srcs.astype(jnp.int64)
    mvs = int_mvs.astype(jnp.int64) * 8
    # window around the full-pel position, 1 pel of drift margin +
    # 7 taps (indices into the padded ref are always in range: REF_PAD
    # covers the clamped search area)
    base_r = ys.astype(jnp.int32) + int_mvs[:, 0].astype(jnp.int32)
    base_c = xs.astype(jnp.int32) + int_mvs[:, 1].astype(jnp.int32)
    Ht, Wt = ref_padded.shape[-2:]
    wy = (base_r + mch.REF_PAD - 4)[:, None, None] \
        + jnp.arange(bh + 9)[None, :, None]
    wx = (base_c + mch.REF_PAD - 4)[:, None, None] \
        + jnp.arange(bw + 9)[None, None, :]
    refp = ref_padded.astype(jnp.int32)
    if ref_idx is None:
        win = refp[jnp.clip(wy, 0, Ht - 1), jnp.clip(wx, 0, Wt - 1)]
    else:
        win = refp[ref_idx[:, None, None], jnp.clip(wy, 0, Ht - 1),
                   jnp.clip(wx, 0, Wt - 1)]

    def cost_of(cand):
        scaled_r = cand[:, 0].astype(jnp.int32) << 1
        scaled_c = cand[:, 1].astype(jnp.int32) << 1
        int_r = ys.astype(jnp.int32) + (scaled_r >> 4)
        int_c = xs.astype(jnp.int32) + (scaled_c >> 4)
        off_r = int_r - (base_r - 1)
        off_c = int_c - (base_c - 1)
        pred = _mc_from_window(win, off_r, off_c, scaled_r & 15,
                               scaled_c & 15, bw, bh, bd)
        return jnp.sum((srcs - pred.astype(jnp.int64)) ** 2, axis=(1, 2))

    best_cost = cost_of(mvs)
    for step in steps:
        for oy, ox in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            cand = mvs + jnp.asarray([oy * step, ox * step],
                                     dtype=jnp.int64)
            cost = cost_of(cand)
            better = cost < best_cost
            mvs = jnp.where(better[:, None], cand, mvs)
            best_cost = jnp.where(better, cost, best_cost)
    return mvs


def _clamp_mvs_j(mvs, xs, ys, bw, bh, plane_w, plane_h, ss=0):
    margin = (mc.REF_PAD - 5) << (2 + ss)
    r = jnp.clip(mvs[:, 0], -(ys << (2 + ss)) - margin,
                 ((plane_h - ys - bh) << (2 + ss)) + margin)
    c = jnp.clip(mvs[:, 1], -(xs << (2 + ss)) - margin,
                 ((plane_w - xs - bw) << (2 + ss)) + margin)
    return jnp.stack([r, c], axis=1)


def mc_block_batch_conv_j(ref_padded, xs, ys, mvs, w, h, ss=0, bd=8,
                          ref_idx=None):
    """Device twin of mc.mc_block_batch_conv (CONV-domain compound
    side). ``ref_idx``: optional [B] plane selector when ``ref_padded``
    is a stacked [R, H, W] bank."""
    from svt_av1_tpu.ops import mc as mch
    b = xs.shape[0]
    mvs = mvs.astype(jnp.int64)
    scaled_r = mvs[:, 0] << (1 - ss)
    scaled_c = mvs[:, 1] << (1 - ss)
    int_r = ys.astype(jnp.int64) + (scaled_r >> 4)
    int_c = xs.astype(jnp.int64) + (scaled_c >> 4)
    frac_r = scaled_r & 15
    frac_c = scaled_c & 15
    fx = jnp.asarray(mch._filters(w), jnp.int64)[frac_c]
    fy = jnp.asarray(mch._filters(h), jnp.int64)[frac_r]
    y0 = int_r + mch.REF_PAD - 3
    x0 = int_c + mch.REF_PAD - 3
    iy = y0[:, None, None] + jnp.arange(h + 7)[None, :, None]
    ix = x0[:, None, None] + jnp.arange(w + 7)[None, None, :]
    if ref_idx is not None:
        Wp = ref_padded.shape[-1]
        plane_sz = ref_padded.shape[-1] * ref_padded.shape[-2]
        flat = ref_padded.reshape(-1)
        idx = (iy * Wp + ix
               + (ref_idx.astype(jnp.int64) * plane_sz)[:, None, None])
        win = flat[idx.reshape(b, -1)].reshape(b, h + 7, w + 7)             .astype(jnp.int64)
    else:
        win = ref_padded[iy, ix].astype(jnp.int64)
    offset_bits = bd + 2 * mch.FILTER_BITS - mch.ROUND0
    horiz = jnp.full((b, h + 7, w), 1 << (bd + mch.FILTER_BITS - 1),
                     dtype=jnp.int64)
    for k in range(8):
        horiz = horiz + fx[:, k, None, None] * win[:, :, k:k + w]
    horiz = (horiz + (1 << (mch.ROUND0 - 1))) >> mch.ROUND0
    vert = jnp.full((b, h, w), 1 << offset_bits, dtype=jnp.int64)
    for k in range(8):
        vert = vert + fy[:, k, None, None] * horiz[:, k:k + h]
    return (vert + (1 << (mch.ROUND1_COMP - 1))) >> mch.ROUND1_COMP


def compound_average_j(res0, res1, bd=8):
    offset_bits = bd + 2 * mc.FILTER_BITS - mc.ROUND0
    round_bits = 2 * mc.FILTER_BITS - mc.ROUND0 - mc.ROUND1_COMP
    tmp = (res0.astype(jnp.int64) + res1.astype(jnp.int64)) >> 1
    tmp = tmp - ((1 << (offset_bits - mc.ROUND1_COMP))
                 + (1 << (offset_bits - mc.ROUND1_COMP - 1)))
    tmp = (tmp + (1 << (round_bits - 1))) >> round_bits
    return jnp.clip(tmp, 0, (1 << bd) - 1)


@functools.lru_cache(maxsize=256)
def _build_ref_candidates(size, bd: int, rdoq: bool = False):
    bw, bh = common.leaf_wh(size)
    tx_size = common.tx_size_for_rect(bw, bh, 0)

    def fn(ref_full, ref_h, ref_q, src_full, src_h, src_q, xs, ys, qv,
           lamqv):
        xs = xs.astype(jnp.int64)
        ys = ys.astype(jnp.int64)
        rlq = lamqv if rdoq else None
        H, W = src_full.shape
        int_mvs, _ = fullpel_search_j((ref_full, ref_h, ref_q),
                                      (src_full, src_h, src_q), xs, ys,
                                      size)
        mvs = subpel_refine_j(ref_full, src_full, xs, ys, size, int_mvs,
                              bd=bd)
        zero = jnp.zeros_like(mvs)
        srcs, _, _ = _gather_curs(src_full.astype(jnp.int32), xs, ys,
                                  bw, bh)
        srcs = srcs.astype(jnp.int64)
        best = None
        for cand0 in (mvs, zero):
            cand = _clamp_mvs_j(cand0, xs, ys, bw, bh, W, H)
            pred = dev.mc_block_batch_j(ref_full, xs, ys, cand, bw, bh,
                                        ss=0, bd=bd).astype(jnp.int64)
            qc, eo, rec, dist, rate = _full_loop_j(
                srcs, pred, jnp.zeros(xs.shape[0], dtype=jnp.int32),
                (0,), tx_size, size, qv, bd, 0, rdoq_lam_qv=rlq)
            mv_bits = (2 << md.RATE_Q) \
                + 256 * (jnp.abs(cand).sum(axis=1) > 0)
            cost = _rdcost_j(dist, lamqv, rate + mv_bits)
            if best is None:
                best = [cost, cand, qc, eo, rec]
            else:
                bt = cost < best[0]
                best[0] = jnp.where(bt, cost, best[0])
                best[1] = jnp.where(bt[:, None], cand, best[1])
                best[2] = jnp.where(bt[:, None, None], qc, best[2])
                best[3] = jnp.where(bt, eo, best[3])
                best[4] = jnp.where(bt[:, None, None], rec, best[4])
        return tuple(best)

    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def _build_chroma_code(size, bd: int, ss: int, rdoq: bool = False):
    cw, ch = common.leaf_wh(size)
    tx_uv = common.tx_size_for_rect(cw, ch, 1)

    def fn(refp, xs, ys, mvs, src_plane, qv, lamqv):
        rlq = lamqv if rdoq else None
        srcs, _, _ = _gather_curs(src_plane.astype(jnp.int32),
                                  xs.astype(jnp.int64),
                                  ys.astype(jnp.int64), cw, ch)
        pred = dev.mc_block_batch_j(refp, xs, ys, mvs, cw, ch, ss=ss,
                                    bd=bd).astype(jnp.int64)
        qc, eo, rec, _, _ = _full_loop_j(
            srcs.astype(jnp.int64), pred,
            jnp.zeros(xs.shape[0], dtype=jnp.int32), (0,), tx_uv,
            (cw, ch), qv, bd, 1, rdoq_lam_qv=rlq)
        return qc, eo, rec

    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def _build_chroma_multi(size, n_refs: int, bd: int, rdoq: bool = False):
    """Both chroma planes' single-ref coding in ONE program: the chosen
    reference per block selects from a stacked plane bank (was 2 planes x
    R refs separate round trips)."""
    cw, ch = common.leaf_wh(size)
    tx_uv = common.tx_size_for_rect(cw, ch, 1)

    def fn(*args):
        # args: R u-planes, R v-planes, src_u, src_v, xs, ys, mvs, ridx,
        # qv, lamqv
        uplanes = args[:n_refs]
        vplanes = args[n_refs:2 * n_refs]
        src_u, src_v = args[2 * n_refs], args[2 * n_refs + 1]
        xs, ys, mvs, ridx, qv, lamqv = args[2 * n_refs + 2:]
        rlq = lamqv if rdoq else None
        outs = []
        for bank_planes, srcp in ((uplanes, src_u), (vplanes, src_v)):
            bank = jnp.stack(bank_planes)
            srcs, _, _ = _gather_curs(srcp.astype(jnp.int32),
                                      xs.astype(jnp.int64),
                                      ys.astype(jnp.int64), cw, ch)
            pred = dev.mc_block_batch_j(bank, xs, ys, mvs, cw, ch, ss=1,
                                        bd=bd,
                                        ref_idx=ridx).astype(jnp.int64)
            qc, eo, rec, _, _ = _full_loop_j(
                srcs.astype(jnp.int64), pred,
                jnp.zeros(xs.shape[0], dtype=jnp.int32), (0,), tx_uv,
                (cw, ch), qv, bd, 1, rdoq_lam_qv=rlq)
            pix = jnp.uint8 if bd <= 8 else jnp.uint16
            outs += [qc.astype(jnp.int16), eo.astype(jnp.int16),
                     rec.astype(pix)]
        return tuple(outs)

    return jax.jit(fn)


def chroma_multi_dev(refs_u, refs_v, src_u, src_v, xs, ys, mvs, ridx,
                     size, qp, bd=8, lam=0.0, rdoq=False, qv=None,
                     lamv=None):
    """U+V single-ref chroma coding across the whole ref set, one call.
    Returns (qc_u, eo_u, rec_u, qc_v, eo_v, rec_v), numpy."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    b = len(xs)
    nb = _bucket(b)
    fn = _build_chroma_multi(
        size if isinstance(size, int) else tuple(size), len(refs_u),
        bd, rdoq=rdoq)
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    pdt = _pix_dt(bd)
    args = [_dput(p, pdt) for p in refs_u] + [_dput(p, pdt)
                                              for p in refs_v]
    args += [_dput(src_u, pdt), _dput(src_v, pdt),
             _pad(np.asarray(xs, np.int64), nb, b),
             _pad(np.asarray(ys, np.int64), nb, b),
             _pad(np.asarray(mvs, np.int64), nb, b),
             _pad(np.asarray(ridx, np.int64), nb, b),
             _pad(qvec, nb, b), _pad(lamqv, nb, b)]
    outs = jax.device_get(fn(*args))
    return tuple(o[:b].astype(np.int32 if i % 3 != 2 else np.int64)
                 for i, o in enumerate(outs))


@functools.lru_cache(maxsize=256)
def _build_compound(size, bd: int, ss: int, plane_type: int,
                    rdoq: bool = False):
    bw, bh = common.leaf_wh(size)
    tx = common.tx_size_for_rect(bw, bh, plane_type)

    def fn(ref0, ref1, xs, ys, mv0, mv1, src_plane, qv, lamqv):
        rlq = lamqv if rdoq else None
        srcs, _, _ = _gather_curs(src_plane.astype(jnp.int32),
                                  xs.astype(jnp.int64),
                                  ys.astype(jnp.int64), bw, bh)
        c0 = mc_block_batch_conv_j(ref0, xs, ys, mv0, bw, bh, ss=ss,
                                   bd=bd)
        c1 = mc_block_batch_conv_j(ref1, xs, ys, mv1, bw, bh, ss=ss,
                                   bd=bd)
        pred = compound_average_j(c0, c1, bd).astype(jnp.int64)
        qc, eo, rec, dist, rate = _full_loop_j(
            srcs.astype(jnp.int64), pred,
            jnp.zeros(xs.shape[0], dtype=jnp.int32), (0,), tx,
            (bw, bh), qv, bd, plane_type, rdoq_lam_qv=rlq)
        mv_bits = (3 << md.RATE_Q) \
            + 256 * ((jnp.abs(mv0).sum(axis=1) > 0).astype(jnp.int64)
                     + (jnp.abs(mv1).sum(axis=1) > 0))
        cost = _rdcost_j(dist, lamqv, rate + mv_bits)
        return cost, qc, eo, rec

    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def _build_compound_multi(size, n_refs: int, bd: int, ss: int,
                          planes: int, rdoq: bool = False):
    """Compound coding for every block's own (fwd, bwd) pair in one
    program: per-block pair indices gather from a stacked ref bank (was
    one round trip per distinct pair per plane). planes=1: luma
    (returns cost too); planes=2: U+V."""
    bw, bh = common.leaf_wh(size)

    def fn(*args):
        banks = [jnp.stack(args[p * n_refs:(p + 1) * n_refs])
                 for p in range(planes)]
        srcs_pl = args[planes * n_refs:planes * n_refs + planes]
        xs, ys, mv0, mv1, idx0, idx1, qv, lamqv = \
            args[planes * n_refs + planes:]
        rlq = lamqv if rdoq else None
        outs = []
        for bank, srcp in zip(banks, srcs_pl):
            tx = common.tx_size_for_rect(bw, bh, 1 if ss else 0)
            srcs, _, _ = _gather_curs(srcp.astype(jnp.int32),
                                      xs.astype(jnp.int64),
                                      ys.astype(jnp.int64), bw, bh)
            c0 = mc_block_batch_conv_j(bank, xs, ys, mv0, bw, bh, ss=ss,
                                       bd=bd, ref_idx=idx0)
            c1 = mc_block_batch_conv_j(bank, xs, ys, mv1, bw, bh, ss=ss,
                                       bd=bd, ref_idx=idx1)
            pred = compound_average_j(c0, c1, bd).astype(jnp.int64)
            qc, eo, rec, dist, rate = _full_loop_j(
                srcs.astype(jnp.int64), pred,
                jnp.zeros(xs.shape[0], dtype=jnp.int32), (0,), tx,
                (bw, bh), qv, bd, 1 if ss else 0, rdoq_lam_qv=rlq)
            pix = jnp.uint8 if bd <= 8 else jnp.uint16
            outs += [qc.astype(jnp.int16), eo.astype(jnp.int16),
                     rec.astype(pix)]
            if ss == 0:
                mv_bits = (3 << md.RATE_Q) \
                    + 256 * ((jnp.abs(mv0).sum(axis=1) > 0)
                             .astype(jnp.int64)
                             + (jnp.abs(mv1).sum(axis=1) > 0))
                outs.append(_rdcost_j(dist, lamqv, rate + mv_bits))
        return tuple(outs)

    return jax.jit(fn)


def compound_multi_dev(ref_planes_list, src_planes, xs, ys, mv0, mv1,
                       idx0, idx1, size, qp, lam, bd=8, ss=0,
                       rdoq=False, qv=None, lamv=None):
    """All blocks' compound coding with per-block ref pairs, one call.
    ref_planes_list: [plane][ref] padded planes; src_planes: [plane].
    Luma (ss=0, 1 plane): returns (qc, eo, rec, cost).
    Chroma (ss=1, 2 planes): returns (qc_u, eo_u, rec_u, qc_v, eo_v,
    rec_v)."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    b = len(xs)
    nb = _bucket(b)
    planes = len(src_planes)
    fn = _build_compound_multi(
        size if isinstance(size, int) else tuple(size),
        len(ref_planes_list[0]), bd, ss, planes, rdoq=rdoq)
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    pdt = _pix_dt(bd)
    args = []
    for pl in ref_planes_list:
        args.extend(_dput(p, pdt) for p in pl)
    for sp in src_planes:
        args.append(_dput(sp, pdt))
    args += [_pad(np.asarray(xs, np.int64), nb, b),
             _pad(np.asarray(ys, np.int64), nb, b),
             _pad(np.asarray(mv0, np.int64), nb, b),
             _pad(np.asarray(mv1, np.int64), nb, b),
             _pad(np.asarray(idx0, np.int64), nb, b),
             _pad(np.asarray(idx1, np.int64), nb, b),
             _pad(qvec, nb, b), _pad(lamqv, nb, b)]
    outs = jax.device_get(fn(*args))
    return tuple(o[:b] for o in outs)


_dput_cache = {}


def _dput(a, dt=None):
    """Upload-once cache for big per-frame arrays (ref planes, source
    planes, pyramids): re-uploads cost ~0.1s+ through the tunnel, and the
    same numpy object is passed to many device calls per frame. Entries
    hold a strong ref so id() stays valid; FIFO-capped.

    ``dt``: upload as this dtype (the tunnel moves ~30 MB/s, so pixel
    planes go over the wire at their narrow storage width and are cast
    back on device — int32 source planes cost 4x their information)."""
    if isinstance(a, jax.Array):
        return a                      # already device-resident
    key = (id(a), dt)
    ent = _dput_cache.get(key)
    if ent is not None and ent[0] is a:
        return ent[1]
    d = jax.device_put(a if dt is None or a.dtype == np.dtype(dt)
                       else a.astype(dt))
    if len(_dput_cache) >= 64:
        for k in list(_dput_cache)[:16]:
            del _dput_cache[k]
    _dput_cache[key] = (a, d)
    return d


def _pix_dt(bd: int):
    return np.uint8 if bd <= 8 else np.uint16


def _dput_seq(seq, dt=None):
    return tuple(_dput(a, dt) for a in seq)


def _bucket(b: int) -> int:
    from svt_av1_tpu.ops.device_md import _bucket as _b
    return _b(b)


def _pad(a, nb, b):
    if a is None or nb == b:
        return a
    return np.concatenate([a, np.repeat(a[:1], nb - b, axis=0)], axis=0)


def ref_candidates_dev(ref_pyr, src_pyr, xs, ys, size, qp, lam, bd=8,
                       rdoq=False, qv=None, lamv=None):
    """Twin of inter.InterFrameEncoder._ref_candidates for one reference
    (numpy in/out; jitted device compute)."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    b = len(xs)
    nb = _bucket(b)
    fn = _build_ref_candidates(
        size if isinstance(size, int) else tuple(size), bd, rdoq=rdoq)
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    xs_p = _pad(np.asarray(xs, dtype=np.int64), nb, b)
    ys_p = _pad(np.asarray(ys, dtype=np.int64), nb, b)
    pdt = _pix_dt(bd)
    outs = fn(*_dput_seq(ref_pyr, pdt), *_dput_seq(src_pyr, pdt), xs_p,
              ys_p, _pad(qvec, nb, b), _pad(lamqv, nb, b))
    cost, mv, qc, eo, rec = [np.asarray(o)[:b] for o in outs]
    pix = np.uint16 if bd > 8 else np.uint8
    return [cost.astype(np.int64), mv.astype(np.int64),
            qc.astype(np.int32), eo.astype(np.int32), rec.astype(pix)]


def chroma_code_dev(refp, src_plane, xs, ys, mvs, size, qp, bd=8, ss=1,
                    lam=0.0, rdoq=False, qv=None, lamv=None):
    """Twin of the chroma MC + full loop in inter._encode_blocks."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    b = len(xs)
    nb = _bucket(b)
    fn = _build_chroma_code(
        size if isinstance(size, int) else tuple(size), bd, ss,
        rdoq=rdoq)
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    pdt = _pix_dt(bd)
    outs = jax.device_get(fn(
        _dput(refp, pdt), _pad(np.asarray(xs, np.int64), nb, b),
        _pad(np.asarray(ys, np.int64), nb, b),
        _pad(np.asarray(mvs, np.int64), nb, b), _dput(src_plane, pdt),
        _pad(qvec, nb, b), _pad(lamqv, nb, b)))
    qc, eo, rec = [o[:b] for o in outs]
    return qc.astype(np.int32), eo.astype(np.int32), rec.astype(np.int64)


def compound_code_dev(ref0, ref1, src_plane, xs, ys, mv0, mv1, size, qp,
                      lam, bd=8, ss=0, plane_type=0, rdoq=False,
                      qv=None, lamv=None):
    """Twin of the compound (LAST+ALT) candidate in
    inter._encode_blocks."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    b = len(xs)
    nb = _bucket(b)
    fn = _build_compound(
        size if isinstance(size, int) else tuple(size), bd, ss,
        plane_type, rdoq=rdoq)
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    pdt = _pix_dt(bd)
    outs = jax.device_get(fn(
        _dput(ref0, pdt), _dput(ref1, pdt),
        _pad(np.asarray(xs, np.int64), nb, b),
        _pad(np.asarray(ys, np.int64), nb, b),
        _pad(np.asarray(mv0, np.int64), nb, b),
        _pad(np.asarray(mv1, np.int64), nb, b), _dput(src_plane, pdt),
        _pad(qvec, nb, b), _pad(lamqv, nb, b)))
    cost, qc, eo, rec = [o[:b] for o in outs]
    return (cost.astype(np.int64), qc.astype(np.int32),
            eo.astype(np.int32), rec.astype(np.int64))


# --- pruned-flow primitives (twin of inter._me_rd_pruned's pieces) ------------

@functools.lru_cache(maxsize=256)
def _build_fullpel(size):
    def fn(ref_full, ref_h, ref_q, src_full, src_h, src_q, xs, ys):
        return fullpel_search_j((ref_full, ref_h, ref_q),
                                (src_full, src_h, src_q),
                                xs.astype(jnp.int64),
                                ys.astype(jnp.int64), size)
    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def _build_subpel(size, bd: int):
    def fn(ref_full, src_full, xs, ys, int_mvs):
        return subpel_refine_j(ref_full, src_full, xs.astype(jnp.int64),
                               ys.astype(jnp.int64), size, int_mvs,
                               bd=bd)
    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def _build_single_rd(size, bd: int, rdoq: bool = False):
    """RD of {given (pre-clamped) MV, zero MV} against one reference —
    the tail of _build_ref_candidates with ME factored out."""
    bw, bh = common.leaf_wh(size)
    tx_size = common.tx_size_for_rect(bw, bh, 0)

    def fn(ref_full, src_full, xs, ys, mvs, qv, lamqv):
        xs = xs.astype(jnp.int64)
        ys = ys.astype(jnp.int64)
        rlq = lamqv if rdoq else None
        srcs, _, _ = _gather_curs(src_full.astype(jnp.int32), xs, ys,
                                  bw, bh)
        srcs = srcs.astype(jnp.int64)
        best = None
        for cand in (mvs.astype(jnp.int64),
                     jnp.zeros_like(mvs, dtype=jnp.int64)):
            pred = dev.mc_block_batch_j(ref_full, xs, ys, cand, bw, bh,
                                        ss=0, bd=bd).astype(jnp.int64)
            qc, eo, rec, dist, rate = _full_loop_j(
                srcs, pred, jnp.zeros(xs.shape[0], dtype=jnp.int32),
                (0,), tx_size, size, qv, bd, 0, rdoq_lam_qv=rlq)
            mv_bits = (2 << md.RATE_Q) \
                + 256 * (jnp.abs(cand).sum(axis=1) > 0)
            cost = _rdcost_j(dist, lamqv, rate + mv_bits)
            if best is None:
                best = [cost, cand, qc, eo, rec]
            else:
                bt = cost < best[0]
                best[0] = jnp.where(bt, cost, best[0])
                best[1] = jnp.where(bt[:, None], cand, best[1])
                best[2] = jnp.where(bt[:, None, None], qc, best[2])
                best[3] = jnp.where(bt, eo, best[3])
                best[4] = jnp.where(bt[:, None, None], rec, best[4])
        return tuple(best)

    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def _build_me_rd_multi(size, n_refs: int, bd: int, rdoq: bool = False):
    """Fused multi-reference ME + RD: full-pel HME over every ref,
    quarter-pel refinement, clamp, and the {refined, zero} full-loop RD
    on the per-block winning ref — ONE program where the per-ref loops
    cost 3R+1 tunnel round trips (~60 ms each through the axon link).
    Decisions are bit-identical to the host _me_rd_pruned: same argmin
    tie-breaks, same clamp, same integer RD."""
    bw, bh = common.leaf_wh(size)
    tx_size = common.tx_size_for_rect(bw, bh, 0)

    def fn(*args):
        # args: R pyramids (full, half, quarter each), then src pyramid
        # (3), xs, ys, qv, lamqv
        pyrs = [args[3 * i:3 * i + 3] for i in range(n_refs)]
        src_pyr = args[3 * n_refs:3 * n_refs + 3]
        xs = args[-4].astype(jnp.int64)
        ys = args[-3].astype(jnp.int64)
        qv, lamqv = args[-2], args[-1]
        rlq = lamqv if rdoq else None
        src_full = src_pyr[0]
        H, W = src_full.shape
        fulls, sads = [], []
        for pyr in pyrs:
            mv, sad = fullpel_search_j(pyr, src_pyr, xs, ys, size)
            fulls.append(mv)
            sads.append(sad)
        sads = jnp.stack(sads)                    # [R, B]
        best_all = jnp.argmin(sads, axis=0)       # first-min tie-break
        refined = []
        for i, pyr in enumerate(pyrs):
            mv8 = subpel_refine_j(pyr[0], src_full, xs, ys, size,
                                  fulls[i], bd=bd)
            refined.append(_clamp_mvs_j(mv8, xs, ys, bw, bh, W, H))
        refined = jnp.stack(refined)              # [R, B, 2]
        # single-ref RD on the overall winner, per-block ref gather
        refs_bank = jnp.stack([pyr[0] for pyr in pyrs])   # [R, H+2p, W+2p]
        mv_win = jnp.take_along_axis(
            refined, best_all[None, :, None], axis=0)[0]
        srcs, _, _ = _gather_curs(src_full.astype(jnp.int32), xs, ys,
                                  bw, bh)
        srcs = srcs.astype(jnp.int64)
        best = None
        for cand in (mv_win, jnp.zeros_like(mv_win)):
            pred = dev.mc_block_batch_j(refs_bank, xs, ys, cand, bw, bh,
                                        ss=0, bd=bd,
                                        ref_idx=best_all).astype(jnp.int64)
            qc, eo, rec, dist, rate = _full_loop_j(
                srcs, pred, jnp.zeros(xs.shape[0], dtype=jnp.int32),
                (0,), tx_size, size, qv, bd, 0, rdoq_lam_qv=rlq)
            mv_bits = (2 << md.RATE_Q) \
                + 256 * (jnp.abs(cand).sum(axis=1) > 0)
            cost = _rdcost_j(dist, lamqv, rate + mv_bits)
            if best is None:
                best = [cost, cand, qc, eo, rec]
            else:
                bt = cost < best[0]
                best[0] = jnp.where(bt, cost, best[0])
                best[1] = jnp.where(bt[:, None], cand, best[1])
                best[2] = jnp.where(bt[:, None, None], qc, best[2])
                best[3] = jnp.where(bt, eo, best[3])
                best[4] = jnp.where(bt[:, None, None], rec, best[4])
        # narrow the wire dtypes: the tunnel moves ~45 MB/s plus a fixed
        # per-transfer cost, so the [B, bh, bw] recon going back as
        # int64 costs more than the whole compute; every value fits the
        # narrow type exactly (recon is clipped to bd, MVs are 1/8-pel
        # within the clamp window, SADs < 2^23)
        cost, mv, qc, eo, rec = best
        pix = jnp.uint8 if bd <= 8 else jnp.uint16
        return (sads.astype(jnp.int32), refined.astype(jnp.int16),
                best_all.astype(jnp.int8), cost, mv.astype(jnp.int16),
                qc.astype(jnp.int16), eo.astype(jnp.int16),
                rec.astype(pix))

    return jax.jit(fn)


def me_rd_multi_dev(ref_pyrs_list, src_pyr, xs, ys, size, qp, lam, bd=8,
                    rdoq=False, qv=None, lamv=None):
    """One call for the whole multi-ref ME+RD stage. Returns
    (sads [R,B], refined_mvs [R,B,2], best_all [B], cost [B], mv [B,2],
    qc, eob, rec), numpy."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    b = len(xs)
    nb = _bucket(b)
    fn = _build_me_rd_multi(
        size if isinstance(size, int) else tuple(size),
        len(ref_pyrs_list), bd, rdoq=rdoq)
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    pdt = _pix_dt(bd)
    args = []
    for pyr in ref_pyrs_list:
        args.extend(_dput_seq(pyr[:3], pdt))
    args.extend(_dput_seq(src_pyr[:3], pdt))
    args.append(_pad(np.asarray(xs, np.int64), nb, b))
    args.append(_pad(np.asarray(ys, np.int64), nb, b))
    args.append(_pad(qvec, nb, b))
    args.append(_pad(lamqv, nb, b))
    outs = jax.device_get(fn(*args))
    sads, refined, best_all, cost, mv, qc, eo, rec = outs
    return (sads[:, :b].astype(np.int64),
            refined[:, :b].astype(np.int64),
            best_all[:b].astype(np.int64),
            cost[:b].astype(np.int64), mv[:b].astype(np.int64),
            qc[:b].astype(np.int32), eo[:b].astype(np.int32),
            rec[:b].astype(np.int64))


# --- whole-shape-group fused program -------------------------------------------
# me_rd + compound + winner fold + both chroma planes in ONE dispatch:
# the tunnel costs ~28 ms per blocking fetch, so the former 3-call chain
# (me_rd -> host argmin -> compound -> host fold -> chroma) is collapsed
# by moving the between-call host logic (direction argmins, cost fold,
# ref gather) into the program. Decisions are bit-identical to the
# 3-call path: same argmin tie-breaks, same integer RD, same fold order.

@functools.lru_cache(maxsize=64)
def _build_shape_group(size, n_refs: int, fwd_pos: tuple, bwd_pos: tuple,
                       bd: int, rdoq: bool = False):
    """fwd_pos/bwd_pos: positions of the forward/backward references in
    the sorted ref bank (empty bwd_pos = no compound search)."""
    bw, bh = common.leaf_wh(size)
    cw, ch = bw >> 1, bh >> 1
    tx_size = common.tx_size_for_rect(bw, bh, 0)
    tx_uv = common.tx_size_for_rect(cw, ch, 1)
    ref_sel = bool(fwd_pos) and bool(bwd_pos)
    pix = jnp.uint8 if bd <= 8 else jnp.uint16

    def fn(*args):
        # args: recon y/u/v planes, R luma pyramids (3 each), R u-planes,
        # R v-planes, src pyramid (3), src_u, src_v, xs, ys, qv, lamqv
        rec_y, rec_u, rec_v = args[0:3]
        args = args[3:]
        k = 0
        pyrs = [args[3 * i:3 * i + 3] for i in range(n_refs)]
        k = 3 * n_refs
        ubank = jnp.stack(args[k:k + n_refs])
        vbank = jnp.stack(args[k + n_refs:k + 2 * n_refs])
        k += 2 * n_refs
        src_pyr = args[k:k + 3]
        src_u, src_v = args[k + 3], args[k + 4]
        xs = args[k + 5].astype(jnp.int64)
        ys = args[k + 6].astype(jnp.int64)
        qv, lamqv = args[k + 7], args[k + 8]
        # (padded lanes replicate lane 0, so their recon scatter writes
        # lane 0's own values — harmless duplicates)
        rlq = lamqv if rdoq else None
        b = xs.shape[0]
        src_full = src_pyr[0]
        H, W = src_full.shape

        # --- multi-ref ME (twin of _build_me_rd_multi) ---
        fulls, sads = [], []
        for pyr in pyrs:
            mv, sad = fullpel_search_j(pyr, src_pyr, xs, ys, size)
            fulls.append(mv)
            sads.append(sad)
        sads = jnp.stack(sads)                    # [R, B]
        best_all = jnp.argmin(sads, axis=0)
        refs_bank = jnp.stack([pyr[0] for pyr in pyrs])
        fulls_a = jnp.stack(fulls)                # [R, B, 2]
        ar = jnp.arange(b)

        def refine_for(pos):
            """Sub-pel refine each block against its own winner ref
            (bank-gathered windows) — the host refines exactly the
            winner set (_me_rd_pruned's ``need``), so running one pass
            per winner ROLE instead of one per reference is
            bit-identical with fewer window-filter chains."""
            mv8 = subpel_refine_j(refs_bank, src_full, xs, ys, size,
                                  fulls_a[pos, ar], bd=bd, ref_idx=pos)
            return _clamp_mvs_j(mv8, xs, ys, bw, bh, W, H)

        if ref_sel:
            # per-direction winners first: the overall winner is always
            # one of them (argmin over the full bank restricted to the
            # winning side picks the same first-min entry), so the
            # single-ref candidate needs NO third refinement pass
            fidx = jnp.asarray(fwd_pos)
            bidx = jnp.asarray(bwd_pos)
            fsel = jnp.argmin(sads[fidx], axis=0).astype(jnp.int32)
            bsel = jnp.argmin(sads[bidx], axis=0).astype(jnp.int32)
            fref = fidx[fsel]                       # [B] bank positions
            bref = bidx[bsel]
            mv0a = refine_for(fref)
            mv1a = refine_for(bref)
            fwd_mask = np.zeros(n_refs, dtype=bool)
            fwd_mask[list(fwd_pos)] = True
            is_f = jnp.asarray(fwd_mask)[best_all]
            mv_win = jnp.where(is_f[:, None], mv0a, mv1a)
        else:
            mv_win = refine_for(best_all)
        srcs, _, _ = _gather_curs(src_full.astype(jnp.int32), xs, ys,
                                  bw, bh)
        srcs = srcs.astype(jnp.int64)
        # BOTH single-ref candidates ({refined winner, zero}) through
        # ONE MC + full loop as a [2B] batch: the transform chain's
        # sequential op DEPTH (not width) is the latency wall, so
        # halving the invocation count beats running wider lanes twice.
        # Per-lane math is independent — the fold is bit-identical to
        # the former two-pass strict-< sequence.
        cand2 = jnp.concatenate([mv_win, jnp.zeros_like(mv_win)])
        xs2 = jnp.concatenate([xs, xs])
        ys2 = jnp.concatenate([ys, ys])
        ba2 = jnp.concatenate([best_all, best_all])
        pred2 = dev.mc_block_batch_j(
            refs_bank, xs2, ys2, cand2, bw, bh, ss=0, bd=bd,
            ref_idx=ba2).astype(jnp.int64)
        qc2, eo2, rec2, dist2, rate2 = _full_loop_j(
            jnp.concatenate([srcs, srcs]), pred2,
            jnp.zeros(2 * b, dtype=jnp.int32), (0,), tx_size, size,
            jnp.concatenate([qv, qv]), bd, 0,
            rdoq_lam_qv=None if rlq is None
            else jnp.concatenate([rlq, rlq]))
        mv_bits2 = (2 << md.RATE_Q) \
            + 256 * (jnp.abs(cand2).sum(axis=1) > 0)
        cost2 = _rdcost_j(dist2, jnp.concatenate([lamqv, lamqv]),
                          rate2 + mv_bits2)
        bt = cost2[b:] < cost2[:b]       # zero strictly beats refined
        cost_s = jnp.where(bt, cost2[b:], cost2[:b])
        mv_s = jnp.where(bt[:, None], cand2[b:], cand2[:b])
        qc_s = jnp.where(bt[:, None, None], qc2[b:], qc2[:b])
        eo_s = jnp.where(bt, eo2[b:], eo2[:b])
        rec_s = jnp.where(bt[:, None, None], rec2[b:], rec2[:b])

        # --- compound fold (twin of inter._compound_pairs device path) ---
        comp = jnp.zeros(b, dtype=bool)
        if not ref_sel:
            fsel = jnp.zeros(b, dtype=jnp.int32)
            bsel = jnp.zeros(b, dtype=jnp.int32)
        mv1 = jnp.zeros_like(mv_s)
        pos_chosen = best_all
        if ref_sel:
            c0 = mc_block_batch_conv_j(refs_bank, xs, ys, mv0a, bw, bh,
                                       ss=0, bd=bd, ref_idx=fref)
            c1 = mc_block_batch_conv_j(refs_bank, xs, ys, mv1a, bw, bh,
                                       ss=0, bd=bd, ref_idx=bref)
            pred_c = compound_average_j(c0, c1, bd).astype(jnp.int64)
            qc_c, eo_c, rec_c, dist_c, rate_c = _full_loop_j(
                srcs, pred_c, jnp.zeros(b, dtype=jnp.int32), (0,),
                tx_size, size, qv, bd, 0, rdoq_lam_qv=rlq)
            mv_bits_c = (3 << md.RATE_Q) \
                + 256 * ((jnp.abs(mv0a).sum(axis=1) > 0)
                         .astype(jnp.int64)
                         + (jnp.abs(mv1a).sum(axis=1) > 0))
            cost_c = _rdcost_j(dist_c, lamqv, rate_c + mv_bits_c)
            comp = cost_c < cost_s
            cost_s = jnp.where(comp, cost_c, cost_s)
            mv_s = jnp.where(comp[:, None], mv0a, mv_s)
            qc_s = jnp.where(comp[:, None, None], qc_c, qc_s)
            eo_s = jnp.where(comp, eo_c, eo_s)
            rec_s = jnp.where(comp[:, None, None], rec_c, rec_s)
            mv1 = jnp.where(comp[:, None], mv1a, mv1)
            pos_chosen = jnp.where(comp, fref, best_all)

        # --- chroma, both planes as ONE [2B] batch over a stacked
        # U+V bank (V lanes offset their ref index by n_refs): one MC +
        # one full loop instead of two of each — same per-lane ints
        cxs, cys = xs >> 1, ys >> 1
        cxs2 = jnp.concatenate([cxs, cxs])
        cys2 = jnp.concatenate([cys, cys])
        uvbank = jnp.concatenate([ubank, vbank])
        pos_uv = jnp.concatenate([pos_chosen, pos_chosen + n_refs])
        csrc_u, _, _ = _gather_curs(src_u.astype(jnp.int32), cxs, cys,
                                    cw, ch)
        csrc_v, _, _ = _gather_curs(src_v.astype(jnp.int32), cxs, cys,
                                    cw, ch)
        csrc2 = jnp.concatenate([csrc_u, csrc_v])
        mvs_uv = jnp.concatenate([mv_s, mv_s])
        pred_uv = dev.mc_block_batch_j(
            uvbank, cxs2, cys2, mvs_uv, cw, ch, ss=1, bd=bd,
            ref_idx=pos_uv).astype(jnp.int64)
        if ref_sel:
            fref2 = jnp.concatenate([fref, fref + n_refs])
            bref2 = jnp.concatenate([bref, bref + n_refs])
            u0 = mc_block_batch_conv_j(uvbank, cxs2, cys2, mvs_uv, cw,
                                       ch, ss=1, bd=bd, ref_idx=fref2)
            u1 = mc_block_batch_conv_j(uvbank, cxs2, cys2,
                                       jnp.concatenate([mv1, mv1]), cw,
                                       ch, ss=1, bd=bd, ref_idx=bref2)
            comp2 = jnp.concatenate([comp, comp])
            pred_uv = jnp.where(
                comp2[:, None, None],
                compound_average_j(u0, u1, bd).astype(jnp.int64),
                pred_uv)
        qcuv, eouv, recuv, _, _ = _full_loop_j(
            csrc2.astype(jnp.int64), pred_uv,
            jnp.zeros(2 * b, dtype=jnp.int32), (0,), tx_uv, (cw, ch),
            jnp.concatenate([qv, qv]), bd, 1,
            rdoq_lam_qv=None if rlq is None
            else jnp.concatenate([rlq, rlq]))
        uv_out = [qcuv[:b].astype(jnp.int16), eouv[:b].astype(jnp.int16),
                  recuv[:b].astype(pix),
                  qcuv[b:].astype(jnp.int16), eouv[b:].astype(jnp.int16),
                  recuv[b:].astype(pix)]

        # scatter the block reconstructions into the frame planes: the
        # recon stays device-resident across shape groups and stages
        # (downloads through the tunnel run ~15 MB/s — the round-2
        # architecture fetched every block's pixels per group)
        iy = ys[:, None, None] + jnp.arange(bh)[None, :, None]
        ix = xs[:, None, None] + jnp.arange(bw)[None, None, :]
        rec_y = rec_y.at[iy, ix].set(rec_s.astype(pix))
        ciy = (ys >> 1)[:, None, None] + jnp.arange(ch)[None, :, None]
        cix = (xs >> 1)[:, None, None] + jnp.arange(cw)[None, None, :]
        rec_u = rec_u.at[ciy, cix].set(uv_out[2])
        rec_v = rec_v.at[ciy, cix].set(uv_out[5])
        return (rec_y, rec_u, rec_v,
                cost_s, mv_s.astype(jnp.int16), mv1.astype(jnp.int16),
                pos_chosen.astype(jnp.int8), comp,
                fsel.astype(jnp.int8), bsel.astype(jnp.int8),
                qc_s.astype(jnp.int16), eo_s.astype(jnp.int16)) \
            + tuple(uv_out[:2] + uv_out[3:5])

    return jax.jit(fn)


def shape_group_issue(recon_planes, ref_pyrs_list, refs_u, refs_v,
                      src_pyr, src_u, src_v, xs, ys, size, qp, lam,
                      fwd_pos, bwd_pos, bd=8, rdoq=False, qv=None,
                      lamv=None):
    """Dispatch the fused shape-group program WITHOUT fetching: returns
    ((rec_y, rec_u, rec_v), device_outputs, b). The updated recon planes
    chain into the next group's dispatch (device-resident — the frame's
    pixels never cross the tunnel); callers fetch only the small
    decision outputs, batched across groups."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    b = len(xs)
    nb = _bucket(b)
    fn = _build_shape_group(
        size if isinstance(size, int) else tuple(size),
        len(ref_pyrs_list), tuple(fwd_pos), tuple(bwd_pos), bd,
        rdoq=rdoq)
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    pdt = _pix_dt(bd)
    args = [recon_planes[0], recon_planes[1], recon_planes[2]]
    for pyr in ref_pyrs_list:
        args.extend(_dput_seq(pyr[:3], pdt))
    args.extend(_dput(p, pdt) for p in refs_u)
    args.extend(_dput(p, pdt) for p in refs_v)
    args.extend(_dput_seq(src_pyr[:3], pdt))
    args.append(_dput(src_u, pdt))
    args.append(_dput(src_v, pdt))
    args.append(_pad(np.asarray(xs, np.int64), nb, b))
    args.append(_pad(np.asarray(ys, np.int64), nb, b))
    args.append(_pad(qvec, nb, b))
    args.append(_pad(lamqv, nb, b))
    outs = fn(*args)
    return outs[0:3], outs[3:], b


@functools.lru_cache(maxsize=8)
def _build_ref_prep(shape_y, shape_c, pad: int, bd: int,
                    valid_y=None, valid_c=None):
    """Slot-write reference prep fully on device: edge-replicate padding
    of all three planes + the 1/2 and 1/4 HME pyramid levels (twin of
    mc.pad_reference + me.build_pyramid — same average-4 decimation, so
    device ME results are unchanged). ``valid_y``/``valid_c``: (vh, vw)
    decoder-visible core dims when planes carry bucket-pad bands —
    replication restarts at the core edge (see mc.pad_reference)."""
    def fn(y, u, v):
        def padp(p, valid):
            h, w = p.shape
            if valid is not None and (valid[0] < h or valid[1] < w):
                vh, vw = valid
                return jnp.pad(p[:vh, :vw],
                               ((pad, pad + h - vh), (pad, pad + w - vw)),
                               mode="edge")
            return jnp.pad(p, pad, mode="edge")

        def dec(p):
            h, w = p.shape
            h2, w2 = h & ~1, w & ~1
            q = p[:h2, :w2].astype(jnp.int32)
            return ((q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2]
                     + q[1::2, 1::2] + 2) >> 2).astype(p.dtype)

        py = padp(y, valid_y)
        # pyramid decimations run over the band-corrected full plane
        # (what the host decimates), not the raw slot plane
        yb = py[pad:-pad, pad:-pad]
        d1 = dec(yb)
        d2 = dec(d1)
        return (py,
                padp(u, valid_c),
                padp(v, valid_c),
                jnp.pad(d1, pad, mode="edge"),
                jnp.pad(d2, pad, mode="edge"))

    return jax.jit(fn)


def ref_prep_dev(planes, bd: int = 8, valid_hw=None):
    """Device twin of inter._padded_ref's body for device-resident slot
    planes. Returns (padded [y, u, v], luma pyramid (full, 1/2, 1/4))."""
    vy = vc = None
    if valid_hw is not None:
        vy = (int(valid_hw[0]), int(valid_hw[1]))
        vc = (vy[0] // 2, vy[1] // 2)
    fn = _build_ref_prep(tuple(planes[0].shape), tuple(planes[1].shape),
                         mc.REF_PAD, bd, vy, vc)
    py, pu, pv, ph, pq = fn(planes[0], planes[1], planes[2])
    return [py, pu, pv], (py, ph, pq)


@functools.lru_cache(maxsize=64)
def _build_flip_decision(size, modes: tuple, bd: int,
                         rdoq: bool = False):
    """Intra-flip DECISION pass fully on device: sources are gathered
    from the (cached) device source plane, the prediction edges are
    gathered from the device-resident recon (the former path prepared
    them on host, which forced the recon across the tunnel), and the
    candidate intra predictions are formed by the device predictors.
    Returns per-mode (dist, rate), integer-identical to the host
    predict_any + _full_loop pair."""
    from svt_av1_tpu.ops.device_md import predict_any_j
    from svt_av1_tpu.ops.device_tile import _edges_j
    bw, bh = common.leaf_wh(size)
    tx_size = common.tx_size_for_rect(bw, bh, 0)

    def fn(src_full, recon_y, xs, ys, ha, hl, htr, hbl, mwv, mhv, qv,
           lamqv):
        xs = xs.astype(jnp.int64)
        ys = ys.astype(jnp.int64)
        # per-lane tile right/bottom bounds: edge replication clamps at
        # the TILE edge, consistent with the apply pass and the decoder
        a1, l1 = _edges_j(recon_y, xs, ys, bw, bh, ha, hl, htr, hbl,
                          bd, mwv, mhv)
        rlq = lamqv if rdoq else None
        srcs, _, _ = _gather_curs(src_full.astype(jnp.int32), xs, ys,
                                  bw, bh)
        srcs = srcs.astype(jnp.int64)
        b = xs.shape[0]
        outs = []
        for m in modes:
            pred = predict_any_j(int(m), 0, a1, l1, bw, bh, ha, hl,
                                 bd).astype(jnp.int64)
            _, _, _, dist, rate = _full_loop_j(
                srcs, pred, jnp.zeros(b, dtype=jnp.int32), (0,),
                tx_size, size, qv, bd, 0, rdoq_lam_qv=rlq)
            outs += [dist, rate.astype(jnp.int32)]
        return tuple(outs)

    return jax.jit(fn)


def flip_decision_issue(src_full, recon_y, xs, ys, ha, hl, htr, hbl,
                        modes, size, qp, lam, mwv, mhv, bd=8,
                        rdoq=False, qv=None, lamv=None):
    """Dispatch (no fetch) the on-device flip decision for one shape
    group; returns (device_outs, b). recon_y: device-resident luma recon
    (edges are gathered on device). Gather with jax.device_get, then
    reshape pairs: outs[2i], outs[2i+1] = (dist, rate) of modes[i]."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    b = len(xs)
    nb = _bucket(b)
    fn = _build_flip_decision(
        size if isinstance(size, int) else tuple(size), tuple(modes),
        bd, rdoq=rdoq)
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    pdt = _pix_dt(bd)
    outs = fn(_dput(src_full, pdt), recon_y,
              _pad(np.asarray(xs, np.int64), nb, b),
              _pad(np.asarray(ys, np.int64), nb, b),
              _pad(np.asarray(ha), nb, b), _pad(np.asarray(hl), nb, b),
              _pad(np.asarray(htr), nb, b),
              _pad(np.asarray(hbl), nb, b),
              _pad(np.asarray(mwv, np.int32), nb, b),
              _pad(np.asarray(mhv, np.int32), nb, b),
              _pad(qvec, nb, b), _pad(lamqv, nb, b))
    return outs, b


@functools.lru_cache(maxsize=256)
def _build_flip_rd(size, n_modes: int, bd: int, rdoq: bool = False):
    """Full-loop dist+rate for M intra candidate predictions per block
    in one dispatch (the intra-flip decision pass; predictions are
    cheap host numpy, the transform/quant/rate loop is not)."""
    bw, bh = common.leaf_wh(size)
    tx_size = common.tx_size_for_rect(bw, bh, 0)

    def fn(srcs, preds, qv, lamqv):
        # srcs [B,h,w]; preds [M,B,h,w]; qv/lamqv [B]
        b = srcs.shape[0]
        s2 = jnp.broadcast_to(srcs[None], preds.shape).reshape(
            n_modes * b, bh, bw).astype(jnp.int64)
        p2 = preds.reshape(n_modes * b, bh, bw).astype(jnp.int64)
        qv2 = jnp.broadcast_to(qv[None], (n_modes, b)).reshape(-1)
        lam2 = jnp.broadcast_to(lamqv[None], (n_modes, b)).reshape(-1)
        rlq = lam2 if rdoq else None
        _, _, _, dist, rate = _full_loop_j(
            s2, p2, jnp.zeros(n_modes * b, dtype=jnp.int32), (0,),
            tx_size, size, qv2, bd, 0, rdoq_lam_qv=rlq)
        return (dist.reshape(n_modes, b),
                rate.reshape(n_modes, b).astype(jnp.int32))

    return jax.jit(fn)


def flip_rd_dev(srcs, preds, size, qp, bd=8, lam=0.0, rdoq=False,
                qv=None, lamv=None):
    """dist [M,B] int64, rate [M,B] int64 for stacked candidate
    predictions (numpy in/out)."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    m, b = preds.shape[0], srcs.shape[0]
    nb = _bucket(b)
    fn = _build_flip_rd(size if isinstance(size, int) else tuple(size),
                        m, bd, rdoq=rdoq)
    bw, bh = common.leaf_wh(size)
    sp = np.zeros((nb, bh, bw), np.int16)   # pixels fit int16 wire width
    sp[:b] = srcs
    pp = np.zeros((m, nb, bh, bw), np.int16)
    pp[:, :b] = preds
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    dist, rate = jax.device_get(fn(sp, pp, _pad(qvec, nb, b),
                                   _pad(lamqv, nb, b)))
    return (dist[:, :b].astype(np.int64), rate[:, :b].astype(np.int64))


def fullpel_dev(ref_pyr, src_pyr, xs, ys, size):
    """Twin of me.fullpel_search: (int_mvs, sad), numpy in/out."""
    b = len(xs)
    nb = _bucket(b)
    fn = _build_fullpel(size if isinstance(size, int) else tuple(size))
    pdt = np.uint16   # pixels for either bit depth, half the int32 wire
    mv, sad = jax.device_get(fn(
        *_dput_seq(ref_pyr, pdt), *_dput_seq(src_pyr, pdt),
        _pad(np.asarray(xs, np.int64), nb, b),
        _pad(np.asarray(ys, np.int64), nb, b)))
    return (mv[:b].astype(np.int64), sad[:b].astype(np.int64))


def subpel_dev(ref_full, src_full, xs, ys, int_mvs, size, bd=8):
    """Twin of me.subpel_refine (refined 1/8-pel MVs, unclamped)."""
    b = len(xs)
    nb = _bucket(b)
    fn = _build_subpel(size if isinstance(size, int) else tuple(size), bd)
    pdt = _pix_dt(bd)
    mv = jax.device_get(fn(
        _dput(ref_full, pdt), _dput(src_full, pdt),
        _pad(np.asarray(xs, np.int64), nb, b),
        _pad(np.asarray(ys, np.int64), nb, b),
        _pad(np.asarray(int_mvs, np.int64), nb, b)))
    return mv[:b].astype(np.int64)


def single_rd_dev(ref_full, src_full, xs, ys, mvs, size, qp, lam, bd=8,
                  rdoq=False, qv=None, lamv=None):
    """RD of {refined MV, zero} for one reference subset."""
    from svt_av1_tpu.ops.device_md import quant_vectors
    b = len(xs)
    nb = _bucket(b)
    fn = _build_single_rd(
        size if isinstance(size, int) else tuple(size), bd, rdoq=rdoq)
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    pdt = _pix_dt(bd)
    outs = jax.device_get(fn(
        _dput(ref_full, pdt), _dput(src_full, pdt),
        _pad(np.asarray(xs, np.int64), nb, b),
        _pad(np.asarray(ys, np.int64), nb, b),
        _pad(np.asarray(mvs, np.int64), nb, b),
        _pad(qvec, nb, b), _pad(lamqv, nb, b)))
    cost, mv, qc, eo, rec = [o[:b] for o in outs]
    return [cost.astype(np.int64), mv.astype(np.int64),
            qc.astype(np.int32), eo.astype(np.int32),
            rec.astype(np.int64)]


# --- partition-DP depth analysis (twin of rd.choose_partition_inter's
# depth_cost: ME + SSE of the compensated block as one jitted program per
# depth; reference analogue: the ME-driven MD partition search,
# EbProductCodingLoop.c:2690) ---------------------------------------------------


def _sse_at_j(ref_full, src_full, xs, ys, mvs, bw: int, bh: int):
    """Integer SSE of src[y:y+bh, x:x+bw] vs ref at (y+mv0, x+mv1)."""
    pad = mc.REF_PAD
    iy = ys[:, None, None] + jnp.arange(bh)[None, :, None]
    ix = xs[:, None, None] + jnp.arange(bw)[None, None, :]
    ry = iy + (mvs[:, 0] + pad)[:, None, None]
    rx = ix + (mvs[:, 1] + pad)[:, None, None]
    d = (src_full[iy, ix].astype(jnp.int64)
         - ref_full[ry, rx].astype(jnp.int64))
    return jnp.sum(d * d, axis=(1, 2))


@functools.lru_cache(maxsize=256)
def _build_dp_root(size):
    bw, bh = common.leaf_wh(size)

    def fn(ref_full, ref_h, ref_q, src_full, src_h, src_q, xs, ys):
        mvs, _ = fullpel_search_j((ref_full, ref_h, ref_q),
                                  (src_full, src_h, src_q), xs, ys, size)
        return mvs, _sse_at_j(ref_full, src_full, xs, ys, mvs, bw, bh)

    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def _build_dp_refine(size):
    bw, bh = common.leaf_wh(size)

    def fn(ref_full, src_full, xs, ys, seeds):
        curs, iy, ix = _gather_curs(src_full.astype(jnp.int32), xs, ys,
                                    bw, bh)
        mv_s, c_s = _exhaustive_j(ref_full, curs, iy, ix, seeds, 3)
        mv_z, c_z = _exhaustive_j(ref_full, curs, iy, ix,
                                  jnp.zeros_like(seeds), 3)
        better = c_z < c_s
        mvs = jnp.where(better[:, None], mv_z, mv_s)
        return mvs, _sse_at_j(ref_full, src_full, xs, ys, mvs, bw, bh)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _build_dp_all(w_eff: int, h_eff: int, sizes: tuple, arm_spec: tuple):
    """The WHOLE inter partition DP's device work as one program: every
    depth's seeded square search plus every rect/4:1 arm refine, chained
    on-device (child depths seed from the parent grid via static index
    maps, arms seed from their node's square MV). Replaces ~14 tunnel
    round trips per frame with one. Block grids are trace-time
    constants derived from the frame geometry."""
    def grid(size):
        xs = np.arange(0, w_eff, size)
        ys = np.arange(0, h_eff, size)
        gx, gy = np.meshgrid(xs, ys)
        return gx.reshape(-1), gy.reshape(-1)

    def fn(ref_full, ref_h, ref_q, src_full, src_h, src_q):
        pyr = (ref_full, ref_h, ref_q)
        spyr = (src_full, src_h, src_q)
        outs = []
        parent_mvs = None
        parent_size = None
        for size in sizes:
            gx, gy = grid(size)
            xs = jnp.asarray(gx)
            ys = jnp.asarray(gy)
            bw = bh = size
            if parent_mvs is None:
                mvs, _ = fullpel_search_j(pyr, spyr, xs, ys, size)
            else:
                pcols = (w_eff + parent_size - 1) // parent_size
                sidx = jnp.asarray((gy // parent_size) * pcols
                                   + gx // parent_size)
                seeds = parent_mvs[sidx]
                curs, iy, ix = _gather_curs(src_full.astype(jnp.int32),
                                            xs, ys, bw, bh)
                mv_s, c_s = _exhaustive_j(ref_full, curs, iy, ix, seeds,
                                          3)
                mv_z, c_z = _exhaustive_j(ref_full, curs, iy, ix,
                                          jnp.zeros_like(seeds), 3)
                better = c_z < c_s
                mvs = jnp.where(better[:, None], mv_z, mv_s)
            sse = _sse_at_j(ref_full, src_full, xs, ys, mvs, bw, bh)
            outs += [mvs.astype(jnp.int16), sse]
            # children of the next depth refine around THIS depth's MVs
            # (the host path's parent_mvs seeding — omitting this carry
            # made every depth below the root re-run full HME, which
            # silently diverged from the host DP; round-4 fix)
            parent_mvs = mvs
            parent_size = size
            for (asize, wh, offs) in arm_spec:
                if asize != size:
                    continue
                aw, ah = wh
                xs2 = jnp.asarray(np.concatenate(
                    [gx + dx for dx, _ in offs]))
                ys2 = jnp.asarray(np.concatenate(
                    [gy + dy for _, dy in offs]))
                # out-of-area sub-blocks: clamp the coords for safe
                # gathers; the host masks their costs to inf after
                xs2 = jnp.minimum(xs2, src_full.shape[1] - aw)
                ys2 = jnp.minimum(ys2, src_full.shape[0] - ah)
                rseeds = jnp.concatenate([mvs] * len(offs))
                curs, iy, ix = _gather_curs(src_full.astype(jnp.int32),
                                            xs2, ys2, aw, ah)
                mv_s, c_s = _exhaustive_j(ref_full, curs, iy, ix,
                                          rseeds, 3)
                mv_z, c_z = _exhaustive_j(ref_full, curs, iy, ix,
                                          jnp.zeros_like(rseeds), 3)
                better = c_z < c_s
                amvs = jnp.where(better[:, None], mv_z, mv_s)
                asse = _sse_at_j(ref_full, src_full, xs2, ys2, amvs,
                                 aw, ah)
                outs += [amvs.astype(jnp.int16), asse]
        return tuple(outs)

    return jax.jit(fn), None


def dp_all_dev(ref_pyr, src_pyr, w_eff: int, h_eff: int, sizes,
               arm_spec):
    """Run the fused DP program; returns a dict:
    {size: (mvs, sse), (size, key): (mvs, sse)} (numpy int64)."""
    fn, _ = _build_dp_all(w_eff, h_eff, tuple(sizes),
                          tuple((s, tuple(wh), tuple(offs))
                                for s, wh, offs in arm_spec))
    pdt = np.uint16   # pixels for either bit depth, half the int32 wire
    outs = jax.device_get(fn(*_dput_seq(ref_pyr[:3], pdt),
                             *_dput_seq(src_pyr[:3], pdt)))
    res = {}
    k = 0
    for size in sizes:
        res[size] = (outs[k].astype(np.int64),
                     outs[k + 1].astype(np.int64))
        k += 2
        for (asize, wh, offs) in arm_spec:
            if asize != size:
                continue
            res[(size, tuple(wh))] = (outs[k].astype(np.int64),
                                      outs[k + 1].astype(np.int64))
            k += 2
    return res


def dp_depth_dev(ref_pyr, src_pyr, xs, ys, size, seeds=None):
    """Numpy-in/out wrapper: (mvs [B,2] int64, sse [B] int64)."""
    b = len(xs)
    nb = _bucket(b)
    key = size if isinstance(size, int) else tuple(size)
    xs_p = _pad(np.asarray(xs, np.int64), nb, b)
    ys_p = _pad(np.asarray(ys, np.int64), nb, b)
    pdt = np.uint16   # pixels for either bit depth, half the int32 wire
    if seeds is None:
        fn = _build_dp_root(key)
        mv, sse = jax.device_get(fn(
            *_dput_seq(ref_pyr[:3], pdt), *_dput_seq(src_pyr[:3], pdt),
            xs_p, ys_p))
    else:
        fn = _build_dp_refine(key)
        mv, sse = jax.device_get(fn(
            _dput(ref_pyr[0], pdt), _dput(src_pyr[0], pdt), xs_p, ys_p,
            _pad(np.asarray(seeds, np.int64), nb, b)))
    return (mv[:b].astype(np.int64), sse[:b].astype(np.int64))
