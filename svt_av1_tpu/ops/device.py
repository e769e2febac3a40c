"""JAX/XLA device kernels — the TPU compute path.

Twins of the host NumPy oracles (``ops.txfm1d`` / ``ops.transforms`` /
``ops.quant`` / ``ops.intra``) expressed as jittable int32 tensor programs:

- transforms run the same extracted butterfly networks, vectorized over the
  batch dimension with static gather indices (VPU int ops; stage count is
  static so XLA fully unrolls and fuses),
- quantization is elementwise int32 with the reference's reciprocal trick
  (``EbFullLoop.c:46``),
- intra predictors are batched jnp ops (``EbIntraPrediction.c`` semantics),
- mode decision scores all candidate modes at once and argmins — the
  static-shape replacement for the reference's early-exit fast loop
  (``EbProductCodingLoop.c:1185``; SURVEY.md §7.4.4).

Integer exactness notes: inverse transforms are normative and spec stage
clamps keep every intermediate within int32; the forward side matches the
reference's own int32 SIMD arithmetic. The batch dimension is the TPU lane
axis once batches are large (thousands of TUs per frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops import quant as quant_host
from svt_av1_tpu.ops import transforms as tx_host
from svt_av1_tpu.ops import txfm1d
from svt_av1_tpu.utils.blocks import (DC_PRED, H_PRED, PAETH_PRED,
                                      SMOOTH_H_PRED, SMOOTH_PRED,
                                      SMOOTH_V_PRED, V_PRED, get_scan)


def round_shift(x, bit: int):
    return (x + (1 << (bit - 1))) >> bit


# --- 1D butterfly networks ------------------------------------------------------
@functools.lru_cache(maxsize=128)
def _stage_consts(key: str, cos_bit: int):
    """Resolve a network into per-stage numpy constants:
    (a, b, w0, w1, btf_mask, clamp_mask)."""
    cospi = txfm1d._tables()["cospi"][cos_bit - txfm1d.COS_BIT_MIN]
    out = []
    for a, b, w0, w1, kind in txfm1d._stages(key):
        is_btf = kind == 1
        w0v = np.where(is_btf, np.sign(w0) * cospi[np.abs(w0) - 1], w0)
        w1v = np.where(is_btf, np.sign(w1) * cospi[np.abs(w1) - 1], w1)
        out.append((a.astype(np.int32), b.astype(np.int32),
                    w0v.astype(np.int32), w1v.astype(np.int32),
                    is_btf.astype(bool), (kind == 2).astype(bool)))
    return out


def _exec_network(x, key: str, cos_bit: int, clamp_bit: int):
    """x: [B, N] int32."""
    for a, b, w0, w1, btf, clamp in _stage_consts(key, cos_bit):
        t = jnp.asarray(w0) * x[:, a] + jnp.asarray(w1) * x[:, b]
        t = jnp.where(jnp.asarray(btf), round_shift(t, cos_bit), t)
        if clamp.any():
            lo = -(1 << (clamp_bit - 1))
            hi = (1 << (clamp_bit - 1)) - 1
            t = jnp.where(jnp.asarray(clamp), jnp.clip(t, lo, hi), t)
        x = t
    return x


def _adst4(x, cos_bit: int, inverse: bool):
    sinpi = [int(v) for v in
             txfm1d._tables()["sinpi"][cos_bit - txfm1d.COS_BIT_MIN]]
    x0, x1, x2, x3 = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
    if inverse:
        s0 = sinpi[1] * x0
        s1 = sinpi[2] * x0
        s2 = sinpi[3] * x1
        s3 = sinpi[4] * x2
        s4 = sinpi[1] * x2
        s5 = sinpi[2] * x3
        s6 = sinpi[4] * x3
        s7 = (x0 - x2) + x3
        t0 = s0 + s3 + s5
        t1 = s1 - s4 - s6
        t3 = s2
        t2 = sinpi[3] * s7
        o = [round_shift(t0 + t3, cos_bit), round_shift(t1 + t3, cos_bit),
             round_shift(t2, cos_bit), round_shift(t0 + t1 - t3, cos_bit)]
    else:
        s0 = sinpi[1] * x0
        s1 = sinpi[4] * x0
        s2 = sinpi[2] * x1
        s3 = sinpi[1] * x1
        s4 = sinpi[3] * x2
        s5 = sinpi[4] * x3
        s6 = sinpi[2] * x3
        s7 = (x0 + x1) - x3
        t0 = s0 + s2 + s5
        t1 = sinpi[3] * s7
        t2 = s1 - s3 + s6
        t3 = s4
        o = [round_shift(t0 + t3, cos_bit), round_shift(t1, cos_bit),
             round_shift(t2 - t3, cos_bit),
             round_shift(t2 - t0 + t3, cos_bit)]
    out = jnp.stack(o, axis=1)
    any_nz = jnp.any(x != 0, axis=1, keepdims=True)
    return jnp.where(any_nz, out, 0)


def _identity(x, n: int):
    mult, bits = txfm1d._ID_SCALE[n]
    x = x * mult
    return round_shift(x, bits) if bits else x


def _run_1d(x, kind: str, n: int, cos_bit: int, inverse: bool,
            clamp_bit: int = 0):
    if kind == "identity":
        return _identity(x, n)
    if kind == "adst" and n == 4:
        return _adst4(x, cos_bit, inverse)
    key = ("i" if inverse else "f") + ("dct" if kind == "dct" else "adst") \
        + str(n)
    return _exec_network(x, key, cos_bit, clamp_bit)


def _apply_shift(x, shift: int):
    if shift == 0:
        return x
    if shift > 0:
        return x << shift
    return round_shift(x, -shift)


# --- 2D transforms ---------------------------------------------------------------
def fwd_tx2d(x, tx_type: int, w: int, h: int):
    """Forward 2D transform, device twin of ``transforms.forward_tx2d``.
    x: [B, H, W] int32 residual -> [B, H, W] int32 coefficients."""
    vk, hk, ud_flip, lr_flip = tx_host.tx_cfg(tx_type, w, h)
    shift = tx_host.FWD_SHIFT[(w, h)]
    wi, hi = int(np.log2(w)) - 2, int(np.log2(h)) - 2
    cb_col = tx_host.FWD_COS_BIT_COL[wi][hi]
    cb_row = tx_host.FWD_COS_BIT_ROW[wi][hi]
    b = x.shape[0]
    if ud_flip:
        x = x[:, ::-1, :]
    cols = x.transpose(0, 2, 1).reshape(b * w, h)
    cols = _apply_shift(cols, shift[0])
    cols = _run_1d(cols, vk, h, cb_col, inverse=False)
    cols = _apply_shift(cols, shift[1])
    buf = cols.reshape(b, w, h).transpose(0, 2, 1)
    if lr_flip:
        buf = buf[:, :, ::-1]
    rows = buf.reshape(b * h, w)
    rows = _run_1d(rows, hk, w, cb_row, inverse=False)
    rows = _apply_shift(rows, shift[2])
    if abs(tx_host._rect_type(w, h)) == 1:
        rows = round_shift(rows * txfm1d.NEW_SQRT2, txfm1d.NEW_SQRT2_BITS)
    return rows.reshape(b, h, w)


def inv_tx2d(coeff, tx_type: int, w: int, h: int, bd: int = 8):
    """Normative inverse 2D transform, device twin of
    ``transforms.inverse_tx2d``. coeff: [B, H, W] int32."""
    vk, hk, ud_flip, lr_flip = tx_host.tx_cfg(tx_type, w, h)
    shift = tx_host.INV_SHIFT[(w, h)]
    clamp_row = {8: 16, 10: 18, 12: 20}[bd]
    clamp_col = {8: 16, 10: 16, 12: 18}[bd]
    b = coeff.shape[0]
    rows = coeff.reshape(b * h, w)
    if abs(tx_host._rect_type(w, h)) == 1:
        rows = round_shift(rows * txfm1d.NEW_INV_SQRT2,
                           txfm1d.NEW_SQRT2_BITS)
    rows = jnp.clip(rows, -(1 << (bd + 7)), (1 << (bd + 7)) - 1)
    rows = _run_1d(rows, hk, w, tx_host.INV_COS_BIT, inverse=True,
                   clamp_bit=clamp_row)
    rows = _apply_shift(rows, shift[0])
    buf = rows.reshape(b, h, w)
    if lr_flip:
        buf = buf[:, :, ::-1]
    cb = max(bd + 6, 16)
    cols = buf.transpose(0, 2, 1).reshape(b * w, h)
    cols = jnp.clip(cols, -(1 << (cb - 1)), (1 << (cb - 1)) - 1)
    cols = _run_1d(cols, vk, h, tx_host.INV_COS_BIT, inverse=True,
                   clamp_bit=clamp_col)
    cols = _apply_shift(cols, shift[1])
    out = cols.reshape(b, w, h).transpose(0, 2, 1)
    if ud_flip:
        out = out[:, ::-1, :]
    return out


# --- quantization ----------------------------------------------------------------
def quantize(coeff, scan: np.ndarray, qp: quant_host.QuantParams,
             log_scale: int):
    """Device twin of ``quant.quantize``. coeff: [B, n] int32 raster.
    Returns (qcoeff, dqcoeff, eob)."""
    n = coeff.shape[1]
    is_dc = np.zeros(n, dtype=bool)
    is_dc[0] = True

    def rpot(v):
        return ((v + ((1 << log_scale) >> 1)) >> log_scale) if log_scale \
            else v
    zbin = np.where(is_dc, rpot(qp.zbin[0]), rpot(qp.zbin[1]))
    rnd = np.where(is_dc, rpot(qp.round[0]), rpot(qp.round[1]))
    quant = np.where(is_dc, qp.quant[0], qp.quant[1]).astype(np.int32)
    qshift = np.where(is_dc, qp.quant_shift[0],
                      qp.quant_shift[1]).astype(np.int32)
    deq = np.where(is_dc, qp.dequant[0], qp.dequant[1]).astype(np.int32)

    sign = jnp.where(coeff < 0, -1, 1)
    abs_c = jnp.abs(coeff)
    over = abs_c >= jnp.asarray(zbin)[None, :]
    tmp = jnp.clip(abs_c + jnp.asarray(rnd)[None, :], -32768, 32767)
    tmp32 = ((((tmp * jnp.asarray(quant)[None, :]) >> 16) + tmp)
             * jnp.asarray(qshift)[None, :]) >> (16 - log_scale)
    tmp32 = jnp.where(over, tmp32, 0)
    qcoeff = sign * tmp32
    dqcoeff = sign * ((tmp32 * jnp.asarray(deq)[None, :]) >> log_scale)
    nz_scan = tmp32[:, scan] != 0
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)
    eob = jnp.max(jnp.where(nz_scan, idx[None, :], 0), axis=1)
    return qcoeff, dqcoeff, eob


@functools.lru_cache(maxsize=4)
def _quant_tables_np(bd: int):
    """Per-qindex quantizer parameter tables [256, 2] (DC, AC) —
    the whole av1_build_quantizer parameter space as constants so the
    quantizer can take qindex as a TRACED operand (one compiled program
    serves every qindex instead of one per (shape, qindex) key)."""
    zbin = np.zeros((256, 2), np.int64)
    rnd = np.zeros((256, 2), np.int64)
    quant = np.zeros((256, 2), np.int64)
    qshift = np.zeros((256, 2), np.int64)
    deq = np.zeros((256, 2), np.int64)
    for q in range(256):
        qp = quant_host.make_quant_params(q, bit_depth=bd)
        zbin[q] = qp.zbin
        rnd[q] = qp.round
        quant[q] = qp.quant
        qshift[q] = qp.quant_shift
        deq[q] = qp.dequant
    return zbin, rnd, quant, qshift, deq


def quantize_qv(coeff, scan: np.ndarray, qv, log_scale: int, bd: int):
    """``quantize`` with a traced per-block qindex vector ``qv`` [B].
    Bit-identical to the static-qindex twin (same integer tables, same
    expressions); per-block parameters come from device-side lookups.
    Returns (qcoeff, dqcoeff, eob)."""
    n = coeff.shape[1]
    tz, tr, tq, ts, td = (jnp.asarray(t) for t in _quant_tables_np(bd))
    qv = qv.astype(jnp.int32)
    is_dc = np.zeros((1, n), dtype=bool)
    is_dc[0, 0] = True
    is_dc = jnp.asarray(is_dc)

    def rpot(v):
        return ((v + ((1 << log_scale) >> 1)) >> log_scale) if log_scale \
            else v

    def sel(tab):                      # [B, n] per-position parameter
        row = tab[qv]                  # [B, 2]
        return jnp.where(is_dc, row[:, 0:1], row[:, 1:2])

    zbin = rpot(sel(tz))
    rnd = rpot(sel(tr))
    quant = sel(tq)
    qshift = sel(ts)
    deq = sel(td)

    sign = jnp.where(coeff < 0, -1, 1)
    abs_c = jnp.abs(coeff)
    over = abs_c >= zbin
    tmp = jnp.clip(abs_c + rnd, -32768, 32767)
    tmp32 = ((((tmp * quant) >> 16) + tmp) * qshift) >> (16 - log_scale)
    tmp32 = jnp.where(over, tmp32, 0)
    qcoeff = sign * tmp32
    dqcoeff = sign * ((tmp32 * deq) >> log_scale)
    nz_scan = tmp32[:, scan] != 0
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)
    eob = jnp.max(jnp.where(nz_scan, idx[None, :], 0), axis=1)
    return qcoeff, dqcoeff, eob


# --- intra predictors -------------------------------------------------------------
def _sm_weights(n: int):
    return jnp.asarray(intra_sm_weights(n), dtype=jnp.int32)


@functools.lru_cache(maxsize=8)
def intra_sm_weights(n: int) -> np.ndarray:
    from svt_av1_tpu.ops.intra import _SM_WEIGHTS
    return _SM_WEIGHTS[n].astype(np.int32)


def predict_modes(modes: tuple, above, left, top_left, have_above, have_left,
                  bw: int, bh: int, bd: int = 8):
    """All candidate intra predictions at once: returns [M, B, bh, bw].

    above [B, >=bw], left [B, >=bh], top_left [B] int32; have_* [B] bool.
    """
    base = 1 << (bd - 1)
    a = above[:, None, :bw]
    l = left[:, :bh, None]
    tl = top_left[:, None, None]
    b = above.shape[0]
    preds = []
    for mode in modes:
        if mode == DC_PRED:
            sum_a = jnp.sum(above[:, :bw], axis=1)
            sum_l = jnp.sum(left[:, :bh], axis=1)
            both = (sum_a + sum_l + ((bw + bh) >> 1)) // (bw + bh)
            only_a = (sum_a + (bw >> 1)) >> int(np.log2(bw))
            only_l = (sum_l + (bh >> 1)) >> int(np.log2(bh))
            avg = jnp.where(have_above & have_left, both,
                            jnp.where(have_above, only_a,
                                      jnp.where(have_left, only_l, base)))
            p = jnp.broadcast_to(avg[:, None, None], (b, bh, bw))
        elif mode == V_PRED:
            p = jnp.broadcast_to(a, (b, bh, bw))
        elif mode == H_PRED:
            p = jnp.broadcast_to(l, (b, bh, bw))
        elif mode == PAETH_PRED:
            pbase = a + l - tl
            pa = jnp.abs(pbase - a)
            pl_ = jnp.abs(pbase - l)
            ptl = jnp.abs(pbase - tl)
            p = jnp.where((pl_ <= pa) & (pl_ <= ptl),
                          jnp.broadcast_to(l, (b, bh, bw)),
                          jnp.where(pa <= ptl,
                                    jnp.broadcast_to(a, (b, bh, bw)),
                                    jnp.broadcast_to(tl, (b, bh, bw))))
        elif mode == SMOOTH_PRED:
            wh = _sm_weights(bh)[None, :, None]
            ww = _sm_weights(bw)[None, None, :]
            below = left[:, bh - 1][:, None, None]
            right = above[:, bw - 1][:, None, None]
            s = (wh * a + (256 - wh) * below + ww * l + (256 - ww) * right)
            p = round_shift(s, 9)
        elif mode == SMOOTH_V_PRED:
            wh = _sm_weights(bh)[None, :, None]
            below = left[:, bh - 1][:, None, None]
            s = wh * a + (256 - wh) * below
            p = round_shift(s, 8)
        elif mode == SMOOTH_H_PRED:
            ww = _sm_weights(bw)[None, None, :]
            right = above[:, bw - 1][:, None, None]
            s = ww * l + (256 - ww) * right
            p = round_shift(s, 8)
        else:
            raise NotImplementedError(f"device intra mode {mode}")
        preds.append(p)
    return jnp.stack(preds, axis=0)


def mode_decision_sse(modes: tuple, src, above, left, top_left,
                      have_above, have_left, bw: int, bh: int, bd: int = 8):
    """Batched open-loop mode decision: [B] best-mode index + SSE cost.

    src [B, bh, bw] int32. Returns (best_idx [B], preds [M, B, bh, bw],
    costs [M, B]).
    """
    preds = predict_modes(modes, above, left, top_left, have_above,
                          have_left, bw, bh, bd)
    diff = src[None] - preds
    costs = jnp.sum(diff * diff, axis=(2, 3))
    best = jnp.argmin(costs, axis=0)
    return best, preds, costs


# --- inter core: full-pel ME + MC + transform/quant over a frame -------------------
@functools.partial(jax.jit, static_argnames=("size", "search_range",
                                             "search_step", "qindex", "bd"))
def inter_core_step(cur, ref_padded, size: int = 16, search_range: int = 16,
                    search_step: int = 2, qindex: int = 160, bd: int = 8):
    """The inter encode compute core for one frame, fully batched: full-pel
    SAD search over a static offset grid, motion compensation (full-pel),
    residual DCT + quant + recon distortion.

    cur: [H, W] int32 (H, W multiples of ``size``); ref_padded: padded by
    ``search_range``. The reference's equivalent is the ME + EncDec inter
    hot path (EbMotionEstimation.c / EbCodingLoop.c); here the whole frame
    is one XLA program (SURVEY.md §2.2: inter has no in-frame deps).
    Returns (best_mv [B,2] pels, qcoeff [B,n], eob [B], sse [B]).
    """
    H, W = cur.shape
    bh, bw = H // size, W // size
    pad = search_range
    offsets = [(dy, dx)
               for dy in range(-search_range, search_range + 1, search_step)
               for dx in range(-search_range, search_range + 1, search_step)]
    sads = []
    for dy, dx in offsets:
        shifted = jax.lax.dynamic_slice(ref_padded, (pad + dy, pad + dx),
                                        (H, W))
        d = jnp.abs(cur - shifted)
        sads.append(d.reshape(bh, size, bw, size).sum(axis=(1, 3)))
    sads = jnp.stack(sads)                                   # [O, bh, bw]
    best = jnp.argmin(sads, axis=0).reshape(-1)              # [B]
    offs = jnp.asarray(np.array(offsets, dtype=np.int32))    # [O, 2]
    best_mv = offs[best]                                     # [B, 2]

    ys = (jnp.arange(bh * bw, dtype=jnp.int32) // bw) * size
    xs = (jnp.arange(bh * bw, dtype=jnp.int32) % bw) * size
    rows = (ys + best_mv[:, 0] + pad)[:, None, None] \
        + jnp.arange(size)[None, :, None]
    cols = (xs + best_mv[:, 1] + pad)[:, None, None] \
        + jnp.arange(size)[None, None, :]
    pred = ref_padded[rows, cols]                            # [B, s, s]
    srcs = cur.reshape(bh, size, bw, size).transpose(0, 2, 1, 3) \
        .reshape(-1, size, size)
    resid = srcs - pred
    coeffs = fwd_tx2d(resid, 0, size, size)
    cw = min(32, size)
    coded = coeffs[:, :cw, :cw].reshape(coeffs.shape[0], -1)
    from svt_av1_tpu.utils.blocks import MAX_TX_SIZE_OF_BLOCK
    tx_size = MAX_TX_SIZE_OF_BLOCK[size]
    scan = get_scan(tx_size, 0)
    qp = quant_host.make_quant_params(qindex, bit_depth=bd)
    log_scale = quant_host.tx_scale(tx_size)
    qcoeff, dqcoeff, eob = quantize(coded, scan, qp, log_scale)
    full = jnp.zeros_like(coeffs)
    full = full.at[:, :cw, :cw].set(dqcoeff.reshape(-1, cw, cw))
    r = inv_tx2d(full, 0, size, size, bd)
    recon = jnp.clip(pred + r, 0, (1 << bd) - 1)
    sse = jnp.sum((srcs - recon) ** 2, axis=(1, 2))
    return best_mv, qcoeff, eob, sse


# --- fused analysis step ------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("modes", "size", "qindex", "bd"))
def intra_analysis_step(src, above, left, top_left, have_above, have_left,
                        modes: tuple = (DC_PRED, V_PRED, H_PRED, SMOOTH_PRED,
                                        PAETH_PRED),
                        size: int = 16, qindex: int = 160, bd: int = 8):
    """The flagship fused device step: batched intra mode decision +
    forward transform + quantize + dequantize + inverse transform + recon
    distortion for a batch of same-sized blocks.

    This is the compute core of the encoder's fast+full loop
    (reference: EbProductCodingLoop.c fast/full loops) as one fused XLA
    program. Returns (best_mode_idx, qcoeff, eob, sse).
    """
    best, preds, _ = mode_decision_sse(modes, src, above, left, top_left,
                                       have_above, have_left, size, size, bd)
    bsel = jnp.take_along_axis(
        preds, best[None, :, None, None], axis=0)[0]          # [B, s, s]
    resid = src - bsel
    coeffs = fwd_tx2d(resid, 0, size, size)
    cw = min(32, size)
    coded = coeffs[:, :cw, :cw].reshape(coeffs.shape[0], -1)
    from svt_av1_tpu.utils.blocks import MAX_TX_SIZE_OF_BLOCK
    tx_size = MAX_TX_SIZE_OF_BLOCK[size]
    scan = get_scan(tx_size, 0)
    qp = quant_host.make_quant_params(qindex, bit_depth=bd)
    log_scale = quant_host.tx_scale(tx_size)
    qcoeff, dqcoeff, eob = quantize(coded, scan, qp, log_scale)
    full = jnp.zeros_like(coeffs)
    full = full.at[:, :cw, :cw].set(dqcoeff.reshape(-1, cw, cw))
    r = inv_tx2d(full, 0, size, size, bd)
    recon = jnp.clip(bsel + r, 0, (1 << bd) - 1)
    sse = jnp.sum((src - recon) ** 2, axis=(1, 2))
    return best, qcoeff, eob, sse


# --- CDEF device twins ---------------------------------------------------------
# (direction search + 8x8 filter batched over every block of a frame; the
# host oracles are ops/cdef.find_dir / filter_block. Partial-sum
# projections are expressed as dense [8, 15, 64] one-hot matmuls — the
# MXU-friendly form of the reference's scatter loops, cdef_find_dir_c
# EbCdef.c:132.)

@functools.lru_cache(maxsize=1)
def _cdef_dir_consts():
    from svt_av1_tpu.ops.cdef import _DIV_TABLE
    i = np.arange(8)[:, None] * np.ones(8, dtype=int)[None, :]
    j = np.ones(8, dtype=int)[:, None] * np.arange(8)[None, :]
    idx = [i + j, i + j // 2, i, 3 + i - j // 2, 7 + i - j,
           3 - i // 2 + j, j, i // 2 + j]
    proj = np.zeros((8, 15, 64), dtype=np.int32)
    for d in range(8):
        flat = idx[d].reshape(-1)
        for k, t in enumerate(flat):
            proj[d, t, k] = 1
    return proj, np.array(_DIV_TABLE, dtype=np.int64)


def cdef_find_dir_batch(blocks, coeff_shift: int):
    """Directions + variances for [B, 8, 8] blocks (device twin of
    ops.cdef.find_dir)."""
    proj, div = _cdef_dir_consts()
    x = (blocks.astype(jnp.int64) >> coeff_shift) - 128
    xf = x.reshape(-1, 64)                             # [B, 64]
    # partial[d] = proj[d] @ x : [B, 8, 15]
    part = jnp.einsum("dtk,bk->bdt", jnp.asarray(proj, jnp.int64), xf)
    cost = []
    for d in range(8):
        p = part[:, d]
        if d in (2, 6):
            c = jnp.sum(p[:, :8] ** 2, axis=1) * div[8]
        elif d in (0, 4):
            c = jnp.sum((p[:, :7] ** 2 + p[:, 14:7:-1] ** 2)
                        * jnp.asarray(div[1:8]), axis=1)
            c = c + p[:, 7] ** 2 * div[8]
        else:
            c = jnp.sum(p[:, 3:8] ** 2, axis=1) * div[8]
            c = c + jnp.sum((p[:, :3] ** 2 + p[:, 10:7:-1] ** 2)
                            * jnp.asarray(div[2:8:2]), axis=1)
        cost.append(c)
    cost = jnp.stack(cost, axis=1)                     # [B, 8]
    best = jnp.argmax(cost, axis=1)
    bc = jnp.take_along_axis(cost, best[:, None], axis=1)[:, 0]
    oc = jnp.take_along_axis(cost, ((best + 4) & 7)[:, None], axis=1)[:, 0]
    return best.astype(jnp.int32), ((bc - oc) >> 10).astype(jnp.int64)


def _cdef_constrain(diff, threshold, damping):
    from svt_av1_tpu.ops.cdef import _DIV_TABLE  # noqa: F401 (parity)
    adiff = jnp.abs(diff)
    sign = jnp.sign(diff)
    shift = jnp.maximum(0, damping - _msb_arr(threshold))
    v = jnp.minimum(adiff, jnp.maximum(
        0, threshold - (adiff >> shift)))
    return jnp.where(threshold == 0, 0, sign * v)


def _msb_arr(v):
    """floor(log2(v)) for v >= 1 (0 -> 0), elementwise."""
    v = jnp.maximum(v, 1)
    return (jnp.log2(v.astype(jnp.float32)) + 1e-6).astype(jnp.int32)


def cdef_filter_blocks(windows, pri, sec, dirs, pri_damping: int,
                       sec_damping: int, coeff_shift: int):
    """Filter [B, 8+6, 8+6] padded windows (3px CDEF_VERY_LARGE borders)
    with per-block strengths/directions (device twin of
    ops.cdef.filter_block for 8x8 blocks)."""
    from svt_av1_tpu.ops.cdef import (CDEF_VERY_LARGE, DIR_OFFSETS,
                                      PRI_TAPS, SEC_TAPS)
    b = windows.shape[0]
    w = windows.astype(jnp.int64)
    x = w[:, 3:11, 3:11]
    offs = np.array(DIR_OFFSETS, dtype=np.int32)       # [8, 2, 2]
    pri_t = np.array(PRI_TAPS, dtype=np.int64)         # [2, 2]
    sec_t = np.array(SEC_TAPS, dtype=np.int64)
    tap_idx = (pri >> coeff_shift) & 1
    s = jnp.zeros((b, 8, 8), dtype=jnp.int64)
    mx = x
    mn = x

    def gather(dy, dx):
        """Per-block shifted 8x8 window: dy/dx [B] ints."""
        iy = 3 + dy[:, None, None] + jnp.arange(8)[None, :, None]
        ix = 3 + dx[:, None, None] + jnp.arange(8)[None, None, :]
        flat = w.reshape(b, -1)
        lin = iy * windows.shape[2] + ix
        return jnp.take_along_axis(flat, lin.reshape(b, -1),
                                   axis=1).reshape(b, 8, 8)

    offs_j = jnp.asarray(offs)
    d_off = offs_j[dirs]                               # [B, 2, 2]
    pri_b = pri.astype(jnp.int64)[:, None, None]
    sec_b = sec.astype(jnp.int64)[:, None, None]
    for k in range(2):
        ptap = jnp.asarray(pri_t)[tap_idx, k][:, None, None]
        stap = jnp.asarray(sec_t)[tap_idx, k][:, None, None]
        for sgn in (1, -1):
            p = gather(sgn * d_off[:, k, 0], sgn * d_off[:, k, 1])
            s = s + ptap * _cdef_constrain(p - x, pri_b, pri_damping)
            mx = jnp.maximum(mx, jnp.where(p == CDEF_VERY_LARGE, mx, p))
            mn = jnp.minimum(mn, p)
            for od in (2, 6):
                d2 = offs_j[(dirs + od) & 7]
                q = gather(sgn * d2[:, k, 0], sgn * d2[:, k, 1])
                s = s + stap * _cdef_constrain(q - x, sec_b, sec_damping)
                mx = jnp.maximum(mx, jnp.where(q == CDEF_VERY_LARGE,
                                               mx, q))
                mn = jnp.minimum(mn, q)
    out = x + ((8 + s - (s < 0)) >> 4)
    return jnp.clip(out, mn, mx)


# --- Loop restoration device twins ---------------------------------------------
# (Wiener separable 7-tap and self-guided box filters over batched
# stripe windows; host oracles in ops/restoration.py. The SGR box sums
# are cumulative-sum window reductions — the natural TPU formulation of
# the reference's integral-image SIMD, selfguided_avx2.)

def _round2j(x, n: int):
    if n == 0:
        return x
    return (x + (1 << (n - 1))) >> n


def wiener_filter_batch(src_ext, taps_v, taps_h, bd: int = 8):
    """[B, h+6, w+6] windows -> [B, h, w] (twin of
    restoration.wiener_filter; taps are static python triples)."""
    from svt_av1_tpu.ops import restoration as rst
    fv = np.asarray(rst.wiener_taps7(taps_v))
    fh = np.asarray(rst.wiener_taps7(taps_h))
    r0 = 3 if bd < 12 else 5
    r1 = 2 * rst.WIENER_FILT_PREC_BITS - r0
    h = src_ext.shape[1] - 6
    w = src_ext.shape[2] - 6
    s = src_ext.astype(jnp.int64)
    hsum = jnp.full((src_ext.shape[0], h + 6, w),
                    1 << (bd + rst.WIENER_FILT_PREC_BITS - 1),
                    dtype=jnp.int64)
    for k in range(7):
        hsum = hsum + int(fh[k]) * s[:, :, k:k + w]
    mid = jnp.clip(_round2j(hsum, r0), 0,
                   (1 << (bd + 1 + rst.WIENER_FILT_PREC_BITS - r0)) - 1)
    vsum = jnp.zeros((src_ext.shape[0], h, w), dtype=jnp.int64)
    for k in range(7):
        vsum = vsum + int(fv[k]) * mid[:, k:k + h]
    vsum = vsum - (1 << (bd + r1 - 1))
    return jnp.clip(_round2j(vsum, r1), 0, (1 << bd) - 1)


def _winsum_j(x, r: int):
    """Batched full-window sums [B, H, W] -> [B, H-2r, W-2r]."""
    n = 2 * r + 1
    v = jnp.cumsum(x, axis=1)
    v = jnp.concatenate([v[:, n - 1:n], v[:, n:] - v[:, :-n]], axis=1)
    hs = jnp.cumsum(v, axis=2)
    return jnp.concatenate([hs[:, :, n - 1:n],
                            hs[:, :, n:] - hs[:, :, :-n]], axis=2)


def _sgr_ab_j(dgd_ext, r: int, s: int, h: int, w: int, bd: int):
    from svt_av1_tpu.ops import restoration as rst
    d = dgd_ext.astype(jnp.int64)
    a_full = _winsum_j(d * d, r)
    b_full = _winsum_j(d, r)
    i0 = 2 - r
    A = a_full[:, i0:i0 + h + 2, i0:i0 + w + 2]
    B = b_full[:, i0:i0 + h + 2, i0:i0 + w + 2]
    n = (2 * r + 1) * (2 * r + 1)
    a = _round2j(A, 2 * (bd - 8))
    b = _round2j(B, bd - 8)
    p = jnp.maximum(a * n - b * b, 0)
    z = _round2j(p * s, rst.SGRPROJ_MTABLE_BITS)
    A2 = jnp.asarray(rst._X_BY_XPLUS1)[jnp.minimum(z, 255)]
    B2 = _round2j((256 - A2) * B * int(rst._ONE_BY_X[n - 1]),
                  rst.SGRPROJ_RECIP_BITS)
    return A2, B2


def sgr_filter_batch(dgd_ext, ep: int, xqd, bd: int = 8):
    """[B, h+6, w+6] -> [B, h, w] (twin of restoration.sgr_filter;
    ep/xqd static)."""
    from svt_av1_tpu.ops import restoration as rst
    (r0, r1), (s0, s1) = rst.SGR_PARAMS[ep]
    h = dgd_ext.shape[1] - 6
    w = dgd_ext.shape[2] - 6
    d = dgd_ext[:, 3:3 + h, 3:3 + w].astype(jnp.int64)
    u = d << rst.SGRPROJ_RST_BITS
    v = u << rst.SGRPROJ_PRJ_BITS
    xq = rst.decode_xq(xqd, ep)
    m = slice(1, w + 1)
    lf, rt = slice(0, w), slice(2, w + 2)
    if r0 > 0:
        A, B = _sgr_ab_j(dgd_ext, r0, s0, h, w, bd)
        out = jnp.zeros((dgd_ext.shape[0], h, w), dtype=jnp.int64)
        ev = np.arange(0, h, 2)
        a = (A[:, ev][:, :, m] + A[:, ev + 2][:, :, m]) * 6 + \
            (A[:, ev][:, :, lf] + A[:, ev][:, :, rt]
             + A[:, ev + 2][:, :, lf] + A[:, ev + 2][:, :, rt]) * 5
        bb = (B[:, ev][:, :, m] + B[:, ev + 2][:, :, m]) * 6 + \
            (B[:, ev][:, :, lf] + B[:, ev][:, :, rt]
             + B[:, ev + 2][:, :, lf] + B[:, ev + 2][:, :, rt]) * 5
        out = out.at[:, 0::2].set(_round2j(
            a * d[:, 0::2] + bb,
            rst.SGRPROJ_SGR_BITS + 5 - rst.SGRPROJ_RST_BITS))
        od = np.arange(1, h, 2) + 1
        a = A[:, od][:, :, m] * 6 + (A[:, od][:, :, lf]
                                     + A[:, od][:, :, rt]) * 5
        bb = B[:, od][:, :, m] * 6 + (B[:, od][:, :, lf]
                                      + B[:, od][:, :, rt]) * 5
        out = out.at[:, 1::2].set(_round2j(
            a * d[:, 1::2] + bb,
            rst.SGRPROJ_SGR_BITS + 4 - rst.SGRPROJ_RST_BITS))
        v = v + xq[0] * (out - u)
    if r1 > 0:
        A, B = _sgr_ab_j(dgd_ext, r1, s1, h, w, bd)
        c = slice(1, h + 1)
        up, dn = slice(0, h), slice(2, h + 2)
        a = (A[:, c, m] + A[:, c, lf] + A[:, c, rt] + A[:, up, m]
             + A[:, dn, m]) * 4 + \
            (A[:, up, lf] + A[:, up, rt] + A[:, dn, lf]
             + A[:, dn, rt]) * 3
        bb = (B[:, c, m] + B[:, c, lf] + B[:, c, rt] + B[:, up, m]
              + B[:, dn, m]) * 4 + \
            (B[:, up, lf] + B[:, up, rt] + B[:, dn, lf]
             + B[:, dn, rt]) * 3
        flt = _round2j(a * d + bb,
                       rst.SGRPROJ_SGR_BITS + 5 - rst.SGRPROJ_RST_BITS)
        v = v + xq[1] * (flt - u)
    out = _round2j(v, rst.SGRPROJ_PRJ_BITS + rst.SGRPROJ_RST_BITS)
    return jnp.clip(out, 0, (1 << bd) - 1)


# --- Pallas: fused quantize+dequantize kernel ----------------------------------
# The hot elementwise chain of the full loop as a hand kernel (the role
# of the reference's highbd_quantize_intrin_avx2): one VMEM pass computes
# qcoeff and dqcoeff for a [B, n] tile of transform blocks. Falls back to
# the XLA `quantize` above when Pallas is unavailable on the platform.

def _quant_kernel(coeff_ref, zbin_ref, rnd_ref, quant_ref, qshift_ref,
                  deq_ref, q_ref, dq_ref, *, log_scale: int):
    c = coeff_ref[...]
    sign = jnp.where(c < 0, -1, 1)
    ac = jnp.abs(c)
    over = ac >= zbin_ref[...]
    tmp = jnp.clip(ac + rnd_ref[...], -32768, 32767)
    t32 = ((((tmp * quant_ref[...]) >> 16) + tmp)
           * qshift_ref[...]) >> (16 - log_scale)
    t32 = jnp.where(over, t32, 0)
    q_ref[...] = sign * t32
    dq_ref[...] = sign * ((t32 * deq_ref[...]) >> log_scale)


def quantize_pallas(coeff, scan: np.ndarray, qp: quant_host.QuantParams,
                    log_scale: int):
    """Pallas-backed twin of ``quantize`` (same contract)."""
    import functools as _ft

    from jax.experimental import pallas as pl
    b, n = coeff.shape
    is_dc = np.zeros(n, dtype=bool)
    is_dc[0] = True

    def rpot(v):
        return ((v + ((1 << log_scale) >> 1)) >> log_scale) if log_scale \
            else v
    rows = {
        "zbin": np.where(is_dc, rpot(qp.zbin[0]), rpot(qp.zbin[1])),
        "rnd": np.where(is_dc, rpot(qp.round[0]), rpot(qp.round[1])),
        "quant": np.where(is_dc, qp.quant[0], qp.quant[1]),
        "qshift": np.where(is_dc, qp.quant_shift[0], qp.quant_shift[1]),
        "deq": np.where(is_dc, qp.dequant[0], qp.dequant[1]),
    }
    ops = [jnp.broadcast_to(jnp.asarray(v, jnp.int32)[None, :], (b, n))
           for v in rows.values()]
    kern = _ft.partial(_quant_kernel, log_scale=log_scale)
    # Mosaic kernels only compile for TPU; on the CPU test mesh fall
    # back to the interpreter (bit-identical semantics, slower).
    interp = jax.default_backend() == "cpu"
    q, dq = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((b, n), jnp.int32),
                   jax.ShapeDtypeStruct((b, n), jnp.int32)),
        interpret=interp,
    )(coeff.astype(jnp.int32), *ops)
    nz_scan = q[:, scan] != 0
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)
    eob = jnp.max(jnp.where(nz_scan, idx[None, :], 0), axis=1)
    return q, dq, eob


# --- Motion compensation device twin -------------------------------------------
# (8/4-tap sub-pel convolve batched over blocks with data-dependent MVs;
# host oracle ops/mc.mc_block_batch. Windows are gathered per block from
# the padded reference; filter rows are gathered by sub-pel phase.)

def mc_block_batch_j(ref_padded, xs, ys, mvs, w: int, h: int,
                     ss: int = 0, bd: int = 8, ref_idx=None):
    """Device twin of mc.mc_block_batch: [B] blocks, [B, 2] MVs in
    1/8-pel luma units. Returns [B, h, w] pixels (int32).
    ``ref_idx``: optional [B] plane selector when ``ref_padded`` is a
    stacked [R, H, W] bank (per-block reference choice in one gather)."""
    from svt_av1_tpu.ops import mc as mch
    b = xs.shape[0]
    mvs = mvs.astype(jnp.int32)
    scaled_r = mvs[:, 0] << (1 - ss)
    scaled_c = mvs[:, 1] << (1 - ss)
    int_r = ys.astype(jnp.int32) + (scaled_r >> 4)
    int_c = xs.astype(jnp.int32) + (scaled_c >> 4)
    frac_r = scaled_r & 15
    frac_c = scaled_c & 15
    fx_tab = jnp.asarray(mch._filters(w), jnp.int32)
    fy_tab = jnp.asarray(mch._filters(h), jnp.int32)
    fx = fx_tab[frac_c]                                  # [B, 8]
    fy = fy_tab[frac_r]
    Wp = ref_padded.shape[-1]
    flat = ref_padded.reshape(-1).astype(jnp.int32)
    y0 = int_r + mch.REF_PAD - 3
    x0 = int_c + mch.REF_PAD - 3
    iy = y0[:, None, None] + jnp.arange(h + 7)[None, :, None]
    ix = x0[:, None, None] + jnp.arange(w + 7)[None, None, :]
    idx = iy * Wp + ix
    if ref_idx is not None:
        plane_sz = ref_padded.shape[-1] * ref_padded.shape[-2]
        idx = idx + (ref_idx.astype(jnp.int32)
                     * plane_sz)[:, None, None]
    win = flat[idx.reshape(b, -1)].reshape(b, h + 7, w + 7)

    offset_bits = bd + 2 * mch.FILTER_BITS - mch.ROUND0
    final_bits = 2 * mch.FILTER_BITS - mch.ROUND0 - mch.ROUND1
    sub = (1 << (offset_bits - mch.ROUND1)) \
        + (1 << (offset_bits - mch.ROUND1 - 1))
    horiz = jnp.full((b, h + 7, w), 1 << (bd + mch.FILTER_BITS - 1),
                     dtype=jnp.int32)
    for k in range(8):
        horiz = horiz + fx[:, k, None, None] * win[:, :, k:k + w]
    horiz = (horiz + (1 << (mch.ROUND0 - 1))) >> mch.ROUND0
    vert = jnp.full((b, h, w), 1 << offset_bits, dtype=jnp.int32)
    for k in range(8):
        vert = vert + fy[:, k, None, None] * horiz[:, k:k + h]
    res = ((vert + (1 << (mch.ROUND1 - 1))) >> mch.ROUND1) - sub
    if final_bits > 0:
        res = (res + (1 << (final_bits - 1))) >> final_bits
    return jnp.clip(res, 0, (1 << bd) - 1)


# --- DLF device twin -----------------------------------------------------------
# (the 4/6/8/14-tap edge filters over batched sample lines [N, 14];
# host oracle ops/dlf._apply_len. Adjacent same-direction edges never
# overlap — filter span is bounded by the minimum tx dim — so whole-frame
# application is one batched gather/filter/scatter.)

def _dlf_filter4_j(p1, p0, q0, q1, mask, thresh, bd):
    shift = bd - 8
    lo, hi, piv = -128 << shift, (128 << shift) - 1, 128 << shift

    def sc(x):
        return jnp.clip(x, lo, hi)

    ps1, ps0 = p1 - piv, p0 - piv
    qs0, qs1 = q0 - piv, q1 - piv
    hev = (jnp.abs(p1 - p0) > thresh) | (jnp.abs(q1 - q0) > thresh)
    f = sc(ps1 - qs1) * hev
    f = sc(f + 3 * (qs0 - ps0)) * mask
    f1 = sc(f + 4) >> 3
    f2 = sc(f + 3) >> 3
    oq0 = sc(qs0 - f1) + piv
    op0 = sc(ps0 + f2) + piv
    f3 = ((f1 + 1) >> 1) * ~hev
    oq1 = sc(qs1 - f3) + piv
    op1 = sc(ps1 + f3) + piv
    return op1, op0, oq0, oq1


def dlf_apply_len_batch(s, length: int, blimit: int, limit: int,
                        thresh: int, bd: int = 8):
    """Device twin of dlf._apply_len: s [N, 14] int32 sample lines
    (p6..p0, q0..q6); returns the filtered lines."""
    p = {i: s[:, 6 - i] for i in range(7)}
    q = {i: s[:, 7 + i] for i in range(7)}
    am = lambda a, b: jnp.abs(a - b)  # noqa: E731

    def r3(x):
        return (x + 4) >> 3

    def r4(x):
        return (x + 8) >> 4

    if length == 4:
        fmask = ~((am(p[1], p[0]) > limit) | (am(q[1], q[0]) > limit)
                  | (am(p[0], q[0]) * 2 + am(p[1], q[1]) // 2 > blimit))
        np1, np0, nq0, nq1 = _dlf_filter4_j(p[1], p[0], q[0], q[1],
                                            fmask, thresh, bd)
        for idx, v in ((5, np1), (6, np0), (7, nq0), (8, nq1)):
            s = s.at[:, idx].set(jnp.where(fmask, v, s[:, idx]))
        return s

    if length == 6:
        fmask = ~((am(p[2], p[1]) > limit) | (am(p[1], p[0]) > limit)
                  | (am(q[1], q[0]) > limit) | (am(q[2], q[1]) > limit)
                  | (am(p[0], q[0]) * 2 + am(p[1], q[1]) // 2 > blimit))
        ft = 1 << (bd - 8)
        flat = ~((am(p[1], p[0]) > ft) | (am(q[1], q[0]) > ft)
                 | (am(p[2], p[0]) > ft) | (am(q[2], q[0]) > ft))
        wide = fmask & flat
        o = {5: r3(p[2] * 3 + p[1] * 2 + p[0] * 2 + q[0]),
             6: r3(p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1]),
             7: r3(p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2]),
             8: r3(p[0] + q[0] * 2 + q[1] * 2 + q[2] * 3)}
        np1, np0, nq0, nq1 = _dlf_filter4_j(p[1], p[0], q[0], q[1],
                                            fmask & ~flat, thresh, bd)
        nar = {5: np1, 6: np0, 7: nq0, 8: nq1}
        for idx in (5, 6, 7, 8):
            s = s.at[:, idx].set(
                jnp.where(wide, o[idx],
                          jnp.where(fmask & ~flat, nar[idx],
                                    s[:, idx])))
        return s

    fmask = ~((am(p[3], p[2]) > limit) | (am(p[2], p[1]) > limit)
              | (am(p[1], p[0]) > limit) | (am(q[1], q[0]) > limit)
              | (am(q[2], q[1]) > limit) | (am(q[3], q[2]) > limit)
              | (am(p[0], q[0]) * 2 + am(p[1], q[1]) // 2 > blimit))
    ft = 1 << (bd - 8)
    flat = ~((am(p[1], p[0]) > ft) | (am(q[1], q[0]) > ft)
             | (am(p[2], p[0]) > ft) | (am(q[2], q[0]) > ft)
             | (am(p[3], p[0]) > ft) | (am(q[3], q[0]) > ft))
    o8 = {4: r3(p[3] * 3 + p[2] * 2 + p[1] + p[0] + q[0]),
          5: r3(p[3] * 2 + p[2] + p[1] * 2 + p[0] + q[0] + q[1]),
          6: r3(p[3] + p[2] + p[1] + p[0] * 2 + q[0] + q[1] + q[2]),
          7: r3(p[2] + p[1] + p[0] + q[0] * 2 + q[1] + q[2] + q[3]),
          8: r3(p[1] + p[0] + q[0] + q[1] * 2 + q[2] + q[3] * 2),
          9: r3(p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 3)}
    np1, np0, nq0, nq1 = _dlf_filter4_j(p[1], p[0], q[0], q[1],
                                        fmask & ~flat, thresh, bd)
    nar = {5: np1, 6: np0, 7: nq0, 8: nq1}
    if length == 8:
        for idx in (4, 5, 6, 7, 8, 9):
            s = s.at[:, idx].set(jnp.where(fmask & flat, o8[idx],
                                           s[:, idx]))
        for idx in (5, 6, 7, 8):
            s = s.at[:, idx].set(jnp.where(fmask & ~flat, nar[idx],
                                           s[:, idx]))
        return s

    flat2 = ~((am(p[4], p[0]) > ft) | (am(q[4], q[0]) > ft)
              | (am(p[5], p[0]) > ft) | (am(q[5], q[0]) > ft)
              | (am(p[6], p[0]) > ft) | (am(q[6], q[0]) > ft))
    o14 = {
        1: r4(p[6] * 7 + p[5] * 2 + p[4] * 2 + p[3] + p[2] + p[1]
              + p[0] + q[0]),
        2: r4(p[6] * 5 + p[5] * 2 + p[4] * 2 + p[3] * 2 + p[2] + p[1]
              + p[0] + q[0] + q[1]),
        3: r4(p[6] * 4 + p[5] + p[4] * 2 + p[3] * 2 + p[2] * 2 + p[1]
              + p[0] + q[0] + q[1] + q[2]),
        4: r4(p[6] * 3 + p[5] + p[4] + p[3] * 2 + p[2] * 2 + p[1] * 2
              + p[0] + q[0] + q[1] + q[2] + q[3]),
        5: r4(p[6] * 2 + p[5] + p[4] + p[3] + p[2] * 2 + p[1] * 2
              + p[0] * 2 + q[0] + q[1] + q[2] + q[3] + q[4]),
        6: r4(p[6] + p[5] + p[4] + p[3] + p[2] + p[1] * 2 + p[0] * 2
              + q[0] * 2 + q[1] + q[2] + q[3] + q[4] + q[5]),
        7: r4(p[5] + p[4] + p[3] + p[2] + p[1] + p[0] * 2 + q[0] * 2
              + q[1] * 2 + q[2] + q[3] + q[4] + q[5] + q[6]),
        8: r4(p[4] + p[3] + p[2] + p[1] + p[0] + q[0] * 2 + q[1] * 2
              + q[2] * 2 + q[3] + q[4] + q[5] + q[6] * 2),
        9: r4(p[3] + p[2] + p[1] + p[0] + q[0] + q[1] * 2 + q[2] * 2
              + q[3] * 2 + q[4] + q[5] + q[6] * 3),
        10: r4(p[2] + p[1] + p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 2
               + q[4] * 2 + q[5] + q[6] * 4),
        11: r4(p[1] + p[0] + q[0] + q[1] + q[2] + q[3] * 2 + q[4] * 2
               + q[5] * 2 + q[6] * 5),
        12: r4(p[0] + q[0] + q[1] + q[2] + q[3] + q[4] * 2 + q[5] * 2
               + q[6] * 7)}
    wide14 = fmask & flat & flat2
    wide8 = fmask & flat & ~flat2
    for idx in range(1, 13):
        s = s.at[:, idx].set(jnp.where(wide14, o14[idx], s[:, idx]))
    for idx in (4, 5, 6, 7, 8, 9):
        s = s.at[:, idx].set(jnp.where(wide8, o8[idx], s[:, idx]))
    for idx in (5, 6, 7, 8):
        s = s.at[:, idx].set(jnp.where(fmask & ~flat, nar[idx],
                                       s[:, idx]))
    return s


def inter_core_subpel_step(cur, ref_mc_padded, size: int = 16,
                           search_range: int = 16, search_step: int = 2,
                           qindex: int = 160, bd: int = 8):
    """Full device inter core with sub-pel refinement: full-pel grid SAD
    (as in ``inter_core_step``) then a 9-candidate quarter-pel sweep
    through the exact 8-tap MC twin, then T/Q/IQ/recon. The complete
    inter hot path (ME + sub-pel + MC + full loop) as one XLA program —
    the foundation of the device-resident encode loop (ROADMAP §2).

    cur: [H, W] int32; ref_mc_padded: REF_PAD(32)-padded reference.
    Returns (best_mv_8th [B, 2] in 1/8-pel units, qcoeff, eob, sse).
    """
    from svt_av1_tpu.ops import mc as mch
    H, W = cur.shape
    bh, bw = H // size, W // size
    b = bh * bw
    pad = mch.REF_PAD
    offsets = [(dy, dx)
               for dy in range(-search_range, search_range + 1, search_step)
               for dx in range(-search_range, search_range + 1,
                               search_step)]
    sads = []
    for dy, dx in offsets:
        shifted = jax.lax.dynamic_slice(ref_mc_padded, (pad + dy, pad + dx),
                                        (H, W))
        d = jnp.abs(cur - shifted)
        sads.append(d.reshape(bh, size, bw, size).sum(axis=(1, 3)))
    sads = jnp.stack(sads)
    best = jnp.argmin(sads, axis=0).reshape(-1)
    offs = jnp.asarray(np.array(offsets, dtype=np.int32))
    mv8 = offs[best] * 8                                      # 1/8 units

    ys = (jnp.arange(b, dtype=jnp.int32) // bw) * size
    xs = (jnp.arange(b, dtype=jnp.int32) % bw) * size
    srcs = cur.reshape(bh, size, bw, size).transpose(0, 2, 1, 3) \
        .reshape(-1, size, size)

    def sse_of(cand):
        pred = mc_block_batch_j(ref_mc_padded, xs, ys, cand, size, size,
                                ss=0, bd=bd)
        return jnp.sum((srcs - pred) ** 2, axis=(1, 2))

    best_cost = sse_of(mv8)
    for step in (4, 2):                  # half then quarter pel
        for oy, ox in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            cand = mv8 + jnp.asarray([oy * step, ox * step],
                                     dtype=jnp.int32)
            cost = sse_of(cand)
            better = cost < best_cost
            mv8 = jnp.where(better[:, None], cand, mv8)
            best_cost = jnp.where(better, cost, best_cost)

    pred = mc_block_batch_j(ref_mc_padded, xs, ys, mv8, size, size,
                            ss=0, bd=bd)
    resid = srcs - pred
    coeffs = fwd_tx2d(resid, 0, size, size)
    cw = min(32, size)
    coded = coeffs[:, :cw, :cw].reshape(b, -1)
    from svt_av1_tpu.utils.blocks import MAX_TX_SIZE_OF_BLOCK
    tx_size = MAX_TX_SIZE_OF_BLOCK[size]
    scan = get_scan(tx_size, 0)
    qp = quant_host.make_quant_params(qindex, bit_depth=bd)
    log_scale = quant_host.tx_scale(tx_size)
    qcoeff, dqcoeff, eob = quantize(coded, scan, qp, log_scale)
    full = jnp.zeros_like(coeffs)
    full = full.at[:, :cw, :cw].set(dqcoeff.reshape(-1, cw, cw))
    r = inv_tx2d(full, 0, size, size, bd)
    recon = jnp.clip(pred + r, 0, (1 << bd) - 1)
    sse = jnp.sum((srcs - recon) ** 2, axis=(1, 2))
    return mv8, qcoeff, eob, sse


# --- full-frame DLF on device ----------------------------------------------------
# The host pick_levels filters the whole frame at up to 4 candidate
# levels per plane group (3.9 s/frame at 1080p on this machine); this
# runs the complete search + apply as ONE jitted program with the
# candidate levels as traced operands. Dense formulation: every 4px
# boundary column maps to strided slices plane[:, k::4] (no gathers);
# writes are provably disjoint across boundaries (filter span is
# bounded by the minimum tx dim — spec 7.14), so masked strided stores
# reproduce the host's sequential edge writes exactly.

def _dlf_thresholds_j(level):
    """thresholds() with a traced level (sharpness 0)."""
    limit = jnp.maximum(level, 1)
    return 2 * (level + 2) + limit, limit, level >> 4


def _dlf_dir_pass_j(plane, txd_map, start, level, is_luma: bool,
                    w_eff: int, h_eff: int, bd: int):
    """One direction pass (vertical edges) over ``plane`` [H, W] int32.
    txd_map/start: [uh, uw] per-4px-unit tx dim along this direction and
    block-start flags (host dlf.build_tx_maps). level: traced scalar.
    Horizontal edges run this on the transposed plane/maps."""
    H, W = plane.shape
    uh, uw = txd_map.shape
    uh = min(uh, h_eff // 4)
    uw = min(uw, w_eff // 4)
    blimit, limit, thresh = _dlf_thresholds_j(level)

    # per-unit filter length from the tx dims across each boundary
    cur = txd_map[:uh, 1:uw]
    prev = txd_map[:uh, :uw - 1]
    mn = jnp.minimum(cur, prev)
    if is_luma:
        lens = jnp.where(mn <= 4, 4, jnp.where(mn == 8, 8, 14))
    else:
        lens = jnp.where(mn <= 4, 4, 6)
    active = start[:uh, 1:uw] & (level > 0)           # [uh, uw-1]

    # sample lines for every boundary: s[y, c, k] = plane[y, 4(c+1)+k-7]
    # = padded[y, 4c+4+k] — strided slices of a 7-padded plane, zero
    # gather ops
    padded = jnp.pad(plane, ((0, 0), (7, 7)), mode="edge")
    nb = uw - 1
    cols = [padded[:uh * 4, 4 + k:4 + k + 4 * nb:4]
            for k in range(14)]
    s = jnp.stack(cols, axis=-1).astype(jnp.int32)    # [4uh, nb, 14]
    n = 4 * uh * nb
    s = s.reshape(n, 14)
    mask = jnp.repeat(active, 4, axis=0).reshape(n)
    lens_r = jnp.repeat(lens, 4, axis=0).reshape(n)

    out = s
    for L in ((4, 8, 14) if is_luma else (4, 6)):
        f = dlf_apply_len_batch(s, L, blimit, limit, thresh, bd)
        out = jnp.where((mask & (lens_r == L))[:, None], f, out)

    # scatter back only genuinely-changed samples (equal-value skips are
    # no-ops, so `changed` is an exact write mask; disjointness makes
    # the per-offset stores race-free)
    out2 = out.reshape(4 * uh, nb, 14)
    s2 = s.reshape(4 * uh, nb, 14)
    changed = out2 != s2
    for k in range(1, 13):
        cur_slice = padded[:uh * 4, 4 + k:4 + k + 4 * nb:4]
        newv = jnp.where(changed[:, :, k], out2[:, :, k], cur_slice)
        padded = padded.at[:uh * 4, 4 + k:4 + k + 4 * nb:4].set(newv)
    return padded[:, 7:-7]


def _dlf_filter_plane_j(plane, maps, level, is_luma: bool, w_eff: int,
                        h_eff: int, bd: int):
    """Both direction passes (vertical first, as spec 7.14 orders)."""
    (txw, txh), sx, sy = maps
    work = plane.astype(jnp.int32)
    work = _dlf_dir_pass_j(work, txw, sx, level, is_luma, w_eff, h_eff,
                           bd)
    work = _dlf_dir_pass_j(work.T, txh.T, sy.T, level, is_luma, h_eff,
                           w_eff, bd).T
    return jnp.clip(work, 0, (1 << bd) - 1)


def make_dlf_search_apply(shapes, map_shapes, eff, bd: int):
    """Traceable whole-frame DLF: pick luma + chroma levels by filtered
    SSE over 4 traced candidate levels (host pick_levels twin: first-min
    over an ascending candidate vector reproduces its dedup+sorted scan)
    and apply the winners. Returns (y, u, v, ly, luv)."""
    (wy, hy), (wc, hc) = eff
    pix = jnp.uint8 if bd <= 8 else jnp.uint16

    def program(y, u, v, sy_, su, sv, ytxw, ytxh, ysx, ysy,
                ctxw, ctxh, csx, csy, cands):
        ymaps = ((ytxw, ytxh), ysx, ysy)
        cmaps = ((ctxw, ctxh), csx, csy)

        def sse(a, b, w_e, h_e):
            d = (a[:h_e, :w_e].astype(jnp.int64)
                 - b[:h_e, :w_e].astype(jnp.int64))
            return jnp.sum(d * d)

        sy64 = sy_.astype(jnp.int32)
        su64 = su.astype(jnp.int32)
        sv64 = sv.astype(jnp.int32)
        y32 = y.astype(jnp.int32)
        u32 = u.astype(jnp.int32)
        v32 = v.astype(jnp.int32)
        ysses, csses = [], []
        for k in range(cands.shape[0]):
            lvl = cands[k]
            fy = _dlf_filter_plane_j(y32, ymaps, lvl, True, wy, hy, bd)
            ysses.append(sse(fy, sy64, wy, hy))
            fu = _dlf_filter_plane_j(u32, cmaps, lvl, False, wc, hc, bd)
            fv = _dlf_filter_plane_j(v32, cmaps, lvl, False, wc, hc, bd)
            csses.append(sse(fu, su64, wc, hc)
                         + sse(fv, sv64, wc, hc))
        ly = cands[jnp.argmin(jnp.stack(ysses))]
        luv = cands[jnp.argmin(jnp.stack(csses))]
        # spec: chroma filters/codes only when the luma level is nonzero
        luv = jnp.where(ly > 0, luv, 0)
        oy = _dlf_filter_plane_j(y32, ymaps, ly, True, wy, hy, bd)
        ou = _dlf_filter_plane_j(u32, cmaps, luv, False, wc, hc, bd)
        ov = _dlf_filter_plane_j(v32, cmaps, luv, False, wc, hc, bd)
        return (oy.astype(pix), ou.astype(pix), ov.astype(pix),
                ly.astype(jnp.int32), luv.astype(jnp.int32))

    return program


@functools.lru_cache(maxsize=16)
def _build_dlf(shapes, map_shapes, eff, bd: int):
    return jax.jit(make_dlf_search_apply(shapes, map_shapes, eff, bd))


def dlf_search_apply_dev(recon_planes, src_planes, leaf_sizes, mi_rows,
                         mi_cols, qindex: int, bd: int = 8):
    """Device DLF level search + apply (host pick_levels +
    loop_filter_frame twin, one dispatch). Mutates recon_planes in
    place; returns (y, y, u, v) levels — identical integers to the host
    pair by construction."""
    from svt_av1_tpu.ops import dlf
    from svt_av1_tpu.ops.device_inter import _dput, _pix_dt
    g = dlf.level_guess(qindex, bd)
    cl = sorted({0, max(0, g // 2), g, min(63, (3 * g) // 2)})
    cands = np.asarray((cl + [cl[-1]] * 4)[:4], np.int32)
    ymaps = dlf.build_tx_maps(leaf_sizes, mi_rows, mi_cols, 0)
    cmaps = dlf.build_tx_maps(leaf_sizes, mi_rows, mi_cols, 1)
    shapes = (recon_planes[0].shape, recon_planes[1].shape)
    map_shapes = (ymaps[0][0].shape, cmaps[0][0].shape)
    eff = ((mi_cols * 4, mi_rows * 4), (mi_cols * 2, mi_rows * 2))
    fn = _build_dlf(shapes, map_shapes, eff, bd)
    pdt = _pix_dt(bd)
    outs = fn(
        recon_planes[0].astype(pdt), recon_planes[1].astype(pdt),
        recon_planes[2].astype(pdt),
        _dput(src_planes[0], pdt), _dput(src_planes[1], pdt),
        _dput(src_planes[2], pdt),
        ymaps[0][0].astype(np.int8), ymaps[0][1].astype(np.int8),
        ymaps[1], ymaps[2],
        cmaps[0][0].astype(np.int8), cmaps[0][1].astype(np.int8),
        cmaps[1], cmaps[2], cands)
    oy, ou, ov, lyd, luvd = outs
    if isinstance(recon_planes[0], jax.Array):
        # device-resident chain: planes never cross the tunnel
        recon_planes[0] = oy
        recon_planes[1] = ou
        recon_planes[2] = ov
        # the two level scalars are only needed by the frame-header
        # syntax, which runs frames later on the entropy worker — a
        # blocking fetch here would stall the main thread until the
        # whole queued device chain for this frame has executed. Hand
        # back a lazy view instead; the async copy starts now.
        lyd.copy_to_host_async()
        luvd.copy_to_host_async()
        return _LazyLfLevels(lyd, luvd)
    oy, ou, ov, ly, luv = jax.device_get(outs)
    recon_planes[0][...] = oy.astype(recon_planes[0].dtype)
    recon_planes[1][...] = ou.astype(recon_planes[1].dtype)
    recon_planes[2][...] = ov.astype(recon_planes[2].dtype)
    ly, luv = int(ly), int(luv)
    if ly == 0:
        return (0, 0, 0, 0)
    return (ly, ly, luv, luv)


class _LazyLfLevels:
    """Deferred DLF (y, y, u, v) level tuple: resolves the two device
    scalars on first element access (i.e. on the entropy worker at
    frame-header time), not on the compute thread."""

    __slots__ = ("_dev", "_val")

    def __init__(self, lyd, luvd):
        self._dev = (lyd, luvd)
        self._val = None

    def _resolve(self):
        if self._val is None:
            ly, luv = (int(x) for x in jax.device_get(self._dev))
            self._val = (0, 0, 0, 0) if ly == 0 else (ly, ly, luv, luv)
            self._dev = None
        return self._val

    def __getitem__(self, i):
        return self._resolve()[i]

    def __iter__(self):
        return iter(self._resolve())

    def __len__(self):
        return 4
