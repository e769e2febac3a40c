"""Device (JAX/XLA) twin of the production mode-decision kernel.

``decide_block_batch_dev`` reproduces ``pipeline.md.decide_block_batch``
bit-for-bit as one jitted XLA program per static shape key: all candidate
intra predictions (incl. directional zones Z1/Z2/Z3 and CfL), the integer
fast-loop ranking, the NFL full loop (forward transform + quantize +
dequantize + inverse transform + recon + CDF-LUT rate), and the luma
TX-type sweep. Because every cost is integer (md.RATE_Q fixed point) the
argmin/argsort decisions agree exactly with the host NumPy path on any
backend (CPU or TPU), so the wavefront encoder produces byte-identical
bitstreams with either compute engine.

Reference equivalents: fast/full loops ``EbProductCodingLoop.c:1185,2004``,
encode-pass tx search ``EbCodingLoop.c:516``, CfL ``:1720``.

int64 note: RD costs and distortions exceed int32, so importing this
module enables jax x64. Pixel-path compute stays int32.
"""

from __future__ import annotations

import functools

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the program set is keyed by static shapes
# only, so a warm cache makes every later process start fast (first
# compile through the axon tunnel can take minutes per program).
import os as _os  # noqa: E402

_cache = _os.environ.get("SVT_TPU_JAX_CACHE") or _os.path.join(
    _os.path.dirname(_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__)))), ".jax_cache")
if _cache.lower() in ("off", "0", "none"):
    _cache = None   # cache disabled (CI/pytest: serializing the biggest
    #                 CPU executables segfaults jax's zstd cache writer)
try:
    if _cache is not None:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
except Exception:  # older jax without the knobs
    pass

import jax.numpy as jnp  # noqa: E402

from svt_av1_tpu.ops import device as dev  # noqa: E402
from svt_av1_tpu.ops import intra_dir  # noqa: E402
from svt_av1_tpu.ops import quant as quant_host  # noqa: E402
from svt_av1_tpu.pipeline import common  # noqa: E402
from svt_av1_tpu.pipeline import md  # noqa: E402
from svt_av1_tpu.utils.blocks import get_scan  # noqa: E402

UV_CFL = 13


# --- directional intra (device twins of intra_dir._z1/_z2/_z3) -----------------
def _z1_j(above1, bw, bh, dx, bd):
    max_base_x = bw + bh - 1
    r = np.arange(bh)[:, None]
    c = np.arange(bw)[None, :]
    x = (r + 1) * dx
    base = (x >> 6) + c
    shift = jnp.asarray((x >> 1) & 0x1F)
    b0 = np.minimum(base, max_base_x)
    b1 = np.minimum(base + 1, max_base_x)
    v0 = above1[:, 1 + b0]
    v1 = above1[:, 1 + b1]
    val = (v0 * (32 - shift) + v1 * shift + 16) >> 5
    out = jnp.where(jnp.asarray(base[None] < max_base_x), val,
                    above1[:, 1 + max_base_x, None, None])
    return jnp.clip(out, 0, (1 << bd) - 1)


def _z3_j(left1, bw, bh, dy, bd):
    max_base_y = bw + bh - 1
    r = np.arange(bh)[:, None]
    c = np.arange(bw)[None, :]
    y = (c + 1) * dy
    base = (y >> 6) + r
    shift = jnp.asarray((y >> 1) & 0x1F)
    b0 = np.minimum(base, max_base_y)
    b1 = np.minimum(base + 1, max_base_y)
    v0 = left1[:, 1 + b0]
    v1 = left1[:, 1 + b1]
    val = (v0 * (32 - shift) + v1 * shift + 16) >> 5
    out = jnp.where(jnp.asarray(base[None] < max_base_y), val,
                    left1[:, 1 + max_base_y, None, None])
    return jnp.clip(out, 0, (1 << bd) - 1)


def _z2_j(above1, left1, bw, bh, dx, dy, bd):
    r = np.arange(bh)[:, None]
    c = np.arange(bw)[None, :]
    x = c * 64 - (r + 1) * dx
    base_x = x >> 6
    shift_x = jnp.asarray((x >> 1) & 0x1F)
    y = r * 64 - (c + 1) * dy
    base_y = y >> 6
    shift_y = jnp.asarray((y >> 1) & 0x1F)
    use_x = base_x >= -1
    bx0 = np.clip(base_x, -1, bw + bh - 1)
    bx1 = np.clip(base_x + 1, -1, bw + bh)
    by0 = np.clip(base_y, -1, bh + bw - 1)
    by1 = np.clip(base_y + 1, -1, bh + bw)
    na = above1.shape[1] - 1
    nl = left1.shape[1] - 1
    vx = (above1[:, 1 + bx0] * (32 - shift_x)
          + above1[:, np.minimum(1 + bx1, na)] * shift_x + 16) >> 5
    vy = (left1[:, 1 + by0] * (32 - shift_y)
          + left1[:, np.minimum(1 + by1, nl)] * shift_y + 16) >> 5
    out = jnp.where(jnp.asarray(use_x[None]), vx, vy)
    return jnp.clip(out, 0, (1 << bd) - 1)


def predict_any_j(mode: int, delta: int, above1, left1, bw, bh, ha, hl,
                  bd: int = 8, edge=None):
    """Device twin of intra_ops.predict_any for one static (mode, delta).
    above1/left1 offset-1 edge arrays (int32/int64). ``edge``: traced
    (ftype, n_top, n_left) operands for the normative intra edge filter
    (same xp-generic integer program as the host — bit-exact twin)."""
    if intra_dir.is_directional(mode):
        angle = intra_dir.mode_angle(mode, delta)
        if angle not in (90, 180):
            if edge is not None:
                return intra_dir.predict_directional_edge(
                    mode, delta, above1.astype(jnp.int64),
                    left1.astype(jnp.int64), bw, bh, ha, hl,
                    edge[0], edge[1], edge[2], bd=bd, xp=jnp)
            if 0 < angle < 90:
                return _z1_j(above1, bw, bh, intra_dir.get_dx(angle), bd)
            if 90 < angle < 180:
                return _z2_j(above1, left1, bw, bh,
                             intra_dir.get_dx(angle),
                             intra_dir.get_dy(angle), bd)
            return _z3_j(left1, bw, bh, intra_dir.get_dy(angle), bd)
    preds = dev.predict_modes((mode,), above1[:, 1:], left1[:, 1:],
                              above1[:, 0], ha, hl, bw, bh, bd)
    return preds[0]


# --- CfL device twins -----------------------------------------------------------
def luma_ac_420_j(luma):
    l32 = luma.astype(jnp.int32)
    sub = (l32[:, 0::2, 0::2] + l32[:, 0::2, 1::2]
           + l32[:, 1::2, 0::2] + l32[:, 1::2, 1::2]) << 1
    b, h, w = sub.shape
    n_log2 = int(np.log2(h * w))
    avg = (sub.reshape(b, -1).sum(axis=1) + (1 << (n_log2 - 1))) >> n_log2
    return sub - avg[:, None, None]


def cfl_predict_j(dc_pred, ac, alpha_q3, bd=8):
    a = alpha_q3.astype(jnp.int64)[:, None, None]
    scaled = a * ac.astype(jnp.int64)
    scaled = jnp.where(scaled >= 0, (scaled + 32) >> 6,
                       -((-scaled + 32) >> 6))
    return jnp.clip(dc_pred.astype(jnp.int64) + scaled, 0, (1 << bd) - 1)


def cfl_fit_alpha_j(ac, src, dc_pred):
    b = ac.shape[0]
    r = (src.astype(jnp.int64) - dc_pred.astype(jnp.int64)).reshape(b, -1)
    acf = ac.reshape(b, -1).astype(jnp.int64)
    a2 = jnp.sum(acf * acf, axis=1)
    ar = jnp.sum(acf * r, axis=1)
    den = jnp.maximum(a2, 1)
    mag = (128 * jnp.abs(ar) + den) // (2 * den)
    alpha = jnp.where(a2 > 0, jnp.sign(ar) * mag, 0)
    return jnp.clip(alpha, -16, 16)


# --- full loop (T/Q/IQ/recon + integer rate) ------------------------------------
#
# qindex and lambda are TRACED OPERANDS throughout ([B] vectors), never
# static jit keys: one compiled program serves every quantizer the
# qp-scaling ladder / rate control / per-SB AQ can produce (round-2
# VERDICT item 1 — the per-(shape, qindex, lambda) key space needed 100+
# compiles per config and minutes per compile through the tunnel).

@functools.lru_cache(maxsize=32)
def _level_cost_tab(plane_type: int, txs_ctx: int) -> np.ndarray:
    """md._level_cost_lut stacked over the 4 coef_qctx buckets [4, 256]."""
    return np.stack([md._level_cost_lut(q, plane_type, txs_ctx)
                     for q in range(4)])


@functools.lru_cache(maxsize=1)
def _qctx_tab() -> np.ndarray:
    from svt_av1_tpu.entropy.cdf import coef_qctx
    return np.array([coef_qctx(q) for q in range(256)], dtype=np.int32)


def _rate_cdf_j(qcoeff_flat, eob, qv, plane_type: int, tx_size: int):
    """Device twin of md.coeff_rate_cdf: [B, n] raster levels -> q9
    rate [B] int64. qv: traced [B] qindex vector."""
    from svt_av1_tpu.entropy import coeff_ctx as cc
    tab = jnp.asarray(_level_cost_tab(plane_type, int(cc.txs_ctx(tx_size))))
    lut = tab[jnp.asarray(_qctx_tab())[qv]]                  # [B, 256]
    ebl = md._eob_bits_lut()
    n = qcoeff_flat.shape[1]
    aq = jnp.minimum(jnp.abs(qcoeff_flat), 255)
    eobi = eob.astype(jnp.int64)
    rate = jnp.take_along_axis(lut, aq, axis=1).sum(axis=1) \
        - (n - eobi) * lut[:, 0]
    rate = jnp.maximum(rate, 0)
    rate = rate + jnp.where(eobi > 0,
                            (3 << md.RATE_Q) + jnp.asarray(ebl)[eobi], 307)
    return rate


def rdoq_trim_j(qc, dq, eob, scan, tx_size, qv, plane_type: int, lam_qv):
    """Device twin of md.rdoq_trim (identical integer math, so host and
    device backends keep emitting byte-identical streams). Like the host
    twin, runs at HALF the mode-decision lambda (see md.rdoq_trim).
    qv/lam_qv: traced [B] vectors; blocks with qindex 0 are left
    untouched (the host gates the trim off at lossless)."""
    from svt_av1_tpu.entropy import coeff_ctx as cc
    b, n = qc.shape
    qv = jnp.broadcast_to(jnp.asarray(qv, jnp.int32), (b,))
    lam_qv = jnp.broadcast_to(jnp.asarray(lam_qv, jnp.int64), (b,)) >> 1
    tab = jnp.asarray(_level_cost_tab(plane_type, int(cc.txs_ctx(tx_size))))
    lut = tab[jnp.asarray(_qctx_tab())[qv]]                  # [B, 256]
    ebl = jnp.asarray(md._eob_bits_lut())
    gq12 = (64, 330, 2700)[quant_host.tx_scale(tx_size)]

    lv = jnp.minimum(jnp.abs(qc[:, scan]), 255)
    dqs = dq[:, scan].astype(jnp.int64)
    k = jnp.arange(n)
    in_prefix = k[None, :] < eob[:, None]
    dd = jnp.where(in_prefix, (dqs * dqs * gq12) >> 12, 0)
    dr = jnp.where(in_prefix, jnp.take_along_axis(lut, lv, axis=1), 0)
    # associative_scan, not cumsum: XLA's reduce-window cumsum lowering
    # blows the scoped-vmem budget inside the big fused inter programs
    from jax import lax as _lax
    sufd = _lax.associative_scan(jnp.add, dd[:, ::-1], axis=1)[:, ::-1]
    sufr = _lax.associative_scan(jnp.add, dr[:, ::-1], axis=1)[:, ::-1]
    sufd = jnp.concatenate([sufd, jnp.zeros((b, 1), jnp.int64)], axis=1)
    sufr = jnp.concatenate([sufr, jnp.zeros((b, 1), jnp.int64)], axis=1)
    e = jnp.arange(n + 1)
    ebits = jnp.where(e > 0, (3 << md.RATE_Q) + ebl[e], 307)
    cur_ebits = jnp.where(eob > 0, (3 << md.RATE_Q) + ebl[eob], 307)
    dcost = (sufd << md.RATE_Q) - ((lam_qv[:, None] * (
        sufr + cur_ebits[:, None] - ebits[None, :])) >> md.LAM_Q)
    valid = e[None, :] <= eob[:, None]
    dcost = jnp.where(valid, dcost, jnp.int64(1) << 62)
    new_eob = jnp.argmin(dcost, axis=1).astype(eob.dtype)
    new_eob = jnp.where(qv > 0, new_eob, eob)
    keep = k[None, :] < new_eob[:, None]
    keep_raster = jnp.zeros((b, n), dtype=bool).at[:, scan].set(keep)
    return (jnp.where(keep_raster, qc, 0),
            jnp.where(keep_raster, dq, 0), new_eob)


def _full_loop_j(srcs, preds, tts, tt_set, tx_size, size, qv, bd,
                 plane_type, rdoq_lam_qv=None):
    """Device twin of md._full_loop. tts [B] dynamic; tt_set: static
    tuple of the tx types tts can take (computed from the candidate
    set). qv: traced [B] qindex vector. Returns (qcoeff [B,ch,cw], eob,
    recon, dist, rate). ``rdoq_lam_qv``: traced [B] lambda vector for
    the RDOQ-lite trailing trim (None = off, decided at trace time)."""
    b = srcs.shape[0]
    w, h = common.leaf_wh(size)
    cw, ch = common.coded_dims(tx_size)
    log_scale = quant_host.tx_scale(tx_size)
    resid = (srcs - preds).astype(jnp.int32)

    qcoeff = jnp.zeros((b, ch, cw), dtype=jnp.int32)
    eob = jnp.zeros(b, dtype=jnp.int64)
    recon = jnp.zeros((b, h, w), dtype=jnp.int64)
    rate = jnp.zeros(b, dtype=jnp.int64)
    for tt in tt_set:
        sel = tts == tt
        coeffs = dev.fwd_tx2d(resid, int(tt), w, h)
        coded = coeffs[:, :ch, :cw].reshape(b, -1)
        scan = get_scan(tx_size, int(tt))
        qc, dq, eo = dev.quantize_qv(coded, scan, qv, log_scale, bd)
        if rdoq_lam_qv is not None:
            qc, dq, eo = rdoq_trim_j(qc, dq, eo, scan, tx_size,
                                     qv, plane_type, rdoq_lam_qv)
        rt = _rate_cdf_j(qc, eo, qv, plane_type, tx_size)
        full = jnp.zeros((b, h, w), dtype=jnp.int32)
        full = full.at[:, :ch, :cw].set(
            dq.reshape(-1, ch, cw).astype(jnp.int32))
        r = dev.inv_tx2d(full, int(tt), w, h, bd=bd)
        rec = jnp.clip(preds + r, 0, (1 << bd) - 1).astype(jnp.int64)
        qcoeff = jnp.where(sel[:, None, None], qc.reshape(-1, ch, cw),
                           qcoeff)
        eob = jnp.where(sel, eo.astype(jnp.int64), eob)
        recon = jnp.where(sel[:, None, None], rec, recon)
        rate = jnp.where(sel, rt, rate)
    dist = jnp.sum((srcs.astype(jnp.int64) - recon) ** 2, axis=(1, 2))
    return qcoeff, eob, recon, dist, rate


def _rdcost_j(dist, lamqv, rate):
    """Integer RD cost; lamqv: traced [B] vector (or a python int)."""
    if not isinstance(lamqv, (int, np.integer)):
        lamqv = lamqv.astype(jnp.int64)
    return (dist.astype(jnp.int64) << md.RATE_Q) \
        + ((lamqv * rate.astype(jnp.int64)) >> md.LAM_Q)


# --- the decide twin ------------------------------------------------------------
def _tt_for_lut(all_cands, plane, tx_size, reduced_tx_set):
    """mode -> chroma tx type mapping restricted to the candidate set."""
    lut = np.zeros(16, dtype=np.int32)
    if plane != 0:
        for m, _ in all_cands:
            lut[m] = common.chroma_tx_type(int(m), tx_size,
                                           reduced_tx_set)
        lut[UV_CFL] = common.chroma_tx_type(UV_CFL, tx_size,
                                            reduced_tx_set)
    return lut


@functools.lru_cache(maxsize=256)
def make_decide_core(plane: int, cands: tuple, size,
                     bd: int, nfl: int, reduced_tx_set: bool,
                     has_forced: bool, has_cfl: bool, tx_search: bool,
                     rdoq: bool = False, edge_filter: bool = False):
    """Build the traceable decide function for a static configuration
    (jitted by _build_decide; also inlined into fused tile programs).
    The returned function takes trailing traced ``qv``/``lamqv`` [B]
    quantizer vectors — qindex/lambda are NOT part of the program key."""
    bw, bh = common.leaf_wh(size)
    tx_size = common.tx_size_for_rect(bw, bh, plane)
    all_cands = list(cands)
    if plane == 1 and has_cfl and not has_forced:
        all_cands = all_cands + [(UV_CFL, 0)]
    tt_lut = _tt_for_lut(all_cands + [(UV_CFL, 0)], plane, tx_size,
                         reduced_tx_set)
    tt_set = tuple(sorted({int(tt_lut[m]) for m, _ in all_cands}
                          | ({int(tt_lut[UV_CFL])} if has_forced
                             and plane == 2 else set()))) \
        if plane != 0 else (0,)
    mode_bits = md.candidate_mode_bits(tuple(map(tuple, all_cands)),
                                       plane, has_cfl)
    carr = np.asarray(all_cands, dtype=np.int64)
    plane_type = int(plane > 0)

    def tts_of(modes):
        if plane == 0:
            return jnp.zeros_like(modes, dtype=jnp.int32)
        return jnp.asarray(tt_lut)[modes]

    def cfl_parts(srcs, above1, left1, ha, hl, cfl_luma):
        ac = luma_ac_420_j(cfl_luma)
        dc = dev.predict_modes((0,), above1[:, 1:], left1[:, 1:],
                               above1[:, 0], ha, hl, bw, bh, bd)[0]
        alpha = cfl_fit_alpha_j(ac, srcs, dc)
        return cfl_predict_j(dc, ac, alpha, bd), alpha

    def forced_fn(srcs, above1, left1, ha, hl, fmodes, fdeltas,
                  cfl_luma, qv, lamqv, ftype=None, n_top=None,
                  n_left=None):
        b = srcs.shape[0]
        edge = (ftype.astype(jnp.int32), n_top.astype(jnp.int64),
                n_left.astype(jnp.int64)) if edge_filter else None
        # inputs may arrive at narrow wire dtypes (uint8/int16) — the
        # tunnel moves ~30 MB/s, so pixels travel at storage width
        srcs = srcs.astype(jnp.int64)
        above1 = above1.astype(jnp.int32)
        left1 = left1.astype(jnp.int32)
        fmodes = fmodes.astype(jnp.int64)
        fdeltas = fdeltas.astype(jnp.int64)
        if cfl_luma is not None:
            cfl_luma = cfl_luma.astype(jnp.int64)
        rlq = lamqv if rdoq else None
        pair_set = list(dict.fromkeys(
            [(int(m), int(d)) for m, d in all_cands] + [(UV_CFL, 0)]))
        preds = jnp.zeros((b, bh, bw), dtype=jnp.int64)
        alphas = jnp.zeros(b, dtype=jnp.int64)
        for m, d in pair_set:
            sel = (fmodes == m) & (fdeltas == d)
            if m == UV_CFL:
                if cfl_luma is None:
                    continue
                p, al = cfl_parts(srcs, above1, left1, ha, hl, cfl_luma)
                alphas = jnp.where(sel, al, alphas)
            else:
                p = predict_any_j(m, d, above1, left1, bw, bh, ha, hl,
                                  bd, edge=edge)
            preds = jnp.where(sel[:, None, None],
                              p.astype(jnp.int64), preds)
        ftts = tts_of(fmodes)
        qc, eo, rec, dist, rate = _full_loop_j(
            srcs, preds, ftts, tt_set, tx_size, size, qv, bd,
            plane_type, rdoq_lam_qv=rlq)
        cost = _rdcost_j(dist, lamqv, rate)
        return (fmodes, fdeltas, qc, eo, rec, cost, alphas, ftts)

    def decide_fn(srcs, above1, left1, ha, hl, cfl_luma, qv, lamqv,
                  ftype=None, n_top=None, n_left=None):
        b = srcs.shape[0]
        edge = (ftype.astype(jnp.int32), n_top.astype(jnp.int64),
                n_left.astype(jnp.int64)) if edge_filter else None
        srcs = srcs.astype(jnp.int64)
        above1 = above1.astype(jnp.int32)
        left1 = left1.astype(jnp.int32)
        if cfl_luma is not None:
            cfl_luma = cfl_luma.astype(jnp.int64)
        rlq = lamqv if rdoq else None
        pred_list = []
        cand_alphas = None
        for i, (m, d) in enumerate(all_cands):
            if m == UV_CFL:
                p, cand_alphas = cfl_parts(srcs, above1, left1, ha, hl,
                                           cfl_luma)
            else:
                p = predict_any_j(int(m), int(d), above1, left1, bw, bh,
                                  ha, hl, bd, edge=edge)
            pred_list.append(p.astype(jnp.int64))
        preds = jnp.stack(pred_list, axis=0)                  # [M,B,h,w]
        diff = srcs[None].astype(jnp.int64) - preds
        sse = jnp.sum(diff * diff, axis=(2, 3))               # [M,B]
        k = min(nfl, len(all_cands))
        mb = jnp.asarray(mode_bits)[:, None]
        fast_cost = (sse << md.RATE_Q) \
            + ((lamqv[None, :].astype(jnp.int64)
                * jnp.broadcast_to(mb, sse.shape)) >> md.LAM_Q)
        order = jnp.argsort(fast_cost, axis=0, stable=True)[:k]
        best_cost = None
        out = None
        out_pred = None
        for kk in range(k):
            idx = order[kk]                                    # [B]
            modes_k = jnp.asarray(carr)[idx, 0]
            deltas_k = jnp.asarray(carr)[idx, 1]
            preds_k = jnp.take_along_axis(
                preds, idx[None, :, None, None], axis=0)[0]
            qc, eo, rec, dist, rate = _full_loop_j(
                srcs, preds_k, tts_of(modes_k), tt_set, tx_size, size,
                qv, bd, plane_type, rdoq_lam_qv=rlq)
            cost = _rdcost_j(dist, lamqv,
                             rate + jnp.asarray(mode_bits)[idx])
            if best_cost is None:
                best_cost = cost
                out = [modes_k, deltas_k, qc, eo, rec, cost]
                out_pred = preds_k
            else:
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                out[0] = jnp.where(better, modes_k, out[0])
                out[1] = jnp.where(better, deltas_k, out[1])
                out[2] = jnp.where(better[:, None, None], qc, out[2])
                out[3] = jnp.where(better, eo, out[3])
                out[4] = jnp.where(better[:, None, None], rec, out[4])
                out[5] = best_cost
                out_pred = jnp.where(better[:, None, None], preds_k,
                                     out_pred)
        tts = tts_of(out[0])
        if tx_search and plane == 0:
            tts = _tx_search_j(srcs, out_pred, out, tx_size, size,
                               qv, bd, lamqv, rdoq=rdoq)
        alphas = jnp.zeros(b, dtype=jnp.int64)
        if cand_alphas is not None:
            alphas = jnp.where(out[0] == UV_CFL, cand_alphas, 0)
        return (out[0], out[1], out[2], out[3], out[4], out[5], alphas,
                tts)

    return forced_fn if has_forced else decide_fn


@functools.lru_cache(maxsize=256)
def _build_decide(*key):
    core = make_decide_core(*key)
    bd = key[3]
    pix = jnp.uint8 if bd <= 8 else jnp.uint16

    def wrapped(*args):
        m, d, qc, eo, rec, cost, al, tts = core(*args)
        # narrow the wire: |level| <= 32767 (quantize clips tmp to
        # int16 before the reciprocal multiply), modes/deltas/alphas/
        # tx types are tiny enums, recon is bd-wide pixels
        return (m.astype(jnp.int8), d.astype(jnp.int8),
                qc.astype(jnp.int16), eo.astype(jnp.int16),
                rec.astype(pix), cost, al.astype(jnp.int8),
                tts.astype(jnp.int8))

    return jax.jit(wrapped)


def _tx_search_j(srcs, preds, out, tx_size, size, qv, bd, lamqv,
                 rdoq: bool = False):
    """Device twin of md._luma_tx_search (in-place update of out)."""
    from svt_av1_tpu.entropy import tx_sets
    from svt_av1_tpu.entropy.cdf import default_tables
    from svt_av1_tpu.utils.blocks import TX_SIZE_SQR
    b = srcs.shape[0]
    tts = jnp.zeros(b, dtype=jnp.int32)
    set_type = tx_sets.ext_tx_set_type(tx_size, False, False)
    if tx_sets.NUM_EXT_TX_SET[set_type] <= 1:
        return tts
    eset = tx_sets.ext_tx_set(tx_size, False, False)
    sqr = int(TX_SIZE_SQR[tx_size])
    table = default_tables()["intra_ext_tx"][eset][sqr]
    pbl = md._prob_bits_lut()
    modes = jnp.clip(out[0], 0, 12).astype(jnp.int64)
    rows = jnp.asarray(table.astype(np.int64))[modes]     # [B, nsyms+1]

    def sig_bits(tt):
        sym = int(tx_sets.EXT_TX_IND[set_type][tt])
        hi = jnp.full(b, 32768, dtype=jnp.int64) if sym == 0 \
            else rows[:, sym - 1]
        p = jnp.maximum(hi - rows[:, sym], 1)
        return jnp.asarray(pbl.astype(np.int64))[p]

    allowed = [int(t) for t in np.nonzero(
        tx_sets.EXT_TX_USED[set_type])[0]]
    rlq = lamqv if rdoq else None
    best_part = None
    for tt in allowed:
        qc, eo, rec, dist, rate = _full_loop_j(
            srcs, preds, jnp.full(b, tt, dtype=jnp.int32), (tt,),
            tx_size, size, qv, bd, 0, rdoq_lam_qv=rlq)
        part = _rdcost_j(dist, lamqv, rate + sig_bits(tt))
        if best_part is None:
            best_part = part
            continue
        better = part < best_part
        out[5] = jnp.where(better, out[5] - best_part + part, out[5])
        best_part = jnp.where(better, part, best_part)
        out[2] = jnp.where(better[:, None, None], qc, out[2])
        out[3] = jnp.where(better, eo, out[3])
        out[4] = jnp.where(better[:, None, None], rec, out[4])
        tts = jnp.where(better, tt, tts)
    return tts


BUCKETS = (64, 256, 1024, 4096, 16384, 65536)


def _bucket(b: int) -> int:
    """Pad batch sizes to a coarse ladder: compile count matters far more
    than padding waste (tunnel compiles cost minutes; padded lanes cost
    microseconds)."""
    for n in BUCKETS:
        if b <= n:
            return n
    return b


def quant_vectors(qp, lam, b: int, qv=None, lamv=None):
    """Per-block qindex/lambda operand vectors: scalar broadcast of
    (qp, lam), or the given per-block arrays (AQ)."""
    if qv is None:
        qv = np.full(b, int(qp.qindex), dtype=np.int32)
    else:
        qv = np.asarray(qv, dtype=np.int32)
    if lamv is None:
        lamqv = np.full(b, md.lam_to_q(lam), dtype=np.int64)
    else:
        lamqv = np.asarray([md.lam_to_q(lv) for lv in lamv],
                           dtype=np.int64)
    return qv, lamqv


def decide_block_batch_dev(plane, srcs, above1, left1, ha, hl, cands, qp,
                           size, lam, bd=8, nfl=3, reduced_tx_set=False,
                           forced=None, cfl_luma=None, tx_search=False,
                           rdoq=False, qv=None, lamv=None, edge=None):
    """Drop-in twin of md.decide_block_batch running the compute as one
    jitted device program (same integer decisions, same return types).
    ``qv``/``lamv``: optional per-block qindex / float-lambda arrays —
    one dispatch covers every AQ group (qindex is a traced operand, not
    a program key)."""
    b = srcs.shape[0]
    nb = _bucket(b)
    bw, bh = common.leaf_wh(size)
    pix = np.uint16 if bd > 8 else np.uint8

    def pad(a, fill_from=0):
        if a is None or nb == b:
            return a
        return np.concatenate([a, np.repeat(a[fill_from:fill_from + 1],
                                            nb - b, axis=0)], axis=0)

    # pixels/edges travel at narrow wire widths; programs re-widen
    srcs_p = pad(np.ascontiguousarray(srcs, dtype=pix))
    above_p = pad(np.ascontiguousarray(above1, dtype=np.int16))
    left_p = pad(np.ascontiguousarray(left1, dtype=np.int16))
    ha_p, hl_p = pad(np.asarray(ha)), pad(np.asarray(hl))
    cfl_p = pad(None if cfl_luma is None
                else np.ascontiguousarray(cfl_luma, dtype=pix))
    qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)
    qvec, lamqv = pad(qvec), pad(lamqv)
    fn = _build_decide(plane, tuple(map(tuple, cands)),
                       size if isinstance(size, int) else tuple(size),
                       bd, nfl, reduced_tx_set, forced is not None,
                       cfl_luma is not None, tx_search, rdoq,
                       edge is not None)
    ekw = ()
    if edge is not None:
        ekw = (pad(np.asarray(edge[0], dtype=np.int8)),
               pad(np.asarray(edge[1], dtype=np.int16)),
               pad(np.asarray(edge[2], dtype=np.int16)))
    if forced is not None:
        fm = pad(np.asarray(forced[0], dtype=np.int8))
        fd = pad(np.asarray(forced[1], dtype=np.int8))
        outs = fn(srcs_p, above_p, left_p, ha_p, hl_p, fm, fd, cfl_p,
                  qvec, lamqv, *ekw)
    else:
        outs = fn(srcs_p, above_p, left_p, ha_p, hl_p, cfl_p, qvec,
                  lamqv, *ekw)
    modes, deltas, qc, eo, rec, cost, alphas, tts = \
        [np.asarray(o)[:b] for o in outs]
    return (modes.astype(np.int64), deltas.astype(np.int64),
            qc.astype(np.int32), eo.astype(np.int32), rec.astype(pix),
            cost.astype(np.int64), alphas.astype(np.int64),
            tts.astype(np.int32))


@functools.lru_cache(maxsize=256)
def _build_decide_cost(plane, cands, size, bd, nfl, tx_search, rdoq):
    """Cost-only variant of _build_decide: the partition DP consumes
    only rd_cost, but the full program's outputs made every depth fetch
    MBs of unused qc/recon tensors through the ~30 MB/s tunnel. Same
    decide core — identical integer costs, so DP trees are unchanged."""
    core = make_decide_core(plane, cands, size, bd, nfl, False, False,
                            False, tx_search, rdoq=rdoq)

    def fn(srcs, above1, left1, ha, hl, qv, lamqv):
        # same operand dtypes as _build_decide's wire format
        outs = core(srcs, above1, left1, ha, hl, None, qv, lamqv)
        return outs[5]                     # rd_cost

    return jax.jit(fn)


def decide_cost_issue(plane, srcs, above1, left1, ha, hl, cands, qp,
                      size, lam, bd=8, nfl=3, tx_search=False,
                      rdoq=False):
    """Dispatch-only decide-cost for one depth/arm of the intra
    partition DP; returns (device cost handle, b). Fetch with
    np.asarray(out)[:b] AFTER issuing every depth (round trips
    overlap). Prep mirrors decide_block_batch_dev exactly so the
    returned costs are bit-identical to its rd_cost output."""
    b = srcs.shape[0]
    nb = _bucket(b)
    pix = np.uint16 if bd > 8 else np.uint8

    def pad(a):
        if a is None or nb == b:
            return a
        return np.concatenate([a, np.repeat(a[:1], nb - b, axis=0)],
                              axis=0)

    qvec, lamqv = quant_vectors(qp, lam, b)
    fn = _build_decide_cost(plane, tuple(map(tuple, cands)),
                            size if isinstance(size, int)
                            else tuple(size), bd, nfl, tx_search, rdoq)
    out = fn(pad(np.ascontiguousarray(srcs, dtype=pix)),
             pad(np.ascontiguousarray(above1, dtype=np.int16)),
             pad(np.ascontiguousarray(left1, dtype=np.int16)),
             pad(np.asarray(ha)), pad(np.asarray(hl)),
             pad(qvec), pad(lamqv))
    return out, b


# --- SATD open-loop depth scoring (intra partition DP) ---------------------------
# The reference's OIS scores open-loop intra candidates by SATD of the
# prediction residual (IntraOpenLoopSearchTheseModesOutputBest,
# EbMotionEstimation.c:7419) instead of a full T/Q loop; the partition
# DP only needs relative costs, so an 8x8 Hadamard |transform| sum is a
# faithful, ~10x cheaper stand-in for the per-depth full loop.

@functools.lru_cache(maxsize=128)
def _build_satd_modes(modes: tuple, size, bd: int):
    """Per-block min-over-modes SATD: predict each candidate mode from
    the (source-pixel) edges, size-matched Hadamard (tile cap 32) the
    residual, sum |coeffs|. Integer-exact twin of rd._satd_modes_host."""
    bw, bh = common.leaf_wh(size)
    tw, th = min(bw, 32), min(bh, 32)
    Hh = jnp.asarray(common.hadamard_n(th))
    Hw = jnp.asarray(common.hadamard_n(tw))

    def fn(srcs, above1, left1, ha, hl):
        best = None
        for m in modes:
            p = predict_any_j(m, 0, above1, left1, bw, bh, ha, hl,
                              bd).astype(jnp.int64)
            r = (srcs - p).reshape(-1, bh // th, th, bw // tw, tw) \
                .transpose(0, 1, 3, 2, 4)
            t = jnp.matmul(jnp.matmul(Hh, r), Hw)
            s = jnp.abs(t).sum(axis=(1, 2, 3, 4))
            best = s if best is None else jnp.minimum(best, s)
        return best

    return jax.jit(fn)


def satd_modes_dev(srcs, above1, left1, ha, hl, modes, size, bd=8):
    """[B] best-mode SATD on device (batch bucket-padded)."""
    b = srcs.shape[0]
    nb = _bucket(b)

    def pad(a):
        if a.shape[0] == nb:
            return a
        return np.concatenate(
            [a, np.repeat(a[-1:], nb - a.shape[0], axis=0)], axis=0)

    fn = _build_satd_modes(tuple(modes),
                           size if isinstance(size, int) else tuple(size),
                           bd)
    out = fn(pad(np.ascontiguousarray(srcs, dtype=np.int64)),
             pad(np.ascontiguousarray(above1, dtype=np.int32)),
             pad(np.ascontiguousarray(left1, dtype=np.int32)),
             pad(np.asarray(ha)), pad(np.asarray(hl)))
    return np.asarray(out)[:b].astype(np.int64)
