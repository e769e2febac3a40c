"""Mode decision kernel: fast loop (pred SSE prune) + full loop (T/Q/IQ RD).

The reference's two-stage search (ProductPerformFastLoop
``EbProductCodingLoop.c:1185`` pruning to NFL candidates, then
AV1PerformFullLoop ``:2004`` with transform/quant/recon RD) as one batched
function. Every encoder backend (per-block oracle, wavefront, device) calls
THIS function, so mode decisions are bit-identical across backends by
construction.
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.ops import intra as intra_ops
from svt_av1_tpu.ops import quant as quant_ops
from svt_av1_tpu.ops import transforms as tx_ops
from svt_av1_tpu.pipeline import common
from svt_av1_tpu.utils.blocks import DCT_DCT, get_scan


import functools

# --- integer RD cost arithmetic -------------------------------------------------
# All mode-decision costs are integers so the host NumPy path and the JAX
# device twin produce bit-identical decisions (the reference likewise uses
# integer RDCOST, EbRateDistortionCost.c). Rates are fixed-point 1/512-bit
# units (q9); lambda is fixed-point 1/256 (q8);
# cost = (dist << 9) + ((lam_q * rate_q9) >> 8)  ~  512 * (dist + lam*rate).
RATE_Q = 9
LAM_Q = 8


def lam_to_q(lam: float) -> int:
    """Quantize a float lambda to the integer RD multiplier."""
    return max(1, int(round(lam * (1 << LAM_Q))))


def rdcost(dist, lam_q, rate_q9):
    """Integer RD cost (int64-safe for 64x64 10-bit blocks).
    ``lam_q`` may be a scalar or a per-block array."""
    d = np.asarray(dist, dtype=np.int64)
    r = np.asarray(rate_q9, dtype=np.int64)
    lq = np.asarray(lam_q, dtype=np.int64)
    return (d << RATE_Q) + ((lq * r) >> LAM_Q)


@functools.lru_cache(maxsize=1)
def _prob_bits_lut() -> np.ndarray:
    """bits_q9[p] = round(-log2(p/32768) * 512) for p in 0..32768
    (p=0 treated as 1). The single source of probability->bits
    conversion, shared by every rate estimate."""
    p = np.maximum(np.arange(32769, dtype=np.float64), 1.0)
    return np.round((15.0 - np.log2(p)) * 512.0).astype(np.int32)


@functools.lru_cache(maxsize=8)
def _eob_bits_lut(n_max: int = 4097) -> np.ndarray:
    """round(log2(e + 1) * 512) for e in 0..n_max-1 (eob position
    rate model term)."""
    e = np.arange(n_max, dtype=np.float64)
    return np.round(np.log2(e + 1.0) * 512.0).astype(np.int32)


def coeff_rate_proxy(qcoeff: np.ndarray) -> np.ndarray:
    """~bits to code quantized levels, [B] from [B, n] (fallback when
    no CDF bucket is known)."""
    aq = np.abs(qcoeff).astype(np.float64)
    return np.sum(np.where(aq > 0, 2.0 + 2.0 * np.log2(1.0 + aq), 0.0),
                  axis=1)


@functools.lru_cache(maxsize=32)
def _level_cost_lut(qctx: int, plane_type: int, txs_ctx: int) -> np.ndarray:
    """Expected q9 bits per |level| 0..255 from the default coefficient
    CDFs, context-averaged (the role of the reference's CDF->cost
    tables, av1_estimate_coefficients_rate EbMdRateEstimation.c:392).
    Integer so host and device rate computations agree exactly."""
    from svt_av1_tpu.entropy.cdf import default_tables
    tabs = default_tables()
    base = tabs["coeff_base"][qctx, txs_ctx, plane_type]    # [42, 5]
    br = tabs["coeff_br"][min(qctx, 3), min(txs_ctx, 3),
                          plane_type]                        # [21, 5]
    bits = _prob_bits_lut()

    def avg_bits(rows, sym):
        hi = np.full(len(rows), 32768, dtype=np.int64) if sym == 0 \
            else rows[:, sym - 1].astype(np.int64)
        p = np.maximum(hi - rows[:, sym].astype(np.int64), 1)
        return int(bits[p].astype(np.int64).sum() // len(rows))

    b = [avg_bits(base, s) for s in range(4)]
    brb = [avg_bits(br, s) for s in range(4)]
    lut = np.zeros(256, dtype=np.int64)
    for lvl in range(1, 256):
        cost = 1 << RATE_Q  # sign
        if lvl < 3:
            cost += b[lvl]
        else:
            cost += b[3]
            rem = lvl - 3
            for _ in range(4):          # BR_CDF rounds
                sym = min(rem, 3)
                cost += brb[sym]
                rem -= sym
                if sym < 3:
                    break
            if rem > 0:                  # golomb tail
                length = int(rem + 1).bit_length()
                cost += (2 * length - 1) << RATE_Q
        lut[lvl] = cost
    lut[0] = b[0]
    return lut


def coeff_rate_cdf(qcoeff: np.ndarray, eob: np.ndarray, qindex: int,
                   plane_type: int, tx_size: int) -> np.ndarray:
    """CDF-LUT coefficient rate [B] in q9 bits: txb-skip / eob-position
    bits plus per-level costs for the eob-prefix of each block."""
    from svt_av1_tpu.entropy import coeff_ctx as cc
    from svt_av1_tpu.entropy.cdf import coef_qctx
    qctx = coef_qctx(qindex)
    lut = _level_cost_lut(qctx, plane_type, int(cc.txs_ctx(tx_size)))
    aq = np.minimum(np.abs(qcoeff.reshape(qcoeff.shape[0], -1)), 255)
    n = aq.shape[1]
    eobi = eob.astype(np.int64)
    # only the eob-prefix is coded: drop the per-zero cost of the tail
    rate = lut[aq].sum(axis=1) - (n - eobi) * lut[0]
    rate = np.maximum(rate, 0)
    ebl = _eob_bits_lut()
    rate += np.where(eobi > 0, (3 << RATE_Q) + ebl[eobi], 307)
    return rate


def _icdf_bits(icdf_row, sym: int) -> int:
    """q9 bits of -log2 p(sym) from an inverse-CDF row (estimation)."""
    hi = 32768 if sym == 0 else int(icdf_row[sym - 1])
    p = max(hi - int(icdf_row[sym]), 1)
    return int(_prob_bits_lut()[p])


@functools.lru_cache(maxsize=64)
def candidate_mode_bits(cands: tuple, plane: int,
                        cfl_allowed: bool = False) -> np.ndarray:
    """Static per-candidate q9 syntax-rate estimate [M] from the default
    CDFs (the reference's MD rate tables are likewise CDF-derived,
    EbMdRateEstimation.c). Context-averaged; used only to bias the RD
    search, never for actual coding."""
    from svt_av1_tpu.entropy.cdf import default_tables
    from svt_av1_tpu.ops import intra_dir
    tabs = default_tables()
    if plane == 0:
        rows = tabs["kf_y_mode"].reshape(-1, 14)
    else:
        rows = tabs["uv_mode"][int(cfl_allowed)]
    out = []
    for mode, delta in cands:
        bits = sum(_icdf_bits(r, mode) for r in rows) // len(rows)
        if intra_dir.is_directional(mode):
            bits += _icdf_bits(tabs["angle_delta"][mode - 1], delta + 3)
        if mode == 13:  # UV_CFL_PRED: joint sign + alpha index
            bits += 7 << RATE_Q
        out.append(bits)
    arr = np.array(out, dtype=np.int64)
    if plane == 1:
        # chroma mode rate calibration knob (coarse-q experiments —
        # tools/rd_experiment.py); 1.0 = raw CDF estimate
        import os
        s = float(os.environ.get("SVT_TPU_CHROMA_RATE_SCALE", "1.0"))
        if s != 1.0:
            arr = (arr.astype(np.float64) * s).astype(np.int64)
    return arr


def rdoq_trim(qcoeff, dqcoeff, eob, scan, tx_size, qindex: int,
              plane_type: int, lam_q: int):
    """Trailing-coefficient RD trim (RDOQ-lite).

    Walks each block's scan tail and zeroes the suffix whose level+eob
    rate (CDF LUT model, same one ``coeff_rate_cdf`` charges) costs more
    than the pixel distortion it saves — the dominant win of the
    reference ecosystem's av1_optimize_txb at coarse quantizers, without
    the per-coefficient trellis. qcoeff/dqcoeff [B, n] raster; eob [B]
    scan units. Returns updated (qcoeff, dqcoeff, eob); pure integer
    math (exact device-twin semantics in ops.device_md.rdoq_trim_j).

    ``lam_q`` is the mode-decision lambda; the trim itself runs at HALF
    that lambda. Block-local trims degrade the recon that later blocks
    predict from (intra chains), a cost the local model cannot see —
    av1_optimize_txb halves its rdmult for the same reason. At full
    lambda the trim loses 1.3 dB on diagonal stripes; at half lambda it
    keeps ~95% of the rate saving with no measurable quality loss.
    """
    lam_q = lam_q >> 1
    from svt_av1_tpu.entropy import coeff_ctx as cc
    from svt_av1_tpu.entropy.cdf import coef_qctx
    from svt_av1_tpu.ops import quant as quant_ops
    b, n = qcoeff.shape
    qctx = coef_qctx(qindex)
    lut = _level_cost_lut(qctx, plane_type, int(cc.txs_ctx(tx_size)))
    ebl = _eob_bits_lut()
    # pixel-SSE of zeroing one stored dq value: asymptotically
    # dq^2 * 4^log_scale / 64 (impulse-response energy of the exact
    # inverse transforms), inflated for the downshifted 32/64-point
    # sizes where inverse-rounding noise adds a term at the small dq
    # magnitudes the trim actually considers (measured Q12 multipliers)
    gq12 = (64, 330, 2700)[quant_ops.tx_scale(tx_size)]

    lv = np.minimum(np.abs(qcoeff[:, scan]), 255)            # [B, n]
    dqs = dqcoeff[:, scan].astype(np.int64)
    k = np.arange(n)
    in_prefix = k[None, :] < eob[:, None]
    dd = np.where(in_prefix, (dqs * dqs * gq12) >> 12, 0)    # dist of drop
    dr = np.where(in_prefix, lut[lv], 0)                     # rate of keep
    # suffix sums: suf[:, e] = sum over k >= e
    sufd = np.cumsum(dd[:, ::-1], axis=1)[:, ::-1]
    sufr = np.cumsum(dr[:, ::-1], axis=1)[:, ::-1]
    sufd = np.concatenate([sufd, np.zeros((b, 1), np.int64)], axis=1)
    sufr = np.concatenate([sufr, np.zeros((b, 1), np.int64)], axis=1)
    # eob-position rate at each candidate e (0 -> txb-skip flag only)
    e = np.arange(n + 1)
    ebits = np.where(e > 0, (3 << RATE_Q) + ebl[e], 307)
    cur_ebits = np.where(eob > 0, (3 << RATE_Q) + ebl[eob], 307)
    # cost delta of trimming to e (vs keeping eob): added dist - saved rate
    dcost = (sufd << RATE_Q) - ((int(lam_q) * (
        sufr + cur_ebits[:, None] - ebits[None, :])) >> LAM_Q)
    valid = e[None, :] <= eob[:, None]
    dcost = np.where(valid, dcost, np.int64(1) << 62)
    new_eob = np.argmin(dcost, axis=1).astype(np.int32)
    changed = new_eob < eob
    if not np.any(changed):
        return qcoeff, dqcoeff, eob
    keep = k[None, :] < new_eob[:, None]                     # scan-domain
    keep_raster = np.empty_like(keep)
    keep_raster[:, scan] = keep
    qcoeff = np.where(keep_raster, qcoeff, 0)
    dqcoeff = np.where(keep_raster, dqcoeff, 0)
    return qcoeff.astype(np.int32), dqcoeff.astype(np.int32), new_eob


def _full_loop(srcs, preds, tts, tx_size, size, qp, bd, plane_type=0,
               rdoq_lam_q=None):
    """T/Q/IQ/recon for one candidate per block.
    srcs/preds [B,h,w]; tts [B]; size: int (square) or (w, h). Returns
    (qcoeff [B,ch,cw], eob [B], recon [B,h,w], dist [B] int64,
    rate [B] int64 q9). Rate uses the CDF-derived level-cost LUT
    bucketed by qindex. ``rdoq_lam_q``: when set, apply the RDOQ-lite
    trailing trim at that integer lambda before reconstruction."""
    b = srcs.shape[0]
    w, h = common.leaf_wh(size)
    cw, ch = common.coded_dims(tx_size)
    log_scale = quant_ops.tx_scale(tx_size)
    qcoeff = np.zeros((b, ch, cw), dtype=np.int32)
    eob = np.zeros(b, dtype=np.int32)
    recon = np.empty((b, h, w), dtype=np.int64)
    rate = np.zeros(b, dtype=np.int64)
    resid = srcs - preds
    for tt in np.unique(tts):
        sel = np.nonzero(tts == tt)[0]
        coeffs = tx_ops.forward_tx2d(resid[sel], int(tt), w, h)
        coded = coeffs[:, :ch, :cw].reshape(len(sel), -1)
        scan = get_scan(tx_size, int(tt))
        qc, dq, eo = quant_ops.quantize(coded, scan, qp, log_scale)
        if rdoq_lam_q is not None:
            qc, dq, eo = rdoq_trim(qc, dq, eo, scan, tx_size,
                                   qp.qindex, plane_type, rdoq_lam_q)
        qcoeff[sel] = qc.reshape(-1, ch, cw)
        eob[sel] = eo
        rate[sel] = coeff_rate_cdf(qc.reshape(-1, ch, cw), eo,
                                   qp.qindex, plane_type, tx_size)
        full = np.zeros((len(sel), h, w), dtype=np.int64)
        full[:, :ch, :cw] = dq.reshape(-1, ch, cw)
        r = tx_ops.inverse_tx2d(full, int(tt), w, h, bd=bd)
        recon[sel] = tx_ops.recon_add(preds[sel], r, bd=bd)
    dist = np.sum((srcs - recon) ** 2, axis=(1, 2)).astype(np.int64)
    return qcoeff, eob, recon, dist, rate


UV_CFL = 13


def decide_block_batch(plane: int, srcs, above1, left1, ha, hl, cands,
                       qp, size: int, lam: float, bd: int = 8, nfl: int = 3,
                       reduced_tx_set: bool = False, forced=None,
                       cfl_luma=None, tx_search: bool = False,
                       rdoq: bool = False, edge=None):
    """Full mode decision + coding for a batch of same-sized blocks.

    Returns (modes [B], deltas [B], qcoeff [B,ch,cw], eob [B],
    recon [B,s,s] pixel dtype, rd_cost [B], alphas [B], tx_types [B]).
    ``tx_search``: luma-only TX-type RD sweep over the intra tx set of
    this tx size (reference encode_pass_tx_search, EbCodingLoop.c:516).
    ``forced``: (modes, deltas) arrays — skip the search (V plane reuses
    U's choice; CfL alphas are re-fit per plane). ``cfl_luma``: co-located
    reconstructed luma [B, 2s, 2s] — enables the CfL candidate (chroma
    planes of blocks <= 32x32)."""
    from svt_av1_tpu.ops import cfl as cfl_ops
    b = srcs.shape[0]
    bw, bh = common.leaf_wh(size)
    tx_size = common.tx_size_for_rect(bw, bh, plane)
    pix = np.uint16 if bd > 8 else np.uint8

    rlq = lam_to_q(lam) if (rdoq and qp.qindex > 0) else None

    def tts_for(modes_arr):
        if plane == 0:
            return np.zeros(b, dtype=np.int32)
        return np.array([common.chroma_tx_type(int(m), tx_size,
                                               reduced_tx_set)
                         for m in modes_arr])

    def cfl_pred_and_alpha(sel=None):
        """CfL prediction + fitted alpha for (a subset of) the batch."""
        idxs = np.arange(b) if sel is None else sel
        ac = cfl_ops.luma_ac_420(cfl_luma[idxs])
        dc = intra_ops.predict(0, above1[idxs, 1:], left1[idxs, 1:],
                               above1[idxs, 0], bw, bh,
                               have_above=ha[idxs], have_left=hl[idxs],
                               bd=bd)
        alpha = cfl_ops.fit_alpha(ac, srcs[idxs], dc)
        return cfl_ops.predict(dc, ac, alpha, bd=bd), alpha

    lamq = lam_to_q(lam)
    if forced is not None:
        fmodes, fdeltas = np.asarray(forced[0]), np.asarray(forced[1])
        alphas = np.zeros(b, dtype=np.int64)
        preds = np.empty((b, bh, bw), dtype=np.int64)
        for m, d in set(zip(fmodes.tolist(), fdeltas.tolist())):
            sel = np.nonzero((fmodes == m) & (fdeltas == d))[0]
            if m == UV_CFL:
                preds[sel], alphas[sel] = cfl_pred_and_alpha(sel)
            else:
                preds[sel] = intra_ops.predict_any(
                    int(m), int(d), above1[sel], left1[sel], bw, bh,
                    ha[sel], hl[sel], bd=bd,
                    edge=None if edge is None
                    else tuple(e[sel] for e in edge))
        ftts = tts_for(fmodes)
        qc, eo, rec, dist, rate = _full_loop(srcs, preds, ftts,
                                             tx_size, size, qp, bd,
                                             plane_type=int(plane > 0),
                                             rdoq_lam_q=rlq)
        return (fmodes, fdeltas, qc, eo, rec.astype(pix),
                rdcost(dist, lamq, rate), alphas, ftts)

    preds = np.stack([
        intra_ops.predict_any(m, d, above1, left1, bw, bh, ha, hl,
                              bd=bd, edge=edge)
        for m, d in cands]).astype(np.int64)                  # [M,B,h,w]
    all_cands = list(cands)
    cand_alphas = None
    if plane == 1 and cfl_luma is not None:
        cfl_pred, cand_alphas = cfl_pred_and_alpha()
        preds = np.concatenate([preds, cfl_pred[None]], axis=0)
        all_cands = all_cands + [(UV_CFL, 0)]
    sse = np.sum((srcs[None] - preds) ** 2, axis=(2, 3))      # [M,B]
    k = min(nfl, len(all_cands))
    carr = np.asarray(all_cands)
    mode_bits = candidate_mode_bits(tuple(map(tuple, all_cands)), plane,
                                    cfl_luma is not None)
    # fast-loop cost = SSE + lambda * mode rate (the reference's fast
    # loop likewise rates candidates, ProductPerformFastLoop); stable
    # sort so every backend breaks ties identically
    fast_cost = rdcost(sse, lamq, np.broadcast_to(mode_bits[:, None],
                                                  sse.shape))
    order = np.argsort(fast_cost, axis=0, kind="stable")[:k]  # [K,B]
    best_cost = None
    out = None
    for kk in range(k):
        idx = order[kk]                                       # [B]
        modes_k = carr[idx, 0]
        deltas_k = carr[idx, 1]
        preds_k = preds[idx, np.arange(b)]
        qc, eo, rec, dist, rate = _full_loop(srcs, preds_k,
                                             tts_for(modes_k), tx_size,
                                             size, qp, bd,
                                             plane_type=int(plane > 0),
                                             rdoq_lam_q=rlq)
        cost = rdcost(dist, lamq, rate + mode_bits[idx])
        if best_cost is None:
            best_cost = cost
            out = [modes_k, deltas_k, qc, eo, rec, cost]
            out_pred = preds_k
        else:
            better = cost < best_cost
            best_cost = np.where(better, cost, best_cost)
            out[0] = np.where(better, modes_k, out[0])
            out[1] = np.where(better, deltas_k, out[1])
            out[2] = np.where(better[:, None, None], qc, out[2])
            out[3] = np.where(better, eo, out[3])
            out[4] = np.where(better[:, None, None], rec, out[4])
            out[5] = best_cost
            out_pred = np.where(better[:, None, None], preds_k, out_pred)
    tts = tts_for(out[0])
    if tx_search and plane == 0:
        tts = _luma_tx_search(srcs, out_pred, out, tx_size, size, qp, bd,
                              lam, rdoq=rdoq)
    alphas = np.zeros(b, dtype=np.int64)
    if cand_alphas is not None:
        alphas = np.where(out[0] == UV_CFL, cand_alphas, 0)
    return (out[0], out[1], out[2], out[3], out[4].astype(pix), out[5],
            alphas, tts)


def _luma_tx_search(srcs, preds, out, tx_size, size, qp, bd, lam,
                    rdoq: bool = False):
    """Sweep the intra ext-tx set for the chosen mode of each block,
    updating qcoeff/eob/recon/cost in place; returns per-block tx types.
    Signaling rate uses default-CDF bit costs of the intra_ext_tx symbol
    (reference av1_get_syntax_rate_from_cdf, EbMdRateEstimation.c:48)."""
    from svt_av1_tpu.entropy import tx_sets
    from svt_av1_tpu.entropy.cdf import default_tables
    from svt_av1_tpu.utils.blocks import TX_SIZE_SQR
    b = srcs.shape[0]
    lamq = lam_to_q(lam)
    tts = np.zeros(b, dtype=np.int32)
    set_type = tx_sets.ext_tx_set_type(tx_size, False, False)
    nsyms = tx_sets.NUM_EXT_TX_SET[set_type]
    if nsyms <= 1:
        return tts
    eset = tx_sets.ext_tx_set(tx_size, False, False)
    sqr = int(TX_SIZE_SQR[tx_size])
    table = default_tables()["intra_ext_tx"][eset][sqr]  # [13, nsyms+1]
    modes = np.clip(out[0], 0, 12).astype(np.int64)
    rows = table[modes].astype(np.int64)                 # [B, nsyms+1]
    pbl = _prob_bits_lut()

    def sig_bits(tt):
        sym = int(tx_sets.EXT_TX_IND[set_type][tt])
        hi = np.full(b, 32768, dtype=np.int64) if sym == 0 \
            else rows[:, sym - 1]
        p = np.maximum(hi - rows[:, sym], 1)
        return pbl[p].astype(np.int64)

    allowed = [int(t) for t in np.nonzero(
        tx_sets.EXT_TX_USED[set_type])[0]]
    best_part = None
    rlq = lamq if (rdoq and qp.qindex > 0) else None
    for tt in allowed:
        qc, eo, rec, dist, rate = _full_loop(
            srcs, preds, np.full(b, tt, dtype=np.int32), tx_size, size,
            qp, bd, rdoq_lam_q=rlq)
        part = rdcost(dist, lamq, rate + sig_bits(tt))
        if best_part is None:                 # DCT_DCT baseline (tt==0)
            best_part = part
            continue
        better = part < best_part
        if not better.any():
            continue
        out[5] = np.where(better, out[5] - best_part + part, out[5])
        best_part = np.where(better, part, best_part)
        out[2] = np.where(better[:, None, None], qc, out[2])
        out[3] = np.where(better, eo, out[3])
        out[4] = np.where(better[:, None, None], rec, out[4])
        tts = np.where(better, tt, tts)
    return tts


def inter_tx_search(srcs, preds, cost, qc, eo, rec, tx_size, size, qp,
                    bd, lam, rdoq: bool = False):
    """Encode-pass TX-type sweep for decided inter blocks (the analogue
    of the reference's encode_pass_tx_search, EbCodingLoop.c:516): with
    the winning prediction fixed, try every type in the inter ext-tx set
    and keep the best RD. Updates cost/qc/eo/rec IN PLACE; returns the
    per-block tx types. Signaling rate uses default-CDF bit costs of the
    inter_ext_tx symbol."""
    from svt_av1_tpu.entropy import tx_sets
    from svt_av1_tpu.entropy.cdf import default_tables
    from svt_av1_tpu.utils.blocks import TX_SIZE_SQR
    b = srcs.shape[0]
    lamq = lam_to_q(lam)
    tts = np.zeros(b, dtype=np.int32)
    set_type = tx_sets.ext_tx_set_type(tx_size, True, False)
    nsyms = tx_sets.NUM_EXT_TX_SET[set_type]
    if nsyms <= 1 or qp.qindex == 0:
        return tts
    eset = tx_sets.ext_tx_set(tx_size, True, False)
    sqr = int(TX_SIZE_SQR[tx_size])
    row = default_tables()["inter_ext_tx"][eset][sqr].astype(np.int64)
    pbl = _prob_bits_lut()

    def sig_bits(tt):
        sym = int(tx_sets.EXT_TX_IND[set_type][tt])
        hi = 32768 if sym == 0 else int(row[sym - 1])
        p = max(int(hi - row[sym]), 1)
        return int(pbl[p])

    allowed = [int(t) for t in np.nonzero(
        tx_sets.EXT_TX_USED[set_type])[0]]
    best_part = None
    rlq = lamq if (rdoq and qp.qindex > 0) else None
    for tt in allowed:
        q2, e2, r2, dist, rate = _full_loop(
            srcs, preds, np.full(b, tt, dtype=np.int32), tx_size, size,
            qp, bd, rdoq_lam_q=rlq)
        part = rdcost(dist, lamq, rate + sig_bits(tt))
        if best_part is None:                 # DCT_DCT baseline (tt==0)
            best_part = part
            continue
        better = part < best_part
        if not better.any():
            continue
        cost[...] = np.where(better, cost - best_part + part, cost)
        best_part = np.where(better, part, best_part)
        qc[...] = np.where(better[:, None, None], q2, qc)
        eo[...] = np.where(better, e2, eo)
        rec[...] = np.where(better[:, None, None], r2, rec)
        tts = np.where(better, tt, tts)
    return tts
