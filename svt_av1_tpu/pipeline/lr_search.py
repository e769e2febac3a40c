"""Loop-restoration parameter search (encoder side).

Counterpart of the reference's EbRestorationPick.c
(search_wiener_unit/search_sgrproj_unit/restoration_search, :1100-1500):
per restoration unit, fit Wiener taps by alternating separable least
squares and SGR projections by 2x2 least squares over an ep sweep, then
score NONE/WIENER/SGRPROJ exactly (running the real stripe filter) and
pick the per-plane frame restoration type by total RD.

Deviations from the reference (encoder-side only; any choice emits a
conformant stream): tap rates are counted against the frame-default
predictor rather than the running ref, and the ep sweep uses a fixed
subset refined by exact evaluation.
"""

from __future__ import annotations

from typing import List

import numpy as np

from svt_av1_tpu.entropy import lr as lr_syntax
from svt_av1_tpu.entropy.cdf import FrameContext
from svt_av1_tpu.ops import restoration as rst

_EP_SWEEP = (0, 3, 6, 9, 11, 14)  # spans all three (r0, r1) classes


def _cdf_bits(icdf: np.ndarray, s: int, nsyms: int) -> float:
    hi = 32768 if s == 0 else int(icdf[s - 1])
    p = max(hi - int(icdf[s]), 1)
    return float(np.log2(32768.0 / p))


def _pad3(x: np.ndarray) -> np.ndarray:
    return np.pad(x, 3, mode="edge")


def _fit_wiener(dgd: np.ndarray, org: np.ndarray, is_chroma: bool):
    """Alternating separable LS fit; returns quantized (v_taps, h_taps).
    Models the role of wiener_decompose_sep_sym (EbRestorationPick.c)."""
    d = _pad3(dgd.astype(np.float64))
    o = org.astype(np.float64)
    h, w = org.shape
    lo = 1 if is_chroma else 0  # chroma: tap0 fixed at 0 (5-tap window)

    def taps7(g):
        g0, g1, g2 = g
        return np.array([g0, g1, g2, 1 - 2 * (g0 + g1 + g2), g2, g1, g0])

    def conv_h(g):
        f = taps7(g)
        out = np.zeros((h + 6, w))
        for k in range(7):
            out += f[k] * d[:, k:k + w]
        return out

    def solve_dir(z, vertical):
        """Fit symmetric normalized taps in one direction given the other
        direction's filtered signal z ([h+6, w] if vertical)."""
        cols = []
        if vertical:
            base = z[3:3 + h]
            pairs = [z[3 - j:3 - j + h] + z[3 + j:3 + j + h]
                     for j in (3, 2, 1)]
        else:
            zp = np.pad(z, ((0, 0), (3, 3)), mode="edge")
            base = zp[:, 3:3 + w]
            pairs = [zp[:, 3 - j:3 - j + w] + zp[:, 3 + j:3 + j + w]
                     for j in (3, 2, 1)]
        tgt = (o - base).ravel()
        cols = [(p - 2 * base).ravel() for p in pairs[lo:]]
        A = np.stack(cols, axis=1)
        try:
            g, *_ = np.linalg.lstsq(A, tgt, rcond=None)
        except np.linalg.LinAlgError:
            g = np.zeros(len(cols))
        full = np.zeros(3)
        full[lo:] = g
        return full

    gv = np.array(rst.WIENER_TAP_MID, dtype=np.float64) / 128.0
    gh = gv.copy()
    if is_chroma:
        gv[0] = gh[0] = 0.0
    for _ in range(3):
        zh = conv_h(gh)                       # [h+6, w]
        gv = solve_dir(zh, vertical=True)
        # vertical-filtered full-width signal for the horizontal fit
        fv = taps7(gv)
        zv = np.zeros((h, w + 6))
        for k in range(7):
            zv += fv[k] * d[k:k + h, :]
        gh = solve_dir(zv[:, 3:3 + w], vertical=False)
    out = []
    for g in (gv, gh):
        t = [int(np.clip(round(g[i] * 128),
                         rst.WIENER_TAP_MIN[i], rst.WIENER_TAP_MAX[i]))
             for i in range(3)]
        if is_chroma:
            t[0] = 0
        out.append(tuple(t))
    return out[0], out[1]


def _fit_sgr_xqd(dgd: np.ndarray, org: np.ndarray, ep: int, bd: int):
    """Projection LS (get_proj_subspace analogue) -> quantized xqd."""
    ext = _pad3(dgd.astype(np.int64))
    r, _s = rst.SGR_PARAMS[ep]
    d = dgd.astype(np.int64)
    u = d << rst.SGRPROJ_RST_BITS
    f0 = (rst._sgr_flt_fast(ext, r[0], _s[0], bd) - u).astype(np.float64) \
        if r[0] > 0 else None
    f1 = (rst._sgr_flt_full(ext, r[1], _s[1], bd) - u).astype(np.float64) \
        if r[1] > 0 else None
    b = ((org.astype(np.int64) - d) << (rst.SGRPROJ_RST_BITS
                                        + rst.SGRPROJ_PRJ_BITS)) \
        .astype(np.float64).ravel()
    cols = [f.ravel() for f in (f0, f1) if f is not None]
    A = np.stack(cols, axis=1)
    ata = A.T @ A
    try:
        xq = np.linalg.solve(ata + np.eye(len(cols)) * 1e-9, A.T @ b)
    except np.linalg.LinAlgError:
        xq = np.zeros(len(cols))
    if r[0] == 0:
        xq0, xq1 = 0, int(round(xq[0]))
        xqd1 = int(np.clip((1 << rst.SGRPROJ_PRJ_BITS) - xq1,
                           rst.SGRPROJ_PRJ_MIN1, rst.SGRPROJ_PRJ_MAX1))
        return (0, xqd1)
    if r[1] == 0:
        xqd0 = int(np.clip(round(xq[0]),
                           rst.SGRPROJ_PRJ_MIN0, rst.SGRPROJ_PRJ_MAX0))
        return (xqd0, 0)
    xqd0 = int(np.clip(round(xq[0]),
                       rst.SGRPROJ_PRJ_MIN0, rst.SGRPROJ_PRJ_MAX0))
    xqd1 = int(np.clip((1 << rst.SGRPROJ_PRJ_BITS) - xqd0 - round(xq[1]),
                       rst.SGRPROJ_PRJ_MIN1, rst.SGRPROJ_PRJ_MAX1))
    return (xqd0, xqd1)


def _unit_sse(plane, bounds, rui, lim, ss, bd, org, scratch) -> float:
    """Exact SSE of one candidate via the real stripe filter."""
    v0, v1, h0, h1 = lim
    rst.filter_unit(plane, bounds, rui, lim, ss, bd, scratch)
    diff = scratch[v0:v1, h0:h1].astype(np.int64) \
        - org[v0:v1, h0:h1].astype(np.int64)
    return float((diff * diff).sum())


def search_restoration(recon, src, bounds, width: int, height: int,
                       bd: int, base_q_idx: int, lam: float,
                       unit_size_y: int = 256) -> List[rst.RestorationInfo]:
    """Pick per-plane frame restoration type + per-unit params.

    recon: post-CDEF padded planes (filter input); src: padded source.
    bounds: per-plane saved deblock boundary lines. Returns one
    RestorationInfo per plane (units populated for non-NONE types)."""
    fc = FrameContext(base_q_idx)
    out = []
    for p in range(3):
        ss = 1 if p else 0
        W = (width + ss) >> ss
        H = (height + ss) >> ss
        size = max(64, unit_size_y >> ss)
        plane = recon[p][:H, :W].astype(np.int64)
        org = src[p][:H, :W].astype(np.int64)
        scratch = plane.copy()
        lims, hn, vn = rst.unit_limits(W, H, size, ss)
        ref = lr_syntax.LrRefState()
        per_unit = []
        for lim in lims:
            v0, v1, h0, h1 = lim
            dgd_u = plane[v0:v1, h0:h1]
            org_u = org[v0:v1, h0:h1]
            sse_none = float(((dgd_u - org_u) ** 2).sum())
            # Wiener
            tv, th = _fit_wiener(dgd_u, org_u, p > 0)
            rui_w = rst.RestorationUnitInfo(rst.RESTORE_WIENER, tv, th)
            sse_w = _unit_sse(plane, bounds[p], rui_w, lim, ss, bd, org,
                              scratch)
            bits_w = lr_syntax.count_wiener(tv, th, lr_syntax.LrRefState(),
                                            p > 0)
            # SGR: approximate sweep, exact eval of the best two
            approx = []
            for ep in _EP_SWEEP:
                xqd = _fit_sgr_xqd(dgd_u, org_u, ep, bd)
                approx.append((ep, xqd))
            scored = []
            for ep, xqd in approx:
                rui_s = rst.RestorationUnitInfo(rst.RESTORE_SGRPROJ,
                                                sgr_ep=ep, sgr_xqd=xqd)
                scored.append((_unit_sse(plane, bounds[p], rui_s, lim, ss,
                                         bd, org, scratch), rui_s))
            scored.sort(key=lambda t: t[0])
            sse_s, rui_s = scored[0]
            bits_s = lr_syntax.count_sgrproj(rui_s.sgr_ep, rui_s.sgr_xqd,
                                             lr_syntax.LrRefState())
            per_unit.append((sse_none, (sse_w, bits_w, rui_w),
                             (sse_s, bits_s, rui_s)))
        # frame-type decision by totals
        b_sw = [_cdf_bits(fc.switchable_restore, t, 3) for t in range(3)]
        b_w = [_cdf_bits(fc.wiener_restore, t, 2) for t in range(2)]
        b_s = [_cdf_bits(fc.sgrproj_restore, t, 2) for t in range(2)]
        tot = {rst.RESTORE_NONE: 0.0, rst.RESTORE_WIENER: 0.0,
               rst.RESTORE_SGRPROJ: 0.0, rst.RESTORE_SWITCHABLE: 0.0}
        choice = {rst.RESTORE_WIENER: [], rst.RESTORE_SGRPROJ: [],
                  rst.RESTORE_SWITCHABLE: []}
        for sse_none, (sse_w, bits_w, rui_w), (sse_s, bits_s, rui_s) \
                in per_unit:
            tot[rst.RESTORE_NONE] += sse_none
            cn = sse_none + lam * b_w[0]
            cw = sse_w + lam * (b_w[1] + bits_w)
            if cw < cn:
                tot[rst.RESTORE_WIENER] += cw
                choice[rst.RESTORE_WIENER].append(rui_w)
            else:
                tot[rst.RESTORE_WIENER] += cn
                choice[rst.RESTORE_WIENER].append(
                    rst.RestorationUnitInfo(rst.RESTORE_NONE))
            cn = sse_none + lam * b_s[0]
            cs = sse_s + lam * (b_s[1] + bits_s)
            if cs < cn:
                tot[rst.RESTORE_SGRPROJ] += cs
                choice[rst.RESTORE_SGRPROJ].append(rui_s)
            else:
                tot[rst.RESTORE_SGRPROJ] += cn
                choice[rst.RESTORE_SGRPROJ].append(
                    rst.RestorationUnitInfo(rst.RESTORE_NONE))
            cands = [(sse_none + lam * b_sw[rst.RESTORE_NONE],
                      rst.RestorationUnitInfo(rst.RESTORE_NONE)),
                     (sse_w + lam * (b_sw[rst.RESTORE_WIENER] + bits_w),
                      rui_w),
                     (sse_s + lam * (b_sw[rst.RESTORE_SGRPROJ] + bits_s),
                      rui_s)]
            c, rui = min(cands, key=lambda t: t[0])
            tot[rst.RESTORE_SWITCHABLE] += c
            choice[rst.RESTORE_SWITCHABLE].append(rui)
        ftype = min(tot, key=tot.get)
        ri = rst.RestorationInfo(frame_restoration_type=ftype,
                                 unit_size=size, hunits=hn, vunits=vn)
        if ftype != rst.RESTORE_NONE:
            ri.units = choice[ftype]
        out.append(ri)
    return out
