"""Loop-restoration syntax: per-SB unit coefficients + subexp primitives.

Mirrors the reference's loop_restoration_write_sb_coeffs / write_wiener_filter
/ write_sgrproj_filter (EbEntropyCoding.c:4576-4730) and the finite subexp
primitives (EbEntropyCoding.c:3360-3530; spec 4.10.6 su / decode_subexp).
Symbols ride the tile's range coder: the restore-type symbol uses an adapted
CDF; coefficients are raw equiprobable bits.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from svt_av1_tpu.ops import restoration as rst


# --- finite subexponential primitives ---------------------------------------

def _recenter_nonneg(r: int, v: int) -> int:
    if v > (r << 1):
        return v
    if v >= r:
        return (v - r) << 1
    return ((r - v) << 1) - 1


def _recenter_finite_nonneg(n: int, r: int, v: int) -> int:
    if (r << 1) <= n:
        return _recenter_nonneg(r, v)
    return _recenter_nonneg(n - 1 - r, n - 1 - v)


def _inv_recenter_nonneg(r: int, v: int) -> int:
    if v > (r << 1):
        return v
    if v & 1:
        return r - ((v + 1) >> 1)
    return r + (v >> 1)


def _inv_recenter_finite_nonneg(n: int, r: int, v: int) -> int:
    if (r << 1) <= n:
        return _inv_recenter_nonneg(r, v)
    return n - 1 - _inv_recenter_nonneg(n - 1 - r, v)


def write_primitive_quniform(w, n: int, v: int) -> None:
    if n <= 1:
        return
    l = (n - 1).bit_length()
    m = (1 << l) - n
    if v < m:
        w.write_literal(v, l - 1)
    else:
        w.write_literal(m + ((v - m) >> 1), l - 1)
        w.write_bit((v - m) & 1)


def read_primitive_quniform(r, n: int) -> int:
    if n <= 1:
        return 0
    l = (n - 1).bit_length()
    m = (1 << l) - n
    v = r.read_literal(l - 1)
    if v < m:
        return v
    return (v << 1) - m + r.read_bit()


def write_primitive_subexpfin(w, n: int, k: int, v: int) -> None:
    i = 0
    mk = 0
    while True:
        b = k + i - 1 if i else k
        a = 1 << b
        if n <= mk + 3 * a:
            write_primitive_quniform(w, n - mk, v - mk)
            return
        t = int(v >= mk + a)
        w.write_bit(t)
        if t:
            i += 1
            mk += a
        else:
            w.write_literal(v - mk, b)
            return


def read_primitive_subexpfin(r, n: int, k: int) -> int:
    i = 0
    mk = 0
    while True:
        b = k + i - 1 if i else k
        a = 1 << b
        if n <= mk + 3 * a:
            return read_primitive_quniform(r, n - mk) + mk
        if r.read_bit():
            i += 1
            mk += a
        else:
            return r.read_literal(b) + mk


def write_primitive_refsubexpfin(w, n: int, k: int, ref: int, v: int) -> None:
    write_primitive_subexpfin(w, n, k, _recenter_finite_nonneg(n, ref, v))


def read_primitive_refsubexpfin(r, n: int, k: int, ref: int) -> int:
    return _inv_recenter_finite_nonneg(n, ref,
                                       read_primitive_subexpfin(r, n, k))


def count_primitive_subexpfin(n: int, k: int, v: int) -> int:
    """Exact bit length of write_primitive_subexpfin (for RD)."""
    bits = 0
    i = 0
    mk = 0
    while True:
        b = k + i - 1 if i else k
        a = 1 << b
        if n <= mk + 3 * a:
            nn = n - mk
            if nn > 1:
                l = (nn - 1).bit_length()
                m = (1 << l) - nn
                bits += (l - 1) if (v - mk) < m else l
            return bits
        bits += 1
        if v >= mk + a:
            i += 1
            mk += a
        else:
            return bits + b


def count_primitive_refsubexpfin(n: int, k: int, ref: int, v: int) -> int:
    return count_primitive_subexpfin(n, k, _recenter_finite_nonneg(n, ref, v))


# --- per-plane reference state ----------------------------------------------

@dataclasses.dataclass
class LrRefState:
    """Predictors for LR coefficient coding, reset per frame at the first
    SB (av1_reset_loop_restoration; EbRestoration.h:250 defaults)."""
    wiener_v: Tuple[int, int, int] = rst.WIENER_TAP_MID
    wiener_h: Tuple[int, int, int] = rst.WIENER_TAP_MID
    sgr_xqd: Tuple[int, int] = dataclasses.field(
        default_factory=rst.default_sgr_xqd)


def _wiener_taps_io(is_chroma: bool):
    """(tap_index, n, k) triples actually coded; chroma tap0 fixed at 0."""
    out = []
    for t in ((1, 2) if is_chroma else (0, 1, 2)):
        n = rst.WIENER_TAP_MAX[t] - rst.WIENER_TAP_MIN[t] + 1
        out.append((t, n, rst.WIENER_FILT_SUBEXP_K[t]))
    return out


def write_wiener(w, taps_v, taps_h, ref: LrRefState, is_chroma: bool) -> None:
    for taps, rtaps in ((taps_v, ref.wiener_v), (taps_h, ref.wiener_h)):
        for t, n, k in _wiener_taps_io(is_chroma):
            write_primitive_refsubexpfin(
                w, n, k, rtaps[t] - rst.WIENER_TAP_MIN[t],
                taps[t] - rst.WIENER_TAP_MIN[t])
    ref.wiener_v = tuple(taps_v)
    ref.wiener_h = tuple(taps_h)


def read_wiener(r, ref: LrRefState, is_chroma: bool):
    out = []
    for rtaps in (ref.wiener_v, ref.wiener_h):
        taps = [0, 0, 0]
        for t, n, k in _wiener_taps_io(is_chroma):
            taps[t] = read_primitive_refsubexpfin(
                r, n, k, rtaps[t] - rst.WIENER_TAP_MIN[t]) \
                + rst.WIENER_TAP_MIN[t]
        out.append(tuple(taps))
    ref.wiener_v, ref.wiener_h = out[0], out[1]
    return out[0], out[1]


def count_wiener(taps_v, taps_h, ref: LrRefState, is_chroma: bool) -> int:
    bits = 0
    for taps, rtaps in ((taps_v, ref.wiener_v), (taps_h, ref.wiener_h)):
        for t, n, k in _wiener_taps_io(is_chroma):
            bits += count_primitive_refsubexpfin(
                n, k, rtaps[t] - rst.WIENER_TAP_MIN[t],
                taps[t] - rst.WIENER_TAP_MIN[t])
    return bits


def write_sgrproj(w, ep: int, xqd, ref: LrRefState) -> None:
    w.write_literal(ep, rst.SGRPROJ_PARAMS_BITS)
    r0, r1 = rst.SGR_PARAMS[ep][0]
    if r0 == 0:
        write_primitive_refsubexpfin(
            w, rst.SGRPROJ_PRJ_MAX1 - rst.SGRPROJ_PRJ_MIN1 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K, ref.sgr_xqd[1] - rst.SGRPROJ_PRJ_MIN1,
            xqd[1] - rst.SGRPROJ_PRJ_MIN1)
    elif r1 == 0:
        write_primitive_refsubexpfin(
            w, rst.SGRPROJ_PRJ_MAX0 - rst.SGRPROJ_PRJ_MIN0 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K, ref.sgr_xqd[0] - rst.SGRPROJ_PRJ_MIN0,
            xqd[0] - rst.SGRPROJ_PRJ_MIN0)
    else:
        write_primitive_refsubexpfin(
            w, rst.SGRPROJ_PRJ_MAX0 - rst.SGRPROJ_PRJ_MIN0 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K, ref.sgr_xqd[0] - rst.SGRPROJ_PRJ_MIN0,
            xqd[0] - rst.SGRPROJ_PRJ_MIN0)
        write_primitive_refsubexpfin(
            w, rst.SGRPROJ_PRJ_MAX1 - rst.SGRPROJ_PRJ_MIN1 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K, ref.sgr_xqd[1] - rst.SGRPROJ_PRJ_MIN1,
            xqd[1] - rst.SGRPROJ_PRJ_MIN1)
    ref.sgr_xqd = tuple(xqd)


def read_sgrproj(r, ref: LrRefState):
    ep = r.read_literal(rst.SGRPROJ_PARAMS_BITS)
    r0, r1 = rst.SGR_PARAMS[ep][0]
    xqd = list(ref.sgr_xqd)
    if r0 == 0:
        xqd[0] = 0
        xqd[1] = read_primitive_refsubexpfin(
            r, rst.SGRPROJ_PRJ_MAX1 - rst.SGRPROJ_PRJ_MIN1 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K,
            ref.sgr_xqd[1] - rst.SGRPROJ_PRJ_MIN1) + rst.SGRPROJ_PRJ_MIN1
    elif r1 == 0:
        xqd[0] = read_primitive_refsubexpfin(
            r, rst.SGRPROJ_PRJ_MAX0 - rst.SGRPROJ_PRJ_MIN0 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K,
            ref.sgr_xqd[0] - rst.SGRPROJ_PRJ_MIN0) + rst.SGRPROJ_PRJ_MIN0
        xqd[1] = 0
    else:
        xqd[0] = read_primitive_refsubexpfin(
            r, rst.SGRPROJ_PRJ_MAX0 - rst.SGRPROJ_PRJ_MIN0 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K,
            ref.sgr_xqd[0] - rst.SGRPROJ_PRJ_MIN0) + rst.SGRPROJ_PRJ_MIN0
        xqd[1] = read_primitive_refsubexpfin(
            r, rst.SGRPROJ_PRJ_MAX1 - rst.SGRPROJ_PRJ_MIN1 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K,
            ref.sgr_xqd[1] - rst.SGRPROJ_PRJ_MIN1) + rst.SGRPROJ_PRJ_MIN1
    ref.sgr_xqd = tuple(xqd)
    return ep, tuple(xqd)


def count_sgrproj(ep: int, xqd, ref: LrRefState) -> int:
    bits = rst.SGRPROJ_PARAMS_BITS
    r0, r1 = rst.SGR_PARAMS[ep][0]
    if r0 != 0:
        bits += count_primitive_refsubexpfin(
            rst.SGRPROJ_PRJ_MAX0 - rst.SGRPROJ_PRJ_MIN0 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K, ref.sgr_xqd[0] - rst.SGRPROJ_PRJ_MIN0,
            xqd[0] - rst.SGRPROJ_PRJ_MIN0)
    if r1 != 0:
        bits += count_primitive_refsubexpfin(
            rst.SGRPROJ_PRJ_MAX1 - rst.SGRPROJ_PRJ_MIN1 + 1,
            rst.SGRPROJ_PRJ_SUBEXP_K, ref.sgr_xqd[1] - rst.SGRPROJ_PRJ_MIN1,
            xqd[1] - rst.SGRPROJ_PRJ_MIN1)
    return bits


# --- per-unit coefficients (loop_restoration_write_sb_coeffs :4668) ----------

def write_lr_unit(w, fc, frame_rtype: int, rui, ref: LrRefState,
                  is_chroma: bool) -> None:
    t = rui.restoration_type
    if frame_rtype == rst.RESTORE_SWITCHABLE:
        w.write_symbol(t, fc.switchable_restore, rst.RESTORE_SWITCHABLE_TYPES)
        if t == rst.RESTORE_WIENER:
            write_wiener(w, rui.wiener_v, rui.wiener_h, ref, is_chroma)
        elif t == rst.RESTORE_SGRPROJ:
            write_sgrproj(w, rui.sgr_ep, rui.sgr_xqd, ref)
    elif frame_rtype == rst.RESTORE_WIENER:
        w.write_symbol(int(t != rst.RESTORE_NONE), fc.wiener_restore, 2)
        if t != rst.RESTORE_NONE:
            write_wiener(w, rui.wiener_v, rui.wiener_h, ref, is_chroma)
    elif frame_rtype == rst.RESTORE_SGRPROJ:
        w.write_symbol(int(t != rst.RESTORE_NONE), fc.sgrproj_restore, 2)
        if t != rst.RESTORE_NONE:
            write_sgrproj(w, rui.sgr_ep, rui.sgr_xqd, ref)


def read_lr_unit(r, fc, frame_rtype: int, ref: LrRefState,
                 is_chroma: bool):
    rui = rst.RestorationUnitInfo()
    if frame_rtype == rst.RESTORE_SWITCHABLE:
        t = r.read_symbol(fc.switchable_restore, rst.RESTORE_SWITCHABLE_TYPES)
        rui.restoration_type = t
        if t == rst.RESTORE_WIENER:
            rui.wiener_v, rui.wiener_h = read_wiener(r, ref, is_chroma)
        elif t == rst.RESTORE_SGRPROJ:
            rui.sgr_ep, rui.sgr_xqd = read_sgrproj(r, ref)
    elif frame_rtype == rst.RESTORE_WIENER:
        if r.read_symbol(fc.wiener_restore, 2):
            rui.restoration_type = rst.RESTORE_WIENER
            rui.wiener_v, rui.wiener_h = read_wiener(r, ref, is_chroma)
    elif frame_rtype == rst.RESTORE_SGRPROJ:
        if r.read_symbol(fc.sgrproj_restore, 2):
            rui.restoration_type = rst.RESTORE_SGRPROJ
            rui.sgr_ep, rui.sgr_xqd = read_sgrproj(r, ref)
    return rui


def write_sb_units(w, fc, rinfos, refs, mi_row: int, mi_col: int,
                   width: int, height: int) -> None:
    """Write every restoration unit whose syntax lands at this SB
    (call site mirror of EbEntropyCoding.c:5429)."""
    if rinfos is None:
        return
    for p in range(3):
        ri = rinfos[p]
        if ri.frame_restoration_type == rst.RESTORE_NONE:
            continue
        ss = 1 if p else 0
        Wp = (width + ss) >> ss
        Hp = (height + ss) >> ss
        for idx in rst.units_in_sb(mi_row, mi_col, 16, Wp, Hp,
                                   ri.unit_size, ss, ss):
            write_lr_unit(w, fc, ri.frame_restoration_type, ri.units[idx],
                          refs[p], p > 0)
