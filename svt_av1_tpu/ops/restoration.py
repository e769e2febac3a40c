"""AV1 loop restoration: Wiener + self-guided (SGR) filters, stripe
machinery, and restoration-unit geometry.

Normative behavior mirrors the reference's EbRestoration.c
(av1_loop_restoration_filter_unit :1173, selfguided_restoration_internal
:906, av1_wiener_convolve_add_src convolve.c:115, boundary handling
setup_processing_stripe_boundary :378 / save_tile_row_boundary_lines
:1691) and AV1 spec 7.17. Re-implemented as vectorized NumPy over whole
stripes — the TPU-side analogue batches units; the host path here is the
bit-exact oracle shared by encoder and decoder.

Key structural facts (spec 7.17.2 / reference :320-363):
- The frame is processed in 64-px (luma) stripes offset upward by 8, so
  the first stripe is 56 rows; chroma 4:2:0 uses 32/28 with offset 4.
- Across interior stripe boundaries the filter context is NOT the
  post-CDEF neighbor rows: 2 saved *deblocked* (pre-CDEF) rows are
  duplicated into the 3 border rows ([a0,a0,a1] above, [b0,b1,b1]
  below). Frame top/bottom use edge replication.
- Restoration units are `unit_size` squares; the last column/row unit
  extends up to 1.5x (foreach_rest_unit_in_tile :1345).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

# --- constants (reference EbRestoration.h:35-161) ----------------------------
RESTORE_NONE = 0
RESTORE_WIENER = 1
RESTORE_SGRPROJ = 2
RESTORE_SWITCHABLE = 3
RESTORE_SWITCHABLE_TYPES = 3

RESTORATION_BORDER = 3
RESTORATION_UNIT_OFFSET = 8
RESTORATION_PROC_UNIT_SIZE = 64

WIENER_HALFWIN = 3
WIENER_WIN = 7
WIENER_WIN_CHROMA = 5
WIENER_FILT_PREC_BITS = 7
WIENER_ROUND0_BITS = 3
# tap midpoints and coded ranges (EbRestoration.h:135-161)
WIENER_TAP_MID = (3, -7, 15)
WIENER_TAP_BITS = (4, 5, 6)
WIENER_TAP_MIN = tuple(m - (1 << b) // 2
                       for m, b in zip(WIENER_TAP_MID, WIENER_TAP_BITS))
WIENER_TAP_MAX = tuple(m - 1 + (1 << b) // 2
                       for m, b in zip(WIENER_TAP_MID, WIENER_TAP_BITS))
WIENER_FILT_SUBEXP_K = (1, 2, 3)  # TAP0/1/2_SUBEXP_K

SGRPROJ_PARAMS_BITS = 4
SGRPROJ_PRJ_BITS = 7
SGRPROJ_RST_BITS = 4
SGRPROJ_SGR_BITS = 8
SGRPROJ_MTABLE_BITS = 20
SGRPROJ_RECIP_BITS = 12
SGRPROJ_PRJ_MIN0 = -(1 << SGRPROJ_PRJ_BITS) * 3 // 4      # -96
SGRPROJ_PRJ_MAX0 = SGRPROJ_PRJ_MIN0 + (1 << SGRPROJ_PRJ_BITS) - 1  # 31
SGRPROJ_PRJ_MIN1 = -(1 << SGRPROJ_PRJ_BITS) // 4          # -32
SGRPROJ_PRJ_MAX1 = SGRPROJ_PRJ_MIN1 + (1 << SGRPROJ_PRJ_BITS) - 1  # 95
SGRPROJ_PRJ_SUBEXP_K = 4

# (r0, r1), (s0, s1) per ep (reference EbRestoration.c:167)
SGR_PARAMS = (
    ((2, 1), (140, 3236)), ((2, 1), (112, 2158)), ((2, 1), (93, 1618)),
    ((2, 1), (80, 1438)), ((2, 1), (70, 1295)), ((2, 1), (58, 1177)),
    ((2, 1), (47, 1079)), ((2, 1), (37, 996)), ((2, 1), (30, 925)),
    ((2, 1), (25, 863)), ((0, 1), (-1, 2589)), ((0, 1), (-1, 1618)),
    ((0, 1), (-1, 1177)), ((0, 1), (-1, 925)), ((2, 0), (56, -1)),
    ((2, 0), (22, -1)),
)

# x -> round(256*x/(x+1)) with two normative fixups: [0] = 1 (so the
# blend never fully discards the pixel) and [255] = 256 (reference :755;
# verified against the reference table in tests/test_lr.py)
_X_BY_XPLUS1 = np.array([round(256 * x / (x + 1)) for x in range(256)],
                        dtype=np.int64)
_X_BY_XPLUS1[0] = 1
_X_BY_XPLUS1[255] = 256

# round(2^12 / n) for n = 1..25 (reference :775)
_ONE_BY_X = np.array([4096, 2048, 1365, 1024, 819, 683, 585, 512, 455, 410,
                      372, 341, 315, 293, 273, 256, 241, 228, 216, 205, 195,
                      186, 178, 171, 164], dtype=np.int64)


def _round2(x, n):
    """ROUND_POWER_OF_TWO for (possibly negative) ints/arrays."""
    if n == 0:
        return x
    return (x + (1 << (n - 1))) >> n


@dataclasses.dataclass
class RestorationUnitInfo:
    """Per-unit filter choice (reference RestorationUnitInfo)."""
    restoration_type: int = RESTORE_NONE
    # Wiener: 3 coded taps per direction (tap3 derived); chroma tap0 == 0
    wiener_v: Tuple[int, int, int] = WIENER_TAP_MID
    wiener_h: Tuple[int, int, int] = WIENER_TAP_MID
    # SGR: ep index + coded projection pair
    sgr_ep: int = 0
    sgr_xqd: Tuple[int, int] = (0, 0)


def default_sgr_xqd() -> Tuple[int, int]:
    """set_default_sgrproj (EbRestoration.h:243)."""
    return ((SGRPROJ_PRJ_MIN0 + SGRPROJ_PRJ_MAX0) // 2,
            (SGRPROJ_PRJ_MIN1 + SGRPROJ_PRJ_MAX1) // 2)


@dataclasses.dataclass
class RestorationInfo:
    """Per-plane frame restoration state."""
    frame_restoration_type: int = RESTORE_NONE
    unit_size: int = 256            # plane-resolution unit size
    units: List[RestorationUnitInfo] = dataclasses.field(default_factory=list)
    hunits: int = 0
    vunits: int = 0


# --- unit geometry (reference :199-204, :1330-1390) --------------------------

def count_units(size: int, dim: int) -> int:
    return max((dim + (size >> 1)) // size, 1)


def unit_limits(W: int, H: int, size: int, ss_y: int):
    """Rectangles [v0,v1,h0,h1) of every restoration unit in raster order,
    with the 8-px upward stripe offset applied to rows
    (foreach_rest_unit_in_tile, reference :1345-1390)."""
    ext = size * 3 // 2
    voff = RESTORATION_UNIT_OFFSET >> ss_y
    rows = []
    y0 = 0
    while y0 < H:
        rem = H - y0
        h = rem if rem < ext else size
        v0, v1 = y0, y0 + h
        v0 = max(0, v0 - voff)
        if v1 < H:
            v1 -= voff
        rows.append((v0, v1))
        y0 += h
    cols = []
    x0 = 0
    while x0 < W:
        rem = W - x0
        w = rem if rem < ext else size
        cols.append((x0, x0 + w))
        x0 += w
    out = []
    for (v0, v1) in rows:
        for (h0, h1) in cols:
            out.append((v0, v1, h0, h1))
    return out, len(cols), len(rows)


def units_in_sb(mi_row: int, mi_col: int, sb_mi: int, plane_W: int,
                plane_H: int, size: int, ss_x: int, ss_y: int):
    """Restoration-unit index ranges whose syntax is coded at this SB
    (av1_loop_restoration_corners_in_sb, reference :1818)."""
    hunits = count_units(size, plane_W)
    vunits = count_units(size, plane_H)
    mi_sz_x = 4 >> ss_x
    mi_sz_y = 4 >> ss_y
    rcol0 = (mi_col * mi_sz_x + size - 1) // size
    rrow0 = (mi_row * mi_sz_y + size - 1) // size
    rcol1 = min(((mi_col + sb_mi) * mi_sz_x + size - 1) // size, hunits)
    rrow1 = min(((mi_row + sb_mi) * mi_sz_y + size - 1) // size, vunits)
    if rcol0 >= rcol1 or rrow0 >= rrow1:
        return []
    return [r * hunits + c for r in range(rrow0, rrow1)
            for c in range(rcol0, rcol1)]


# --- boundary lines (reference save_tile_row_boundary_lines :1691) -----------

def save_deblock_boundary_lines(plane: np.ndarray, H: int, ss_y: int):
    """2 deblocked rows above/below every interior stripe boundary.

    Returns {stripe_index: (above2 [2,W] or None, below2 [2,W] or None)}
    keyed by stripe; row y0 of stripe s is s*stripe_h - off (s>0)."""
    stripe_h = RESTORATION_PROC_UNIT_SIZE >> ss_y
    off = RESTORATION_UNIT_OFFSET >> ss_y
    out = {}
    s = 0
    while True:
        y0 = max(0, s * stripe_h - off)
        if y0 >= H:
            break
        y1 = min((s + 1) * stripe_h - off, H)
        above = plane[y0 - 2:y0].copy() if s > 0 else None
        below = plane[y1:y1 + 2].copy() if y1 < H else None
        out[s] = (above, below)
        s += 1
    return out


# --- filters -----------------------------------------------------------------

def wiener_taps7(t: Tuple[int, int, int]) -> np.ndarray:
    """3 coded taps -> full 7-tap kernel with derived center
    (spec 7.17.1; sum == 128 including the add-src 128)."""
    t0, t1, t2 = t
    return np.array([t0, t1, t2, 128 - 2 * (t0 + t1 + t2), t2, t1, t0],
                    dtype=np.int64)


def wiener_filter(src_ext: np.ndarray, taps_v, taps_h, bd: int) -> np.ndarray:
    """7-tap separable Wiener on an edge-prepared window.

    src_ext: [h+6, w+6] int; returns [h, w]. Mirrors
    av1_wiener_convolve_add_src_c (convolve.c:115): horizontal pass with
    round0 and intermediate clamp, vertical pass with round1."""
    fv = wiener_taps7(taps_v)
    fh = wiener_taps7(taps_h)
    r0 = 3 if bd < 12 else 5
    r1 = 2 * WIENER_FILT_PREC_BITS - r0
    h = src_ext.shape[0] - 6
    w = src_ext.shape[1] - 6
    s = src_ext.astype(np.int64)
    # horizontal over all h+6 rows (vertical taps need 3 each side)
    hsum = np.zeros((h + 6, w), dtype=np.int64)
    for k in range(7):
        hsum += fh[k] * s[:, k:k + w]
    hsum += 1 << (bd + WIENER_FILT_PREC_BITS - 1)
    mid = np.clip(_round2(hsum, r0), 0,
                  (1 << (bd + 1 + WIENER_FILT_PREC_BITS - r0)) - 1)
    vsum = np.zeros((h, w), dtype=np.int64)
    for k in range(7):
        vsum += fv[k] * mid[k:k + h]
    vsum -= 1 << (bd + r1 - 1)
    return np.clip(_round2(vsum, r1), 0, (1 << bd) - 1)


def _winsum(x: np.ndarray, r: int) -> np.ndarray:
    """(2r+1)x(2r+1) full-window sums; output reduced by 2r per dim."""
    n = 2 * r + 1
    v = x.cumsum(0)
    v = np.vstack([v[n - 1:n], v[n:] - v[:-n]])
    hsum = v.cumsum(1)
    return np.hstack([hsum[:, n - 1:n], hsum[:, n:] - hsum[:, :-n]])


def _sgr_ab(dgd_ext: np.ndarray, r: int, s: int, h: int, w: int, bd: int):
    """A/B grids on rows/cols [-1, h]x[-1, w] of the unit interior
    (selfguided_restoration_internal, reference :906-1005)."""
    d = dgd_ext.astype(np.int64)
    # window centers (-1..h, -1..w) map to ext (2..h+4, 2..w+4); full
    # (2r+1) windows start at ext (2-r, 2-r)
    a_full = _winsum(d * d, r)
    b_full = _winsum(d, r)
    i0 = 2 - r  # offset of center (-1,-1) window within the reduced array
    A = a_full[i0:i0 + h + 2, i0:i0 + w + 2]
    B = b_full[i0:i0 + h + 2, i0:i0 + w + 2]
    n = (2 * r + 1) * (2 * r + 1)
    a = _round2(A, 2 * (bd - 8))
    b = _round2(B, bd - 8)
    p = np.maximum(a * n - b * b, 0)
    z = _round2(p * s, SGRPROJ_MTABLE_BITS)
    A2 = _X_BY_XPLUS1[np.minimum(z, 255)]
    B2 = _round2((256 - A2) * B * _ONE_BY_X[n - 1], SGRPROJ_RECIP_BITS)
    return A2, B2


def _sgr_flt_full(dgd_ext: np.ndarray, r: int, s: int, bd: int) -> np.ndarray:
    """Box filter, every row (radius_idx 1 path, reference :906)."""
    h, w = dgd_ext.shape[0] - 6, dgd_ext.shape[1] - 6
    A, B = _sgr_ab(dgd_ext, r, s, h, w, bd)
    d = dgd_ext[3:3 + h, 3:3 + w].astype(np.int64)
    # 3x3 cross/diag weighting 4/3 (reference :1005-1022)
    c = slice(1, h + 1)
    m = slice(1, w + 1)
    up, dn, lf, rt = slice(0, h), slice(2, h + 2), slice(0, w), slice(2, w + 2)
    a = (A[c, m] + A[c, lf] + A[c, rt] + A[up, m] + A[dn, m]) * 4 + \
        (A[up, lf] + A[up, rt] + A[dn, lf] + A[dn, rt]) * 3
    b = (B[c, m] + B[c, lf] + B[c, rt] + B[up, m] + B[dn, m]) * 4 + \
        (B[up, lf] + B[up, rt] + B[dn, lf] + B[dn, rt]) * 3
    v = a * d + b
    return _round2(v, SGRPROJ_SGR_BITS + 5 - SGRPROJ_RST_BITS)


def _sgr_flt_fast(dgd_ext: np.ndarray, r: int, s: int, bd: int) -> np.ndarray:
    """Box filter computed on odd rows only (radius_idx 0 "fast" path,
    reference :776-905): even output rows blend the rows above/below."""
    h, w = dgd_ext.shape[0] - 6, dgd_ext.shape[1] - 6
    A, B = _sgr_ab(dgd_ext, r, s, h, w, bd)
    d = dgd_ext[3:3 + h, 3:3 + w].astype(np.int64)
    out = np.zeros((h, w), dtype=np.int64)
    m = slice(1, w + 1)
    lf, rt = slice(0, w), slice(2, w + 2)
    # even rows i: use A/B rows i-1, i+1 (grid offset +1)
    ev = np.arange(0, h, 2)
    a = (A[ev, m] + A[ev + 2, m]) * 6 + \
        (A[ev, lf] + A[ev, rt] + A[ev + 2, lf] + A[ev + 2, rt]) * 5
    b = (B[ev, m] + B[ev + 2, m]) * 6 + \
        (B[ev, lf] + B[ev, rt] + B[ev + 2, lf] + B[ev + 2, rt]) * 5
    out[0::2] = _round2(a * d[0::2] + b, SGRPROJ_SGR_BITS + 5
                        - SGRPROJ_RST_BITS)
    # odd rows i: use A/B row i
    od = np.arange(1, h, 2) + 1
    a = A[od, m] * 6 + (A[od, lf] + A[od, rt]) * 5
    b = B[od, m] * 6 + (B[od, lf] + B[od, rt]) * 5
    out[1::2] = _round2(a * d[1::2] + b, SGRPROJ_SGR_BITS + 4
                        - SGRPROJ_RST_BITS)
    return out


def decode_xq(xqd, ep) -> Tuple[int, int]:
    """reference decode_xq (:741)."""
    r = SGR_PARAMS[ep][0]
    if r[0] == 0:
        return 0, (1 << SGRPROJ_PRJ_BITS) - xqd[1]
    if r[1] == 0:
        return xqd[0], 0
    return xqd[0], (1 << SGRPROJ_PRJ_BITS) - xqd[0] - xqd[1]


def sgr_filter(dgd_ext: np.ndarray, ep: int, xqd, bd: int) -> np.ndarray:
    """Self-guided restoration of one window
    (apply_selfguided_restoration_c, reference :1040)."""
    (r0, r1), (s0, s1) = SGR_PARAMS[ep]
    h, w = dgd_ext.shape[0] - 6, dgd_ext.shape[1] - 6
    d = dgd_ext[3:3 + h, 3:3 + w].astype(np.int64)
    u = d << SGRPROJ_RST_BITS
    v = u << SGRPROJ_PRJ_BITS
    xq = decode_xq(xqd, ep)
    if r0 > 0:
        v = v + xq[0] * (_sgr_flt_fast(dgd_ext, r0, s0, bd) - u)
    if r1 > 0:
        v = v + xq[1] * (_sgr_flt_full(dgd_ext, r1, s1, bd) - u)
    w_ = _round2(v, SGRPROJ_PRJ_BITS + SGRPROJ_RST_BITS)
    return np.clip(w_, 0, (1 << bd) - 1)


# --- stripe orchestration ----------------------------------------------------

def _stripe_window(plane: np.ndarray, bounds: dict, v0: int, v1: int,
                   h0: int, h1: int, ss_y: int) -> np.ndarray:
    """Build the [v1-v0+6, h1-h0+6] filter input for one stripe-piece:
    post-CDEF interior with stripe-boundary rows replaced by saved
    deblocked lines (setup_processing_stripe_boundary, reference :378)."""
    H, W = plane.shape
    stripe_h = RESTORATION_PROC_UNIT_SIZE >> ss_y
    off = RESTORATION_UNIT_OFFSET >> ss_y
    s = (v0 + off) // stripe_h
    rows = []
    if v0 == 0:
        top = plane[0:1]
        rows += [top, top, top]
    else:
        a = bounds[s][0]
        assert a is not None
        rows += [a[0:1], a[0:1], a[1:2]]
    rows.append(plane[v0:v1])
    if v1 >= H:
        bot = plane[H - 1:H]
        rows += [bot, bot, bot]
    else:
        b = bounds[s][1]
        assert b is not None
        rows += [b[0:1], b[1:2], b[1:2]]
    win = np.concatenate(rows, axis=0).astype(np.int64)
    # horizontal 3-px edge extension of the [h0,h1) slice
    wslice = win[:, max(h0 - 3, 0):min(h1 + 3, W)]
    padl = 3 - (h0 - max(h0 - 3, 0))
    padr = 3 - (min(h1 + 3, W) - h1)
    if padl or padr:
        wslice = np.pad(wslice, ((0, 0), (padl, padr)), mode="edge")
    return wslice


def unit_stripe_pieces(limits, ss_y: int):
    """Stripe pieces [(y, h)] covering a unit's rows [v0, v1) — the
    vertical spans filter_unit processes independently (each gets its own
    boundary-line window)."""
    v0, v1, _, _ = limits
    stripe_h = RESTORATION_PROC_UNIT_SIZE >> ss_y
    off = RESTORATION_UNIT_OFFSET >> ss_y
    out = []
    y = v0
    while y < v1:
        next_boundary = ((y + off) // stripe_h + 1) * stripe_h - off
        h = min(next_boundary, v1) - y
        out.append((y, h))
        y += h
    return out


def filter_unit(plane: np.ndarray, bounds: dict, rui: RestorationUnitInfo,
                limits, ss_y: int, bd: int, dst: np.ndarray) -> None:
    """Filter one restoration unit stripe by stripe into dst
    (av1_loop_restoration_filter_unit, reference :1173)."""
    v0, v1, h0, h1 = limits
    if rui.restoration_type == RESTORE_NONE:
        dst[v0:v1, h0:h1] = plane[v0:v1, h0:h1]
        return
    stripe_h = RESTORATION_PROC_UNIT_SIZE >> ss_y
    off = RESTORATION_UNIT_OFFSET >> ss_y
    y = v0
    while y < v1:
        first = (y + off) // stripe_h == 0
        nominal = stripe_h - (off if first else 0)
        stripe_top = y
        # stripes start at s*stripe_h - off; height of the piece is up to
        # the next stripe boundary or the unit end
        next_boundary = ((y + off) // stripe_h + 1) * stripe_h - off
        h = min(next_boundary, v1) - y
        assert h <= nominal
        win = _stripe_window(plane, bounds, stripe_top, stripe_top + h,
                             h0, h1, ss_y)
        if rui.restoration_type == RESTORE_WIENER:
            out = wiener_filter(win, rui.wiener_v, rui.wiener_h, bd)
        else:
            out = sgr_filter(win, rui.sgr_ep, rui.sgr_xqd, bd)
        dst[stripe_top:stripe_top + h, h0:h1] = out
        y += h
    return


def loop_restoration_filter_frame(planes: List[np.ndarray],
                                  rinfos: List[RestorationInfo],
                                  bounds: List[dict], width: int,
                                  height: int, bd: int) -> None:
    """Apply LR in place to the cropped-resolution region of each plane
    (av1_loop_restoration_filter_frame, reference :1283)."""
    for p in range(3):
        ri = rinfos[p]
        if ri.frame_restoration_type == RESTORE_NONE:
            continue
        ss = 1 if p else 0
        W = (width + ss) >> ss
        H = (height + ss) >> ss
        plane = planes[p][:H, :W].astype(np.int64)
        dst = plane.copy()
        lims, hn, vn = unit_limits(W, H, ri.unit_size, ss)
        assert len(ri.units) == len(lims), (len(ri.units), len(lims))
        for rui, lim in zip(ri.units, lims):
            filter_unit(plane, bounds[p], rui, lim, ss, bd, dst)
        planes[p][:H, :W] = dst.astype(planes[p].dtype)
