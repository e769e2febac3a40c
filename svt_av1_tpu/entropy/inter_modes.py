"""Inter-frame mode syntax: is_inter, ref frames, inter mode, DRL.

Reference behavior: WriteInterMode ``EbEntropyCoding.c:1724``, WriteDrlIdx
``:1756``, WriteRefFrames ``:2560ff`` with the single-ref context functions
``:2473-2520``. Specialized to single-reference coding (LAST; the compound
paths land with the bidirectional rounds), with the context derivations
implemented generally from neighbor ref counts.
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.pipeline.mvp import (GLOBALMV, INTRA_FRAME, LAST_FRAME,
                                      NEARESTMV, NEARMV, NEWMV, MvStackResult)

# ref frame enum (AV1)
LAST2_FRAME = 2
LAST3_FRAME = 3
GOLDEN_FRAME = 4
BWDREF_FRAME = 5
ALTREF2_FRAME = 6
ALTREF_FRAME = 7


def neighbor_ref_counts(state, mi_row: int, mi_col: int):
    """Counts of each ref frame among the above/left neighbors
    (av1_collect_neighbors_ref_counts)."""
    counts = np.zeros(8, dtype=np.int32)
    if mi_row > 0:
        r = int(state.ref[mi_row - 1, mi_col])
        if r > INTRA_FRAME:
            counts[r] += 1
    if mi_col > 0:
        r = int(state.ref[mi_row, mi_col - 1])
        if r > INTRA_FRAME:
            counts[r] += 1
    return counts


def _two_way_ctx(c0: int, c1: int) -> int:
    return 1 if c0 == c1 else (0 if c0 < c1 else 2)


def intra_inter_ctx(state, mi_row: int, mi_col: int) -> int:
    """Context for the is_inter flag (spec intra_inter_context)."""
    au = mi_row > 0
    al = mi_col > 0
    above_intra = au and state.ref[mi_row - 1, mi_col] == INTRA_FRAME
    left_intra = al and state.ref[mi_row, mi_col - 1] == INTRA_FRAME
    if au and al:
        return 3 if (above_intra and left_intra) \
            else int(above_intra or left_intra)
    if au or al:
        return 2 * int(above_intra if au else left_intra)
    return 0


def write_is_inter(w, fc, state, mi_row, mi_col, is_inter: int) -> None:
    w.write_symbol(is_inter, fc.intra_inter[intra_inter_ctx(state, mi_row,
                                                            mi_col)], 2)


def read_is_inter(r, fc, state, mi_row, mi_col) -> int:
    return r.read_symbol(fc.intra_inter[intra_inter_ctx(state, mi_row,
                                                        mi_col)], 2)


def write_single_ref(w, fc, state, mi_row, mi_col, ref: int) -> None:
    """Single-reference signaling tree (spec read_ref_frames single path)."""
    counts = neighbor_ref_counts(state, mi_row, mi_col)
    fwd = counts[LAST_FRAME] + counts[LAST2_FRAME] + counts[LAST3_FRAME] \
        + counts[GOLDEN_FRAME]
    bwd = counts[BWDREF_FRAME] + counts[ALTREF2_FRAME] + counts[ALTREF_FRAME]
    p1_ctx = _two_way_ctx(fwd, bwd)
    is_bwd = int(ref >= BWDREF_FRAME)
    w.write_symbol(is_bwd, fc.single_ref[p1_ctx][0], 2)
    if is_bwd:
        # p2: ALTREF vs BWDREF/ALTREF2
        p2_ctx = _two_way_ctx(counts[BWDREF_FRAME] + counts[ALTREF2_FRAME],
                              counts[ALTREF_FRAME])
        w.write_symbol(int(ref == ALTREF_FRAME), fc.single_ref[p2_ctx][1],
                       2)
        if ref != ALTREF_FRAME:
            p6_ctx = _two_way_ctx(counts[BWDREF_FRAME],
                                  counts[ALTREF2_FRAME])
            w.write_symbol(int(ref == ALTREF2_FRAME),
                           fc.single_ref[p6_ctx][5], 2)
        return
    ll2 = counts[LAST_FRAME] + counts[LAST2_FRAME]
    l3g = counts[LAST3_FRAME] + counts[GOLDEN_FRAME]
    p3_ctx = _two_way_ctx(ll2, l3g)
    is_l3g = int(ref in (LAST3_FRAME, GOLDEN_FRAME))
    w.write_symbol(is_l3g, fc.single_ref[p3_ctx][2], 2)
    if is_l3g:
        p5_ctx = _two_way_ctx(counts[LAST3_FRAME], counts[GOLDEN_FRAME])
        w.write_symbol(int(ref == GOLDEN_FRAME), fc.single_ref[p5_ctx][4], 2)
    else:
        p4_ctx = _two_way_ctx(counts[LAST_FRAME], counts[LAST2_FRAME])
        w.write_symbol(int(ref == LAST2_FRAME), fc.single_ref[p4_ctx][3], 2)


def read_single_ref(r, fc, state, mi_row, mi_col) -> int:
    counts = neighbor_ref_counts(state, mi_row, mi_col)
    fwd = counts[LAST_FRAME] + counts[LAST2_FRAME] + counts[LAST3_FRAME] \
        + counts[GOLDEN_FRAME]
    bwd = counts[BWDREF_FRAME] + counts[ALTREF2_FRAME] + counts[ALTREF_FRAME]
    if r.read_symbol(fc.single_ref[_two_way_ctx(fwd, bwd)][0], 2):
        p2_ctx = _two_way_ctx(counts[BWDREF_FRAME] + counts[ALTREF2_FRAME],
                              counts[ALTREF_FRAME])
        if r.read_symbol(fc.single_ref[p2_ctx][1], 2):
            return ALTREF_FRAME
        p6_ctx = _two_way_ctx(counts[BWDREF_FRAME], counts[ALTREF2_FRAME])
        return ALTREF2_FRAME if r.read_symbol(fc.single_ref[p6_ctx][5], 2) \
            else BWDREF_FRAME
    ll2 = counts[LAST_FRAME] + counts[LAST2_FRAME]
    l3g = counts[LAST3_FRAME] + counts[GOLDEN_FRAME]
    if r.read_symbol(fc.single_ref[_two_way_ctx(ll2, l3g)][2], 2):
        p5 = _two_way_ctx(counts[LAST3_FRAME], counts[GOLDEN_FRAME])
        return GOLDEN_FRAME if r.read_symbol(fc.single_ref[p5][4], 2) \
            else LAST3_FRAME
    p4 = _two_way_ctx(counts[LAST_FRAME], counts[LAST2_FRAME])
    return LAST2_FRAME if r.read_symbol(fc.single_ref[p4][3], 2) \
        else LAST_FRAME


def write_inter_mode(w, fc, mode: int, res: MvStackResult) -> None:
    """WriteInterMode (EbEntropyCoding.c:1724)."""
    w.write_symbol(int(mode != NEWMV), fc.newmv[res.newmv_ctx], 2)
    if mode != NEWMV:
        w.write_symbol(int(mode != GLOBALMV), fc.zeromv[res.zeromv_ctx], 2)
        if mode != GLOBALMV:
            w.write_symbol(int(mode != NEARESTMV),
                           fc.refmv[res.refmv_ctx], 2)


def read_inter_mode(r, fc, res: MvStackResult) -> int:
    if not r.read_symbol(fc.newmv[res.newmv_ctx], 2):
        return NEWMV
    if not r.read_symbol(fc.zeromv[res.zeromv_ctx], 2):
        return GLOBALMV
    if not r.read_symbol(fc.refmv[res.refmv_ctx], 2):
        return NEARESTMV
    return NEARMV


def write_drl_idx(w, fc, mode: int, drl_index: int,
                  res: MvStackResult) -> None:
    """WriteDrlIdx (EbEntropyCoding.c:1756)."""
    if mode == NEWMV:
        for idx in range(2):
            if res.count > idx + 1:
                w.write_symbol(int(drl_index != idx),
                               fc.drl[res.drl_ctx(idx)], 2)
                if drl_index == idx:
                    return
    elif mode == NEARMV:
        for idx in range(1, 3):
            if res.count > idx + 1:
                w.write_symbol(int(drl_index != idx - 1),
                               fc.drl[res.drl_ctx(idx)], 2)
                if drl_index == idx - 1:
                    return


def read_drl_idx(r, fc, mode: int, res: MvStackResult) -> int:
    drl = 0
    if mode == NEWMV:
        for idx in range(2):
            if res.count > idx + 1:
                if not r.read_symbol(fc.drl[res.drl_ctx(idx)], 2):
                    return idx
                drl = idx + 1
            else:
                return drl
        return drl
    if mode == NEARMV:
        for idx in range(1, 3):
            if res.count > idx + 1:
                if not r.read_symbol(fc.drl[res.drl_ctx(idx)], 2):
                    return idx - 1
                drl = idx
            else:
                return drl
        return drl
    return 0
