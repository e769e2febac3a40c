"""Intra predictor tests vs independent scalar spec implementations."""

import numpy as np
import pytest

from svt_av1_tpu.ops import intra
from svt_av1_tpu.utils.blocks import (DC_PRED, H_PRED, PAETH_PRED,
                                      SMOOTH_H_PRED, SMOOTH_PRED,
                                      SMOOTH_V_PRED, V_PRED)


def scalar_paeth(above, left, tl, bw, bh):
    out = np.zeros((bh, bw), dtype=np.int32)
    for r in range(bh):
        for c in range(bw):
            base = int(left[r]) + int(above[c]) - int(tl)
            pl, pt, ptl = (abs(base - int(left[r])), abs(base - int(above[c])),
                           abs(base - int(tl)))
            if pl <= pt and pl <= ptl:
                out[r, c] = left[r]
            elif pt <= ptl:
                out[r, c] = above[c]
            else:
                out[r, c] = tl
    return out


SM_W = intra._SM_WEIGHTS


def scalar_smooth(above, left, bw, bh):
    out = np.zeros((bh, bw), dtype=np.int32)
    below, right = int(left[bh - 1]), int(above[bw - 1])
    for r in range(bh):
        for c in range(bw):
            s = (int(SM_W[bh][r]) * int(above[c])
                 + (256 - int(SM_W[bh][r])) * below
                 + int(SM_W[bw][c]) * int(left[r])
                 + (256 - int(SM_W[bw][c])) * right)
            out[r, c] = (s + 256) >> 9
    return out


@pytest.mark.parametrize("bw,bh", [(4, 4), (8, 8), (16, 16), (8, 16),
                                   (32, 8), (64, 64)])
def test_predictors_vs_scalar(bw, bh):
    rng = np.random.RandomState(bw * 64 + bh)
    B = 5
    above = rng.randint(0, 256, (B, bw + bh)).astype(np.int32)
    left = rng.randint(0, 256, (B, bh + bw)).astype(np.int32)
    tl = rng.randint(0, 256, B).astype(np.int32)

    p = intra.predict(PAETH_PRED, above, left, tl, bw, bh)
    for i in range(B):
        np.testing.assert_array_equal(
            p[i], scalar_paeth(above[i], left[i], tl[i], bw, bh))

    s = intra.predict(SMOOTH_PRED, above, left, tl, bw, bh)
    for i in range(B):
        np.testing.assert_array_equal(
            s[i], scalar_smooth(above[i], left[i], bw, bh))

    v = intra.predict(V_PRED, above, left, tl, bw, bh)
    assert (v == above[:, None, :bw]).all()
    h = intra.predict(H_PRED, above, left, tl, bw, bh)
    assert (h == left[:, :bh, None]).all()

    d = intra.predict(DC_PRED, above, left, tl, bw, bh)
    for i in range(B):
        expect = (above[i, :bw].sum() + left[i, :bh].sum()
                  + ((bw + bh) >> 1)) // (bw + bh)
        assert (d[i] == expect).all()


def test_dc_availability_variants():
    B, bw, bh = 3, 8, 8
    rng = np.random.RandomState(1)
    above = rng.randint(0, 256, (B, bw + bh)).astype(np.int32)
    left = rng.randint(0, 256, (B, bh + bw)).astype(np.int32)
    tl = rng.randint(0, 256, B).astype(np.int32)
    no = np.zeros(B, dtype=bool)
    yes = np.ones(B, dtype=bool)
    d = intra.predict(DC_PRED, above, left, tl, bw, bh, have_above=yes,
                      have_left=no)
    assert (d[0] == (above[0, :bw].sum() + 4) >> 3).all()
    d = intra.predict(DC_PRED, above, left, tl, bw, bh, have_above=no,
                      have_left=yes)
    assert (d[0] == (left[0, :bh].sum() + 4) >> 3).all()
    d = intra.predict(DC_PRED, above, left, tl, bw, bh, have_above=no,
                      have_left=no)
    assert (d == 128).all()


def test_smooth_v_h():
    B, bw, bh = 2, 16, 8
    rng = np.random.RandomState(2)
    above = rng.randint(0, 256, (B, bw + bh)).astype(np.int32)
    left = rng.randint(0, 256, (B, bh + bw)).astype(np.int32)
    tl = rng.randint(0, 256, B).astype(np.int32)
    sv = intra.predict(SMOOTH_V_PRED, above, left, tl, bw, bh)
    sh = intra.predict(SMOOTH_H_PRED, above, left, tl, bw, bh)
    for i in range(B):
        below, right = int(left[i, bh - 1]), int(above[i, bw - 1])
        for r in range(bh):
            for c in range(bw):
                ev = (int(SM_W[bh][r]) * int(above[i, c])
                      + (256 - int(SM_W[bh][r])) * below + 128) >> 8
                eh = (int(SM_W[bw][c]) * int(left[i, r])
                      + (256 - int(SM_W[bw][c])) * right + 128) >> 8
                assert sv[i, r, c] == ev
                assert sh[i, r, c] == eh


def test_prepare_edges_rules():
    rng = np.random.RandomState(3)
    recon = rng.randint(0, 256, (32, 48)).astype(np.uint8)
    bw = bh = 8
    xs = np.array([0, 8, 0, 40])
    ys = np.array([0, 0, 8, 24])
    above, left, tl = intra.prepare_edges(recon, xs, ys, bw, bh)
    # block (0,0): nothing available
    assert (above[0] == 127).all() and (left[0] == 129).all() and tl[0] == 128
    # block (8,0): left available only -> above = left[0] sample
    assert (above[1] == recon[0, 7]).all()
    np.testing.assert_array_equal(left[1][:bh], recon[0:8, 7].astype(np.int32))
    assert tl[1] == recon[0, 7]
    # block (0,8): above available only
    np.testing.assert_array_equal(above[2][:bw], recon[7, 0:8])
    assert (left[2] == recon[7, 0]).all() and tl[2] == recon[7, 0]
    # block (40,24): both available, top-right extension replicates past edge
    np.testing.assert_array_equal(above[3][:8], recon[23, 40:48])
    assert (above[3][8:] == recon[23, 47]).all()
    assert tl[3] == recon[23, 39]
