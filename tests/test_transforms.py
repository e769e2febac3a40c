"""Transform unit tests.

The inverse transforms are normative; we validate their structure against
independent float DCT/ADST references (catches any wiring error; integer
rounding keeps differences to a few LSB) plus exact forward/inverse
round-trip gain checks.
"""

import numpy as np
import pytest

from svt_av1_tpu.ops.transforms import forward_tx2d, inverse_tx2d
from svt_av1_tpu.utils.blocks import (ADST_ADST, ADST_DCT, DCT_ADST, DCT_DCT,
                                      IDTX, FLIPADST_DCT, DCT_FLIPADST,
                                      V_DCT, H_DCT)
from svt_av1_tpu.ops import txfm1d


def float_idct(n):
    """Orthonormal DCT-III (inverse DCT-II) basis matrix [n, n]."""
    k = np.arange(n)
    M = np.cos(np.pi * (2 * k[:, None] + 1) * k[None, :] / (2 * n))
    M[:, 0] *= 1 / np.sqrt(2)
    return M * np.sqrt(2 / n)


def float_iadst(n):
    """AV1 ADST basis: sin((2i+1)(2j+1)pi/4N), inverse = transpose."""
    i = np.arange(n)
    M = np.sin(np.pi * (2 * i[:, None] + 1) * (2 * i[None, :] + 1) / (4 * n))
    return M * 2 / np.sqrt(2 * n + 1)  # approximate normalization


@pytest.mark.parametrize("n", [4, 8, 16, 32, 64])
def test_idct_matches_float_reference(n):
    # impulse responses of the integer idct = scaled DCT-III matrix
    x = np.eye(n, dtype=np.int64) * 1024
    y = txfm1d.run_1d(x, "dct", n, 12, inverse=True, clamp_bit=20).T  # [out,in]
    F = float_idct(n)
    alpha = (y * F).sum() / (F * F).sum()
    err = np.abs(y - alpha * F).max()
    assert err <= 2.0, f"idct{n}: max err {err} (alpha={alpha})"
    # gain must be a power of two times 1024/sqrt-normalization
    log2a = np.log2(alpha / 1024 * np.sqrt(n / 2))
    assert abs(log2a - round(log2a)) < 1e-3, f"idct{n} gain {alpha}"


def test_iadst4_matches_spec_pseudocode():
    """The 4-point inverse ADST (spec 7.13.2.6) is the sinpi/9 transform;
    its exact matrix is hand-derived here from the spec pseudocode."""
    sinpi = np.round(np.sqrt(2) * np.sin(np.arange(5) * np.pi / 9)
                     * 2 / 3 * 4096)
    sinpi[4] = sinpi[1] + sinpi[2]  # spec adjustment
    s1, s2, s3, s4 = sinpi[1:5]
    expect = np.array([
        [s1, s3, s4, s2],
        [s2, s3, -s1, -s4],
        [s3, 0, -s3, s3],
        [s4, -s3, s2, -s1],  # s4 = s1+s2; col2: s4-s1 = s2; col3: s2-s4 = -s1
    ])
    x = np.eye(4, dtype=np.int64) * 4096
    y = txfm1d.run_1d(x, "adst", 4, 12, inverse=True, clamp_bit=20).T
    np.testing.assert_array_equal(y, expect.astype(np.int64))


@pytest.mark.parametrize("n", [8, 16])
def test_iadst_matches_float_reference(n):
    x = np.eye(n, dtype=np.int64) * 1024
    y = txfm1d.run_1d(x, "adst", n, 12, inverse=True, clamp_bit=20).T
    i = np.arange(n)
    F = np.sin(np.pi * (2 * i[None, :] + 1) * (2 * i[:, None] + 1) / (4 * n))
    alpha = (y * F).sum() / (F * F).sum()
    err = np.abs(y - alpha * F).max()
    assert err <= 3.0, f"iadst{n}: max err {err}"


@pytest.mark.parametrize("wh", [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64),
                                (4, 8), (8, 4), (16, 8), (8, 32), (16, 64)])
@pytest.mark.parametrize("tx_type", [DCT_DCT, ADST_ADST, ADST_DCT, IDTX])
def test_fwd_inv_roundtrip(wh, tx_type):
    w, h = wh
    if tx_type != DCT_DCT and max(w, h) > 16:
        pytest.skip("ADST only defined to 16 points")
    rng = np.random.RandomState(hash((w, h, tx_type)) & 0xFFFF)
    if max(w, h) > 32:
        # 64-point transforms drop coeffs beyond 32: use a band-limited input
        # (sum of low-frequency cosines) so dropped energy is ~zero
        ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        x = np.zeros((4, h, w))
        for b in range(4):
            for _ in range(6):
                fy, fx = rng.randint(0, min(h, 16), 2)
                x[b] += rng.randint(-60, 60) * \
                    np.cos(np.pi * fy * (2 * ii + 1) / (2 * h)) * \
                    np.cos(np.pi * fx * (2 * jj + 1) / (2 * w))
        x = np.round(x).astype(np.int64)
    else:
        x = rng.randint(-255, 256, size=(4, h, w)).astype(np.int64)
    coeff = forward_tx2d(x, tx_type, w, h)
    # zero out >32 coeffs as the codec does for 64-point transforms
    if w > 32:
        coeff[:, :, 32:] = 0
    if h > 32:
        coeff[:, 32:, :] = 0
    resid = inverse_tx2d(coeff, tx_type, w, h)
    # total fwd*inv gain is a power of two; estimate and verify
    gain = (resid * x).sum() / (x * x).sum()
    log2g = np.log2(gain)
    assert abs(log2g - round(log2g)) < 0.01, f"gain {gain}"
    scaled = x * gain
    err = np.abs(resid - scaled)
    tol = 2 * gain + 2 + (60 * gain if max(w, h) > 32 else 0)
    assert err.max() <= tol, f"{wh} type{tx_type}: err {err.max()} tol {tol}"


def test_flip_types_relate_to_adst():
    rng = np.random.RandomState(0)
    x = rng.randint(-255, 256, size=(2, 8, 8)).astype(np.int64)
    a = forward_tx2d(x, ADST_DCT, 8, 8)
    f = forward_tx2d(x[:, ::-1, :], FLIPADST_DCT, 8, 8)
    np.testing.assert_array_equal(a, f)
    b = forward_tx2d(x, DCT_FLIPADST, 8, 8)
    c = forward_tx2d(x[:, :, ::-1], DCT_ADST, 8, 8)
    np.testing.assert_array_equal(b, c)


def test_1d_tx_types():
    rng = np.random.RandomState(1)
    x = rng.randint(-255, 256, size=(2, 16, 16)).astype(np.int64)
    for t in (V_DCT, H_DCT):
        coeff = forward_tx2d(x, t, 16, 16)
        resid = inverse_tx2d(coeff, t, 16, 16)
        gain = (resid * x).sum() / (x * x).sum()
        assert abs(np.log2(gain) - round(np.log2(gain))) < 0.01
        assert np.abs(resid - x * gain).max() <= 2 * gain + 2


def test_dc_only_inverse():
    # a DC-only coefficient must reconstruct to a flat block
    for n, tx in [(4, DCT_DCT), (8, DCT_DCT), (16, DCT_DCT), (32, DCT_DCT)]:
        coeff = np.zeros((1, n, n), dtype=np.int64)
        coeff[0, 0, 0] = 512
        resid = inverse_tx2d(coeff, tx, n, n)
        assert resid.std() < 1.0, f"{n}: inverse of DC not flat"
        assert abs(resid.mean()) > 1


def test_inverse_extreme_coeff_clamps():
    # adversarial coefficient magnitudes must not overflow (clamps engage)
    coeff = np.full((1, 32, 32), 2 ** 19, dtype=np.int64)
    resid = inverse_tx2d(coeff, DCT_DCT, 32, 32)
    assert np.abs(resid).max() < 2 ** 31
