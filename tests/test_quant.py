"""Quantization tests + full transform/quant pipeline reconstruction bound."""

import numpy as np
import pytest

from svt_av1_tpu.ops.quant import (QuantParams, dequantize, make_quant_params,
                                   quantize, tx_scale, dc_quant, ac_quant)
from svt_av1_tpu.ops.transforms import forward_tx2d, inverse_tx2d
from svt_av1_tpu.utils.blocks import (DCT_DCT, TX_16X16, TX_32X32, TX_4X4,
                                      TX_64X64, TX_8X8, TX_WIDTH, TX_HEIGHT,
                                      zigzag_scan)


def test_quant_params_known_values():
    qp = make_quant_params(0)
    assert qp.dequant == (4, 4)  # lossless step
    qp = make_quant_params(255)
    assert qp.dequant[0] == dc_quant(255, 0) and qp.dequant[1] == ac_quant(255, 0)
    assert dc_quant(0, 0) == 4 and ac_quant(0, 0) == 4
    # spec values: qindex 100 -> dc 118? pin a few monotonicity facts instead
    assert dc_quant(100, 0) < dc_quant(200, 0)


def test_dequant_matches_quantize_output():
    rng = np.random.RandomState(0)
    qp = make_quant_params(120)
    for tx, ls in [(TX_4X4, 0), (TX_16X16, 0), (TX_32X32, 1)]:
        n = int(TX_WIDTH[tx] * TX_HEIGHT[tx])
        scan = zigzag_scan(int(TX_WIDTH[tx]), int(TX_HEIGHT[tx]))
        assert tx_scale(tx) == ls
        coeff = rng.randint(-20000, 20000, size=(8, n))
        qc, dqc, eob = quantize(coeff, scan, qp, ls)
        np.testing.assert_array_equal(dequantize(qc, qp, ls), dqc)
        # eob consistency: all scan positions >= eob are zero
        for b in range(8):
            tail = qc[b, scan[eob[b]:]]
            assert (tail == 0).all()
            if eob[b]:
                assert qc[b, scan[eob[b] - 1]] != 0


@pytest.mark.parametrize("tx,qindex", [(TX_4X4, 40), (TX_8X8, 80),
                                       (TX_16X16, 120), (TX_32X32, 160),
                                       (TX_64X64, 100)])
def test_pipeline_reconstruction_error_bounded(tx, qindex):
    """fwd -> quant -> dequant -> inv must reconstruct within ~q-step."""
    rng = np.random.RandomState(tx)
    w, h = int(TX_WIDTH[tx]), int(TX_HEIGHT[tx])
    x = rng.randint(-100, 101, size=(4, h, w)).astype(np.int64)
    if max(w, h) > 32:  # strictly band-limit for 64-point (coeffs>32 dropped)
        ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        x = np.zeros((4, h, w))
        for b in range(4):
            for _ in range(6):
                fy, fx = rng.randint(0, 16, 2)
                x[b] += rng.randint(-40, 40) * \
                    np.cos(np.pi * fy * (2 * ii + 1) / (2 * h)) * \
                    np.cos(np.pi * fx * (2 * jj + 1) / (2 * w))
        x = np.round(x).astype(np.int64)
    coeff = forward_tx2d(x, DCT_DCT, w, h)
    if w > 32:
        coeff[:, :, 32:] = 0
    if h > 32:
        coeff[:, 32:, :] = 0
    qp = make_quant_params(qindex)
    ls = tx_scale(tx)
    scan = zigzag_scan(min(32, w), min(32, h))
    # quantizer operates on the scanned (<=32x32) corner
    cw, ch = min(32, w), min(32, h)
    corner = coeff[:, :ch, :cw].reshape(4, -1)
    qc, dqc, eob = quantize(corner, scan, qp, ls)
    dq_full = np.zeros_like(coeff)
    dq_full[:, :ch, :cw] = dqc.reshape(4, ch, cw)
    resid = inverse_tx2d(dq_full, DCT_DCT, w, h)
    err = np.abs(resid - x)
    step = qp.dequant[1] / 8.0  # Q3 step in pixel units
    assert err.max() <= max(2.0, 1.5 * step), \
        f"err {err.max()} vs step {step}"
    assert err.mean() <= max(1.0, 0.5 * step)


def test_native_quantizer_bit_exact():
    """native/svt_quant.c must match the NumPy oracle exactly over
    random coefficients, all log_scales, extreme magnitudes and qindex
    corners."""
    from unittest import mock

    from svt_av1_tpu.ops import quant as q
    from svt_av1_tpu.utils.blocks import get_scan
    if not q._native_ok():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(7)
    for qindex in (0, 1, 80, 160, 255):
        for tx_size, n in ((0, 16), (1, 64), (2, 256), (3, 1024)):
            qp = q.make_quant_params(qindex, bit_depth=8)
            ls = q.tx_scale(tx_size)
            scan = get_scan(tx_size, 0)
            coeff = rng.randint(-(1 << 20), 1 << 20, (13, n))
            coeff[0] = 0
            coeff[1, :4] = [-(1 << 22), 1 << 22, -1, 1]
            nat = q._quantize_native(coeff, scan, qp, ls)
            with mock.patch.object(q, "_native_ok", lambda: False):
                ora = q.quantize(coeff, scan, qp, ls)
            for a, b, name in zip(nat, ora, ("qc", "dq", "eob")):
                assert (np.asarray(a) == np.asarray(b)).all(), \
                    (qindex, tx_size, name)
