"""RDOQ-lite trailing-coefficient trim: host/device twin exactness,
exact-RD non-regression, and end-to-end stream effects."""

import numpy as np
import pytest

from svt_av1_tpu.ops import quant as quant_ops
from svt_av1_tpu.ops import transforms as tx_ops
from svt_av1_tpu.ops.quant import make_quant_params
from svt_av1_tpu.pipeline import common, md
from svt_av1_tpu.utils.blocks import get_scan


def _quantized_batch(w, h, qindex, seed=0, b=24, amp=30):
    rng = np.random.default_rng(seed)
    ts = common.tx_size_for_rect(w, h, 0)
    cw, ch = common.coded_dims(ts)
    ls = quant_ops.tx_scale(ts)
    resid = rng.integers(-amp, amp, (b, h, w)).astype(np.int64)
    coeffs = tx_ops.forward_tx2d(resid, 0, w, h)
    coded = coeffs[:, :ch, :cw].reshape(b, -1)
    qp = make_quant_params(qindex, bit_depth=8)
    scan = get_scan(ts, 0)
    qc, dq, eo = quant_ops.quantize(coded, scan, qp, ls)
    return resid, qc, dq, eo, scan, ts, (cw, ch)


@pytest.mark.parametrize("w,h,qindex", [(8, 8, 120), (16, 16, 140),
                                        (32, 16, 100), (4, 16, 150)])
def test_trim_improves_exact_rd(w, h, qindex):
    resid, qc, dq, eo, scan, ts, (cw, ch) = _quantized_batch(w, h, qindex)
    lam_q = md.lam_to_q(0.5 * (qindex / 8.0) ** 2)
    qc2, dq2, eo2 = md.rdoq_trim(qc.copy(), dq.copy(), eo.copy(), scan,
                                 ts, qindex, 0, lam_q)
    assert np.any(eo2 < eo), "nothing trimmed at a coarse quantizer"
    assert np.all(eo2 <= eo)
    # the distortion model is the asymptotic impulse-response gain, so
    # individual blocks may regress slightly from rounding cross-terms;
    # exact RD must improve in aggregate and never degrade a block much
    deltas = []
    for b in np.nonzero(eo2 < eo)[0]:
        def cost(q, d, e):
            full = np.zeros((1, h, w), np.int64)
            full[0, :ch, :cw] = d[b].reshape(ch, cw)
            r = tx_ops.inverse_tx2d(full, 0, w, h, bd=8)
            dist = np.sum((resid[b] - r[0]) ** 2)
            rate = md.coeff_rate_cdf(q[b:b + 1].reshape(1, ch, cw),
                                     e[b:b + 1], qindex, 0, ts)[0]
            return md.rdcost(dist, lam_q, rate)
        c_old, c_new = cost(qc, dq, eo), cost(qc2, dq2, eo2)
        assert c_new <= c_old * 1.002
        deltas.append(c_new - c_old)
    assert sum(deltas) < 0


def test_trim_device_twin_exact():
    from svt_av1_tpu.ops.device_md import rdoq_trim_j
    import jax.numpy as jnp
    for w, h, qx in ((8, 8, 120), (16, 16, 150), (16, 8, 90)):
        _, qc, dq, eo, scan, ts, _ = _quantized_batch(w, h, qx, seed=qx)
        lam_q = md.lam_to_q(0.4 * (qx / 8.0) ** 2)
        hq, hd, he = md.rdoq_trim(qc.copy(), dq.copy(), eo.copy(), scan,
                                  ts, qx, 0, lam_q)
        dq_, dd_, de_ = rdoq_trim_j(jnp.asarray(qc), jnp.asarray(dq),
                                    jnp.asarray(eo), scan, ts, qx, 0,
                                    lam_q)
        assert (np.asarray(de_) == he).all()
        assert (np.asarray(dq_) == hq).all()
        assert (np.asarray(dd_) == hd).all()


def test_trim_zero_lambda_keeps_everything():
    _, qc, dq, eo, scan, ts, _ = _quantized_batch(16, 16, 140)
    q2, d2, e2 = md.rdoq_trim(qc.copy(), dq.copy(), eo.copy(), scan, ts,
                              140, 0, 1)
    assert (e2 == eo).all() and (q2 == qc).all()


def test_rdoq_stream_roundtrips_and_saves_bits():
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import decode_temporal_unit
    from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
    rng = np.random.default_rng(9)
    h, w = 128, 192
    y = np.clip(110 + 45 * np.sin(np.arange(w) / 7.0)[None, :]
                + rng.normal(0, 22, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    sizes = {}
    for rdoq in (False, True):
        cfg = EncoderConfig(width=w, height=h, qp=46, enable_rdoq=rdoq)
        tu, recon, _ = encode_keyframe_wavefront(y, u, v, cfg)
        _, dec = decode_temporal_unit(tu)
        for p in range(3):
            assert (dec[p] == recon[p]).all()
        sizes[rdoq] = len(tu)
    assert sizes[True] < sizes[False]
