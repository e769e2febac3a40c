"""10-bit 4:2:0 pipeline tests (high_bitdepth sequence path)."""

import io

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.decode import decode_ivf, decode_temporal_unit
from svt_av1_tpu.pipeline.encoder import Encoder, encode_ivf
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
from svt_av1_tpu.utils.stats import psnr


def _frame10(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(400 + 250 * np.sin(xx / 19.0) + 180 * np.cos(yy / 13.0)
                + rng.normal(0, 12, (h, w)), 0, 1023).astype(np.uint16)
    u = np.full((h // 2, w // 2), 480, np.uint16)
    v = np.full((h // 2, w // 2), 540, np.uint16)
    return y, u, v


@pytest.mark.parametrize("qp", [25, 45])
def test_10bit_intra_roundtrip(qp):
    y, u, v = _frame10(128, 96, seed=qp)
    cfg = EncoderConfig(width=128, height=96, qp=qp, bit_depth=10)
    tu, rec, _ = encode_keyframe_wavefront(y, u, v, cfg)
    assert rec[0].dtype == np.uint16
    seq, dec = decode_temporal_unit(tu)
    assert seq.bit_depth == 10
    for a, b in zip(rec, dec):
        assert np.array_equal(a, b)
    assert psnr(y, rec[0], 10) > 30


def test_10bit_ldp_roundtrip():
    frames = [_frame10(128, 96, seed=t) for t in range(3)]
    cfg = EncoderConfig(width=128, height=96, qp=40, bit_depth=10)
    enc = Encoder(cfg)
    recs = []
    for f in frames:
        enc.send_picture(*f)
        _, rec = enc.get_packet()
        recs.append(rec)
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    for rec, dec in zip(recs, decs):
        for a, b in zip(rec, dec):
            assert np.array_equal(a, b)


def test_10bit_uses_more_precision_than_8bit():
    """Same content coded 10-bit at low qp must achieve > 8-bit ceiling."""
    y10, u10, v10 = _frame10(64, 64, seed=1)
    y8 = (y10 >> 2).astype(np.uint8)
    u8, v8 = (u10 >> 2).astype(np.uint8), (v10 >> 2).astype(np.uint8)
    c8 = EncoderConfig(width=64, height=64, qp=4, bit_depth=8)
    c10 = EncoderConfig(width=64, height=64, qp=4, bit_depth=10)
    _, r8, _ = encode_keyframe_wavefront(y8, u8, v8, c8)
    _, r10, _ = encode_keyframe_wavefront(y10, u10, v10, c10)
    err8 = np.mean((r8[0].astype(np.int32) * 4 - y10.astype(np.int32)) ** 2)
    err10 = np.mean((r10[0].astype(np.int32) - y10.astype(np.int32)) ** 2)
    assert err10 < err8
