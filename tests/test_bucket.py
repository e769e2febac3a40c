"""Resolution-bucketed compute planes (SVT_TPU_BUCKET).

Fused whole-frame device programs key on plane dims; bucketing pads the
compute planes to canonical dims so nearby resolutions share one
compiled program set (the reference encodes any size instantly — user
guide :127). The pad must be COMPUTE-ONLY: reference pads rebuild from
the decoder-visible core (mc.pad_reference valid_hw), so any legal MV
reads identical pixels on both sides and streams stay conformant.
"""

import io

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import common
from svt_av1_tpu.pipeline.decode import decode_ivf, decode_temporal_unit
from svt_av1_tpu.pipeline.encoder import encode_ivf
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
from tests.test_inter_e2e import _clip
from tests.test_intra_e2e import psnr, synth_frame


def test_bucket_policy():
    assert common.bucket_dims(192, 128) == (192, 128)      # small: exact
    assert common.bucket_dims(1920, 1088) == (1920, 1088)  # 1080p exact
    assert common.bucket_dims(1600, 960) == (1920, 1088)   # shares 1080p
    assert common.bucket_dims(1280, 736) == (1280, 768)
    assert common.bucket_dims(3840, 2176) == (3840, 2176)  # 4K exact
    assert common.bucket_dims(4096, 2304) == (4096, 2304)  # over: exact


def test_bucketed_keyframe_roundtrip(monkeypatch):
    monkeypatch.setenv("SVT_TPU_BUCKET", "256x192")
    y, u, v = synth_frame(200, 120, seed=3)
    cfg = EncoderConfig(width=200, height=120, qp=40)
    tu, rec, _ = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for a, b in zip(rec, dec):
        h, w = b.shape
        assert np.array_equal(np.asarray(a)[:h, :w], b)
    assert psnr(y, np.asarray(rec[0])[:120, :200]) > 28


def test_bucketed_inter_gop_conformant(monkeypatch):
    """Bucket-padded RA GOP: mirror decode + independent checker green;
    quality matches the exact-pad encode (reference pads rebuild from
    the decoder-visible core, so MC semantics are unchanged)."""
    w, h = 200, 120
    frames = _clip(5, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=40, hierarchical_levels=2,
                        enable_cdef=True)
    monkeypatch.setenv("SVT_TPU_BUCKET", "off")
    iv_off = encode_ivf(frames, cfg)
    monkeypatch.setenv("SVT_TPU_BUCKET", "320x192")
    iv_b = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv_b))
    assert len(decs) == len(frames)
    p_b = min(psnr(f[0], d[0]) for f, d in zip(frames, decs))
    p_off = min(psnr(f[0], d[0])
                for f, d in zip(frames, decode_ivf(io.BytesIO(iv_off))))
    assert p_b > 28 and abs(p_b - p_off) < 0.2
    assert len(iv_b) < len(iv_off) * 1.05
    from svt_av1_tpu.verify.indep import check_ivf
    assert check_ivf(io.BytesIO(iv_b)) > 0


def test_bucketed_tiles_and_aq(monkeypatch):
    monkeypatch.setenv("SVT_TPU_BUCKET", "320x192")
    w, h = 256, 128
    frames = _clip(3, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=1,
                        adaptive_quantization=1, enable_restoration=True)
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    assert min(psnr(f[0], d[0]) for f, d in zip(frames, decs)) > 28
