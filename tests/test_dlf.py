"""Deblocking filter tests: thresholds, roundtrip, quality."""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.ops import dlf
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.intra import encode_keyframe
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
from tests.test_intra_e2e import psnr, synth_frame


def test_thresholds_match_reference_rules():
    # update_sharpness (EbDeblockingFilter.c:719)
    for lvl in (1, 10, 35, 63):
        bl, lim, th = dlf.thresholds(lvl, 0)
        assert lim == max(1, lvl) if lvl < 64 else True
        assert bl == 2 * (lvl + 2) + lim
        assert th == lvl >> 4
    bl, lim, th = dlf.thresholds(40, 5)
    assert lim == min(max(1, 40 >> 2), 4)


def test_filter4_smooths_step_edge():
    # vertical edge with a step: filtering must reduce the discontinuity
    plane = np.zeros((64, 64), dtype=np.uint8)
    plane[:, :8] = 100
    plane[:, 8:] = 120
    leaf_sizes = {(r, c): 8 for r in range(0, 16, 2)
                  for c in range(0, 16, 2)}
    before = abs(int(plane[4, 7]) - int(plane[4, 8]))
    dlf.loop_filter_frame([plane,
                           np.full((32, 32), 100, np.uint8),
                           np.full((32, 32), 100, np.uint8)],
                          leaf_sizes, 16, 16, (20, 20, 20, 20))
    after = abs(int(plane[4, 7]) - int(plane[4, 8]))
    assert after < before


@pytest.mark.parametrize("qp", [30, 50])
def test_dlf_roundtrip_and_oracle_equivalence(qp):
    y, u, v = synth_frame(128, 96, seed=qp)
    cfg = EncoderConfig(width=128, height=96, qp=qp, enable_dlf=True,
                        fixed_partition_size=16)
    tu_o, rec_o, _ = encode_keyframe(y, u, v, cfg)
    tu_w, rec_w, _ = encode_keyframe_wavefront(y, u, v, cfg)
    assert tu_o == tu_w
    for a, b in zip(rec_o, rec_w):
        assert np.array_equal(a, b)
    _, dec = decode_temporal_unit(tu_w)
    for a, b in zip(rec_w, dec):
        assert np.array_equal(a, b)


def test_dlf_improves_low_rate_quality():
    y, u, v = synth_frame(200, 120, seed=9)
    qp = 55
    c0 = EncoderConfig(width=200, height=120, qp=qp, enable_dlf=False)
    c1 = EncoderConfig(width=200, height=120, qp=qp, enable_dlf=True)
    _, r0, _ = encode_keyframe_wavefront(y, u, v, c0)
    _, r1, _ = encode_keyframe_wavefront(y, u, v, c1)
    assert psnr(y, r1[0]) >= psnr(y, r0[0])
