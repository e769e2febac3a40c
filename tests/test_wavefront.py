"""Wavefront-batched encoder vs per-block oracle: bit-identical streams."""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.intra import encode_keyframe
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
from tests.test_intra_e2e import synth_frame


@pytest.mark.parametrize("part,w,h", [(16, 128, 96), (32, 200, 120),
                                      (64, 128, 128), (8, 64, 64)])
def test_wavefront_matches_oracle(part, w, h):
    y, u, v = synth_frame(w, h, seed=part)
    cfg = EncoderConfig(width=w, height=h, qp=40,
                        fixed_partition_size=part)
    tu_o, rec_o, _ = encode_keyframe(y, u, v, cfg)
    tu_w, rec_w, _ = encode_keyframe_wavefront(y, u, v, cfg)
    assert tu_o == tu_w
    for a, b in zip(rec_o, rec_w):
        assert np.array_equal(a, b)
    _, dec = decode_temporal_unit(tu_w)
    for a, b in zip(rec_w, dec):
        assert np.array_equal(a, b)
