"""CDEF tests: direction search, filter math, end-to-end roundtrip."""

import io

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.ops import cdef
from svt_av1_tpu.pipeline.decode import decode_ivf, decode_temporal_unit
from svt_av1_tpu.pipeline.encoder import encode_ivf
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
from tests.test_inter_e2e import _clip
from tests.test_intra_e2e import psnr, synth_frame


def test_find_dir_detects_gradients():
    # pure horizontal stripes -> horizontal direction (2); vertical -> 6
    horiz = np.tile(np.arange(8)[:, None] * 20 + 60, (1, 8))
    vert = horiz.T.copy()
    d_h, var_h = cdef.find_dir(horiz, 0)
    d_v, var_v = cdef.find_dir(vert, 0)
    assert d_h == 2 and d_v == 6
    assert var_h > 0 and var_v > 0
    flat = np.full((8, 8), 128)
    d_f, var_f = cdef.find_dir(flat, 0)
    assert var_f == 0


def test_constrain_matches_reference_formula():
    diffs = np.array([-300, -10, -1, 0, 1, 5, 50, 300])
    out = cdef._constrain(diffs, 8, 5)
    # reference: sign(d) * min(|d|, max(0, t - (|d| >> (damping-msb(t)))))
    for d, o in zip(diffs, out):
        shift = max(0, 5 - 3)
        exp = np.sign(d) * min(abs(d), max(0, 8 - (abs(d) >> shift)))
        assert o == exp
    assert (cdef._constrain(diffs, 0, 5) == 0).all()


@pytest.mark.parametrize("qp", [35, 55])
def test_cdef_intra_roundtrip(qp):
    y, u, v = synth_frame(192, 128, seed=qp)
    cfg = EncoderConfig(width=192, height=128, qp=qp, enable_cdef=True)
    tu, rec, _ = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for a, b in zip(rec, dec):
        assert np.array_equal(a, b)


def test_cdef_with_tiles_roundtrip():
    y, u, v = synth_frame(256, 192, seed=9)
    cfg = EncoderConfig(width=256, height=192, qp=45, enable_cdef=True,
                        tile_cols_log2=1, tile_rows_log2=1)
    tu, rec, _ = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for a, b in zip(rec, dec):
        assert np.array_equal(a, b)


def test_cdef_inter_roundtrip():
    frames = _clip(3, 128, 96)
    cfg = EncoderConfig(width=128, height=96, qp=50, enable_cdef=True)
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    assert len(decs) == 3
    for f, d in zip(frames, decs):
        assert psnr(f[0], d[0]) > 24
