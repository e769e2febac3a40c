"""Multi-tile encode/decode tests (tile-independent entropy contexts)."""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import common
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
from tests.test_intra_e2e import psnr, synth_frame


def test_tile_rects_cover_frame():
    # 256x192: 4x3 SBs
    rects = common.tile_rects(4, 3, 64, 48, 1, 1)
    assert len(rects) == 4
    cover = np.zeros((48, 64), dtype=int)
    for (r0, c0, rs, cs, _, _) in rects:
        cover[r0:r0 + rs, c0:c0 + cs] += 1
    assert (cover == 1).all()


@pytest.mark.parametrize("cl,rl,w,h", [(1, 0, 256, 192), (1, 1, 256, 192),
                                       (2, 0, 256, 192), (1, 1, 200, 120)])
def test_multi_tile_roundtrip(cl, rl, w, h):
    y, u, v = synth_frame(w, h, seed=cl * 4 + rl)
    cfg = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=cl,
                        tile_rows_log2=rl)
    tu, rec, st = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for a, b in zip(rec, dec):
        assert np.array_equal(a, b)
    assert psnr(y, rec[0]) > 28


def test_tiles_quality_close_to_single():
    y, u, v = synth_frame(256, 192, seed=7)
    c1 = EncoderConfig(width=256, height=192, qp=40)
    c4 = EncoderConfig(width=256, height=192, qp=40, tile_cols_log2=1,
                       tile_rows_log2=1)
    _, r1, s1 = encode_keyframe_wavefront(y, u, v, c1)
    _, r4, s4 = encode_keyframe_wavefront(y, u, v, c4)
    assert abs(psnr(y, r1[0]) - psnr(y, r4[0])) < 0.5
    assert s4["tu_bytes"] < s1["tu_bytes"] * 1.3  # bounded tile overhead


def test_tile_request_clamped_to_frame_geometry():
    """A tile-column request exceeding the frame's SB columns must be
    clamped to the legal range (reference: svt_aom_set_tile_info), not
    produce an illegal tile_info."""
    y, u, v = synth_frame(64, 192, seed=3)
    cfg = EncoderConfig(width=64, height=192, qp=40,
                        tile_cols_log2=1, tile_rows_log2=0)
    tu, rec, st = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for a, b in zip(rec, dec):
        assert np.array_equal(a, b)


def test_tiles_with_adaptive_quantization_delta_q_reset():
    """Delta-q state must reset to base_q_idx at every tile start (spec
    6.10.2). Regression: the decoder carried tile 1's last delta'd qp
    into tile 2's dequant. Content is half-busy/half-flat so the AQ map
    really produces nonzero deltas."""
    rng = np.random.RandomState(12)
    h, w = 128, 192
    # three SB columns; tiles split them 2+1. Column noise levels are
    # chosen so tile 0 ENDS on a delta'd qindex (flat middle column)
    # while tile 1's SBs sit exactly at base_q_idx — the configuration
    # where a stale cross-tile qp cache is actually consumed.
    y = np.empty((h, w), np.float64)
    y[:, :64] = 128 + rng.normal(0, 60, (h, 64))     # busy: q above base
    y[:, 64:128] = 128 + rng.normal(0, 2, (h, 64))   # flat: q below base
    y[:, 128:] = 128 + rng.normal(0, 10, (h, 64))    # medium: q == base
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.full((64, 96), 120, np.uint8)
    v = np.full((64, 96), 140, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=1,
                        adaptive_quantization=1)
    tu, rec, st = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for a, b in zip(rec, dec):
        assert np.array_equal(a, b)
