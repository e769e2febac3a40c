"""Partition RD search tests: validity, roundtrip, and RD benefit."""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import rd
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
from tests.test_intra_e2e import psnr, synth_frame


def test_partition_covers_frame_exactly():
    y, u, v = synth_frame(200, 120, seed=4)
    cfg = EncoderConfig(width=200, height=120, qp=40)
    from svt_av1_tpu.bitstream.obu import SequenceHeader
    seq = SequenceHeader(width=200, height=120)
    leaves = rd.choose_partition(y, cfg, seq.mi_cols, seq.mi_rows)
    from svt_av1_tpu.pipeline.common import leaf_wh
    cover = np.zeros((seq.mi_rows, seq.mi_cols), dtype=int)
    for (r, c), s in leaves.items():
        lw, lh = leaf_wh(s)
        cover[r:r + (lh >> 2), c:c + (lw >> 2)] += 1
    assert (cover == 1).all(), "leaves must tile the mi area exactly once"
    for (r, c), s in leaves.items():
        lw, lh = leaf_wh(s)
        if max(lw, lh) > 8:
            hbs = max(lw, lh) >> 3
            assert (r + min(hbs, lh >> 2) - 1) < seq.mi_rows \
                and (c + min(hbs, lw >> 2) - 1) < seq.mi_cols


@pytest.mark.parametrize("w,h,qp", [(128, 96, 30), (200, 120, 45)])
def test_rd_roundtrip(w, h, qp):
    y, u, v = synth_frame(w, h, seed=qp)
    cfg = EncoderConfig(width=w, height=h, qp=qp, fixed_partition_size=None)
    tu, rec, st = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for a, b in zip(rec, dec):
        assert np.array_equal(a, b)


def test_rd_beats_or_ties_fixed():
    """RD cost (SSE + lambda*bits with the shared lambda) must not be worse
    than the best fixed partition."""
    y, u, v = synth_frame(448, 256, seed=2)
    qp = 45
    lam = rd.rd_lambda(qp * 4)
    results = {}
    for part in (16, 32, 64, None):
        cfg = EncoderConfig(width=448, height=256, qp=qp,
                            fixed_partition_size=part)
        tu, rec, st = encode_keyframe_wavefront(y, u, v, cfg)
        sse = float(np.sum((y.astype(np.int64) - rec[0]) ** 2))
        results[part] = sse + lam * st["tu_bytes"] * 8
    fixed = [results[p] for p in (16, 32, 64)]
    # proxy-rate DP: must be near the best fixed choice and beat the mean
    assert results[None] <= min(fixed) * 1.10
    assert results[None] <= np.mean(fixed)
