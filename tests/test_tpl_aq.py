"""TPL AQ: MV-propagated lookahead importance (adaptive_quantization=2).

Reference analogue: the BEA/TPL machinery of InitialRateControl
(UpdateBeaInfoOverTime, EbInitialRateControlProcess.c:954) — per-block
inter cost propagated along ME MVs so areas future frames predict FROM
are quantized finer.
"""

import dataclasses
import io

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import analysis
from svt_av1_tpu.pipeline.decode import decode_ivf
from svt_av1_tpu.pipeline.encoder import encode_ivf
from tests.test_inter_e2e import _clip
from tests.test_intra_e2e import psnr


def test_propagation_rewards_referenced_areas():
    """Offsets are mean-normalized (within-frame redistribution; the
    per-layer qp-scaling already prices temporal depth), so the signal
    to check is spatial: a statically-predicted region that future
    frames copy from must get finer qindex than a region that refreshes
    to new noise every frame (nothing references it)."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (320, 512)).astype(np.uint8)
    lumas = []
    for t in range(5):
        f = base.copy()
        # right half: fresh unpredictable noise every frame
        f[:, 256:] = rng.integers(0, 255, (320, 256))
        lumas.append(f)
    # window = frames 1..4 with frame 0 as the previous anchor
    maps = analysis.tpl_group_qmaps(lumas[1:], 120, 2, 5, 8,
                                    prev_luma=lumas[0])
    # the GOP anchor (last frame) is what interior frames reference:
    # left (referenced) SB columns finer than right (noise/new) ones
    assert maps[-1][:, :4].mean() < maps[-1][:, 4:].mean()
    assert abs(maps[-1].mean()) <= 4       # ~zero-mean redistribution
    # propagation follows the pyramid: display-order leaves (odd
    # positions of the 4-frame window: 0 and 2) are referenced by
    # nothing, so their maps carry no deltas at all
    assert np.all(maps[0] == 0) and np.all(maps[2] == 0)
    # offsets are codable multiples of 1 << delta_q_res
    assert all((m.astype(int) % 4 == 0).all() for m in maps)


def test_tpl_aq_roundtrip_exact():
    frames = _clip(9, 192, 128)
    cfg = EncoderConfig(width=192, height=128, qp=40,
                        hierarchical_levels=3,
                        adaptive_quantization=2)
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    assert len(decs) == 9


def test_tpl_aq_backends_byte_identical():
    frames = _clip(5, 128, 96)
    cfg_h = EncoderConfig(width=128, height=96, qp=40,
                          hierarchical_levels=2,
                          adaptive_quantization=2)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    assert encode_ivf(frames, cfg_h) == encode_ivf(frames, cfg_d)


def _bd_point(frames, cfg):
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    p = np.mean([psnr(f[0], d[0]) for f, d in zip(frames, decs)])
    return len(iv), p


def test_tpl_aq_helps_on_panning_content():
    """Fixed config, aq=2 vs aq=0: on predictable motion the TPL map
    must not lose quality-per-bit (finer anchors pay off through the
    prediction chain)."""
    frames = _clip(9, 192, 128)
    cfg0 = EncoderConfig(width=192, height=128, qp=45,
                         hierarchical_levels=3, adaptive_quantization=0)
    cfg2 = dataclasses.replace(cfg0, adaptive_quantization=2)
    b0, p0 = _bd_point(frames, cfg0)
    b2, p2 = _bd_point(frames, cfg2)
    # quality-per-bit must improve: either cheaper at >= equal quality
    # or better quality at <= 5% more bits with > 0.1 dB gain
    assert (b2 <= b0 and p2 >= p0 - 0.02) \
        or (p2 >= p0 + 0.1 and b2 <= b0 * 1.05), \
        (b0, p0, b2, p2)


def test_tpl_aq_natural_pan_is_neutral():
    """A uniform natural pan has no reference heterogeneity — every
    area is equally referenced — so the mean-normalized + dead-zoned
    TPL map must stay (near-)empty: bits and quality within noise of
    flat q (a naive TPL that turns rounding noise into deltas fails
    this; measured round 4: identical PSNR, +5 bytes)."""
    from svt_av1_tpu.utils import natural
    if not natural.available():
        pytest.skip("natural-content asset not present")
    frames = natural.natural_clip(448, 256, frames=9, pan=(2, 4))
    cfg0 = EncoderConfig(width=448, height=256, qp=45,
                         hierarchical_levels=3, adaptive_quantization=0)
    cfg2 = dataclasses.replace(cfg0, adaptive_quantization=2)
    b0, p0 = _bd_point(frames, cfg0)
    b2, p2 = _bd_point(frames, cfg2)
    assert b2 <= b0 * 1.01 and p2 >= p0 - 0.05, (b0, p0, b2, p2)


def test_tpl_aq_structured_on_natural_occlusion():
    """Static natural background + moving occluder: propagation must
    follow the real pyramid — display-order leaves get empty maps, the
    GOP anchor (referenced by every interior frame) gets the densest
    map — and the encode must stay near the flat-q RD point (bounded
    bits, no quality loss). Measured round 4 (448x256 qp45): flat
    (4547 B, 47.21 dB) vs TPL (4615 B, 47.29 dB)."""
    from svt_av1_tpu.utils import natural
    if not natural.available():
        pytest.skip("natural-content asset not present")
    frames = natural.occluder_clip(448, 256, frames=9)
    lumas = [f[0] for f in frames]
    maps = analysis.tpl_group_qmaps(lumas[1:], 120, 2, 4, 7,
                                    prev_luma=lumas[0])
    # leaves (display positions 0,2,4,6 of the 8-frame window) empty
    assert all(np.all(maps[i] == 0) for i in (0, 2, 4, 6))
    # the anchor carries deltas, and they coarsen the occluder's sweep
    # corridor (the mid-height band nothing can predict across the
    # window) relative to the stable background rows
    assert (maps[-1] != 0).sum() > 0
    band = maps[-1][1:3, :].mean()      # corridor rows (patch at h/2)
    outer = maps[-1][[0, 3], :].mean()  # stable background rows
    assert band > outer
    cfg0 = EncoderConfig(width=448, height=256, qp=45,
                         hierarchical_levels=3, adaptive_quantization=0)
    cfg2 = dataclasses.replace(cfg0, adaptive_quantization=2)
    b0, p0 = _bd_point(frames, cfg0)
    b2, p2 = _bd_point(frames, cfg2)
    assert b2 <= b0 * 1.02 and p2 >= p0, (b0, p0, b2, p2)
