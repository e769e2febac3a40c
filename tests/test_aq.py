"""Adaptive quantization (delta-QP / QPM) tests: spec 5.9.17/5.11.5
syntax, per-SB qindex plumbing through decide/syntax/decode."""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy import delta as delta_syntax
from svt_av1_tpu.entropy.cdf import FrameContext
from svt_av1_tpu.entropy.writer import SymbolReader, SymbolWriter
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.wavefront import (WavefrontIntraEncoder,
                                            encode_keyframe_wavefront)


def test_delta_q_syntax_roundtrip():
    rng = np.random.RandomState(0)
    deltas = [int(d) for d in rng.randint(-20, 21, 100)]
    fc_w, fc_r = FrameContext(100), FrameContext(100)
    w = SymbolWriter()
    for d in deltas:
        delta_syntax.write_delta_qindex(w, fc_w, d)
    r = SymbolReader(w.done())
    for d in deltas:
        assert delta_syntax.read_delta_qindex(r, fc_r) == d


def test_apply_delta_clamps():
    assert delta_syntax.apply_delta(10, -10, 2) == 1
    assert delta_syntax.apply_delta(250, 4, 2) == 255
    assert delta_syntax.apply_delta(100, 2, 2) == 108


def _mixed_content(w, h, seed=1):
    """Half flat gradient (low variance), half heavy texture."""
    rng = np.random.RandomState(seed)
    y = np.tile(np.linspace(60, 180, w), (h, 1))
    y[:, w // 2:] += rng.normal(0, 40, (h, w - w // 2))
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.full(((h + 1) // 2, (w + 1) // 2), 110, np.uint8)
    v = np.full(((h + 1) // 2, (w + 1) // 2), 150, np.uint8)
    return y, u, v


def test_aq_keyframe_roundtrip():
    y, u, v = _mixed_content(256, 128)
    cfg = EncoderConfig(width=256, height=128, qp=45,
                        adaptive_quantization=1)
    enc = WavefrontIntraEncoder(cfg)
    tu, recon, _ = enc.encode(y, u, v)
    assert enc.qmap is not None
    assert len(np.unique(enc.qmap)) > 1, "variance AQ produced a flat map"
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == recon[p]).all(), f"plane {p} AQ mismatch"


def test_aq_shifts_bits_toward_flat_areas():
    """Flat half should reconstruct better with AQ on at similar size."""
    y, u, v = _mixed_content(256, 128, seed=2)
    cfg_on = EncoderConfig(width=256, height=128, qp=50,
                           adaptive_quantization=1)
    cfg_off = EncoderConfig(width=256, height=128, qp=50)
    tu1, r1, _ = encode_keyframe_wavefront(y, u, v, cfg_on)
    tu0, r0, _ = encode_keyframe_wavefront(y, u, v, cfg_off)
    flat = slice(0, 128)
    sse_on = float(((r1[0][:, flat].astype(int) - y[:, flat]) ** 2).sum())
    sse_off = float(((r0[0][:, flat].astype(int) - y[:, flat]) ** 2).sum())
    assert sse_on < sse_off, (sse_on, sse_off)


def test_aq_with_tiles_roundtrip():
    y, u, v = _mixed_content(256, 128, seed=3)
    cfg = EncoderConfig(width=256, height=128, qp=45,
                        adaptive_quantization=1, tile_cols_log2=1)
    tu, recon, _ = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == recon[p]).all(), f"plane {p} tiles+AQ"


def test_aq_inter_roundtrip():
    """AQ on a low-delay sequence: per-SB deltas in inter frames too."""
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    rng = np.random.RandomState(9)
    h, w = 128, 256
    frames = []
    for t in range(3):
        y, u, v = _mixed_content(w, h, seed=10 + 0)  # static content
        y = np.clip(y.astype(int) + t, 0, 255).astype(np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(width=w, height=h, qp=45, intra_period=16,
                        adaptive_quantization=1,
                        scene_change_detection=False)
    enc = Encoder(cfg)
    outs = []
    for f in frames:
        enc.send_picture(*f)
        while (p := enc.get_packet()) is not None:
            outs.append(p)
    enc.flush()
    while (p := enc.get_packet()) is not None:
        outs.append(p)
    dec = StreamDecoder()
    shown = 0
    for tu, disp in outs:
        out = dec.decode_tu(tu)
        if disp is None:
            continue
        shown += 1
        for p in range(3):
            assert (out[p] == disp[p]).all(), f"frame {shown} plane {p}"
    assert shown == len(frames)


def test_temporal_aq_boosts_stable_regions():
    """TPL-lite: with a static left half and churning right half, the
    stable SBs should get lower qindex than spatial-only AQ gives, and
    streams must stay exact."""
    from svt_av1_tpu.pipeline import analysis
    rng = np.random.RandomState(12)
    h, w = 128, 256
    y0 = rng.randint(40, 210, (h, w)).astype(np.uint8)
    y1 = y0.copy()
    y1[:, w // 2:] = rng.randint(40, 210, (h, w - w // 2))
    qm_spatial = analysis.variance_qmap(y1, 2, 4, 160, 2)
    qm_temporal = analysis.variance_qmap(y1, 2, 4, 160, 2, prev_y=y0)
    assert (qm_temporal[:, :2] <= qm_spatial[:, :2]).all()
    assert (qm_temporal[:, :2] < qm_spatial[:, :2]).any()
    # e2e: low-delay with temporal AQ decodes exactly
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    u = np.full((64, 128), 100, np.uint8)
    v = np.full((64, 128), 140, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=40, intra_period=16,
                        adaptive_quantization=1,
                        scene_change_detection=False)
    enc = Encoder(cfg)
    outs = []
    for f in ((y0, u, v), (y1, u, v)):
        enc.send_picture(*f)
        while (p := enc.get_packet()) is not None:
            outs.append(p)
    dec = StreamDecoder()
    for tu, disp in outs:
        out = dec.decode_tu(tu)
        for p in range(3):
            assert (out[p] == disp[p]).all()
