"""Film grain synthesis tests (reference: grainSynthesis.c; spec 5.9.30 /
7.18.3). Grain is display-only: references stay clean, encoder display
output must equal decoder display output byte-exactly."""

import numpy as np
import pytest

from svt_av1_tpu.bitstream.bitio import BitReader, BitWriter
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.ops import grain
from svt_av1_tpu.pipeline.decode import StreamDecoder, decode_temporal_unit
from svt_av1_tpu.pipeline.encoder import Encoder
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront


def _planes(w, h, seed=3):
    r = np.random.RandomState(seed)
    base = r.randint(0, 255, (h, w)).astype(np.float64)
    y = np.clip(base + np.arange(w)[None, :] * 0.1, 0, 255).astype(np.uint8)
    u = r.randint(0, 255, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8)
    v = r.randint(0, 255, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8)
    return y, u, v


# --- unit --------------------------------------------------------------------

def test_lfsr_deterministic():
    a, b = grain._Lfsr(1234), grain._Lfsr(1234)
    seq_a = [a.bits(11) for _ in range(64)]
    seq_b = [b.bits(11) for _ in range(64)]
    assert seq_a == seq_b
    assert max(seq_a) < 2048 and min(seq_a) >= 0
    assert len(set(seq_a)) > 8  # actually random-ish


def test_scaling_lut_flat_and_ramp():
    flat = grain._scaling_lut(((0, 20), (255, 20)))
    assert flat.shape == (256,)
    assert (flat == 20).all()
    ramp = grain._scaling_lut(((0, 0), (255, 64)))
    assert ramp[0] == 0 and ramp[255] == 64
    assert (np.diff(ramp.astype(int)) >= 0).all()


def test_apply_grain_changes_pixels_refs_untouched():
    y, u, v = _planes(96, 64)
    params = grain.default_params(24, seed=777)
    y0 = y.copy()
    out = grain.apply_grain([y, u, v], params, 8)
    assert (y == y0).all(), "apply_grain must not mutate its input"
    assert out[0].shape == y.shape and out[0].dtype == y.dtype
    assert (out[0] != y).any(), "grain should perturb luma"
    # luma-only params: chroma untouched (num_cb/cr_points == 0)
    assert (out[1] == u).all() and (out[2] == v).all()
    # determinism
    out2 = grain.apply_grain([y, u, v], params, 8)
    assert all((a == b).all() for a, b in zip(out, out2))


def test_grain_strength_monotone():
    y, u, v = _planes(128, 96)
    deltas = []
    for s in (4, 16, 48):
        out = grain.apply_grain([y, u, v], grain.default_params(s), 8)
        deltas.append(np.abs(out[0].astype(int) - y.astype(int)).mean())
    assert deltas[0] < deltas[1] < deltas[2]


def test_params_syntax_roundtrip():
    p = grain.FilmGrainParams(
        grain_seed=0xBEEF, num_y_points=3,
        scaling_points_y=((0, 10), (128, 40), (255, 22)),
        num_cb_points=2, scaling_points_cb=((0, 8), (255, 8)),
        num_cr_points=1, scaling_points_cr=((60, 30),),
        scaling_shift=9, ar_coeff_lag=1,
        ar_coeffs_y=(5, -3, 7, 1),              # lag 1 -> 4 luma taps
        ar_coeffs_cb=(1, 2, 3, 4, 5),           # + luma-injection tap
        ar_coeffs_cr=(-1, -2, -3, -4, -5),
        ar_coeff_shift=7, grain_scale_shift=1,
        cb_mult=130, cb_luma_mult=100, cb_offset=300,
        cr_mult=126, cr_luma_mult=200, cr_offset=200,
        overlap_flag=False, clip_to_restricted_range=True)
    for is_inter in (False, True):
        w = BitWriter()
        grain.write_params(w, p, is_inter)
        w.trailing_bits()
        q = grain.read_params(BitReader(w.data()), is_inter)
        for f in grain.FilmGrainParams.__dataclass_fields__:
            assert getattr(p, f) == getattr(q, f), f


# --- e2e ---------------------------------------------------------------------

def test_keyframe_grain_roundtrip():
    y, u, v = _planes(200, 120)
    cfg = EncoderConfig(width=200, height=120, qp=35,
                        film_grain_strength=20, film_grain_seed=901)
    tu, recon, _ = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == recon[p]).all(), f"plane {p} grain mismatch"
    # grain actually on: decode of the grain-free cfg differs on luma
    cfg0 = EncoderConfig(width=200, height=120, qp=35)
    _, recon0, _ = encode_keyframe_wavefront(y, u, v, cfg0)
    assert (recon[0] != recon0[0]).any()


def test_gop_grain_roundtrip_with_show_existing():
    """Hierarchical GOP: grain must survive inter frames and
    show_existing display (per-slot params in the decoder)."""
    frames = []
    r = np.random.RandomState(11)
    base = r.randint(40, 200, (96, 128)).astype(np.int32)
    for t in range(5):
        yy = np.clip(base + t * 2, 0, 255).astype(np.uint8)
        uu = np.full((48, 64), 100 + t, np.uint8)
        vv = np.full((48, 64), 140 - t, np.uint8)
        frames.append((yy, uu, vv))
    cfg = EncoderConfig(width=128, height=96, qp=35, intra_period=16,
                        hierarchical_levels=1, film_grain_strength=12,
                        scene_change_detection=False)
    enc = Encoder(cfg)
    outs = []
    for f in frames:
        enc.send_picture(*f)
        while (pkt := enc.get_packet()) is not None:
            outs.append(pkt)
    enc.flush()
    while (pkt := enc.get_packet()) is not None:
        outs.append(pkt)
    dec = StreamDecoder()
    shown = 0
    for tu, disp in outs:
        out = dec.decode_tu(tu)
        if disp is None:
            assert out is None
            continue
        shown += 1
        for p in range(3):
            assert (out[p] == disp[p]).all(), f"shown {shown} plane {p}"
    assert shown == len(frames)


def test_picture_analysis_maps():
    from svt_av1_tpu.pipeline import analysis
    r = np.random.RandomState(5)
    y = r.randint(0, 255, (96, 128)).astype(np.uint8)
    vm = analysis.variance_maps(y)
    assert set(vm) == {8, 16, 32, 64}
    assert vm[64].shape == (1, 2)
    h = analysis.luma_histogram(y)
    assert h.sum() == y.size and h.shape == (256,)
    ac = analysis.activity_class(y)
    assert ac.shape == (3, 4) and ac.max() <= 3


def test_noise_estimator_tracks_sigma():
    from svt_av1_tpu.pipeline import analysis
    r = np.random.RandomState(6)
    base = np.clip(np.tile(np.linspace(40, 200, 192), (128, 1)),
                   0, 255)
    assert analysis.estimate_noise_sigma(base.astype(np.uint8)) < 0.8
    for true_sigma in (4.0, 10.0):
        noisy = np.clip(base + r.normal(0, true_sigma, base.shape),
                        0, 255).astype(np.uint8)
        est = analysis.estimate_noise_sigma(noisy)
        assert 0.6 * true_sigma < est < 1.5 * true_sigma, \
            (true_sigma, est)


def test_auto_film_grain_end_to_end():
    """film_grain_strength=-1: the GOP encoder estimates grain from the
    source; noisy input -> grain on + exact roundtrip, clean -> off."""
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    r = np.random.RandomState(7)
    base = np.clip(np.tile(np.linspace(30, 220, 128), (96, 1)), 0, 255)
    noisy = np.clip(base + r.normal(0, 9, base.shape), 0,
                    255).astype(np.uint8)
    u = np.full((48, 64), 100, np.uint8)
    v = np.full((48, 64), 140, np.uint8)
    cfg = EncoderConfig(width=128, height=96, qp=40,
                        film_grain_strength=-1)
    enc = Encoder(cfg)
    enc.send_picture(noisy, u, v)
    enc.flush()
    tu, disp = enc.get_packet()
    assert enc.cfg.film_grain_params is not None, "noise not detected"
    dec = StreamDecoder()
    out = dec.decode_tu(tu)
    for p in range(3):
        assert (out[p] == disp[p]).all()
    # clean input -> grain stays off
    enc2 = Encoder(cfg)
    enc2.send_picture(base.astype(np.uint8), u, v)
    enc2.flush()
    assert enc2.cfg.film_grain_params is None


def test_grain_ar_model_estimation():
    """The noise-model solve recovers AR(2) spectral shape and noise
    strength from a grained source (noise_model.c:118-1823 role)."""
    from svt_av1_tpu.ops.grain import FilmGrainParams, apply_grain
    from svt_av1_tpu.pipeline import analysis
    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    clean = np.clip(120 + 30 * np.sin(xx / 200.0)
                    + 20 * np.cos(yy / 150.0), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    true_p = FilmGrainParams(
        grain_seed=1234, ar_coeff_lag=2,
        ar_coeffs_y=(2, -3, 5, -2, 4, 6, -8, 12, 30, -12, 8, 40),
        ar_coeff_shift=7, scaling_points_y=((0, 40), (255, 40)),
        num_y_points=2)
    gy, _, _ = apply_grain([clean, u, u], true_p, 8)
    est = analysis.estimate_grain_params(gy, 8)
    assert est.apply_grain and est.ar_coeff_lag == 2
    tf = np.array(true_p.ar_coeffs_y, float) / (1 << true_p.ar_coeff_shift)
    ef = np.array(est.ar_coeffs_y, float) / (1 << est.ar_coeff_shift)
    assert np.corrcoef(tf, ef)[0, 1] > 0.9
    # resynthesized noise strength within 20% of the truth
    ry, _, _ = apply_grain([clean, u, u], est, 8)
    t_std = (gy.astype(float) - clean).std()
    r_std = (ry.astype(float) - clean).std()
    assert abs(r_std - t_std) / t_std < 0.2, (t_std, r_std)
    # white noise -> no spurious AR structure
    wn = np.clip(clean.astype(float)
                 + np.random.default_rng(0).normal(0, 5, (h, w)),
                 0, 255).astype(np.uint8)
    est_w = analysis.estimate_grain_params(wn, 8)
    assert est_w.apply_grain and est_w.ar_coeff_lag == 0
