"""InitialRateControl histogram queue: in-window scene-cut detection
over lookahead luma histograms (GetHistogramQueueData /
UpdateHistogramQueueEntry, EbInitialRateControlProcess.c:1211,1257)."""

import numpy as np

from svt_av1_tpu.config import EncoderConfig, RateControlMode
from svt_av1_tpu.pipeline import analysis
from svt_av1_tpu.pipeline.encoder import Encoder
from svt_av1_tpu.pipeline.scd import luma_stats


def _hist(img):
    return luma_stats(img)[1]


def test_cut_index_detects_scene_change():
    rng = np.random.RandomState(0)
    a = np.clip(100 + rng.normal(0, 10, (128, 192)), 0, 255) \
        .astype(np.uint8)
    dark = np.full((128, 192), 30, np.uint8)
    hists = [_hist(a), _hist(a), _hist(dark), _hist(dark)]
    assert analysis.histogram_cut_index(hists) == 2


def test_cut_index_none_on_stable_content():
    rng = np.random.RandomState(1)
    hists = []
    for t in range(5):
        img = np.clip(100 + 20 * np.sin(np.arange(192) / 13.0 + t)
                      + rng.normal(0, 8, (128, 192)), 0, 255) \
            .astype(np.uint8)
        hists.append(_hist(img))
    assert analysis.histogram_cut_index(hists) is None


def test_lookahead_window_truncates_at_cut():
    """The head frame's budget share must not be shaped by post-cut
    complexity: with a huge-complexity scene cut inside the window, the
    truncated window keeps the head frame's share near 1.0."""
    cfg = EncoderConfig(width=192, height=128, qp=40,
                        rate_control_mode=RateControlMode.VBR,
                        target_bit_rate=150_000,
                        look_ahead_distance=4, intra_period=-1,
                        hierarchical_levels=0,
                        scene_change_detection=False)
    enc = Encoder(cfg)
    rng = np.random.RandomState(2)
    flat = np.full((128, 192), 120, np.uint8)
    noisy = np.clip(rng.normal(128, 60, (128, 192)), 0, 255) \
        .astype(np.uint8)
    u = np.full((64, 96), 128, np.uint8)
    shares = []
    orig = enc._rc.set_lookahead

    def spy(window):
        shares.append(list(window))
        return orig(window)

    enc._rc.set_lookahead = spy
    # 3 flat frames, then a hard cut to heavy noise
    for img in [flat, flat, flat, noisy, noisy, noisy, noisy]:
        enc.send_picture(img, u, u)
        while enc.get_packet() is not None:
            pass
    enc.flush()
    while enc.get_packet() is not None:
        pass
    assert shares, "lookahead never reached the controller"
    # frame 0's raw window spans the cut: without truncation it would
    # contain the first noisy frame's OIS-capped complexity (~12 here,
    # vs ~0.001 for flat-on-flat). The histogram queue truncates at the
    # cut, so no post-cut entry leaks in.
    w0 = shares[0]
    assert len(w0) <= 3, f"window not truncated at the cut: {w0}"
    assert max(w0) <= 1.0 + 1e-9, f"post-cut complexity leaked: {w0}"
    # the first POST-cut frame's window may span its own content freely
    assert max(shares[3]) > 5.0, "cut frame's own complexity lost"
