"""Hierarchical-B random access tests: pyramid coding, show_existing,
display-order reconstruction."""

import io

import numpy as np
import pytest

from svt_av1_tpu.bitstream import obu
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.decode import decode_ivf
from svt_av1_tpu.pipeline.encoder import encode_ivf
from tests.test_inter_e2e import _clip
from tests.test_intra_e2e import psnr


def test_show_existing_tu_roundtrip():
    tu = obu.show_existing_frame_tu(5)
    obus = obu.parse_obus(tu)
    assert obus[0][0] == obu.OBU_TEMPORAL_DELIMITER
    assert obus[1][0] == obu.OBU_FRAME_HEADER
    assert obu.parse_show_existing(obus[1][1]) == 5


@pytest.mark.parametrize("levels,n", [(1, 5), (2, 9), (2, 7)])
def test_pyramid_display_order_correct(levels, n):
    """Every source frame must come back in display order with sane
    quality — wrong reorder/slot management would misalign them."""
    frames = _clip(n, 192, 128)
    cfg = EncoderConfig(width=192, height=128, qp=40,
                        hierarchical_levels=levels)
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    assert len(decs) == n
    for f, d in zip(frames, decs):
        assert psnr(f[0], d[0]) > 27


def test_pyramid_vs_ldp_rate():
    """On static-ish content the pyramid with qp offsets must not cost
    substantially more than LDP."""
    frames = _clip(9, 192, 128)
    c0 = EncoderConfig(width=192, height=128, qp=40, hierarchical_levels=0)
    c2 = EncoderConfig(width=192, height=128, qp=40, hierarchical_levels=2)
    iv0 = encode_ivf(frames, c0)
    iv2 = encode_ivf(frames, c2)
    assert len(iv2) < len(iv0) * 1.15


def test_keyframe_inside_pyramid_stream():
    frames = _clip(8, 128, 96)
    cfg = EncoderConfig(width=128, height=96, qp=40,
                        hierarchical_levels=2, intra_period=3)
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    assert len(decs) == 8
    for f, d in zip(frames, decs):
        assert psnr(f[0], d[0]) > 27


def _run_gop(levels, n_frames, w=128, h=96, qp=35):
    import numpy as np
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    rng = np.random.RandomState(31 + levels)
    base = rng.randint(40, 200, (h, w)).astype(np.int32)
    frames = []
    for t in range(n_frames):
        yy = np.clip(base + 3 * t, 0, 255).astype(np.uint8)
        uu = np.full((h // 2, w // 2), 100 + t, np.uint8)
        vv = np.full((h // 2, w // 2), 140 - t, np.uint8)
        frames.append((yy, uu, vv))
    cfg = EncoderConfig(width=w, height=h, qp=qp, intra_period=64,
                        hierarchical_levels=levels,
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
    shown = []
    for tu, disp in outs:
        out = dec.decode_tu(tu)
        if disp is None:
            assert out is None
            continue
        assert out is not None
        for p in range(3):
            assert (out[p] == disp[p]).all()
        shown.append(disp)
    return shown, frames


def test_deep_pyramid_levels_3():
    """8-frame mini-GOPs: interleaved display, leaf Bs coded shown with
    refresh 0, slots recycled."""
    shown, frames = _run_gop(3, 9)
    assert len(shown) == len(frames)
    # display order must match source order: shown frame t ~ source t
    import numpy as np
    for t, (disp, src) in enumerate(zip(shown, frames)):
        err = np.abs(disp[0].astype(int) - src[0].astype(int)).mean()
        assert err < 12, f"frame {t} mean err {err} (display order broken?)"


def test_deep_pyramid_levels_4_partial_group():
    """Partial final group (flush with < 2^levels frames)."""
    shown, frames = _run_gop(4, 11)
    assert len(shown) == len(frames)
    import numpy as np
    for t, (disp, src) in enumerate(zip(shown, frames)):
        err = np.abs(disp[0].astype(int) - src[0].astype(int)).mean()
        assert err < 12, f"frame {t} err {err}"


def test_compound_prediction_roundtrip():
    """Hierarchical-B with compound (LAST+ALTREF averaged) blocks:
    byte-exact decode and actual compound usage."""
    import numpy as np
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    rng = np.random.RandomState(51)
    h, w = 96, 128
    base = rng.randint(40, 200, (h, w)).astype(np.int32)
    noise = [rng.normal(0, 6, (h, w)) for _ in range(5)]
    frames = []
    for t in range(5):
        yy = np.clip(base + noise[t] + 2 * t, 0, 255).astype(np.uint8)
        uu = np.full((h // 2, w // 2), 100, np.uint8)
        vv = np.full((h // 2, w // 2), 140, np.uint8)
        frames.append((yy, uu, vv))
    cfg = EncoderConfig(width=w, height=h, qp=45, intra_period=32,
                        hierarchical_levels=2,
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
            assert (out[p] == disp[p]).all(), f"shown {shown} plane {p}"
    assert shown == len(frames)
    # direct check that compound blocks were chosen on a middle B frame
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    kf = WavefrontIntraEncoder(cfg)
    kf.encode(*frames[0])
    anchor = InterFrameEncoder(cfg, kf.seq)
    _, arec = anchor.encode(*frames[4], kf.recon, show_frame=False)
    mid = InterFrameEncoder(cfg, kf.seq)
    mid.encode(*frames[2], kf.recon, alt_planes=arec,
               refresh_frame_flags=0, show_frame=True)
    assert mid.block_comp.sum() > 0, "no compound blocks chosen"


def test_compound_mixed_motion_roundtrip():
    """Opposed motion against past/future refs: exercises the NEAR and
    mixed NEAREST_NEW/NEW_NEAREST compound canonicalizations."""
    import numpy as np
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    rng = np.random.RandomState(91)
    h, w = 128, 192
    big = rng.randint(30, 220, (200, 280)).astype(np.uint8)
    f0 = np.ascontiguousarray(big[8:8 + h, 8:8 + w])
    f2 = np.ascontiguousarray(big[8:8 + h, 24:24 + w])
    f1 = np.ascontiguousarray(big[8:8 + h, 16:16 + w])
    u = np.full((64, 96), 100, np.uint8)
    v = np.full((64, 96), 140, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=45, intra_period=32,
                        scene_change_detection=False)
    kf = WavefrontIntraEncoder(cfg)
    ktu, _, _ = kf.encode(f0, u, v)
    anchor = InterFrameEncoder(cfg, kf.seq)
    atu, arec = anchor.encode(f2, u, v, kf.recon, show_frame=False,
                              refresh_frame_flags=2, ref_frame_idx=[0] * 7)
    mid = InterFrameEncoder(cfg, kf.seq)
    mtu, mrec = mid.encode(f1, u, v, kf.recon, alt_planes=arec,
                           refresh_frame_flags=0, show_frame=True,
                           ref_frame_idx=[0, 0, 0, 0, 0, 0, 1])
    assert mid.block_comp.sum() > 0
    dec = StreamDecoder()
    dec.decode_tu(ktu)
    dec.decode_tu(atu)
    out = dec.decode_tu(mtu)
    for p in range(3):
        hh, ww = out[p].shape
        assert (out[p] == mrec[p][:hh, :ww]).all(), f"plane {p}"
