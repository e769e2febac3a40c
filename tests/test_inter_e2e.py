"""Low-delay P end-to-end tests: ME, MC, MVP, inter syntax, GOP chain."""

import io

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.ops import mc, me
from svt_av1_tpu.pipeline.decode import decode_ivf
from svt_av1_tpu.pipeline.encoder import Encoder, encode_ivf
from tests.test_intra_e2e import psnr


def _texture(seed=0, size=(400, 400)):
    rng = np.random.default_rng(seed)
    big = rng.normal(0, 1, size)
    k = np.ones(7) / 7
    for ax in (0, 1):
        big = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"),
                                  ax, big)
    return np.clip(128 + big * 180, 0, 255).astype(np.uint8)


BIG = _texture()


def _clip(n, w, h, pan=(3, 5)):
    out = []
    for t in range(n):
        y = BIG[pan[0] * t:pan[0] * t + h, pan[1] * t:pan[1] * t + w].copy()
        y[30:54, 20 + 8 * t:44 + 8 * t] = 220  # moving bright object
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        out.append((y, u, v))
    return out


def test_fullpel_me_finds_known_pan():
    ref = BIG[0:128, 0:192]
    cur = BIG[7:7 + 128, 11:11 + 192]
    refp = mc.pad_reference(ref)
    xs = np.array([16, 64, 96])
    ys = np.array([32, 48, 64])
    mvs, cost = me.fullpel_search(refp, cur, xs, ys, 16)
    assert (mvs == [7, 11]).all() and (cost == 0).all()


def test_subpel_mc_phase0_is_copy():
    ref = BIG[:64, :64]
    refp = mc.pad_reference(ref)
    pred = mc.mc_block_batch(refp, np.array([8]), np.array([16]),
                             np.array([[8 * 3, 8 * 5]]), 16, 16)[0]
    np.testing.assert_array_equal(pred, ref[19:35, 13:29])


@pytest.mark.parametrize("w,h", [(192, 128), (200, 120)])
def test_ldp_roundtrip_exact(w, h):
    frames = _clip(4, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=40)
    enc = Encoder(cfg)
    recons = []
    for f in frames:
        enc.send_picture(*f)
        tu, rec = enc.get_packet()
        recons.append(rec)
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    assert len(decs) == len(frames)
    for rec, dec in zip(recons, decs):
        for a, b in zip(rec, dec):
            assert np.array_equal(a, b)


def test_ldp_beats_all_intra_on_motion():
    frames = _clip(5, 192, 128)
    cfg_p = EncoderConfig(width=192, height=128, qp=40)
    cfg_i = EncoderConfig(width=192, height=128, qp=40, intra_period=0)
    iv_p = encode_ivf(frames, cfg_p)
    iv_i = encode_ivf(frames, cfg_i)
    decs = decode_ivf(io.BytesIO(iv_p))
    min_psnr = min(psnr(f[0], d[0]) for f, d in zip(frames, decs))
    assert len(iv_p) < 0.7 * len(iv_i)
    assert min_psnr > 28


def test_intra_period_inserts_keyframes():
    frames = _clip(5, 128, 96)
    cfg = EncoderConfig(width=128, height=96, qp=40, intra_period=1)
    iv = encode_ivf(frames, cfg)  # K P K P K
    decs = decode_ivf(io.BytesIO(iv))
    assert len(decs) == 5


def test_intra_blocks_in_inter_frames():
    """A frame that changes content should flip blocks to intra
    (spec 5.11.19 path) and still decode byte-exactly."""
    import numpy as np
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    rng = np.random.RandomState(21)
    h, w = 128, 192
    y0 = rng.randint(30, 220, (h, w)).astype(np.uint8)
    # frame 1: half the frame is new content (pan-in), half is static
    y1 = y0.copy()
    yy, xx = np.mgrid[0:h, 0:w // 2]
    y1[:, :w // 2] = np.clip(128 + 90 * np.sin(yy / 5.0) *
                             np.cos(xx / 4.0), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=40, intra_period=16,
                        scene_change_detection=False)
    enc = Encoder(cfg)
    outs = []
    for f in ((y0, u, v), (y1, u, v)):
        enc.send_picture(*f)
        while (p := enc.get_packet()) is not None:
            outs.append(p)
    enc.flush()
    while (p := enc.get_packet()) is not None:
        outs.append(p)
    dec = StreamDecoder()
    flipped = 0
    for tu, disp in outs:
        out = dec.decode_tu(tu)
        for p in range(3):
            assert (out[p] == disp[p]).all()
    # confirm the encoder actually used intra blocks on the changed frame
    # (predicting the new content from the *keyframe* recon)
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    kf = WavefrontIntraEncoder(cfg)
    kf.encode(y0, u, v)
    ie = InterFrameEncoder(cfg, kf.seq)
    tu2, rec2 = ie.encode(y1, u, v, kf.recon)
    assert (~ie.block_is_inter).sum() > 0, \
        "no blocks flipped to intra on drastically new content"
    # the flipped stream itself must decode byte-exactly
    ktu, krec, _ = kf.encode(y0, u, v)
    sdec = StreamDecoder()
    sdec.decode_tu(ktu)
    # re-encode against the fresh keyframe recon for a matched pair
    ie2 = InterFrameEncoder(cfg, kf.seq)
    tu3, rec3 = ie2.encode(y1, u, v, kf.recon)
    out3 = sdec.decode_tu(tu3)
    for p in range(3):
        hh, ww = out3[p].shape
        assert (out3[p] == rec3[p][:hh, :ww]).all(), f"plane {p}"


def test_global_motion_pan():
    """A panning sequence should elect a global translation MV and code
    GLOBALMV blocks; streams stay byte-exact."""
    import numpy as np
    from svt_av1_tpu.bitstream.bitio import BitReader, BitWriter
    from svt_av1_tpu.bitstream import obu
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    rng = np.random.RandomState(61)
    big = rng.randint(30, 220, (160, 260)).astype(np.uint8)
    frames = []
    for t in range(3):
        dx = 4 * t  # pan 4 px/frame to the right
        y = big[16:16 + 128, 16 + dx:16 + dx + 192]
        u = np.full((64, 96), 100, np.uint8)
        v = np.full((64, 96), 140, np.uint8)
        frames.append((np.ascontiguousarray(y), u, v))
    cfg = EncoderConfig(width=192, height=128, qp=40, intra_period=16,
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
    for tu, disp in outs:
        out = dec.decode_tu(tu)
        for p in range(3):
            assert (out[p] == disp[p]).all()
    # the inter TUs should signal a nonzero global translation
    found_gm = False
    for tu, _ in outs[1:]:
        for obu_type, payload in obu.parse_obus(tu):
            if obu_type == obu.OBU_FRAME:
                fh, _t = obu.parse_frame_obu(payload, dec.seq)
                if any(g != (0, 0) for g in fh.gm_trans):
                    found_gm = True
    assert found_gm, "pan did not produce a global motion signal"


def test_inter_partition_rd_adapts_to_motion():
    """Static background + moving region: the inter partition DP should
    give large leaves to the static area and small ones to the motion,
    and the mixed-size stream must decode exactly."""
    import numpy as np
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    rng = np.random.RandomState(3)
    h, w = 128, 192
    big = rng.randint(30, 220, (200, 280)).astype(np.uint8)
    f0 = np.ascontiguousarray(big[8:8 + h, 8:8 + w])
    f1 = f0.copy()
    f1[40:80, 60:120] = big[60:100, 90:150]
    u = np.full((64, 96), 100, np.uint8)
    v = np.full((64, 96), 140, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=40, intra_period=16,
                        scene_change_detection=False,
                        fixed_partition_size=None)
    kf = WavefrontIntraEncoder(cfg)
    ktu, _, _ = kf.encode(f0, u, v)
    ie = InterFrameEncoder(cfg, kf.seq)
    tu, rec = ie.encode(f1, u, v, kf.recon)
    sizes = set(ie.leaf_sizes.values())
    assert 64 in sizes and (8 in sizes or 16 in sizes), sizes
    dec = StreamDecoder()
    dec.decode_tu(ktu)
    out = dec.decode_tu(tu)
    for p in range(3):
        hh, ww = out[p].shape
        assert (out[p] == rec[p][:hh, :ww]).all()


def test_intra_in_inter_cfl_on_scene_change():
    """Full scene change without a keyframe: every block should flip to
    intra (absolute cost trigger) and luma-derived chroma should elect
    CfL; the stream must decode byte-exactly."""
    import numpy as np
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    rng = np.random.RandomState(77)
    h, w = 128, 192
    f0y = rng.randint(30, 220, (h, w)).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    f1y = np.clip(128 + 90 * np.sin(yy / 6.0) * np.cos(xx / 5.0),
                  0, 255).astype(np.uint8)
    u0 = np.full((64, 96), 100, np.uint8)
    v0 = np.full((64, 96), 140, np.uint8)
    lu = f1y.reshape(64, 2, 96, 2).mean(axis=(1, 3))
    u1 = np.clip(60 + 0.6 * lu, 0, 255).astype(np.uint8)
    v1 = np.clip(200 - 0.5 * lu, 0, 255).astype(np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=40, intra_period=16,
                        scene_change_detection=False)
    kf = WavefrontIntraEncoder(cfg)
    ktu, _, _ = kf.encode(f0y, u0, v0)
    ie = InterFrameEncoder(cfg, kf.seq)
    tu, rec = ie.encode(f1y, u1, v1, kf.recon)
    assert (~ie.block_is_inter).sum() > 50
    assert ie.intra_uv_cfl.sum() > 20
    dec = StreamDecoder()
    dec.decode_tu(ktu)
    out = dec.decode_tu(tu)
    for p in range(3):
        hh, ww = out[p].shape
        assert (out[p] == rec[p][:hh, :ww]).all(), f"plane {p}"
