"""Switchable interpolation-filter search (REGULAR/SMOOTH/SHARP).

Reference: per-block filter RD in the inter MD loop
(EbInterPrediction.c:3523), write_mb_interp_filter syntax
(EbEntropyCoding.c:2024), context EbEntropyCoding.c:1904, filter tap
tables EbInterPrediction.c:918-963.
"""

import dataclasses
import io

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.ops import mc
from svt_av1_tpu.pipeline.decode import decode_ivf
from svt_av1_tpu.pipeline.encoder import Encoder, encode_ivf
from tests.test_inter_e2e import _clip


def test_filter_taps_are_unit_gain():
    for bank in (mc.FILTER_BANK_8, mc.FILTER_BANK_4):
        assert bank.shape == (3, 16, 8)
        assert (bank.sum(axis=2) == 128).all()
    # phase 0 is the same pure delta in every set: integer MVs are
    # filter-independent (the REGULAR tie-break is free)
    for f in range(3):
        assert tuple(mc.FILTER_BANK_8[f, 0]) == (0, 0, 0, 128, 0, 0, 0, 0)


def test_smooth_and_sharp_differ_from_regular():
    ref = mc.pad_reference(
        (np.arange(64 * 64, dtype=np.int64).reshape(64, 64) * 7) % 255)
    xs, ys = np.array([8]), np.array([8])
    mvs = np.array([[5, 3]])    # fractional both dims
    preds = [mc.mc_block_batch(ref, xs, ys, mvs, 16, 16, ftype=f)
             for f in range(3)]
    assert not np.array_equal(preds[0], preds[1])
    assert not np.array_equal(preds[0], preds[2])


def _roundtrip(frames, cfg):
    enc = Encoder(cfg)
    recons = []
    for f in frames:
        enc.send_picture(*f)
        while (p := enc.get_packet()) is not None:
            if p[1] is not None:
                recons.append(p[1])
    enc.flush()
    while (p := enc.get_packet()) is not None:
        if p[1] is not None:
            recons.append(p[1])
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    assert len(decs) == len(frames)
    for rec, dec in zip(recons, decs):
        for a, b in zip(rec, dec):
            assert np.array_equal(np.asarray(a), np.asarray(b))
    return iv


def test_interp_search_roundtrip_and_filters_used():
    """The searched stream must decode to the encoder's own recon
    byte-exactly AND actually use a non-REGULAR filter somewhere
    (else the test covers nothing)."""
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder

    frames = _clip(4, 192, 128, pan=(3, 5))
    cfg = EncoderConfig(width=192, height=128, qp=40,
                        enable_interp_filter_search=True)
    kf = WavefrontIntraEncoder(cfg)
    kf.encode(*frames[0])
    ie = InterFrameEncoder(cfg, kf.seq)
    ie.encode_compute(*frames[1], kf.recon)
    used = set(np.unique(ie.interp_f[ie.block_is_inter]))
    assert used - {0}, "content picked only REGULAR; test needs " \
        "restructuring"
    _roundtrip(frames, cfg)


def test_interp_search_off_stream_unchanged():
    frames = _clip(3, 128, 96)
    cfg_off = EncoderConfig(width=128, height=96, qp=40)
    explicit = dataclasses.replace(cfg_off,
                                   enable_interp_filter_search=False)
    assert encode_ivf(frames, cfg_off) == encode_ivf(frames, explicit)


def test_interp_search_backends_byte_identical():
    frames = _clip(3, 128, 96)
    cfg_h = EncoderConfig(width=128, height=96, qp=40,
                          enable_interp_filter_search=True)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    assert encode_ivf(frames, cfg_h) == encode_ivf(frames, cfg_d)


def test_interp_search_hierarchical_compound_roundtrip():
    frames = _clip(5, 128, 96)
    cfg = EncoderConfig(width=128, height=96, qp=40,
                        hierarchical_levels=2,
                        enable_interp_filter_search=True)
    _roundtrip(frames, cfg)


def test_interp_search_passes_indep_checker():
    from svt_av1_tpu.verify.indep import check_ivf
    frames = _clip(3, 128, 96)
    cfg = EncoderConfig(width=128, height=96, qp=40,
                        enable_interp_filter_search=True)
    iv = encode_ivf(frames, cfg)
    n = check_ivf(io.BytesIO(iv))
    assert n >= 3


def test_interp_search_helps_on_smooth_content():
    """On soft, noisy-gradient content the searched stream should not
    be larger at equal reconstruction than forced-REGULAR coding (the
    reference enables the search for exactly this reason)."""
    rng = np.random.default_rng(3)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h + 32, 0:w + 32].astype(np.float32)
    base = np.clip(110 + 50 * np.sin(xx / 23) * np.cos(yy / 31)
                   + rng.normal(0, 5, (h + 32, w + 32)), 0,
                   255).astype(np.uint8)
    frames = []
    for t in range(4):
        y = base[2 * t:2 * t + h, 3 * t:3 * t + w]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, u, v))
    cfg_on = EncoderConfig(width=w, height=h, qp=45,
                           enable_interp_filter_search=True)
    cfg_off = dataclasses.replace(cfg_on,
                                  enable_interp_filter_search=False)
    on = encode_ivf(frames, cfg_on)
    off = encode_ivf(frames, cfg_off)
    from tests.test_intra_e2e import psnr
    dec_on = decode_ivf(io.BytesIO(on))
    dec_off = decode_ivf(io.BytesIO(off))
    p_on = np.mean([psnr(f[0], d[0]) for f, d in zip(frames, dec_on)])
    p_off = np.mean([psnr(f[0], d[0]) for f, d in zip(frames, dec_off)])
    # quality-normalized size: no regression beyond noise, and the
    # filter symbols must pay for themselves on this content
    assert p_on >= p_off - 0.05
    assert len(on) <= len(off) * 1.01
