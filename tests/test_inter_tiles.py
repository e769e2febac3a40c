"""Multi-tile INTER frames: tile-clipped MVP/availability, per-tile
entropy contexts, frame-absolute MC, TMVP through tile views.

The reference fans every inter coding/filter stage out over segments
(EbCdefProcess.c:469-473, EbEntropyCodingProcess.c:362-415); here tile
columns cut the intra-flip wavefront critical path and parallelize the
host entropy. These tests pin the normative side: byte-exact mirror
decode and the independent checker across tile geometries.
"""

import io

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.decode import decode_ivf
from svt_av1_tpu.pipeline.encoder import Encoder, encode_ivf
from tests.test_inter_e2e import _clip
from tests.test_intra_e2e import psnr


def _roundtrip(frames, cfg):
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    assert len(decs) == len(frames)
    return iv, decs


@pytest.mark.parametrize("cl,rl", [(1, 0), (2, 0), (1, 1)])
def test_inter_tiles_roundtrip_exact(cl, rl):
    w, h = 256, 128
    frames = _clip(4, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=cl,
                        tile_rows_log2=rl)
    enc = Encoder(cfg)
    recons = []
    for f in frames:
        enc.send_picture(*f)
        tu, rec = enc.get_packet()
        recons.append(rec)
    iv, decs = _roundtrip(frames, cfg)
    for rec, d in zip(recons, decs):
        for a, b in zip(rec, d):
            assert np.array_equal(a, b)   # encoder recon == mirror decode
    for f, d in zip(frames, decs):
        assert psnr(f[0], d[0]) > 28
    # independent checker re-derives every prediction from the bits
    from svt_av1_tpu.verify.indep import check_ivf
    assert check_ivf(io.BytesIO(iv)) > 0


def test_inter_tiles_hierarchical_compound():
    """Tiles + pyramid GOP: compound blocks, TMVP projection sliced per
    tile, CDF carry via tile-0 state."""
    w, h = 256, 128
    frames = _clip(7, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=1,
                        hierarchical_levels=2)
    iv, decs = _roundtrip(frames, cfg)
    for f, d in zip(frames, decs):
        assert psnr(f[0], d[0]) > 28


def test_inter_tiles_with_intra_flips():
    """Half-new content forces intra flips inside an inter frame; the
    flip edges and waves must clip at the tile boundary."""
    rng = np.random.RandomState(21)
    h, w = 128, 256
    y0 = rng.randint(30, 220, (h, w)).astype(np.uint8)
    y1 = y0.copy()
    yy, xx = np.mgrid[0:h, 0:w // 2]
    y1[:, :w // 2] = np.clip(128 + 90 * np.sin(yy / 5.0) *
                             np.cos(xx / 4.0), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    frames = [(y0, u, v), (y1, u, v)]
    cfg = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=1,
                        scene_change_detection=False)
    iv, decs = _roundtrip(frames, cfg)
    from svt_av1_tpu.verify.indep import check_ivf
    assert check_ivf(io.BytesIO(iv)) > 0


def test_inter_tiles_filters_and_aq():
    """Tiles with DLF+CDEF+LR+AQ: frame-level filter syntax rides each
    tile's coder; delta-q resets per tile."""
    w, h = 256, 128
    frames = _clip(3, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=1,
                        enable_cdef=True, enable_restoration=True,
                        adaptive_quantization=1)
    _roundtrip(frames, cfg)


def test_inter_tiles_directional_flips_clamp_at_tile_edge():
    """D45-class flip modes read the above-right edge EXTENSION
    (above[bw:2bw]); replication must clamp at the TILE edge, not the
    frame edge (spec 7.11.2 BlockDecoded is tile-relative). Diagonal
    content drives directional flips right up to the tile boundary."""
    rng = np.random.RandomState(3)
    h, w = 128, 256
    y0 = rng.randint(30, 220, (h, w)).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    # frame 1: diagonal stripes everywhere (D45/D135 winners), new
    # content so inter prediction fails and flips fire frame-wide
    y1 = (128 + 100 * np.sin((xx + yy) / 3.0)).clip(0, 255) \
        .astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    frames = [(y0, u, v), (y1, u, v)]
    cfg = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=1,
                        scene_change_detection=False,
                        intra_modes=(0, 3, 4), fixed_partition_size=16)
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    kf = WavefrontIntraEncoder(cfg)
    kf.encode(y0, u, v)
    ie = InterFrameEncoder(cfg, kf.seq)
    ie.encode(y1, u, v, kf.recon)
    flipped = ~ie.block_is_inter
    assert flipped.sum() > 0 and np.any(ie.intra_mode[flipped] == 3)
    iv, decs = _roundtrip(frames, cfg)
    from svt_av1_tpu.verify.indep import check_ivf
    assert check_ivf(io.BytesIO(iv)) > 0


def test_backend_tiles_flip_streams_byte_identical():
    """Device fused flip program with tile-clipped per-lane ha/hl vs
    the host wave recode: byte-identical streams at 2 tile columns.
    Content is a half-frame scene change so flips fire in both tiles
    and at the tile boundary column."""
    import dataclasses
    rng = np.random.default_rng(21)
    h, w = 128, 256
    y0 = rng.integers(30, 220, (h, w)).astype(np.uint8)
    y1 = y0.copy()
    yy, xx = np.mgrid[0:h, 0:w // 2]
    # new content straddles the tile boundary (w//4 .. 3w//4)
    y1[:, w // 4:3 * w // 4] = np.clip(
        128 + 90 * np.sin(yy / 5.0) * np.cos(xx / 4.0), 0,
        255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    frames = [(y0, u, v), (y1, u, v)]
    cfg_h = EncoderConfig(width=w, height=h, qp=40, intra_period=16,
                          scene_change_detection=False,
                          tile_cols_log2=1)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    kf = WavefrontIntraEncoder(cfg_d)
    kf.encode(y0, u, v)
    ie = InterFrameEncoder(cfg_d, kf.seq)
    ie.encode(y1, u, v, kf.recon)
    assert (~ie.block_is_inter).sum() > 0   # flips actually fired
    assert encode_ivf(frames, cfg_h) == encode_ivf(frames, cfg_d)


def test_backend_tiles_dp_streams_byte_identical():
    """Partition-DP + hierarchical GOP + 2 tile columns on both
    backends (the production preset shape under tiles)."""
    import dataclasses
    w, h = 256, 128
    frames = _clip(4, w, h)
    cfg_h = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=1,
                          hierarchical_levels=2,
                          fixed_partition_size=None)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    assert encode_ivf(frames, cfg_h) == encode_ivf(frames, cfg_d)


def test_backend_multitile_keyframe_fused_byte_identical():
    """Multi-tile keyframes on the device backend run as ONE fused
    frame program whose scan steps batch every tile's wave lanes
    (device_tile.run_tiles_fused); must match the host per-tile
    wavefront byte-exactly, including tile-edge replication clamps."""
    import dataclasses
    from svt_av1_tpu.ops import device_tile
    from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
    from tests.test_intra_e2e import synth_frame
    y, u, v = synth_frame(256, 192, seed=5)
    cfg_h = EncoderConfig(width=256, height=192, qp=40,
                          tile_cols_log2=1, tile_rows_log2=1)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    tu_h, rec_h, _ = encode_keyframe_wavefront(y, u, v, cfg_h)
    calls = []
    orig = device_tile.run_tiles_fused

    def spy(enc, metas, *a, **k):
        calls.append(len(metas))
        return orig(enc, metas, *a, **k)

    device_tile.run_tiles_fused = spy
    try:
        tu_d, rec_d, _ = encode_keyframe_wavefront(y, u, v, cfg_d)
    finally:
        device_tile.run_tiles_fused = orig
    assert calls and calls[0] == 4, "frame-batched tile path did not run"
    assert tu_h == tu_d
    for a, b in zip(rec_h, rec_d):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_inter_tiles_bit_overhead_bounded():
    w, h = 256, 128
    frames = _clip(4, w, h)
    iv1 = encode_ivf(frames, EncoderConfig(width=w, height=h, qp=40))
    iv4 = encode_ivf(frames, EncoderConfig(width=w, height=h, qp=40,
                                           tile_cols_log2=2))
    assert len(iv4) < len(iv1) * 1.35
