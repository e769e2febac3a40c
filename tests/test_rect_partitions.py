"""Rectangular partition tests (PARTITION_HORZ/VERT, spec 5.11.4):
handcrafted leaf maps across tool combinations, RD selection benefit,
and decoder byte-exactness."""

import numpy as np
import pytest
from unittest import mock

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import rd
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder


def _content(w, h, seed=6):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(128 + 70 * np.sin((xx + yy) / 7.0)
                + rng.normal(0, 8, (h, w)), 0, 255).astype(np.uint8)
    u = rng.randint(60, 200, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8)
    v = np.full(((h + 1) // 2, (w + 1) // 2), 150, np.uint8)
    return y, u, v


_MIXED_MAP = {
    (0, 0): (32, 16), (4, 0): (32, 16),       # 32 node HORZ
    (0, 8): (16, 32), (0, 12): (16, 32),      # 32 node VERT
    (8, 0): (16, 8), (10, 0): (16, 8),        # 16 node HORZ
    (8, 4): 16, (12, 0): 16, (12, 4): 16,
    (8, 8): 32,
    (0, 16): (64, 32), (8, 16): (64, 32),
    (16, 0): (32, 64), (16, 8): (32, 64),
    (16, 16): 64,
}


@pytest.mark.parametrize("tools", [
    {}, {"enable_dlf": True, "enable_tx_type_search": True},
    {"adaptive_quantization": 1}, {"enable_cdef": True},
    {"enable_restoration": True}, {"bit_depth": 10},
])
def test_handcrafted_rect_map_roundtrip(tools):
    bd = tools.get("bit_depth", 8)
    y, u, v = _content(128, 128)
    if bd == 10:
        y = (y.astype(np.uint16) << 2)
        u = (u.astype(np.uint16) << 2)
        v = (v.astype(np.uint16) << 2)
    cfg = EncoderConfig(width=128, height=128, qp=35,
                        fixed_partition_size=None, **tools)
    with mock.patch.object(rd, "choose_partition",
                           return_value=dict(_MIXED_MAP)):
        enc = WavefrontIntraEncoder(cfg)
        tu, recon, _ = enc.encode(y, u, v)
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == recon[p]).all(), f"{tools} plane {p}"


def test_rd_picks_rect_and_it_pays():
    """Horizontally banded content: the DP should choose HORZ leaves and
    reduce bits at no quality loss."""
    rng = np.random.RandomState(7)
    h, w = 192, 256
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where((yy // 16) % 2 == 0, 80 + xx * 0.3, 180 - xx * 0.2)
    y = np.clip(y + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((96, 128), 110, np.uint8)
    v = np.full((96, 128), 150, np.uint8)
    out = {}
    for rect in (False, True):
        cfg = EncoderConfig(width=w, height=h, qp=35,
                            fixed_partition_size=None,
                            enable_rect_partitions=rect)
        enc = WavefrontIntraEncoder(cfg)
        tu, rec, st = enc.encode(y, u, v)
        nrect = sum(1 for s in enc.leaf_sizes.values()
                    if isinstance(s, tuple))
        sse = float(((rec[0].astype(int) - y) ** 2).sum())
        out[rect] = (st["tu_bytes"], sse, nrect, tu, rec)
    assert out[True][2] > 0, "RD never chose a rect partition"
    assert out[True][0] < out[False][0], "rect did not reduce bits"
    assert out[True][1] <= out[False][1] * 1.05
    # the rect-bearing stream must decode exactly
    _, dec = decode_temporal_unit(out[True][3])
    for p in range(3):
        assert (dec[p] == out[True][4][p]).all()


def test_rect_with_odd_frame_size():
    y, u, v = _content(200, 120, seed=9)
    cfg = EncoderConfig(width=200, height=120, qp=40,
                        fixed_partition_size=None)
    enc = WavefrontIntraEncoder(cfg)
    tu, recon, _ = enc.encode(y, u, v)
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == recon[p]).all()


def test_inter_rect_partitions_roundtrip():
    """A moving horizontal band: the inter partition DP should choose
    HORZ rect leaves and the stream must decode exactly (single-ref,
    intra-flip, and compound tails all handle rect)."""
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    rng = np.random.RandomState(3)
    h, w = 128, 192
    big = rng.randint(30, 220, (220, 300)).astype(np.uint8)
    f0 = np.ascontiguousarray(big[8:8 + h, 8:8 + w])
    f1 = f0.copy()
    f1[48:80, :] = big[52:84, 8:8 + w]
    u = np.full((64, 96), 100, np.uint8)
    v = np.full((64, 96), 140, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=40, intra_period=16,
                        scene_change_detection=False,
                        fixed_partition_size=None)
    kf = WavefrontIntraEncoder(cfg)
    ktu, _, _ = kf.encode(f0, u, v)
    ie = InterFrameEncoder(cfg, kf.seq)
    tu, rec = ie.encode(f1, u, v, kf.recon)
    assert any(isinstance(s, tuple) for s in ie.leaf_sizes.values()), \
        "inter DP never chose a rect leaf"
    dec = StreamDecoder()
    dec.decode_tu(ktu)
    out = dec.decode_tu(tu)
    for p in range(3):
        hh, ww = out[p].shape
        assert (out[p] == rec[p][:hh, :ww]).all(), f"plane {p}"


_MAP_4WAY = {
    # SB0: 64x64 HORZ_4
    (0, 0): (64, 16), (4, 0): (64, 16), (8, 0): (64, 16), (12, 0): (64, 16),
    # SB0 right half via VERT_4 (cols 16..31)
    (0, 16): (16, 64), (0, 20): (16, 64), (0, 24): (16, 64), (0, 28): (16, 64),
    # SB1 bottom-left: 32 HORZ_4 strips + 8x32 VERT_4 strips
    (16, 0): (32, 8), (18, 0): (32, 8), (20, 0): (32, 8), (22, 0): (32, 8),
    (16, 8): (8, 32), (16, 10): (8, 32), (16, 12): (8, 32), (16, 14): (8, 32),
    (24, 0): 32, (24, 8): 32,
    (16, 16): 64,
}


@pytest.mark.parametrize("tools", [
    {}, {"enable_dlf": True, "enable_tx_type_search": True},
    {"adaptive_quantization": 1}, {"enable_cdef": True},
    {"enable_restoration": True}, {"bit_depth": 10},
])
def test_handcrafted_4way_map_roundtrip(tools):
    """PARTITION_HORZ_4 / VERT_4 (4:1 leaves 64x16/16x64/32x8/8x32,
    spec 5.11.4) across tool combinations; decoder byte-exactness."""
    bd = tools.get("bit_depth", 8)
    y, u, v = _content(128, 128)
    if bd == 10:
        y = (y.astype(np.uint16) << 2)
        u = (u.astype(np.uint16) << 2)
        v = (v.astype(np.uint16) << 2)
    cfg = EncoderConfig(width=128, height=128, qp=35,
                        fixed_partition_size=None, **tools)
    with mock.patch.object(rd, "choose_partition",
                           return_value=dict(_MAP_4WAY)):
        enc = WavefrontIntraEncoder(cfg)
        tu, recon, _ = enc.encode(y, u, v)
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == recon[p]).all(), f"{tools} plane {p}"


def test_rd_picks_4way_and_it_pays():
    """Thin horizontal stripes (8 px period): the DP should choose
    HORZ_4 strips, cutting bits and SSE vs the square-only tree."""
    rng = np.random.RandomState(7)
    h, w = 192, 256
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where((yy // 8) % 2 == 0, 70 + xx * 0.3, 190 - xx * 0.2)
    y = np.clip(y + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((96, 128), 110, np.uint8)
    v = np.full((96, 128), 150, np.uint8)
    out = {}
    for rect in (False, True):
        cfg = EncoderConfig(width=w, height=h, qp=35,
                            fixed_partition_size=None,
                            enable_rect_partitions=rect)
        enc = WavefrontIntraEncoder(cfg)
        tu, rec, st = enc.encode(y, u, v)
        n4 = sum(1 for s in enc.leaf_sizes.values()
                 if isinstance(s, tuple) and max(s) == 4 * min(s))
        sse = float(((rec[0].astype(int) - y) ** 2).sum())
        out[rect] = (st["tu_bytes"], sse, n4, tu, rec)
    assert out[True][2] > 0, "RD never chose a 4-way partition"
    assert out[True][0] < out[False][0], "4-way did not reduce bits"
    assert out[True][1] <= out[False][1] * 1.05
    _, dec = decode_temporal_unit(out[True][3])
    for p in range(3):
        assert (dec[p] == out[True][4][p]).all()


def test_inter_4way_partitions_roundtrip():
    """Thin (16 px) moving bands: the inter partition DP should choose
    4:1 strip leaves and the stream must decode exactly."""
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    rng = np.random.RandomState(3)
    h, w = 128, 192
    big = rng.randint(30, 220, (220, 300)).astype(np.uint8)
    f0 = np.ascontiguousarray(big[8:8 + h, 8:8 + w])
    f1 = f0.copy()
    f1[48:64, :] = big[53:69, 8:8 + w]
    f1[96:112, :] = big[100:116, 12:12 + w]
    u = np.full((64, 96), 100, np.uint8)
    v = np.full((64, 96), 140, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=40, intra_period=16,
                        scene_change_detection=False,
                        fixed_partition_size=None)
    kf = WavefrontIntraEncoder(cfg)
    ktu, _, _ = kf.encode(f0, u, v)
    ie = InterFrameEncoder(cfg, kf.seq)
    tu, rec = ie.encode(f1, u, v, kf.recon)
    n4 = sum(1 for s in ie.leaf_sizes.values()
             if isinstance(s, tuple) and max(s) == 4 * min(s))
    assert n4 > 0, "inter DP never chose a 4:1 leaf"
    dec = StreamDecoder()
    dec.decode_tu(ktu)
    out = dec.decode_tu(tu)
    for p in range(3):
        hh, ww = out[p].shape
        assert (out[p] == rec[p][:hh, :ww]).all(), f"plane {p}"


_T_MAP = {
    # 64-node (0,0): HORZ_A — two 32x32 squares on top, 64x32 below
    (0, 0): 32, (0, 8): 32, (8, 0): (64, 32),
    # 64-node (0,16): HORZ_B — 64x32 on top, two 32x32 below
    (0, 16): (64, 32), (8, 16): 32, (8, 24): 32,
    # 64-node (16,0): VERT_A — two 32x32 left, 32x64 right
    (16, 0): 32, (24, 0): 32, (16, 8): (32, 64),
    # 64-node (16,16): split; 32-node T-shapes inside
    (16, 16): (16, 32), (16, 20): 16, (20, 20): 16,     # VERT_B @32
    (16, 24): 16, (16, 28): 16, (20, 24): (32, 16),     # HORZ_A @32
    (24, 16): (32, 16), (28, 16): 16, (28, 20): 16,     # HORZ_B @32
    (24, 24): 16, (28, 24): 16, (24, 28): (16, 32),     # VERT_A @32
}


def test_infer_partition_t_shapes():
    from svt_av1_tpu.pipeline import common
    from svt_av1_tpu.utils.blocks import (PARTITION_HORZ_A,
                                          PARTITION_HORZ_B,
                                          PARTITION_SPLIT,
                                          PARTITION_VERT_A,
                                          PARTITION_VERT_B)
    part, leaves = common.infer_partition(_T_MAP, 0, 0, 64, 32, 32)
    assert part == PARTITION_HORZ_A
    assert [(r, c) for r, c, _ in leaves] == [(0, 0), (0, 8), (8, 0)]
    part, _ = common.infer_partition(_T_MAP, 0, 16, 64, 32, 32)
    assert part == PARTITION_HORZ_B
    part, _ = common.infer_partition(_T_MAP, 16, 0, 64, 32, 32)
    assert part == PARTITION_VERT_A
    part, leaves = common.infer_partition(_T_MAP, 16, 16, 64, 32, 32)
    assert part == PARTITION_SPLIT and leaves is None
    part, _ = common.infer_partition(_T_MAP, 16, 16, 32, 32, 32)
    assert part == PARTITION_VERT_B
    part, _ = common.infer_partition(_T_MAP, 16, 24, 32, 32, 32)
    assert part == PARTITION_HORZ_A
    part, _ = common.infer_partition(_T_MAP, 24, 16, 32, 32, 32)
    assert part == PARTITION_HORZ_B
    part, _ = common.infer_partition(_T_MAP, 24, 24, 32, 32, 32)
    assert part == PARTITION_VERT_A


@pytest.mark.parametrize("tools", [
    {}, {"enable_dlf": True, "enable_tx_type_search": True},
    {"adaptive_quantization": 1}, {"enable_cdef": True},
    {"bit_depth": 10},
])
def test_handcrafted_t_shape_roundtrip(tools):
    """HORZ_A/B + VERT_A/B keyframe streams decode byte-exactly."""
    bd = tools.get("bit_depth", 8)
    y, u, v = _content(128, 128, seed=9)
    if bd == 10:
        y = (y.astype(np.uint16) << 2)
        u = (u.astype(np.uint16) << 2)
        v = (v.astype(np.uint16) << 2)
    cfg = EncoderConfig(width=128, height=128, qp=35,
                        fixed_partition_size=None, **tools)
    with mock.patch.object(rd, "choose_partition",
                           return_value=dict(_T_MAP)):
        enc = WavefrontIntraEncoder(cfg)
        tu, recon, _ = enc.encode(y, u, v)
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == recon[p]).all(), f"{tools} plane {p}"


def test_t_shape_inter_roundtrip():
    """T-shape leaf maps through the inter path decode byte-exactly."""
    import io
    from svt_av1_tpu.bitstream.ivf import (write_ivf_frame,
                                           write_ivf_header)
    from svt_av1_tpu.pipeline.decode import decode_ivf
    from svt_av1_tpu.pipeline.encoder import Encoder

    y, u, v = _content(128, 128, seed=12)
    frames = [(y, u, v)]
    for t in range(1, 3):
        frames.append((np.roll(y, 2 * t, axis=1), u, v))
    cfg = EncoderConfig(width=128, height=128, qp=40,
                        fixed_partition_size=None, intra_period=-1,
                        scene_change_detection=False)
    with mock.patch.object(rd, "choose_partition",
                           return_value=dict(_T_MAP)), \
         mock.patch.object(rd, "choose_partition_inter",
                           return_value=dict(_T_MAP)):
        enc = Encoder(cfg)
        outs = []
        for f in frames:
            enc.send_picture(*f)
            while (p := enc.get_packet()) is not None:
                outs.append(p)
        enc.flush()
        while (p := enc.get_packet()) is not None:
            outs.append(p)
    buf = io.BytesIO()
    write_ivf_header(buf, 128, 128, 30, 1, len(frames))
    for i, (tu, _) in enumerate(outs):
        write_ivf_frame(buf, tu, i)
    buf.seek(0)
    decs = decode_ivf(buf)
    assert len(decs) == len(frames)
    shown = 0
    for tu, disp in outs:
        if disp is None:
            continue
        for p in range(3):
            assert (decs[shown][p] == disp[p]).all(), \
                f"frame {shown} plane {p}"
        shown += 1


def test_vert_ab_availability_tables():
    """Square members of VERT_A/VERT_B use the mixed-vertical coding
    order tables (reference get_has_tr_table/get_has_bl_table,
    EbIntraPrediction.c:5691/5879): the top-right square of a VERT_B
    gets its bottom-left (the left rectangle is already decoded), and
    the bottom-left square of a VERT_A loses its top-right (decoded
    before the right rectangle)."""
    from svt_av1_tpu.pipeline import avail

    # VERT_B at 16x16 parent (12,4): rect (12..15, 4..5) decodes first,
    # so the TR 8x8 at (12,6) sees decoded pixels below-left.
    assert not avail.has_bottom_left_wh(12, 6, 2, 2, 64)
    assert avail.has_bottom_left_wh(12, 6, 2, 2, 64, vert_ab=True)
    # VERT_A at 16x16 parent (0,0): the BL 8x8 at (2,0)'s top-right
    # region (rows 0..1, cols 2..3) is the right rect — NOT yet decoded.
    assert avail.has_top_right_wh(2, 0, 2, 2, 64)
    assert not avail.has_top_right_wh(2, 0, 2, 2, 64, vert_ab=True)
    # MVP adjust (reference EbAdaptiveMotionVectorPrediction.c:882)
    from svt_av1_tpu.pipeline.mvp import _mvp_has_top_right_rect
    assert _mvp_has_top_right_rect(2, 0, 2, 2)
    assert not _mvp_has_top_right_rect(2, 0, 2, 2, vert_a=True)


def test_leaf_square_tshape_inference():
    from svt_av1_tpu.pipeline import avail
    from svt_av1_tpu.utils.blocks import (PARTITION_VERT_A,
                                          PARTITION_VERT_B)
    # 16x16 parent at (12,4) split VERT_B: 8x16 rect + two 8x8 squares
    leaves = {(12, 4): (8, 16), (12, 6): 8, (14, 6): 8}
    assert avail.leaf_square_tshape(leaves, 12, 6, 2, 2, 64, 64) \
        == PARTITION_VERT_B
    assert avail.leaf_square_tshape(leaves, 14, 6, 2, 2, 64, 64) \
        == PARTITION_VERT_B
    assert avail.leaf_square_tshape(leaves, 12, 4, 2, 4, 64, 64) is None
    # VERT_A: two squares left + 8x16 right
    leaves = {(0, 0): 8, (2, 0): 8, (0, 2): (8, 16)}
    assert avail.leaf_square_tshape(leaves, 2, 0, 2, 2, 64, 64) \
        == PARTITION_VERT_A
    # plain SPLIT quadrant of 4 squares: no flag
    leaves = {(0, 0): 8, (0, 2): 8, (2, 0): 8, (2, 2): 8}
    assert avail.leaf_square_tshape(leaves, 2, 0, 2, 2, 64, 64) is None
