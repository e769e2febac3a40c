"""Directional intra prediction + availability tests."""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.ops import intra_dir
from svt_av1_tpu.pipeline import avail
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.intra import encode_keyframe
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
from tests.test_intra_e2e import psnr


def _morton(r, c):
    return avail._morton(r, c)


def test_top_right_availability_rules():
    # top row of SB always available (given above+right exist)
    assert avail.has_top_right(16, 4, 4, 100)
    # rightmost column of SB never
    assert not avail.has_top_right(20, 12, 4, 100)
    # no above row / no right neighbor
    assert not avail.has_top_right(0, 4, 4, 100)
    assert not avail.has_top_right(16, 96, 4, 100)
    # z-order: block (1,1) of 16px grid -> above-right (0,2) later -> False
    assert not avail.has_top_right(16 + 4, 4, 4, 100)
    # block (2,1): above-right (1,2) is earlier in z-order -> True
    assert avail.has_top_right(16 + 8, 4, 4, 100)


def test_bottom_left_availability_rules():
    # leftmost col of SB: available until SB bottom
    assert avail.has_bottom_left(16, 16, 4, 1000)
    assert not avail.has_bottom_left(16 + 12, 16, 4, 1000)
    # bottom row of SB (not col 0) never
    assert not avail.has_bottom_left(16 + 12, 20, 4, 1000)
    # z-order: (1,1) -> below-left (2,0) later -> False
    assert not avail.has_bottom_left(16 + 4, 16 + 4, 4, 1000)
    # (1,2) -> below-left (2,1) later in z-order? morton(2,1)=9 > morton(1,2)=6
    assert not avail.has_bottom_left(16 + 4, 16 + 8, 4, 1000)
    # (2,1): below-left (3,0): morton(3,0)=10 > morton(2,1)=9 -> False
    assert not avail.has_bottom_left(16 + 8, 16 + 4, 4, 1000)
    # (1,3): below-left (2,2): morton(2,2)=12 > morton(1,3)=7 -> False;
    # (3,1): below-left is bottom row -> False; (2,3): (3,2): 14>13 False
    assert not avail.has_bottom_left(16 + 4, 16 + 12, 4, 1000)


def test_derivative_table_angles():
    for mode, base in intra_dir.MODE_TO_ANGLE.items():
        for d in range(-3, 4):
            angle = intra_dir.mode_angle(mode, d)
            if angle in (90, 180):
                continue
            if 0 < angle < 90:
                assert intra_dir.get_dx(angle) > 0
            elif 90 < angle < 180:
                assert intra_dir.get_dx(angle) > 0
                assert intra_dir.get_dy(angle) > 0
            else:
                assert intra_dir.get_dy(angle) > 0


def _diag_frame(w, h):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(128 + 90 * np.sin((xx + yy) / 6.0)
                + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    return y, u, u.copy()


@pytest.mark.parametrize("deltas", [(0,), (-3, 0, 3)])
def test_directional_roundtrip_and_equivalence(deltas):
    y, u, v = _diag_frame(128, 96)
    cfg = EncoderConfig(width=128, height=96, qp=35,
                        fixed_partition_size=16, angle_deltas=deltas)
    tu_o, rec_o, _ = encode_keyframe(y, u, v, cfg)
    tu_w, rec_w, _ = encode_keyframe_wavefront(y, u, v, cfg)
    assert tu_o == tu_w
    _, dec = decode_temporal_unit(tu_w)
    for a, b in zip(rec_w, dec):
        assert np.array_equal(a, b)


def test_directional_modes_used_and_help_on_diagonals():
    # sharp diagonal stripes: only directional extension can follow the
    # pattern; smooth-family interpolation cannot (this is the content
    # class the z1/z2/z3 predictors exist for)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where((xx + yy) % 16 < 3, 200, 60).astype(np.uint8)
    u = np.full((64, 96), 128, np.uint8)
    v = u.copy()
    base = EncoderConfig(width=w, height=h, qp=30,
                         fixed_partition_size=None,
                         intra_modes=(0, 9, 10, 11, 12))  # no directional
    full = EncoderConfig(width=w, height=h, qp=30,
                         fixed_partition_size=None)
    _, rec_b, st_b = encode_keyframe_wavefront(y, u, v, base)
    _, rec_f, st_f = encode_keyframe_wavefront(y, u, v, full)
    # directional set must improve rate at comparable-or-better quality
    assert st_f["tu_bytes"] < st_b["tu_bytes"]
    assert psnr(y, rec_f[0]) > psnr(y, rec_b[0]) - 0.3
