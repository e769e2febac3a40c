"""Directional (angular) intra prediction, batched (host NumPy oracle).

Normative AV1 directional prediction without edge filtering/upsampling —
this encoder signals ``enable_intra_edge_filter = 0`` in the sequence
header, so the spec's filter/upsample steps are disabled and prediction is
pure 2-tap interpolation along the angle. Semantics follow the reference
``EbIntraPrediction.c``: dr_intra_derivative (:342), av1_dr_prediction_z1_c
(:445), z2 (:485), z3 (:413).

Edge arrays use the "offset 1" layout: ``edge[0]`` is the top-left corner
sample, ``edge[1:]`` are the above row / left column (so spec index -1 maps
to 0) — zone 2 reads index -1.
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.utils.blocks import MODE_TO_ANGLE, V_PRED

ANGLE_STEP = 3
MAX_ANGLE_DELTA = 3

# dr_intra_derivative (reference EbIntraPrediction.c:342; AV1 spec table)
DR_INTRA_DERIVATIVE = np.zeros(90, dtype=np.int32)
for _a, _v in [(3, 1023), (6, 547), (9, 372), (14, 273), (17, 215),
               (20, 178), (23, 151), (26, 132), (29, 116), (32, 102),
               (36, 90), (39, 80), (42, 71), (45, 64), (48, 57), (51, 51),
               (54, 45), (58, 40), (61, 35), (64, 31), (67, 27), (70, 23),
               (73, 19), (76, 15), (81, 11), (84, 7), (87, 3)]:
    DR_INTRA_DERIVATIVE[_a] = _v


def is_directional(mode: int) -> bool:
    return mode in MODE_TO_ANGLE


def mode_angle(mode: int, angle_delta: int) -> int:
    return MODE_TO_ANGLE[mode] + angle_delta * ANGLE_STEP


def get_dx(angle: int) -> int:
    if 0 < angle < 90:
        return int(DR_INTRA_DERIVATIVE[angle])
    if 90 < angle < 180:
        return int(DR_INTRA_DERIVATIVE[180 - angle])
    return 1


def get_dy(angle: int) -> int:
    if 90 < angle < 180:
        return int(DR_INTRA_DERIVATIVE[angle - 90])
    if 180 < angle < 270:
        return int(DR_INTRA_DERIVATIVE[270 - angle])
    return 1


def _z1(above1, bw, bh, dx, bd):
    """angle in (0, 90): above + above-right. above1: [B, 1+bw+bh]
    (index 0 = top-left)."""
    max_base_x = bw + bh - 1
    r = np.arange(bh)[:, None]
    c = np.arange(bw)[None, :]
    x = (r + 1) * dx
    base = (x >> 6) + c                      # [bh, bw]
    shift = (x >> 1) & 0x1F
    b0 = np.minimum(base, max_base_x)
    b1 = np.minimum(base + 1, max_base_x)
    v0 = above1[:, 1 + b0]
    v1 = above1[:, 1 + b1]
    val = (v0 * (32 - shift) + v1 * shift + 16) >> 5
    out = np.where(base[None] < max_base_x, val, above1[:, 1 + max_base_x,
                                                        None, None])
    return np.clip(out, 0, (1 << bd) - 1)


def _z3(left1, bw, bh, dy, bd):
    """angle in (180, 270): left + bottom-left. left1: [B, 1+bh+bw]."""
    max_base_y = bw + bh - 1
    r = np.arange(bh)[:, None]
    c = np.arange(bw)[None, :]
    y = (c + 1) * dy
    base = (y >> 6) + r
    shift = (y >> 1) & 0x1F
    b0 = np.minimum(base, max_base_y)
    b1 = np.minimum(base + 1, max_base_y)
    v0 = left1[:, 1 + b0]
    v1 = left1[:, 1 + b1]
    val = (v0 * (32 - shift) + v1 * shift + 16) >> 5
    out = np.where(base[None] < max_base_y, val,
                   left1[:, 1 + max_base_y, None, None])
    return np.clip(out, 0, (1 << bd) - 1)


def _z2(above1, left1, bw, bh, dx, dy, bd):
    """angle in (90, 180): above + left + corner (index -1 -> offset 0)."""
    r = np.arange(bh)[:, None]
    c = np.arange(bw)[None, :]
    x = c * 64 - (r + 1) * dx                # spec: x = -dx*(r+1) + (c<<6)
    base_x = x >> 6                          # >= -1 when used
    shift_x = (x >> 1) & 0x1F
    y = r * 64 - (c + 1) * dy
    base_y = y >> 6
    shift_y = (y >> 1) & 0x1F
    use_x = base_x >= -1
    bx0 = np.clip(base_x, -1, bw + bh - 1)
    bx1 = np.clip(base_x + 1, -1, bw + bh)
    by0 = np.clip(base_y, -1, bh + bw - 1)
    by1 = np.clip(base_y + 1, -1, bh + bw)
    vx = (above1[:, 1 + bx0] * (32 - shift_x)
          + above1[:, np.minimum(1 + bx1, above1.shape[1] - 1)] * shift_x
          + 16) >> 5
    vy = (left1[:, 1 + by0] * (32 - shift_y)
          + left1[:, np.minimum(1 + by1, left1.shape[1] - 1)] * shift_y
          + 16) >> 5
    out = np.where(use_x[None], vx, vy)
    return np.clip(out, 0, (1 << bd) - 1)


def predict_directional(mode: int, angle_delta: int, above1: np.ndarray,
                        left1: np.ndarray, bw: int, bh: int,
                        bd: int = 8) -> np.ndarray:
    """Batched directional prediction. above1/left1: offset-1 edge arrays
    ([B, 1+bw+bh] / [B, 1+bh+bw], index 0 = top-left). Returns [B, bh, bw].

    pAngle 90/180 are the exact V/H copies (handled by the caller's V/H
    predictors when delta == 0)."""
    angle = mode_angle(mode, angle_delta)
    assert angle not in (90, 180), "exact V/H handled by v_pred/h_pred"
    if 0 < angle < 90:
        return _z1(above1, bw, bh, get_dx(angle), bd)
    if 90 < angle < 180:
        return _z2(above1, left1, bw, bh, get_dx(angle), get_dy(angle), bd)
    return _z3(left1, bw, bh, get_dy(angle), bd)
