"""_balance_waves: the flip program's fixed-width scan re-chunking must
preserve wave order and never exceed the per-class lane cap."""

import numpy as np

from svt_av1_tpu.ops.device_tile import FLIP_LANE_CAP, _balance_waves


def _mk(r, c, size=16, li=0, m=0):
    return (r, c, size, li, m)


def test_small_waves_pass_through():
    waves = [[_mk(0, 0)], [_mk(0, 4), _mk(8, 0)]]
    assert _balance_waves(waves) == waves


def test_wide_wave_splits_to_cap():
    wave = [_mk(0, 4 * i) for i in range(30)]
    out = _balance_waves([wave])
    assert len(out) == (30 + FLIP_LANE_CAP - 1) // FLIP_LANE_CAP
    assert all(len(s) <= FLIP_LANE_CAP for s in out)
    flat = [e for s in out for e in s]
    assert sorted(flat) == sorted(wave), "lanes lost or duplicated"


def test_per_class_cap_mixed_shapes():
    # 20 of 16x16 plus 20 of 32x32 in one wave: per-CLASS cap, so the
    # split count follows the larger class, and each step holds at most
    # cap lanes of each shape
    wave = [_mk(0, 4 * i, 16) for i in range(20)] \
        + [_mk(32, 8 * i, 32) for i in range(20)]
    out = _balance_waves([wave])
    k = (20 + FLIP_LANE_CAP - 1) // FLIP_LANE_CAP
    assert len(out) == k
    for s in out:
        for size in (16, 32):
            assert sum(1 for e in s if e[2] == size) <= FLIP_LANE_CAP
    flat = [e for s in out for e in s]
    assert sorted(flat) == sorted(wave)


def test_order_across_waves_preserved():
    """Entries of wave w must appear in steps strictly before any entry
    of wave w+1 (dependency safety: later waves may read pixels written
    by ANY earlier wave's lanes)."""
    rng = np.random.RandomState(0)
    waves = []
    li = 0
    for w in range(6):
        n = int(rng.randint(1, 40))
        waves.append([_mk(w * 8, 4 * i, 16, li + i) for i in range(n)])
        li += n
    out = _balance_waves(waves)
    step_of = {}
    for s, step in enumerate(out):
        for e in step:
            step_of[e[3]] = s
    hi = -1
    for wave in waves:
        lo = min(step_of[e[3]] for e in wave)
        assert lo > hi, "a wave's lane ran before an earlier wave's"
        hi = max(step_of[e[3]] for e in wave)
