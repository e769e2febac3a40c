"""Device CDEF search+apply twin vs the host pair (bit-exact)."""

import numpy as np
import pytest

from svt_av1_tpu.ops import cdef as host_cdef


def _mk(h, w, bd, seed, flat=False):
    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd <= 8 else np.uint16
    Hp = -(-h // 64) * 64
    Wp = -(-w // 64) * 64
    if flat:
        y = np.full((Hp, Wp), peak // 2, dtype=dt)
    else:
        yy, xx = np.mgrid[0:Hp, 0:Wp]
        y = np.clip(peak / 2 + (peak / 5) * np.sin(xx / 7.0 + yy / 11.0)
                    + rng.normal(0, peak / 32, (Hp, Wp)),
                    0, peak).astype(dt)
    u = np.clip(rng.normal(peak / 2, peak / 16, (Hp // 2, Wp // 2)),
                0, peak).astype(dt)
    v = np.clip(rng.normal(peak / 2, peak / 16, (Hp // 2, Wp // 2)),
                0, peak).astype(dt)
    return [y, u, v]


@pytest.mark.parametrize("bd,qindex,seed", [(8, 40, 0), (8, 120, 1),
                                            (8, 200, 2), (10, 120, 3)])
def test_cdef_dev_matches_host(bd, qindex, seed):
    from svt_av1_tpu.ops import device_cdef
    h, w = 72, 136   # odd SB tiling: 2x3 SBs, partial edges
    mi_rows, mi_cols = -(-h // 4), -(-w // 4)
    recon = _mk(h, w, bd, seed)
    rng = np.random.default_rng(seed + 100)
    src = [np.clip(p.astype(np.int32)
                   + rng.integers(-6, 7, p.shape), 0, (1 << bd) - 1)
           .astype(np.int32) for p in recon]
    h8 = (mi_rows * 4 + 7) // 8
    w8 = (mi_cols * 4 + 7) // 8
    skip8 = rng.random((h8, w8)) < 0.25

    host_rec = [p.copy() for p in recon]
    idx_h, ys_h, uv_h, damp_h = host_cdef.cdef_search(
        host_rec, src, skip8, mi_rows, mi_cols, qindex, bd)
    host_cdef.cdef_frame(host_rec, skip8, idx_h, ys_h, uv_h, damp_h,
                         mi_rows, mi_cols, bd)

    dev_rec = [p.copy() for p in recon]
    idx_d, ys_d, uv_d, damp_d = device_cdef.cdef_search_apply_dev(
        dev_rec, src, skip8, mi_rows, mi_cols, qindex, bd)

    assert ys_d == ys_h and uv_d == uv_h and damp_d == damp_h
    np.testing.assert_array_equal(idx_d, idx_h)
    for p in range(3):
        np.testing.assert_array_equal(dev_rec[p], host_rec[p])


def test_cdef_dev_all_skip_is_noop():
    from svt_av1_tpu.ops import device_cdef
    bd = 8
    h, w = 64, 64
    mi_rows, mi_cols = 16, 16
    recon = _mk(h, w, bd, 7)
    src = [p.astype(np.int32) for p in recon]
    skip8 = np.ones((8, 8), dtype=bool)
    dev_rec = [p.copy() for p in recon]
    idx_d, *_ = device_cdef.cdef_search_apply_dev(
        dev_rec, src, skip8, mi_rows, mi_cols, 120, bd)
    assert (idx_d == -1).all()
    for p in range(3):
        np.testing.assert_array_equal(dev_rec[p], recon[p])
