"""Device DLF (search + apply as one program) vs the host oracle."""

import numpy as np
import pytest

from svt_av1_tpu.ops import dlf


def _blocky_frames(h, w, seed=3):
    """Smooth source + per-block-DC recon: edges the DLF must smooth."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    src_y = np.clip(100 + 40 * np.sin(xx / 37.0) + 30 * np.cos(yy / 29.0)
                    + rng.normal(0, 1.5, (h, w)), 0, 255)
    rec_y = src_y.copy()
    for r in range(0, h, 16):
        for c in range(0, w, 16):
            rec_y[r:r + 16, c:c + 16] = round(
                float(src_y[r:r + 16, c:c + 16].mean()))
    src_c = np.clip(128 + 20 * np.sin(xx[:h // 2, :w // 2] / 23.0), 0, 255)
    rec_c = src_c.copy()
    for r in range(0, h // 2, 8):
        for c in range(0, w // 2, 8):
            rec_c[r:r + 8, c:c + 8] = round(
                float(src_c[r:r + 8, c:c + 8].mean()))
    rec = [rec_y.astype(np.uint8), rec_c.astype(np.uint8),
           rec_c.astype(np.uint8)]
    src = [src_y.astype(np.int32), src_c.astype(np.int32),
           src_c.astype(np.int32)]
    return rec, src


@pytest.mark.parametrize("qindex,leaf_size", [(200, 16), (160, 32),
                                              (255, 8)])
def test_device_dlf_search_apply_exact(qindex, leaf_size):
    from svt_av1_tpu.ops.device import dlf_search_apply_dev
    h, w = 128, 192
    rec, src = _blocky_frames(h, w, seed=qindex)
    mi_rows, mi_cols = h // 4, w // 4
    step = leaf_size // 4
    leaf = {(r, c): leaf_size for r in range(0, mi_rows, step)
            for c in range(0, mi_cols, step)}
    rec_h = [p.copy() for p in rec]
    lv_h = dlf.pick_levels(rec_h, src, leaf, mi_rows, mi_cols, qindex, 8)
    dlf.loop_filter_frame(rec_h, leaf, mi_rows, mi_cols, lv_h, bd=8)
    rec_d = [p.copy() for p in rec]
    lv_d = dlf_search_apply_dev(rec_d, src, leaf, mi_rows, mi_cols,
                                qindex, 8)
    assert lv_h == lv_d
    assert lv_d[0] > 0, "filter should fire on blocky content"
    for p in range(3):
        assert np.array_equal(rec_h[p], rec_d[p])


def test_device_dlf_mixed_leaves_exact():
    from svt_av1_tpu.ops.device import dlf_search_apply_dev
    h, w = 128, 128
    rec, src = _blocky_frames(h, w, seed=9)
    mi_rows, mi_cols = h // 4, w // 4
    leaf = {}
    for r in range(0, mi_rows, 16):
        for c in range(0, mi_cols, 16):
            if (r + c) % 32 == 0:
                leaf[(r, c)] = 64
            else:
                for rr in range(r, r + 16, 8):
                    for cc in range(c, c + 16, 8):
                        leaf[(rr, cc)] = 32
    rec_h = [p.copy() for p in rec]
    lv_h = dlf.pick_levels(rec_h, src, leaf, mi_rows, mi_cols, 220, 8)
    dlf.loop_filter_frame(rec_h, leaf, mi_rows, mi_cols, lv_h, bd=8)
    rec_d = [p.copy() for p in rec]
    lv_d = dlf_search_apply_dev(rec_d, src, leaf, mi_rows, mi_cols,
                                220, 8)
    assert lv_h == lv_d
    for p in range(3):
        assert np.array_equal(rec_h[p], rec_d[p])
