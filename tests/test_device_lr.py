"""Device LR search/apply vs the host pair: identical decisions, taps,
xqd, and filtered planes (the integer stats and SSEs must agree exactly,
so the solves and the RD decision coincide)."""

import numpy as np
import pytest

from svt_av1_tpu.ops import restoration as rst
from svt_av1_tpu.pipeline import lr_search, rd


def _setup(w, h, bd, seed, noise=8.0):
    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd <= 8 else np.uint16
    Hp = -(-h // 64) * 64
    Wp = -(-w // 64) * 64
    yy, xx = np.mgrid[0:Hp, 0:Wp]
    base = peak / 2 + (peak / 4) * np.sin(xx / 13.0) * np.cos(yy / 17.0)
    src, recon = [], []
    for p in range(3):
        ss = 1 if p else 0
        b = base[:Hp >> ss, :Wp >> ss]
        s = np.clip(b + rng.normal(0, peak / 48, b.shape), 0,
                    peak).astype(np.int32)
        r = np.clip(s + rng.normal(0, noise * (peak + 1) / 256, b.shape),
                    0, peak).astype(dt)
        src.append(s)
        recon.append(r)
    bounds = []
    for p in range(3):
        ss = 1 if p else 0
        Hc = (h + ss) >> ss
        bounds.append(rst.save_deblock_boundary_lines(
            recon[p][:Hc, :(w + ss) >> ss], Hc, ss))
    return recon, src, bounds


@pytest.mark.parametrize("w,h,bd,seed", [(200, 120, 8, 0),
                                         (320, 192, 8, 1),
                                         (136, 72, 10, 2)])
def test_lr_dev_matches_host(w, h, bd, seed):
    recon, src, bounds = _setup(w, h, bd, seed)
    lam = rd.rd_lambda(120, bd)
    host_rec = [p.copy() for p in recon]
    ri_h = lr_search.search_restoration(host_rec, src, bounds, w, h, bd,
                                        120, lam)
    rst.loop_restoration_filter_frame(host_rec, ri_h, bounds, w, h, bd)

    dev_rec = [p.copy() for p in recon]
    ri_d = lr_search.search_restoration_dev(dev_rec, src, bounds, w, h,
                                            bd, 120, lam)
    for p in range(3):
        assert ri_d[p].frame_restoration_type == \
            ri_h[p].frame_restoration_type, f"plane {p}"
        assert len(ri_d[p].units) == len(ri_h[p].units)
        for ud, uh in zip(ri_d[p].units, ri_h[p].units):
            assert ud.restoration_type == uh.restoration_type
            if ud.restoration_type == rst.RESTORE_WIENER:
                assert ud.wiener_v == uh.wiener_v
                assert ud.wiener_h == uh.wiener_h
            if ud.restoration_type == rst.RESTORE_SGRPROJ:
                assert ud.sgr_ep == uh.sgr_ep
                assert ud.sgr_xqd == uh.sgr_xqd
        np.testing.assert_array_equal(dev_rec[p], host_rec[p])


def test_lr_dev_helps_on_noise():
    """On noisy recon the device search should pick a filter and reduce
    luma SSE, like the host does."""
    recon, src, bounds = _setup(256, 128, 8, 9, noise=16.0)
    lam = rd.rd_lambda(100, 8)
    dev_rec = [p.copy() for p in recon]
    ri = lr_search.search_restoration_dev(dev_rec, src, bounds, 256, 128,
                                          8, 100, lam)
    assert any(r.frame_restoration_type != rst.RESTORE_NONE for r in ri)
    sse0 = ((recon[0][:128, :256].astype(np.int64)
             - src[0][:128, :256]) ** 2).sum()
    sse1 = ((dev_rec[0][:128, :256].astype(np.int64)
             - src[0][:128, :256]) ** 2).sum()
    assert sse1 < sse0
