"""Device (JAX) kernels vs host NumPy oracles: bit-exactness.

Transforms/quant must agree exactly with the host oracle on realistic
residual ranges (the oracle itself is pinned against float references and
the reference algorithms in test_transforms/test_quant).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from svt_av1_tpu.ops import device  # noqa: E402
from svt_av1_tpu.ops import intra as intra_host  # noqa: E402
from svt_av1_tpu.ops import quant as quant_host  # noqa: E402
from svt_av1_tpu.ops import transforms as tx_host  # noqa: E402
from svt_av1_tpu.utils.blocks import (ADST_ADST, DC_PRED, DCT_DCT, H_PRED,  # noqa: E402
                                      IDTX, PAETH_PRED, SMOOTH_PRED,
                                      SMOOTH_H_PRED, SMOOTH_V_PRED, V_PRED,
                                      MAX_TX_SIZE_OF_BLOCK, get_scan)

MODES = (DC_PRED, V_PRED, H_PRED, SMOOTH_PRED, SMOOTH_V_PRED,
         SMOOTH_H_PRED, PAETH_PRED)


@pytest.mark.parametrize("size,tx_type", [
    (4, DCT_DCT), (4, ADST_ADST), (8, IDTX), (16, ADST_ADST),
    (16, DCT_DCT), (32, DCT_DCT), (64, DCT_DCT),
])
def test_fwd_inv_tx_device_matches_host(size, tx_type):
    rng = np.random.default_rng(size + tx_type)
    x = rng.integers(-255, 256, (8, size, size)).astype(np.int32)
    host_f = tx_host.forward_tx2d(x, tx_type, size, size)
    dev_f = np.asarray(device.fwd_tx2d(jnp.asarray(x), tx_type, size, size))
    np.testing.assert_array_equal(host_f, dev_f)

    cw = min(32, size)
    coeffs = np.zeros_like(host_f)
    coeffs[:, :cw, :cw] = host_f[:, :cw, :cw]
    host_i = tx_host.inverse_tx2d(coeffs, tx_type, size, size)
    dev_i = np.asarray(device.inv_tx2d(jnp.asarray(coeffs.astype(np.int32)),
                                       tx_type, size, size))
    np.testing.assert_array_equal(host_i, dev_i)


@pytest.mark.parametrize("qindex", [8, 100, 200])
@pytest.mark.parametrize("size", [8, 16, 32])
def test_quantize_device_matches_host(qindex, size):
    rng = np.random.default_rng(qindex)
    tx_size = MAX_TX_SIZE_OF_BLOCK[size]
    n = size * size
    coeff = rng.integers(-20000, 20000, (16, n)).astype(np.int32)
    scan = get_scan(tx_size, DCT_DCT)
    qp = quant_host.make_quant_params(qindex)
    ls = quant_host.tx_scale(tx_size)
    hq, hd, he = quant_host.quantize(coeff, scan, qp, ls)
    dq, dd, de = device.quantize(jnp.asarray(coeff), scan, qp, ls)
    np.testing.assert_array_equal(hq, np.asarray(dq))
    np.testing.assert_array_equal(hd, np.asarray(dd))
    np.testing.assert_array_equal(he, np.asarray(de))


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_intra_predictors_device_match_host(size):
    rng = np.random.default_rng(size)
    b = 12
    above = rng.integers(0, 256, (b, 2 * size)).astype(np.int32)
    left = rng.integers(0, 256, (b, 2 * size)).astype(np.int32)
    tl = rng.integers(0, 256, b).astype(np.int32)
    ha = rng.integers(0, 2, b).astype(bool)
    hl = rng.integers(0, 2, b).astype(bool)
    dev = np.asarray(device.predict_modes(
        MODES, jnp.asarray(above), jnp.asarray(left), jnp.asarray(tl),
        jnp.asarray(ha), jnp.asarray(hl), size, size))
    for mi, mode in enumerate(MODES):
        host = intra_host.predict(mode, above, left, tl, size, size,
                                  have_above=ha, have_left=hl)
        np.testing.assert_array_equal(host, dev[mi], err_msg=f"mode {mode}")


def test_analysis_step_runs_and_matches_mode_choice():
    rng = np.random.default_rng(0)
    b, size = 24, 16
    src = rng.integers(0, 256, (b, size, size)).astype(np.int32)
    above = rng.integers(0, 256, (b, 2 * size)).astype(np.int32)
    left = rng.integers(0, 256, (b, 2 * size)).astype(np.int32)
    tl = rng.integers(0, 256, b).astype(np.int32)
    ha = np.ones(b, dtype=bool)
    hl = np.ones(b, dtype=bool)
    modes = (DC_PRED, V_PRED, H_PRED, SMOOTH_PRED, PAETH_PRED)
    best, qcoeff, eob, sse = device.intra_analysis_step(
        jnp.asarray(src), jnp.asarray(above), jnp.asarray(left),
        jnp.asarray(tl), jnp.asarray(ha), jnp.asarray(hl),
        modes=modes, size=size, qindex=160)
    best = np.asarray(best)
    # host mode choice by SSE must agree
    for i in range(b):
        costs = []
        for mode in modes:
            pred = intra_host.predict(mode, above[i:i + 1], left[i:i + 1],
                                      tl[i:i + 1], size, size,
                                      have_above=ha[i:i + 1],
                                      have_left=hl[i:i + 1])[0]
            costs.append(int(np.sum((src[i] - pred) ** 2)))
        assert modes[best[i]] == modes[int(np.argmin(costs))]
    assert np.asarray(sse).shape == (b,)


def test_inter_core_step_finds_pan_and_zeroes_residual():
    rng = np.random.default_rng(3)
    H, W = 128, 192
    big = rng.integers(0, 256, (H + 64, W + 64)).astype(np.int32)
    ref = big[32:32 + H, 32:32 + W]
    dy, dx = 6, -4
    cur = big[32 + dy:32 + dy + H, 32 + dx:32 + dx + W]
    refp = np.pad(ref, 16, mode="edge")
    refp = refp[8:-8, 8:-8]  # pad must equal search_range
    mv, qc, eob, sse = device.inter_core_step(
        jnp.asarray(cur), jnp.asarray(refp), size=16, search_range=8,
        qindex=160)
    mv = np.asarray(mv)
    assert (mv[:, 0] == dy).mean() > 0.8
    assert (mv[:, 1] == dx).mean() > 0.8
    # interior blocks (1-block margin: border blocks read edge-padded
    # reference content) must have zero residual
    bw = W // 16
    idx = np.arange(len(mv))
    interior = ((idx // bw >= 1) & (idx // bw < H // 16 - 1)
                & (idx % bw >= 1) & (idx % bw < bw - 1))
    assert (np.asarray(eob)[interior] == 0).all()
    assert (np.asarray(sse)[interior] == 0).all()


def test_device_cdef_twins_bit_exact():
    """Device CDEF direction search + filter vs host oracles, including
    extreme flat blocks (partial-sum magnitude stress)."""
    import jax.numpy as jnp
    from svt_av1_tpu.ops import cdef as host
    from svt_av1_tpu.ops import device as dev
    rng = np.random.RandomState(0)
    B = 41
    blocks = rng.randint(0, 256, (B, 8, 8)).astype(np.int32)
    blocks[0] = 255          # flat extremes
    blocks[1] = 0
    blocks[2, :, :4] = 255   # hard edge
    gd, gv = dev.cdef_find_dir_batch(jnp.asarray(blocks), 0)
    gd, gv = np.array(gd), np.array(gv)
    for i in range(B):
        hd, hv = host.find_dir(blocks[i], 0)
        assert hd == gd[i] and hv == gv[i], (i, hd, gd[i], hv, gv[i])
    wins = np.full((B, 14, 14), host.CDEF_VERY_LARGE, dtype=np.int32)
    wins[:, 3:11, 3:11] = blocks
    wins[:, :3, :] = rng.randint(0, 256, (B, 3, 14))
    pri = rng.choice([0, 4, 8, 15], B).astype(np.int32)
    sec = rng.choice([0, 1, 2, 4], B).astype(np.int32)
    dirs = rng.randint(0, 8, B).astype(np.int32)
    got = np.array(dev.cdef_filter_blocks(
        jnp.asarray(wins), jnp.asarray(pri), jnp.asarray(sec),
        jnp.asarray(dirs), 3, 3, 0))
    for i in range(B):
        want = host.filter_block(wins[i].astype(np.int64), 3, 3, 8, 8,
                                 int(pri[i]), int(sec[i]), int(dirs[i]),
                                 3, 3, 0)
        assert (got[i] == want).all(), i


def test_device_lr_twins_bit_exact():
    """Device Wiener + self-guided restoration vs host oracles over
    batched stripe windows."""
    import jax.numpy as jnp
    from svt_av1_tpu.ops import device as dev
    from svt_av1_tpu.ops import restoration as host
    rng = np.random.RandomState(1)
    B, h, w = 7, 24, 40
    x = rng.randint(0, 256, (B, h + 6, w + 6)).astype(np.int64)
    x[0] = 255
    tv, th = (2, -5, 18), (-3, 6, 11)
    want = np.stack([host.wiener_filter(x[i], tv, th, 8)
                     for i in range(B)])
    got = np.array(dev.wiener_filter_batch(jnp.asarray(x), tv, th, 8))
    assert (got == want).all()
    for ep, xqd in ((4, (-20, 40)), (11, (0, 33)), (14, (-50, 0))):
        want = np.stack([host.sgr_filter(x[i], ep, xqd, 8)
                         for i in range(B)])
        got = np.array(dev.sgr_filter_batch(jnp.asarray(x), ep, xqd, 8))
        assert (got == want).all(), ep


def test_pallas_quantize_bit_exact():
    """The Pallas fused quantize/dequantize kernel vs the host oracle."""
    import jax.numpy as jnp
    from svt_av1_tpu.ops import device as dev
    from svt_av1_tpu.ops import quant as qh
    from svt_av1_tpu.utils.blocks import get_scan
    rng = np.random.RandomState(0)
    for qidx in (20, 120, 220):
        qp = qh.make_quant_params(qidx)
        for txs, n, ls in ((2, 256, 0), (1, 64, 0), (3, 1024, 1)):
            scan = get_scan(txs, 0)
            coeff = rng.randint(-9000, 9000, (17, n)).astype(np.int32)
            want = qh.quantize(coeff, scan, qp, ls)
            got = dev.quantize_pallas(jnp.asarray(coeff), scan, qp, ls)
            for g, w in zip(got, want):
                assert (np.array(g) == w).all(), (qidx, n, ls)


def test_device_mc_twin_bit_exact():
    """Device sub-pel MC (8/4-tap, data-dependent MVs) vs host oracle,
    luma and chroma scales, square and rect blocks."""
    import jax.numpy as jnp
    from svt_av1_tpu.ops import device as dev
    from svt_av1_tpu.ops import mc
    rng = np.random.RandomState(0)
    ref = rng.randint(0, 256, (128, 192)).astype(np.uint8)
    pad = mc.pad_reference(ref)
    B = 29
    xs = rng.randint(0, 160, B) & ~3
    ys = rng.randint(0, 96, B) & ~3
    mvs = rng.randint(-64, 65, (B, 2))
    for (w, h, ss) in ((16, 16, 0), (16, 8, 0), (8, 8, 1), (8, 16, 1),
                       (4, 4, 1)):
        want = mc.mc_block_batch(pad, xs, ys, mvs, w, h, ss=ss,
                                 bd=8).astype(np.int32)
        got = np.array(dev.mc_block_batch_j(
            jnp.asarray(pad), jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(mvs), w, h, ss=ss, bd=8))
        assert (got == want).all(), (w, h, ss)


def test_device_dlf_twin_bit_exact():
    """Device DLF edge filters (4/6/8/14-tap) vs host, 8 and 10-bit,
    including near-flat lines that trigger the wide-filter branches."""
    import jax.numpy as jnp
    from svt_av1_tpu.ops import device as dev
    from svt_av1_tpu.ops import dlf as host
    rng = np.random.RandomState(0)
    for bd in (8, 10):
        peak = (1 << bd) - 1
        sh = bd - 8
        for L in (4, 6, 8, 14):
            N = 193
            s = rng.randint(0, peak + 1, (N, 14)).astype(np.int32)
            s[:48] = np.clip(s[:48, :1]
                             + rng.randint(-1, 2, (48, 14)), 0, peak)
            bl, lim, th = host.thresholds(24)
            want = host._apply_len(s.copy(), np.ones(N, dtype=bool), L,
                                   bl << sh, lim << sh, th << sh, bd)
            got = np.array(dev.dlf_apply_len_batch(
                jnp.asarray(s), L, bl << sh, lim << sh, th << sh, bd))
            assert (got == want).all(), (bd, L)


def test_device_inter_subpel_core_recovers_subpel_shift():
    """Full device inter core (grid ME + quarter-pel refine through the
    8-tap MC twin + T/Q/recon): a synthetic 2.5-px pan must be recovered
    exactly with zero residual."""
    import jax
    import jax.numpy as jnp
    from svt_av1_tpu.ops import device as dev
    from svt_av1_tpu.ops import mc
    rng = np.random.RandomState(0)
    H, W = 128, 192
    ref = rng.randint(0, 256, (H, W)).astype(np.uint8)
    padded = mc.pad_reference(ref).astype(np.int32)
    cur = np.zeros((H, W), np.int32)
    shift_mv = np.array([[0, 20]])  # 2.5 px right, 1/8-pel units
    for y in range(0, H, 16):
        for x in range(0, W, 16):
            cur[y:y + 16, x:x + 16] = mc.mc_block_batch(
                padded, np.array([x]), np.array([y]), shift_mv, 16, 16)[0]
    fn = jax.jit(dev.inter_core_subpel_step,
                 static_argnames=("size", "search_range", "search_step",
                                  "qindex", "bd"))
    mv8, qc, eob, sse = fn(jnp.asarray(cur), jnp.asarray(padded))
    inner_mv = np.array(mv8).reshape(8, 12, 2)[1:-1, 1:-1]
    assert (np.median(inner_mv.reshape(-1, 2), axis=0) == [0, 20]).all()
    inner_sse = np.array(sse).reshape(8, 12)[1:-1, 1:-1]
    assert float(inner_sse.mean()) == 0.0
