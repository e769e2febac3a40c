"""Device mode-decision twin vs host: bit-exact decisions and streams.

``ops.device_md.decide_block_batch_dev`` must reproduce
``pipeline.md.decide_block_batch`` exactly (integer RD costs make this
well-defined on any backend), and the wavefront encoder configured with
``backend="device"`` must emit byte-identical bitstreams to the host
backend.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from svt_av1_tpu.config import EncoderConfig  # noqa: E402
from svt_av1_tpu.ops import quant as quant_ops  # noqa: E402
from svt_av1_tpu.ops.device_md import decide_block_batch_dev  # noqa: E402
from svt_av1_tpu.pipeline import common, md, rd  # noqa: E402

CANDS = [(0, 0), (1, 0), (2, 0), (9, 0), (12, 0), (1, -2), (4, 1)]
NAMES = ["modes", "deltas", "qcoeff", "eob", "recon", "cost", "alphas",
         "tts"]


def _batch(rng, b, bw, bh):
    srcs = rng.integers(0, 256, (b, bh, bw)).astype(np.int64)
    above1 = rng.integers(0, 256, (b, 1 + bw + bh)).astype(np.int32)
    left1 = rng.integers(0, 256, (b, 1 + bh + bw)).astype(np.int32)
    ha = rng.random(b) > 0.2
    hl = rng.random(b) > 0.2
    return srcs, above1, left1, ha, hl


@pytest.mark.parametrize("plane,size,qidx,txs", [
    (0, 8, 160, True),
    (0, (16, 8), 120, False),
    (1, 8, 160, False),
])
def test_decide_twin_exact(plane, size, qidx, txs):
    rng = np.random.default_rng(0)
    bw, bh = common.leaf_wh(size)
    srcs, above1, left1, ha, hl = _batch(rng, 11, bw, bh)
    qp = quant_ops.make_quant_params(qidx)
    lam = rd.rd_lambda(qidx, 8)
    cfl = None
    if plane == 1:
        cfl = rng.integers(0, 256, (11, 2 * bh, 2 * bw)).astype(np.int64)
    kw = dict(bd=8, nfl=3, cfl_luma=cfl, tx_search=txs)
    host = md.decide_block_batch(plane, srcs, above1, left1, ha, hl,
                                 CANDS, qp, size, lam, **kw)
    devr = decide_block_batch_dev(plane, srcs, above1, left1, ha, hl,
                                  CANDS, qp, size, lam, **kw)
    for n, hv, dv in zip(NAMES, host, devr):
        assert np.array_equal(np.asarray(hv), np.asarray(dv)), n


def test_decide_twin_forced_exact():
    rng = np.random.default_rng(1)
    srcs, above1, left1, ha, hl = _batch(rng, 6, 8, 8)
    fmodes = np.array([0, 13, 1, 13, 9, 2])
    fdeltas = np.zeros(6, np.int64)
    cfl = rng.integers(0, 256, (6, 16, 16)).astype(np.int64)
    qp = quant_ops.make_quant_params(160)
    lam = rd.rd_lambda(160, 8)
    host = md.decide_block_batch(2, srcs, above1, left1, ha, hl,
                                 CANDS[:4], qp, 8, lam,
                                 forced=(fmodes, fdeltas), cfl_luma=cfl)
    devr = decide_block_batch_dev(2, srcs, above1, left1, ha, hl,
                                  CANDS[:4], qp, 8, lam,
                                  forced=(fmodes, fdeltas), cfl_luma=cfl)
    for n, hv, dv in zip(NAMES, host, devr):
        assert np.array_equal(np.asarray(hv), np.asarray(dv)), n


def test_backend_streams_byte_identical():
    from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
    rng = np.random.default_rng(2)
    h, w = 64, 128
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cfg_h = EncoderConfig(width=w, height=h, qp=35)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    tu_h, rec_h, _ = encode_keyframe_wavefront(y, u, v, cfg_h)
    tu_d, rec_d, _ = encode_keyframe_wavefront(y, u, v, cfg_d)
    assert tu_h == tu_d
    for a, b in zip(rec_h, rec_d):
        assert np.array_equal(a, b)


def test_fused_tile_program_byte_identical():
    """Aligned dims -> uniform leaves -> the fused whole-tile program
    runs (asserted via spy) and matches the host stream byte-exactly."""
    from svt_av1_tpu.ops import device_tile
    from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
    rng = np.random.default_rng(3)
    h, w = 128, 192
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cfg_h = EncoderConfig(width=w, height=h, qp=35)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    used = []
    orig = device_tile.analyze_tile_fused

    def spy(enc, cands):
        r = orig(enc, cands)
        used.append(r)
        return r

    device_tile.analyze_tile_fused = spy
    try:
        tu_h, _, _ = encode_keyframe_wavefront(y, u, v, cfg_h)
        tu_d, _, _ = encode_keyframe_wavefront(y, u, v, cfg_d)
    finally:
        device_tile.analyze_tile_fused = orig
    assert used and all(used), "fused tile path did not run"
    assert tu_h == tu_d


def test_mixed_fused_tile_program_byte_identical():
    """Partition RD -> mixed square + rect leaves -> the mixed-shape
    fused program runs (asserted via spy) and matches the host stream
    and recon byte-exactly."""
    from svt_av1_tpu.ops import device_tile
    from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
    rng = np.random.default_rng(7)
    h, w = 128, 192
    y = np.zeros((h, w), dtype=np.uint8)
    y[:] = (np.arange(w)[None, :] // 3 % 256).astype(np.uint8)
    y[40:80, 40:100] = rng.integers(0, 256, (40, 60))
    y[90:, 120:] = 128
    u = rng.integers(100, 160, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(100, 160, (h // 2, w // 2)).astype(np.uint8)
    cfg_h = EncoderConfig(width=w, height=h, qp=20,
                          fixed_partition_size=None)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    shapes = []
    orig = device_tile.analyze_tile_fused_mixed

    def spy(enc, cands):
        r = orig(enc, cands)
        if r:
            shapes.append({tuple(wh) for _, _, wh in enc._leaves()})
        return r

    device_tile.analyze_tile_fused_mixed = spy
    try:
        tu_h, rec_h, _ = encode_keyframe_wavefront(y, u, v, cfg_h)
        tu_d, rec_d, _ = encode_keyframe_wavefront(y, u, v, cfg_d)
    finally:
        device_tile.analyze_tile_fused_mixed = orig
    assert shapes, "mixed fused tile path did not run"
    assert any(bw != bh for s in shapes for bw, bh in s), \
        "content produced no rect leaves; test needs restructuring"
    assert tu_h == tu_d
    for a, b in zip(rec_h, rec_d):
        assert np.array_equal(a, b)


def test_backend_inter_streams_byte_identical():
    from svt_av1_tpu.pipeline.encoder import Encoder
    rng = np.random.default_rng(4)
    h, w = 64, 128
    base = (rng.integers(0, 256, (h + 8, w + 8)) * 0.5 + 60) \
        .astype(np.uint8)
    frames = []
    for i in range(4):
        y = base[i:i + h, i:i + w].copy()
        u = rng.integers(100, 160, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(100, 160, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, u, v))

    def run(cfg):
        enc = Encoder(cfg)
        tus = []
        for f in frames:
            enc.send_picture(*f)
            while True:
                p = enc.get_packet()
                if p is None:
                    break
                tus.append(p[0])
        enc.flush()
        while True:
            p = enc.get_packet()
            if p is None:
                break
            tus.append(p[0])
        return b"".join(tus)

    cfg_h = EncoderConfig(width=w, height=h, qp=40,
                          hierarchical_levels=2)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    assert run(cfg_h) == run(cfg_d)


def test_backend_aq_streams_byte_identical():
    """Adaptive quantization on both backends: the device path codes
    every AQ group in one dispatch with per-block traced qindex vectors
    (intra wavefront + inter shape groups) and must still match the
    host's per-group scalar path byte-exactly."""
    from svt_av1_tpu.pipeline.encoder import encode_ivf
    rng = np.random.default_rng(11)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for t in range(3):
        y = np.clip(110 + 60 * np.sin((xx + 3 * t) / 11.0)
                    + rng.normal(0, 8, (h, w)), 0, 255).astype(np.uint8)
        y[h // 2:, :w // 2] = 90  # flat region for the variance AQ
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        frames.append((y, u, v))
    cfg_h = EncoderConfig(width=w, height=h, qp=40,
                          adaptive_quantization=1, intra_period=-1)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    ivf_h = encode_ivf(frames, cfg_h)
    ivf_d = encode_ivf(frames, cfg_d)
    assert ivf_h == ivf_d


def test_backend_flip_streams_byte_identical():
    """Intra-in-inter flips on the device backend run as ONE fused
    wave-loop program (device_tile.flip_apply_fused: lax.fori_loop over
    dependency waves carrying the frame recon) plus a dispatch-only
    decision pass (device_inter.flip_decision_issue); both must match
    the host wave-by-wave recode byte-exactly. Content is a half-frame
    scene change so the flip pass actually fires (many waves, mixed
    shapes)."""
    from svt_av1_tpu.pipeline.encoder import encode_ivf
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    rng = np.random.default_rng(21)
    h, w = 128, 192
    y0 = rng.integers(30, 220, (h, w)).astype(np.uint8)
    y1 = y0.copy()
    yy, xx = np.mgrid[0:h, 0:w // 2]
    y1[:, :w // 2] = np.clip(128 + 90 * np.sin(yy / 5.0) *
                             np.cos(xx / 4.0), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    frames = [(y0, u, v), (y1, u, v)]
    cfg_h = EncoderConfig(width=w, height=h, qp=40, intra_period=16,
                          scene_change_detection=False)
    cfg_d = dataclasses.replace(cfg_h, backend="device")
    # the device run must actually flip blocks (else this test silently
    # stops covering the fused program)
    kf = WavefrontIntraEncoder(cfg_d)
    kf.encode(y0, u, v)
    ie = InterFrameEncoder(cfg_d, kf.seq)
    ie.encode(y1, u, v, kf.recon)
    assert (~ie.block_is_inter).sum() > 0
    assert encode_ivf(frames, cfg_h) == encode_ivf(frames, cfg_d)


def test_backend_partition_dp_streams_byte_identical():
    """Partition-DP inter coding (fixed_partition_size=None — the
    production preset shape) on both backends. Round 4 regression: the
    fused device DP program dropped the parent-MV seeding carry, so
    child depths re-ran full HME and silently diverged from the host
    DP decisions (caught by the verify drive, not the suite — this
    combo had no byte-identity coverage)."""
    from svt_av1_tpu.pipeline.encoder import encode_ivf
    rng = np.random.default_rng(5)
    h, w = 64, 128
    base = rng.integers(0, 255, (h + 32, w + 32)).astype(np.uint8)
    frames = []
    for t in range(4):
        y = base[2 * t:2 * t + h, 3 * t:3 * t + w]
        u = np.full((h // 2, w // 2), 110 + t, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        frames.append((y, u, v))
    for hier in (0, 3):
        cfg_h = EncoderConfig(width=w, height=h, qp=40,
                              hierarchical_levels=hier,
                              fixed_partition_size=None)
        cfg_d = dataclasses.replace(cfg_h, backend="device")
        assert encode_ivf(frames, cfg_h) == encode_ivf(frames, cfg_d), \
            f"hier={hier}"
