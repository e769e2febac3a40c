"""VBR rate-control tests: convergence + monotone quality."""

import io

import numpy as np

from svt_av1_tpu.bitstream.ivf import write_ivf_frame, write_ivf_header
from svt_av1_tpu.config import EncoderConfig, RateControlMode
from svt_av1_tpu.pipeline.decode import decode_ivf
from svt_av1_tpu.pipeline.encoder import Encoder, encode_ivf
from tests.test_inter_e2e import _clip
from tests.test_intra_e2e import psnr


def _run(target_bps, frames):
    cfg = EncoderConfig(width=192, height=128, qp=40,
                        rate_control_mode=RateControlMode.VBR,
                        target_bit_rate=target_bps, frame_rate_num=30)
    enc = Encoder(cfg)
    buf = io.BytesIO()
    write_ivf_header(buf, 192, 128, 30, 1, len(frames))
    total = 0
    for i, f in enumerate(frames):
        enc.send_picture(*f)
        tu, _ = enc.get_packet()
        total += len(tu)
        write_ivf_frame(buf, tu, i)
    buf.seek(0)
    decs = decode_ivf(buf)
    kbps = total * 8 * 30 / len(frames) / 1000
    avg = float(np.mean([psnr(f[0], d[0])
                         for f, d in zip(frames, decs)]))
    return kbps, avg, len(decs)


def test_vbr_hits_target_within_tolerance():
    frames = _clip(16, 192, 128)
    kbps, _, n = _run(200_000, frames)
    assert n == len(frames)
    assert 0.6 * 200 < kbps < 1.4 * 200, kbps


def test_vbr_rate_quality_monotone():
    frames = _clip(12, 192, 128)
    k1, p1, _ = _run(120_000, frames)
    k2, p2, _ = _run(400_000, frames)
    assert k2 > k1
    assert p2 > p1


def test_lookahead_rate_tracking():
    """Lookahead-weighted VBR must decode fully and track the target at
    least as well as no-lookahead on variable-complexity content."""
    from tests.test_inter_e2e import _texture
    big = _texture(seed=5)
    frames = []
    for t in range(6):
        frames.append((big[0:128, 2 * t:2 * t + 192].copy(),
                       np.full((64, 96), 120, np.uint8),
                       np.full((64, 96), 130, np.uint8)))
    for t in range(6):
        frames.append((big[12 * t:12 * t + 128,
                           100 + 15 * t:100 + 15 * t + 192].copy(),
                       np.full((64, 96), 120, np.uint8),
                       np.full((64, 96), 130, np.uint8)))
    res = {}
    for lad in (0, 4):
        cfg = EncoderConfig(width=192, height=128, qp=40,
                            rate_control_mode=RateControlMode.VBR,
                            target_bit_rate=250_000,
                            look_ahead_distance=lad,
                            scene_change_detection=False)
        iv = encode_ivf(frames, cfg)
        decs = decode_ivf(io.BytesIO(iv))
        assert len(decs) == len(frames)
        res[lad] = abs(len(iv) * 8 * 30 / len(frames) - 250_000)
    assert res[4] <= res[0] * 1.5


def test_cli_presets_and_channels(tmp_path):
    """M0-M8 preset mapping resolves to valid configs; --nch runs
    independent channels."""
    import numpy as np
    from svt_av1_tpu.app.cli import build_parser, preset_config
    for preset in range(9):
        args = build_parser().parse_args(
            ["-i", "x.y4m", "-b", "x.ivf", "--preset", str(preset)])
        args.width, args.height, args.bit_depth = 128, 96, 8
        cfg = preset_config(args)
        assert cfg.width == 128
    # vbr flags map through
    args = build_parser().parse_args(
        ["-i", "x.y4m", "-b", "x.ivf", "--tbr", "200000", "--lad", "4"])
    args.width, args.height, args.bit_depth = 128, 96, 8
    cfg = preset_config(args)
    assert cfg.rate_control_mode == 1 and cfg.look_ahead_distance == 4
    # channels: two tiny y4m encodes in one invocation
    from svt_av1_tpu.app import cli
    src = tmp_path / "in.y4m"
    rng = np.random.RandomState(3)
    with open(src, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H64 F30:1 Ip A1:1 C420\n")
        for _ in range(2):
            f.write(b"FRAME\n")
            f.write(rng.randint(0, 255, 64 * 64).astype(np.uint8).tobytes())
            f.write(np.full(2 * 32 * 32, 128, np.uint8).tobytes())
    o1, o2 = tmp_path / "a.ivf", tmp_path / "b.ivf"
    rc = cli.main(["-i", f"{src},{src}", "-b", f"{o1},{o2}",
                   "--nch", "2", "--preset", "8", "--no-stats"])
    assert rc == 0 and o1.stat().st_size > 0 and o2.stat().st_size > 0
    from svt_av1_tpu.pipeline.decode import decode_ivf
    assert len(decode_ivf(open(o1, "rb"))) == 2


def test_encoder_checkpoint_resume():
    """save_state/load_state mid-stream: the resumed encoder must emit
    byte-identical packets to an uninterrupted run."""
    import numpy as np
    from svt_av1_tpu.pipeline.encoder import Encoder
    rng = np.random.RandomState(71)
    base = rng.randint(40, 200, (96, 128)).astype(np.int32)
    frames = []
    for t in range(6):
        y = np.clip(base + 2 * t, 0, 255).astype(np.uint8)
        u = np.full((48, 64), 100, np.uint8)
        v = np.full((48, 64), 140, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(width=128, height=96, qp=40, intra_period=16,
                        hierarchical_levels=1,
                        scene_change_detection=False)

    def run(enc, fs):
        outs = []
        for f in fs:
            enc.send_picture(*f)
            while (p := enc.get_packet()) is not None:
                outs.append(p[0])
        return outs

    ref_enc = Encoder(cfg)
    ref = run(ref_enc, frames)
    ref_enc.flush()
    while (p := ref_enc.get_packet()) is not None:
        ref.append(p[0])

    enc1 = Encoder(cfg)
    part1 = run(enc1, frames[:3])
    state = enc1.save_state()
    enc2 = Encoder.load_state(state)
    part2 = run(enc2, frames[3:])
    enc2.flush()
    while (p := enc2.get_packet()) is not None:
        part2.append(p[0])
    got = part1 + part2
    assert len(got) == len(ref)
    for i, (a, b) in enumerate(zip(got, ref)):
        assert a == b, f"packet {i} differs after resume"


def test_parallel_gop_encode_matches_serial():
    """Parallel GOP workers must produce byte-identical packet streams."""
    import numpy as np
    from svt_av1_tpu.pipeline import parallel
    from svt_av1_tpu.pipeline.parallel import encode_parallel
    rng = np.random.RandomState(81)
    frames = []
    base = rng.randint(40, 200, (96, 128)).astype(np.int32)
    for t in range(6):
        y = np.clip(base + 3 * t, 0, 255).astype(np.uint8)
        u = np.full((48, 64), 100, np.uint8)
        v = np.full((48, 64), 140, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(width=128, height=96, qp=42, intra_period=2,
                        scene_change_detection=False)
    assert parallel.parallelizable(cfg)
    assert parallel.gop_chunks(6, cfg) == [(0, 3), (3, 6)]
    serial = encode_parallel(frames, cfg, jobs=1)
    par = encode_parallel(frames, cfg, jobs=3)
    assert len(serial) == len(par)
    for i, (a, b) in enumerate(zip(serial, par)):
        assert a[0] == b[0], f"packet {i} differs"


def test_vbr_within_5pct_accuracy():
    """VERDICT r1 #7 contract: VBR lands within ±5% of target on
    synthetic clips, for both the low-delay chain and the hierarchical
    pyramid (per-layer budgets + debt repayment)."""
    rng = np.random.RandomState(12)
    big = rng.randint(16, 235, (800, 1100)).astype(np.uint8)

    def clip(n, w=192, h=128, pan=(2, 3)):
        out = []
        for t in range(n):
            y = big[pan[0] * t:pan[0] * t + h,
                    pan[1] * t:pan[1] * t + w].copy()
            y[30:54, (20 + 5 * t) % (w - 24):(44 + 5 * t) % (w - 24)] = 220
            u = np.full((h // 2, w // 2), 120, np.uint8)
            v = np.full((h // 2, w // 2), 130, np.uint8)
            out.append((y, u, v))
        return out

    for hier, tgt in ((0, 300_000), (2, 800_000)):
        frames = clip(96)
        cfg = EncoderConfig(width=192, height=128, qp=40,
                            rate_control_mode=RateControlMode.VBR,
                            target_bit_rate=tgt, frame_rate_num=30,
                            hierarchical_levels=hier,
                            look_ahead_distance=4,
                            scene_change_detection=False)
        iv = encode_ivf(frames, cfg)
        bps = len(iv) * 8 * 30 / len(frames)
        assert 0.95 * tgt < bps < 1.05 * tgt, \
            f"hier={hier} target={tgt}: {bps:.0f}bps"


def test_vbr_layer_budgets_learned():
    """Per-layer budgets: anchors must end up spending more bits/frame
    than leaf Bs, and the learned per-layer deltas must stay ordered."""
    from svt_av1_tpu.pipeline.rc import RateControl, _layer_weights
    w = _layer_weights(3)
    assert w[0] > w[1] > w[3], w
    rc = RateControl(500_000, 30, hierarchical_levels=1)
    # GOP mean lands on budget, but the anchor overshoots its share and
    # the leaf undershoots: the learned deltas must move toward each
    # other (anchor delta up = fewer bits, leaf delta down = more)
    dq0_0, dq1_0 = rc.layer_dq
    b = rc.frame_budget
    for _ in range(30):
        rc.frame_qindex(False, layer=0)
        rc.update(1.5 * b, False, 0)
        rc.frame_qindex(False, layer=1)
        rc.update(0.5 * b, False, 1)
    assert rc.layer_dq[0] > dq0_0, "anchor delta must rise on overshoot"
    assert rc.layer_dq[1] < dq1_0, "leaf delta must fall on undershoot"
    # balanced totals: base q stays in a sane interior range
    assert 20 < rc.q < 240, rc.q


def test_gop_budget_correction():
    """GOP model: overspending early in a GOP must push qindex up for
    the GOP's remaining frames (RateControlModel.c correction role)."""
    from svt_av1_tpu.pipeline.rc import RateControl
    rc = RateControl(300_000, 30, intra_period=15)
    q0 = rc.frame_qindex(False)
    rc.update(rc.frame_budget * 4, False)   # big overshoot inside GOP
    assert rc.frame_qindex(False) > q0


def test_config_file_and_qp_file(tmp_path):
    """Reference-style cfg file (EbAppConfig.c config_entry tokens) and
    per-frame qp file (--use-q-file analogue)."""
    import numpy as np

    from svt_av1_tpu.app import cli

    from svt_av1_tpu.pipeline.decode import decode_ivf
    from svt_av1_tpu.utils import yuv

    w, h, n = 128, 96, 4
    rng = np.random.default_rng(3)
    src = tmp_path / "in.yuv"
    with open(src, "wb") as fh:
        for t in range(n):
            fh.write(rng.integers(0, 255, (h, w), dtype=np.uint8)
                     .tobytes())
            fh.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes())
            fh.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes())
    qpf = tmp_path / "qp.txt"
    qpf.write_text("30\n-1\n55\n")  # frame 0 qp30, 1 keeps, 2 qp55
    cfgf = tmp_path / "enc.cfg"
    cfgf.write_text(
        f"InputFile : {src}\n"
        "SourceWidth : 128\n"
        "SourceHeight: 96   # comment\n"
        "QP = 44\n"
        "EncoderMode : 8\n"
        f"QpFile : {qpf}\n")
    out = tmp_path / "out.ivf"
    rc = cli.main(["-c", str(cfgf), "-b", str(out), "--no-stats"])
    assert rc == 0
    with open(out, "rb") as fh:
        frames = decode_ivf(fh)
    assert len(frames) == n
    # CLI overrides the file
    out2 = tmp_path / "out2.ivf"
    rc = cli.main(["-c", str(cfgf), "-b", str(out2), "-q", "60",
                   "--no-stats"])
    assert rc == 0
    assert out2.stat().st_size < out.stat().st_size  # higher qp, fewer bytes


def test_qp_file_changes_frame_sizes(tmp_path):
    import io

    import numpy as np

    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.encoder import Encoder

    rng = np.random.default_rng(5)
    frames = [(rng.integers(0, 255, (96, 128), dtype=np.uint8),
               np.full((48, 64), 128, np.uint8),
               np.full((48, 64), 128, np.uint8)) for _ in range(3)]

    def sizes(qp_file):
        # qp scaling off: a qp-file frame bypasses scaling (reference
        # qp_on_the_fly semantics), so the nominal-vs-override size
        # ordering this test asserts only holds at unscaled qindexes
        enc = Encoder(EncoderConfig(width=128, height=96, qp=40,
                                    intra_period=0, qp_file=qp_file,
                                    enable_qp_scaling=False))
        out = []
        for (y, u, v) in frames:
            enc.send_picture(y, u, v)
            while (p := enc.get_packet()) is not None:
                out.append(len(p[0]))
        enc.flush()
        while (p := enc.get_packet()) is not None:
            out.append(len(p[0]))
        return out

    base = sizes(None)
    tweaked = sizes((20, -1, 60))
    assert tweaked[0] > base[0]      # much finer qp on frame 0
    assert tweaked[1] == base[1]     # -1 keeps frame 1
    assert tweaked[2] < base[2]      # coarser frame 2


def test_cqp_qp_scaling_allocation():
    """CQP qp-scaling (reference enable_qp_scaling_flag): key frames
    target 0.25x the nominal quantizer step, temporal layers
    0.40/0.7/0.85/1.0x (EbRateControlProcess.c:1123-1155), so scaled
    streams spend more bits on anchors than unscaled ones."""
    import numpy as np

    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.ops.quant import ac_quant, qindex_for_qstep_scale
    from svt_av1_tpu.pipeline.encoder import Encoder

    # step-ratio targets are honored within table granularity
    for base in (80, 120, 160, 200):
        for r in (0.25, 0.40, 0.7, 0.85):
            qi = qindex_for_qstep_scale(base, r)
            step = ac_quant(qi, 0)
            assert step >= r * ac_quant(base, 0)
            assert ac_quant(max(qi - 1, 0), 0) < r * ac_quant(base, 0) \
                or qi == 1

    rng = np.random.default_rng(7)
    frames = [(rng.integers(0, 255, (96, 128), dtype=np.uint8),
               np.full((48, 64), 128, np.uint8),
               np.full((48, 64), 128, np.uint8)) for _ in range(5)]

    def total(scaling):
        enc = Encoder(EncoderConfig(width=128, height=96, qp=45,
                                    intra_period=-1, hierarchical_levels=2,
                                    enable_qp_scaling=scaling))
        n = 0
        for (y, u, v) in frames:
            enc.send_picture(y, u, v)
            while (p := enc.get_packet()) is not None:
                n += len(p[0])
        enc.flush()
        while (p := enc.get_packet()) is not None:
            n += len(p[0])
        return n

    assert total(True) > total(False)  # finer anchors spend more bits


def test_ois_intra_cost():
    """OIS: per-block open-loop intra SADs are 0 on flat/columnwise/
    rowwise content (DC/V/H predictors from source neighbors) and
    positive on noise; the lookahead complexity uses it as a cap."""
    from svt_av1_tpu.pipeline.analysis import ois_intra_cost

    flat = np.full((64, 96), 77, np.uint8)
    assert (ois_intra_cost(flat) == 0).all()
    colwise = np.tile(np.arange(96, dtype=np.uint8), (64, 1))
    assert (ois_intra_cost(colwise) == 0).all()        # V predicts exactly
    rowwise = np.tile(np.arange(64, dtype=np.uint8)[:, None], (1, 96))
    assert (ois_intra_cost(rowwise) == 0).all()        # H predicts exactly
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 255, (64, 96), dtype=np.uint8)
    costs = ois_intra_cost(noise)
    assert costs.shape == (4, 6) and (costs > 0).all()
