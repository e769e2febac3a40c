"""Auxiliary subsystem tests (SURVEY.md §6): checkpoint/resume,
parallel GOP workers, stage tracing, auto film-grain estimation."""

import json

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.decode import StreamDecoder
from svt_av1_tpu.pipeline.encoder import Encoder


def _frames(n, w=96, h=64, seed=5, noise=0.0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = np.clip(110 + 70 * np.sin((xx + 5 * t) / 9.0)
                    + rng.normal(0, noise, (h, w)), 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 90, np.uint8)
        v = np.full((h // 2, w // 2), 170, np.uint8)
        out.append((y, u, v))
    return out


def _drain(enc):
    out = []
    while (p := enc.get_packet()) is not None:
        out.append(p)
    return out


def test_checkpoint_resume_bitstream_identical():
    """save_state mid-stream + load_state in a fresh process-equivalent
    must continue with byte-identical packets."""
    frames = _frames(6)
    cfg = EncoderConfig(width=96, height=64, qp=40, intra_period=16,
                        scene_change_detection=False)
    enc = Encoder(cfg)
    head, tail_a = [], []
    for f in frames[:3]:
        enc.send_picture(*f)
        head += _drain(enc)
    state = enc.save_state()
    for f in frames[3:]:
        enc.send_picture(*f)
        tail_a += _drain(enc)
    enc.flush()
    tail_a += _drain(enc)

    enc2 = Encoder.load_state(state)
    tail_b = []
    for f in frames[3:]:
        enc2.send_picture(*f)
        tail_b += _drain(enc2)
    enc2.flush()
    tail_b += _drain(enc2)

    assert len(tail_a) == len(tail_b)
    for (tu_a, _), (tu_b, _) in zip(tail_a, tail_b):
        assert tu_a == tu_b
    # and the resumed continuation must decode against the shared head
    dec = StreamDecoder()
    for tu, _ in head + tail_b:
        dec.decode_tu(tu)


def test_parallel_gops_match_serial():
    from svt_av1_tpu.pipeline import parallel
    frames = _frames(8)
    cfg = EncoderConfig(width=96, height=64, qp=40, intra_period=3,
                        scene_change_detection=False)
    assert parallel.parallelizable(cfg)
    serial = parallel.encode_parallel(frames, cfg, jobs=1)
    par = parallel.encode_parallel(frames, cfg, jobs=3)
    assert len(serial) == len(par)
    for (tu_a, _), (tu_b, _) in zip(serial, par):
        assert tu_a == tu_b


def test_tracer_spans_and_dump(tmp_path):
    from svt_av1_tpu.utils.trace import TRACER
    frames = _frames(2)
    cfg = EncoderConfig(width=96, height=64, qp=45)
    TRACER.enabled = True
    TRACER.reset()
    try:
        enc = Encoder(cfg)
        for f in frames:
            enc.send_picture(*f)
            _drain(enc)
        enc.flush()
        _drain(enc)
    finally:
        TRACER.enabled = False
    s = TRACER.summary()
    assert s, "no spans recorded"
    assert all(v["count"] > 0 and v["total_s"] >= 0 for v in s.values())
    path = tmp_path / "trace.json"
    TRACER.dump(str(path))
    loaded = json.loads(path.read_text())
    assert loaded["summary"].keys() == s.keys()
    assert len(loaded["spans"]) == len(TRACER.spans)


def test_auto_grain_estimates_from_noise():
    """film_grain_strength=-1: noisy source must trigger synthesis with
    a positive strength; clean source must resolve to zero."""
    noisy = _frames(1, noise=10.0)
    clean = _frames(1, noise=0.0)
    for frames, expect_grain in ((noisy, True), (clean, False)):
        cfg = EncoderConfig(width=96, height=64, qp=40,
                            film_grain_strength=-1)
        enc = Encoder(cfg)
        enc.send_picture(*frames[0])
        enc.flush()
        pkts = _drain(enc)
        assert (enc.cfg.film_grain_params is not None) == expect_grain
        dec = StreamDecoder()
        for tu, disp in pkts:
            out = dec.decode_tu(tu)
            # grain is applied post-recon at display; coded recon must
            # still match byte-exactly
            for p in range(3):
                assert (out[p] == disp[p]).all()


def test_source_denoise_classes_and_filters():
    """Noise classification drives the weak-filter denoiser (reference
    DenoiseInputPicture): clean frames pass through untouched, heavy
    flat noise triggers frame filtering, and the stream still
    roundtrips byte-exactly with denoising on."""
    import numpy as np
    from svt_av1_tpu.pipeline import analysis

    rng = np.random.default_rng(8)
    clean = np.full((96, 128), 120, np.uint8)
    assert analysis.classify_picture_noise(clean) == 1
    y2, _, _ = analysis.denoise_source(
        clean, np.full((48, 64), 128, np.uint8),
        np.full((48, 64), 128, np.uint8), 1, 45)
    assert (y2 == clean).all()

    noisy = np.clip(120 + rng.normal(0, 12, (96, 128)), 0,
                    255).astype(np.uint8)
    nc = analysis.classify_picture_noise(noisy)
    assert nc == 4          # flat + strong noise -> frame-based denoise
    yd, ud, vd = analysis.denoise_source(
        noisy, noisy[:48, :64].copy(), noisy[:48, :64].copy(), nc, 45)
    assert yd[1:-1, 1:-1].std() < noisy[1:-1, 1:-1].std()
    # weak luma filter exact semantics: cross (1,1,4,1,1) // 8
    yi = noisy.astype(np.int32)
    expect = (yi[:-2, 1:-1] + yi[1:-1, :-2] + 4 * yi[1:-1, 1:-1]
              + yi[1:-1, 2:] + yi[2:, 1:-1]) // 8
    assert (analysis.weak_filter_luma(noisy)[1:-1, 1:-1]
            == expect.astype(np.uint8)).all()

    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import decode_temporal_unit
    from svt_av1_tpu.pipeline.encoder import Encoder
    cfg = EncoderConfig(width=128, height=96, qp=45,
                        enable_source_denoise=True)
    enc = Encoder(cfg)
    enc.send_picture(noisy, np.full((48, 64), 128, np.uint8),
                     np.full((48, 64), 128, np.uint8))
    tu, disp = enc.get_packet()
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == disp[p]).all()


def test_cli_stdout_ivf_pipe():
    """The ffmpeg-plugin pipe contract: y4m on stdin -> IVF on stdout,
    stats on stderr, stream decodes byte-exactly."""
    import io
    import subprocess
    import sys

    import numpy as np
    from svt_av1_tpu.pipeline.decode import decode_ivf

    rng = np.random.RandomState(3)
    y4m = b"YUV4MPEG2 W64 H64 F30:1 Ip A1:1 C420\n"
    for _ in range(2):
        y4m += (b"FRAME\n"
                + rng.randint(0, 255, 64 * 64).astype(np.uint8).tobytes()
                + np.full(2 * 32 * 32, 128, np.uint8).tobytes())
    p = subprocess.run([sys.executable, "-m", "svt_av1_tpu.app.cli",
                        "-i", "-", "-b", "-", "--preset", "8", "-n", "2"],
                       input=y4m, capture_output=True, timeout=300)
    assert p.returncode == 0, p.stderr.decode()[-400:]
    assert p.stdout[:4] == b"DKIF"
    assert b"encode speed" in p.stderr     # stats rerouted off stdout
    assert len(decode_ivf(io.BytesIO(p.stdout))) == 2


def test_hdr_metadata_obus():
    """HDR CLL/MDCV metadata OBUs (spec 5.8.3/5.8.4) ride keyframe TUs
    and surface from the stream decoder without disturbing decode."""
    import numpy as np
    from svt_av1_tpu.bitstream import obu
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.encoder import Encoder

    prim = ((13250, 34500), (7500, 3000), (34000, 16000))
    cfg = EncoderConfig(width=128, height=96, qp=40,
                        content_light=(1000, 400),
                        mastering_display=(prim, (15635, 16450),
                                           1000 << 8, 1))
    enc = Encoder(cfg)
    rng = np.random.default_rng(2)
    enc.send_picture(rng.integers(0, 255, (96, 128), dtype=np.uint8),
                     np.full((48, 64), 128, np.uint8),
                     np.full((48, 64), 128, np.uint8))
    tu, disp = enc.get_packet()
    dec = StreamDecoder()
    out = dec.decode_tu(tu)
    for p in range(3):
        assert (out[p] == disp[p]).all()
    assert dec.metadata[obu.METADATA_TYPE_HDR_CLL] == {
        "max_cll": 1000, "max_fall": 400}
    md = dec.metadata[obu.METADATA_TYPE_HDR_MDCV]
    assert md["primaries"] == [list(p) for p in map(list, prim)] or \
        md["primaries"] == [tuple(p) for p in prim]
    assert md["max_luminance"] == 1000 << 8 and md["min_luminance"] == 1
