"""End-to-end all-intra encode → bitstream → mirror-decode tests.

The conformance criterion (SURVEY.md §4): the decoder, consuming only the
bitstream bytes, must reproduce the encoder's reconstruction exactly, and
PSNR must behave sanely across operating points.
"""

import io

import numpy as np
import pytest

from svt_av1_tpu.bitstream.ivf import write_ivf_frame, write_ivf_header
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.decode import decode_ivf, decode_temporal_unit
from svt_av1_tpu.pipeline.intra import encode_keyframe


def synth_frame(w, h, seed=0):
    """Natural-ish content: smooth gradients + texture + edges."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (96 + 60 * np.sin(xx / 23.0) + 40 * np.cos(yy / 17.0)
         + rng.normal(0, 6, (h, w)))
    y[h // 3:, w // 2:] += 40  # hard edge
    y = np.clip(y, 0, 255).astype(np.uint8)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    u = np.clip(128 + 20 * np.sin(np.mgrid[0:ch, 0:cw][1] / 11.0), 0,
                255).astype(np.uint8)
    v = np.full((ch, cw), 120, dtype=np.uint8)
    return y, u, v


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


@pytest.mark.parametrize("w,h", [(64, 64), (128, 96), (200, 120)])
def test_roundtrip_recon_exact(w, h):
    y, u, v = synth_frame(w, h)
    cfg = EncoderConfig(width=w, height=h, qp=40)
    tu, recon, stats = encode_keyframe(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for enc_p, dec_p, name in zip(recon, dec, "yuv"):
        assert np.array_equal(enc_p, dec_p), f"plane {name} recon mismatch"
    assert psnr(y, recon[0]) > 28


@pytest.mark.parametrize("qp", [10, 30, 55])
def test_qp_quality_tradeoff(qp):
    y, u, v = synth_frame(64, 64, seed=qp)
    cfg = EncoderConfig(width=64, height=64, qp=qp)
    tu, recon, stats = encode_keyframe(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    assert np.array_equal(recon[0], dec[0])


def test_monotone_rate_quality():
    y, u, v = synth_frame(128, 96, seed=3)
    sizes, psnrs = [], []
    for qp in (15, 35, 55):
        cfg = EncoderConfig(width=128, height=96, qp=qp)
        tu, recon, stats = encode_keyframe(y, u, v, cfg)
        sizes.append(stats["tu_bytes"])
        psnrs.append(psnr(y, recon[0]))
    assert sizes[0] > sizes[1] > sizes[2], sizes
    assert psnrs[0] > psnrs[1] > psnrs[2], psnrs


def test_partition_sizes():
    y, u, v = synth_frame(128, 128, seed=7)
    recons = []
    for part in (8, 16, 32, 64):
        cfg = EncoderConfig(width=128, height=128, qp=35,
                            fixed_partition_size=part)
        tu, recon, _ = encode_keyframe(y, u, v, cfg)
        _, dec = decode_temporal_unit(tu)
        assert np.array_equal(recon[0], dec[0]), f"partition {part}"
        recons.append(recon)


def test_ivf_stream_multi_frame():
    cfg = EncoderConfig(width=64, height=64, qp=40)
    buf = io.BytesIO()
    write_ivf_header(buf, 64, 64, 30, 1, 3)
    encs = []
    for i in range(3):
        y, u, v = synth_frame(64, 64, seed=i)
        tu, recon, _ = encode_keyframe(y, u, v, cfg)
        write_ivf_frame(buf, tu, i)
        encs.append(recon)
    buf.seek(0)
    decs = decode_ivf(buf)
    assert len(decs) == 3
    for enc, dec in zip(encs, decs):
        for a, b in zip(enc, dec):
            assert np.array_equal(a, b)


def test_tx_type_search_roundtrip_and_gain():
    """enable_tx_type_search sweeps the intra ext-tx set; streams must
    stay decoder-exact, oracle/wavefront identical, and RD not regress."""
    import numpy as np
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import decode_temporal_unit
    from svt_av1_tpu.pipeline.intra import IntraFrameEncoder
    from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
    rng = np.random.RandomState(41)
    h, w = 120, 200
    yy, xx = np.mgrid[0:h, 0:w]
    # ramps + texture: content where ADST/identity variants win
    y = np.clip(xx * 1.1 + 40 * np.sin(yy / 6.0) +
                rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(128 + yy[:60, :100] * 0.8, 0, 255).astype(np.uint8)
    v = np.full((60, 100), 120, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=40, enable_tx_type_search=True)
    tu, recon, st = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == recon[p]).all(), f"plane {p}"
    # oracle must match the wavefront stream byte for byte
    tu2, recon2, _ = IntraFrameEncoder(cfg).encode(y, u, v)
    assert tu == tu2
    # search actually chose non-DCT types somewhere
    enc = IntraFrameEncoder(cfg)
    # (wavefront stores them; check via the wavefront encoder)
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    wf = WavefrontIntraEncoder(cfg)
    wf.encode(y, u, v)
    assert (wf.y_tx_type != 0).any(), "tx search never chose non-DCT"
    # quality-at-size sanity: search should not lose vs DCT-only
    cfg0 = EncoderConfig(width=w, height=h, qp=40)
    tu0, recon0, _ = encode_keyframe_wavefront(y, u, v, cfg0)
    sse = float(((recon[0].astype(int) - y) ** 2).sum())
    sse0 = float(((recon0[0].astype(int) - y) ** 2).sum())
    assert sse * 1.0 <= sse0 * 1.05 or len(tu) <= len(tu0)
