"""End-to-end tests for enable_intra_edge_filter = 1: encode with the
normative intra edge filter + upsample, mirror-decode byte-exact,
independent checker green, device twin byte-identical to host."""

import io

import numpy as np
import pytest

from svt_av1_tpu.bitstream.ivf import write_ivf_frame, write_ivf_header
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront
from svt_av1_tpu.verify.indep import check_ivf


def synth(w, h, seed=0):
    """Diagonal structure so directional modes (and the edge filter)
    actually engage."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (80 + 70 * np.sin((xx + 2 * yy) / 9.0)
         + 30 * np.cos((2 * xx - yy) / 13.0)
         + rng.normal(0, 4, (h, w)))
    y = np.clip(y, 0, 255).astype(np.uint8)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    u = np.clip(128 + 40 * np.sin((np.mgrid[0:ch, 0:cw][0]
                                   + np.mgrid[0:ch, 0:cw][1]) / 7.0),
                0, 255).astype(np.uint8)
    v = np.clip(110 + 30 * np.cos(np.mgrid[0:ch, 0:cw][1] / 5.0),
                0, 255).astype(np.uint8)
    return y, u, v


def ivf_bytes(tu, w, h):
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    write_ivf_frame(buf, tu, 0)
    return buf.getvalue()


@pytest.mark.parametrize("qp", [20, 45])
def test_keyframe_roundtrip_and_checker(qp):
    w, h = 128, 96
    y, u, v = synth(w, h)
    cfg = EncoderConfig(width=w, height=h, qp=qp,
                        enable_intra_edge_filter=True)
    tu, recon, _ = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    for enc_p, dec_p, name in zip(recon, dec, "yuv"):
        assert np.array_equal(enc_p, dec_p), f"plane {name} mismatch"
    assert check_ivf(io.BytesIO(ivf_bytes(tu, w, h))) > 0


def test_flag_changes_stream_and_helps():
    """The filter must actually engage (streams differ) on directional
    content, and the sequence header must signal it."""
    w, h = 128, 96
    y, u, v = synth(w, h, seed=3)
    tus = {}
    for flag in (False, True):
        cfg = EncoderConfig(width=w, height=h, qp=45,
                            enable_intra_edge_filter=flag)
        tu, recon, _ = encode_keyframe_wavefront(y, u, v, cfg)
        _, dec = decode_temporal_unit(tu)
        assert np.array_equal(recon[0], dec[0])
        tus[flag] = tu
    assert tus[False] != tus[True]


def test_multitile_keyframe_roundtrip():
    w, h = 192, 128
    y, u, v = synth(w, h, seed=5)
    cfg = EncoderConfig(width=w, height=h, qp=35, tile_cols_log2=1,
                        enable_intra_edge_filter=True)
    tu, recon, _ = encode_keyframe_wavefront(y, u, v, cfg)
    _, dec = decode_temporal_unit(tu)
    assert np.array_equal(recon[0], dec[0])
    assert check_ivf(io.BytesIO(ivf_bytes(tu, w, h))) > 0


def test_device_host_byte_identity():
    w, h = 128, 64
    y, u, v = synth(w, h, seed=9)
    tus = {}
    for backend in ("host", "device"):
        cfg = EncoderConfig(width=w, height=h, qp=35, backend=backend,
                            enable_intra_edge_filter=True)
        tu, recon, _ = encode_keyframe_wavefront(y, u, v, cfg)
        tus[backend] = tu
    assert tus["host"] == tus["device"]


def test_gop_e2e_with_edge_filter():
    from svt_av1_tpu.pipeline.encoder import encode_ivf
    w, h = 96, 64
    frames = [synth(w, h, seed=s) for s in range(3)]
    cfg = EncoderConfig(width=w, height=h, qp=40,
                        enable_intra_edge_filter=True,
                        hierarchical_levels=1)
    iv = encode_ivf(frames, cfg)
    assert check_ivf(io.BytesIO(iv)) > 0
