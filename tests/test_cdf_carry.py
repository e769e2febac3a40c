"""Forward CDF carry (primary_ref_frame) tests: rate benefit, exact
roundtrip, and mixed-mode streams (spec 6.8.2 load_cdfs / 5.9.2
primary_ref_frame; reference: write_uncompressed_header_obu)."""

import io

import numpy as np
import pytest

from svt_av1_tpu.bitstream.ivf import (read_ivf, write_ivf_frame,
                                       write_ivf_header)
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.decode import StreamDecoder, decode_ivf
from svt_av1_tpu.pipeline.encoder import Encoder


def _clip(w=192, h=128, n=8, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h + 32, 0:w + 32].astype(np.float32)
    base = np.clip(90 + 50 * np.sin(xx / 11.0) * np.cos(yy / 17.0)
                   + rng.normal(0, 7, (h + 32, w + 32)), 0, 255)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 132, np.uint8)
    return [(base[t:t + h, 2 * t:2 * t + w].astype(np.uint8), u, v)
            for t in range(n)]


def _encode(frames, **kw):
    kw.setdefault("intra_period", -1)
    enc = Encoder(EncoderConfig(width=192, height=128, qp=36, **kw))
    pk = []
    for (y, u, v) in frames:
        enc.send_picture(y, u, v)
        while (p := enc.get_packet()) is not None:
            pk.append(p)
    enc.flush()
    while (p := enc.get_packet()) is not None:
        pk.append(p)
    return pk


def _roundtrip_exact(pk):
    dec = StreamDecoder()
    shown = []
    for tu, recon in pk:
        out = dec.decode_tu(tu)
        if out is not None:
            shown.append(out)
            assert recon is not None
            for p in range(3):
                assert np.array_equal(out[p], recon[p])
    return shown


@pytest.mark.parametrize("hl", [0, 2])
def test_carry_saves_bits_and_decodes_exactly(hl):
    frames = _clip()
    carried = _encode(frames, hierarchical_levels=hl)
    resilient = _encode(frames, hierarchical_levels=hl,
                        error_resilient=True)
    nb_c = sum(len(t) for t, _ in carried)
    nb_r = sum(len(t) for t, _ in resilient)
    assert nb_c < nb_r, (nb_c, nb_r)
    shown = _roundtrip_exact(carried)
    assert len(shown) == len(frames)
    _roundtrip_exact(resilient)


def test_carry_with_tools_roundtrips():
    frames = _clip(n=6)
    pk = _encode(frames, hierarchical_levels=2, enable_cdef=True,
                 adaptive_quantization=1, enable_tx_type_search=True)
    shown = _roundtrip_exact(pk)
    assert len(shown) == len(frames)


def test_carry_crosses_keyframe_reset():
    """A mid-stream keyframe reseeds every slot; carry resumes after."""
    frames = _clip(n=9)
    pk = _encode(frames, intra_period=4, hierarchical_levels=0)
    shown = _roundtrip_exact(pk)
    assert len(shown) == len(frames)


def test_gm_carry_roundtrip():
    """Global pan: gm params delta-code against the saved prev params."""
    frames = _clip(n=6, seed=11)
    pk = _encode(frames, hierarchical_levels=0)
    buf = io.BytesIO()
    write_ivf_header(buf, 192, 128, 30, 1, 0)
    for tu, _ in pk:
        write_ivf_frame(buf, tu, 0)
    buf.seek(0)
    out = decode_ivf(buf)
    assert len(out) == len(frames)
