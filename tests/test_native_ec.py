"""Native (C) range coder vs Python oracle: byte-identical streams."""

import numpy as np
import pytest

from svt_av1_tpu import native

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy.cwriter import NativeSymbolWriter
from svt_av1_tpu.entropy.range_coder import make_icdf
from svt_av1_tpu.entropy.writer import SymbolWriter
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.intra import encode_keyframe
from tests.test_intra_e2e import synth_frame


def test_symbol_stream_identical():
    rng = np.random.default_rng(0)
    pw = SymbolWriter()
    nw = NativeSymbolWriter()
    cdf_p = make_icdf([0.5, 0.2, 0.2, 0.1])
    cdf_n = cdf_p.copy()
    for _ in range(5000):
        op = rng.integers(0, 3)
        if op == 0:
            s = int(rng.integers(0, 4))
            pw.write_symbol(s, cdf_p, 4)
            nw.write_symbol(s, cdf_n, 4)
        elif op == 1:
            b = int(rng.integers(0, 2))
            pw.write_bit(b)
            nw.write_bit(b)
        else:
            v = int(rng.integers(0, 256))
            pw.write_literal(v, 8)
            nw.write_literal(v, 8)
    np.testing.assert_array_equal(cdf_p, cdf_n)
    assert pw.done() == nw.done()


@pytest.mark.parametrize("qp", [20, 40, 60])
def test_encoder_native_matches_python(qp):
    y, u, v = synth_frame(128, 96, seed=qp)
    cfg_p = EncoderConfig(width=128, height=96, qp=qp, native_entropy=False)
    cfg_n = EncoderConfig(width=128, height=96, qp=qp, native_entropy=True)
    tu_p, recon_p, _ = encode_keyframe(y, u, v, cfg_p)
    tu_n, recon_n, _ = encode_keyframe(y, u, v, cfg_n)
    assert tu_p == tu_n, "native and Python entropy paths diverge"
    _, dec = decode_temporal_unit(tu_n)
    for a, b in zip(recon_n, dec):
        assert np.array_equal(a, b)
