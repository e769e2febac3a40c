"""Independent prediction-path conformance checker tests.

Round-1 VERDICT: encoder and mirror decoder share ``ops.intra``, so a
shared prediction bug is invisible to every roundtrip test. The
``verify.indep`` checker re-derives availability and intra prediction
from the spec in scalar code; these tests prove (a) real streams pass
it, and (b) a deliberately injected shared prediction bug that the
mirror roundtrip CANNOT see is caught by the independent checker.
"""

import io

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import decode as decode_mod
from svt_av1_tpu.pipeline.encoder import encode_ivf
from svt_av1_tpu.verify.indep import MismatchError, check_ivf
from tests.test_intra_e2e import synth_frame


def _clip(w, h, n, seed=0):
    fr = []
    for i in range(n):
        y, u, v = synth_frame(w, h, seed=seed + i)
        fr.append((np.roll(y, 3 * i, axis=1), np.roll(u, i, axis=1),
                   np.roll(v, i, axis=1)))
    return fr


@pytest.mark.parametrize("kw", [
    dict(width=128, height=64, qp=32, intra_period=0,
         fixed_partition_size=None, enable_tx_type_search=True,
         angle_deltas=(-3, 0, 3)),
    dict(width=128, height=64, qp=40, fixed_partition_size=None,
         hierarchical_levels=2, intra_period=8),
    dict(width=128, height=64, qp=40, bit_depth=10),
], ids=["all-intra-tools", "hier-gop", "10bit"])
def test_clean_streams_pass(kw):
    frames = _clip(kw["width"], kw["height"], 4)
    if kw.get("bit_depth") == 10:
        frames = [tuple(p.astype(np.uint16) << 2 for p in f)
                  for f in frames]
    iv = encode_ivf(frames, EncoderConfig(**kw))
    assert check_ivf(io.BytesIO(iv)) > 0


@pytest.mark.parametrize("kw", [
    dict(width=128, height=96, qp=40, fixed_partition_size=None),
    dict(width=128, height=96, qp=40, hierarchical_levels=3,
         intra_period=16, fixed_partition_size=None),
], ids=["flat-inter", "hier-compound"])
def test_clean_inter_streams_pass(kw):
    iv = encode_ivf(_clip(kw["width"], kw["height"], 8),
                    EncoderConfig(**kw))
    assert check_ivf(io.BytesIO(iv)) > 0


def test_injected_mc_bug_caught(monkeypatch):
    """A motion-compensation bug in shared ops.mc survives the mirror
    roundtrip (both sides compute the same wrong pixels) but the
    independent scalar convolve flags it."""
    from svt_av1_tpu.ops import mc as mc_ops

    real = mc_ops.mc_block_batch

    def buggy(ref_padded, xs, ys, mvs, w, h, ss=0, bd=8, ftype=0):
        out = real(ref_padded, xs, ys, mvs, w, h, ss=ss, bd=bd,
                   ftype=ftype)
        out = out.copy()
        out[..., h // 2, w // 2] = np.clip(
            out[..., h // 2, w // 2].astype(np.int64) + 3, 0,
            (1 << bd) - 1).astype(out.dtype)
        return out

    monkeypatch.setattr(mc_ops, "mc_block_batch", buggy)

    cfg = EncoderConfig(width=128, height=96, qp=45,
                        fixed_partition_size=None, enable_dlf=False)
    iv = encode_ivf(_clip(128, 96, 4), cfg)

    decoded = decode_mod.decode_ivf(io.BytesIO(iv))  # mirror is blind
    assert len(decoded) == 4

    with pytest.raises(MismatchError):
        check_ivf(io.BytesIO(iv))


def test_injected_shared_bug_caught(monkeypatch):
    """A prediction bug in shared ops.intra survives the mirror
    roundtrip byte-exactly (both sides compute the same wrong pixels)
    but the independent checker flags it."""
    from svt_av1_tpu.ops import intra as intra_ops

    real = intra_ops.predict_any

    def buggy(mode, angle_delta, above1, left1, bw, bh, ha, hl, bd=8,
              **kw):
        out = real(mode, angle_delta, above1, left1, bw, bh, ha, hl,
                   bd=bd, **kw)
        if mode == 9:  # SMOOTH: corrupt one interior pixel
            out = out.copy()
            out[..., bh // 2, bw // 2] = np.clip(
                out[..., bh // 2, bw // 2] + 4, 0, (1 << bd) - 1)
        return out

    # patch every importer (decode binds it at module import time)
    monkeypatch.setattr(intra_ops, "predict_any", buggy)
    monkeypatch.setattr(decode_mod.intra_ops, "predict_any", buggy)

    frames = _clip(128, 64, 1)
    cfg = EncoderConfig(width=128, height=64, qp=30, intra_period=0,
                        fixed_partition_size=None,
                        intra_modes=(0, 9),  # force SMOOTH into use
                        enable_dlf=False)
    iv = encode_ivf(frames, cfg)

    # the mirror roundtrip is blind to the shared bug
    decoded = decode_mod.decode_ivf(io.BytesIO(iv))
    assert len(decoded) == 1

    with pytest.raises(MismatchError):
        check_ivf(io.BytesIO(iv))
