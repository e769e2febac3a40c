"""Range coder roundtrip tests: every encoded stream must decode exactly.

The decoder is implemented independently from the AV1 spec's symbol decoder;
roundtrip equality is the in-repo conformance oracle for the arithmetic layer.
"""

import numpy as np
import pytest

from svt_av1_tpu.entropy.range_coder import (
    RangeDecoder, RangeEncoder, make_icdf, update_cdf, CDF_PROB_TOP)


def roundtrip_symbols(symbols, icdfs, nsyms_list, adapt=False):
    enc = RangeEncoder()
    icdfs_enc = [np.array(c, copy=True) for c in icdfs]
    for s, ci in symbols:
        enc.encode_symbol(s, icdfs_enc[ci], nsyms_list[ci])
        if adapt:
            update_cdf(icdfs_enc[ci], s, nsyms_list[ci])
    data = enc.done()

    dec = RangeDecoder(data)
    icdfs_dec = [np.array(c, copy=True) for c in icdfs]
    out = []
    for _, ci in symbols:
        s = dec.decode_symbol(icdfs_dec[ci], nsyms_list[ci])
        if adapt:
            update_cdf(icdfs_dec[ci], s, nsyms_list[ci])
        out.append(s)
    assert out == [s for s, _ in symbols]
    for a, b in zip(icdfs_enc, icdfs_dec):
        np.testing.assert_array_equal(a, b)
    return data


def test_single_symbol():
    icdf = make_icdf([0.5, 0.3, 0.2])
    roundtrip_symbols([(1, 0)], [icdf], [3])


def test_uniform_cdf_roundtrip():
    rng = np.random.RandomState(0)
    for nsyms in (2, 3, 4, 5, 8, 10, 13, 16):
        icdf = make_icdf(np.ones(nsyms))
        symbols = [(int(rng.randint(nsyms)), 0) for _ in range(500)]
        roundtrip_symbols(symbols, [icdf], [nsyms])


def test_skewed_cdf_roundtrip():
    rng = np.random.RandomState(1)
    for trial in range(10):
        nsyms = int(rng.randint(2, 17))
        probs = rng.dirichlet(np.full(nsyms, 0.3)) + 1e-6
        icdf = make_icdf(probs)
        symbols = [(int(rng.choice(nsyms, p=probs / probs.sum())), 0)
                   for _ in range(300)]
        roundtrip_symbols(symbols, [icdf], [nsyms])


def test_adaptive_roundtrip_multi_context():
    rng = np.random.RandomState(2)
    nsyms_list = [2, 4, 8, 16, 3, 11]
    icdfs = [make_icdf(np.ones(n)) for n in nsyms_list]
    symbols = []
    for _ in range(3000):
        ci = int(rng.randint(len(nsyms_list)))
        symbols.append((int(rng.randint(nsyms_list[ci])), ci))
    roundtrip_symbols(symbols, icdfs, nsyms_list, adapt=True)


def test_bools_and_literals():
    rng = np.random.RandomState(3)
    ops = []
    for _ in range(2000):
        kind = rng.randint(3)
        if kind == 0:
            ops.append(("bool", int(rng.randint(2)), int(rng.randint(1, 32768))))
        elif kind == 1:
            nb = int(rng.randint(1, 17))
            ops.append(("lit", int(rng.randint(1 << nb)), nb))
        else:
            ops.append(("sym", int(rng.randint(4)), None))
    icdf = make_icdf([0.4, 0.3, 0.2, 0.1])
    enc = RangeEncoder()
    for kind, v, p in ops:
        if kind == "bool":
            enc.encode_bool(v, p)
        elif kind == "lit":
            enc.encode_literal(v, p)
        else:
            enc.encode_symbol(v, icdf, 4)
    data = enc.done()
    dec = RangeDecoder(data)
    for kind, v, p in ops:
        if kind == "bool":
            assert dec.decode_bool(p) == v
        elif kind == "lit":
            assert dec.decode_literal(p) == v
        else:
            assert dec.decode_symbol(icdf, 4) == v


def test_extreme_probabilities():
    # near-deterministic CDFs stress the carry/renormalization paths
    icdf = np.array([4, 0, 0], dtype=np.int32)  # p0 ~ 1, tiny p1
    symbols = [(0, 0)] * 500 + [(1, 0)] + [(0, 0)] * 500
    roundtrip_symbols(symbols, [icdf], [2])
    icdf2 = np.array([CDF_PROB_TOP - 4, 0, 0], dtype=np.int32)
    symbols = [(1, 0)] * 500 + [(0, 0)] + [(1, 0)] * 500
    roundtrip_symbols(symbols, [icdf2], [2])


def test_long_carry_chain():
    # Long runs of the same skewed symbol produce low values close to the
    # carry boundary; ensure carry propagation over many bytes is exact.
    rng = np.random.RandomState(4)
    icdf = make_icdf([0.999, 0.001])
    for _ in range(5):
        n = int(rng.randint(100, 4000))
        symbols = [(0 if rng.rand() < 0.999 else 1, 0) for _ in range(n)]
        roundtrip_symbols(symbols, [icdf], [2])


def test_empty_stream():
    enc = RangeEncoder()
    data = enc.done()
    assert isinstance(data, bytes)


def test_update_cdf_matches_spec_example():
    # coding symbol 0 must increase its probability (decrease nothing before,
    # raise cdf tail toward 0) and bump the counter
    icdf = make_icdf([0.25, 0.25, 0.25, 0.25])
    before = icdf.copy()
    update_cdf(icdf, 0, 4)
    assert icdf[4] == before[4] + 1
    # icdf[i] = 32768 - cum(0..i); prob(0) up => cum(0) up => icdf[0] down
    assert icdf[0] < before[0]
    assert icdf[3] == 0


def test_tell_monotone():
    enc = RangeEncoder()
    icdf = make_icdf([0.5, 0.5])
    prev = enc.tell()
    for i in range(100):
        enc.encode_symbol(i & 1, icdf, 2)
        now = enc.tell()
        assert now >= prev
        prev = now


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_mixed(seed):
    rng = np.random.RandomState(100 + seed)
    nctx = int(rng.randint(1, 8))
    nsyms_list = [int(rng.randint(2, 17)) for _ in range(nctx)]
    icdfs = [make_icdf(rng.dirichlet(np.full(n, 0.5)) + 1e-5)
             for n in nsyms_list]
    symbols = []
    for _ in range(int(rng.randint(1, 2000))):
        ci = int(rng.randint(nctx))
        symbols.append((int(rng.randint(nsyms_list[ci])), ci))
    roundtrip_symbols(symbols, icdfs, nsyms_list, adapt=bool(seed & 1))
