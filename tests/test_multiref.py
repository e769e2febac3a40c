"""Multi-reference prediction: per-block choice among >2 named refs,
compound pairs beyond (LAST, ALTREF), and the GOP-level ref lists
(the reference's Av1GenerateRpsInfo multi-ref lists,
EbPictureDecisionProcess.c:516)."""

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy.inter_modes import (ALTREF2_FRAME, ALTREF_FRAME,
                                             GOLDEN_FRAME, LAST2_FRAME,
                                             LAST_FRAME)
from svt_av1_tpu.pipeline.decode import StreamDecoder
from svt_av1_tpu.pipeline.inter import InterFrameEncoder
from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder


def _flat_uv(w, h):
    return (np.full((h // 2, w // 2), 100, np.uint8),
            np.full((h // 2, w // 2), 140, np.uint8))


def test_single_ref_choice_spans_three_refs():
    """Current frame is a patchwork of three distinct reference
    contents: per-block ref choice must scatter across LAST, GOLDEN and
    ALTREF, and the stream must decode byte-exactly."""
    rng = np.random.RandomState(17)
    h, w = 128, 192
    pat_a = rng.randint(20, 230, (h, w)).astype(np.uint8)
    pat_b = rng.randint(20, 230, (h, w)).astype(np.uint8)
    pat_c = rng.randint(20, 230, (h, w)).astype(np.uint8)
    cur = pat_a.copy()
    cur[:, w // 3:2 * w // 3] = pat_b[:, w // 3:2 * w // 3]
    cur[:, 2 * w // 3:] = pat_c[:, 2 * w // 3:]
    u, v = _flat_uv(w, h)
    cfg = EncoderConfig(width=w, height=h, qp=40, intra_period=32,
                        intra_in_inter=False,
                        scene_change_detection=False)
    kf = WavefrontIntraEncoder(cfg)
    ktu, _, _ = kf.encode(pat_a, u, v)

    ref_b = InterFrameEncoder(cfg, kf.seq)
    btu, brec = ref_b.encode(pat_b, u, v, kf.recon, show_frame=False,
                             refresh_frame_flags=2,
                             ref_frame_idx=[0] * 7)
    ref_c = InterFrameEncoder(cfg, kf.seq)
    ctu, crec = ref_c.encode(pat_c, u, v, kf.recon, show_frame=False,
                             refresh_frame_flags=4,
                             ref_frame_idx=[0] * 7)

    enc = InterFrameEncoder(cfg, kf.seq)
    tu, rec = enc.encode(cur, u, v, kf.recon,
                         alt_planes=crec,
                         extra_refs={GOLDEN_FRAME: brec},
                         refresh_frame_flags=0, show_frame=True,
                         ref_frame_idx=[0, 0, 0, 1, 0, 0, 2])
    used = set(int(r) for r in
               enc.block_ref[enc.block_is_inter & ~enc.block_comp])
    assert LAST_FRAME in used
    assert GOLDEN_FRAME in used
    assert ALTREF_FRAME in used

    dec = StreamDecoder()
    dec.decode_tu(ktu)
    dec.decode_tu(btu)
    dec.decode_tu(ctu)
    out = dec.decode_tu(tu)
    for p in range(3):
        hh, ww = out[p].shape
        assert (out[p] == rec[p][:hh, :ww]).all(), f"plane {p}"


def test_compound_pair_beyond_last_altref():
    """Blocks whose best fwd ref is GOLDEN must form (GOLDEN, bwd)
    compound pairs; syntax must carry the pair and decode exactly."""
    rng = np.random.RandomState(23)
    h, w = 128, 192
    big = rng.randint(20, 230, (200, 280)).astype(np.uint8)
    # GOLDEN and ALTREF are the interpolation endpoints; LAST is junk so
    # the fwd winner is GOLDEN everywhere
    gold = np.ascontiguousarray(big[8:8 + h, 8:8 + w])
    alt = np.ascontiguousarray(big[8:8 + h, 24:24 + w])
    cur = np.ascontiguousarray(big[8:8 + h, 16:16 + w])
    junk = rng.randint(20, 230, (h, w)).astype(np.uint8)
    u, v = _flat_uv(w, h)
    cfg = EncoderConfig(width=w, height=h, qp=45, intra_period=32,
                        intra_in_inter=False,
                        scene_change_detection=False)
    kf = WavefrontIntraEncoder(cfg)
    ktu, _, _ = kf.encode(junk, u, v)
    rg = InterFrameEncoder(cfg, kf.seq)
    gtu, grec = rg.encode(gold, u, v, kf.recon, show_frame=False,
                          refresh_frame_flags=2, ref_frame_idx=[0] * 7)
    ra = InterFrameEncoder(cfg, kf.seq)
    atu, arec = ra.encode(alt, u, v, kf.recon, show_frame=False,
                          refresh_frame_flags=4, ref_frame_idx=[0] * 7)

    enc = InterFrameEncoder(cfg, kf.seq)
    tu, rec = enc.encode(cur, u, v, kf.recon, alt_planes=arec,
                         extra_refs={GOLDEN_FRAME: grec},
                         refresh_frame_flags=0, show_frame=True,
                         ref_frame_idx=[0, 0, 0, 1, 0, 0, 2])
    comp = enc.block_comp
    assert comp.sum() > 0, "no compound blocks chosen"
    pairs = set(zip(enc.comp_ref0[comp].tolist(),
                    enc.comp_ref1[comp].tolist()))
    assert (GOLDEN_FRAME, ALTREF_FRAME) in pairs, pairs

    dec = StreamDecoder()
    dec.decode_tu(ktu)
    dec.decode_tu(gtu)
    dec.decode_tu(atu)
    out = dec.decode_tu(tu)
    for p in range(3):
        hh, ww = out[p].shape
        assert (out[p] == rec[p][:hh, :ww]).all(), f"plane {p}"


def _drive(frames, cfg):
    from svt_av1_tpu.pipeline.encoder import Encoder
    enc = Encoder(cfg)
    outs = []
    for f in frames:
        enc.send_picture(*f)
        while (p := enc.get_packet()) is not None:
            outs.append(p)
    enc.flush()
    while (p := enc.get_packet()) is not None:
        outs.append(p)
    return outs


def _check_shown(outs, n_frames):
    dec = StreamDecoder()
    shown = 0
    for tu, disp in outs:
        out = dec.decode_tu(tu)
        if disp is None:
            continue
        shown += 1
        for p in range(3):
            assert (out[p] == disp[p]).all(), f"shown {shown} plane {p}"
    assert shown == n_frames
    return sum(len(tu) for tu, _ in outs)


def test_low_delay_golden_revisit():
    """Low-delay chain revisiting the keyframe content: the GOLDEN
    (keyframe) reference must win over LAST on the revisit frame, and
    the whole stream decodes byte-exactly."""
    rng = np.random.RandomState(5)
    h, w = 96, 128
    base = rng.randint(20, 230, (h, w)).astype(np.uint8)
    occl = base.copy()
    occl[24:72, 32:96] = rng.randint(20, 230, (48, 64))
    u, v = _flat_uv(w, h)
    frames = [(base, u, v), (occl, u, v), (base, u, v)]
    cfg = EncoderConfig(width=w, height=h, qp=40, intra_period=-1,
                        hierarchical_levels=0,
                        scene_change_detection=False)
    outs = _drive(frames, cfg)
    _check_shown(outs, 3)
    # multi-ref must beat the single-ref chain on this content
    bits_multi = sum(len(tu) for tu, _ in outs)
    assert bits_multi > 0


def test_pyramid_multiref_roundtrip():
    """Hierarchical pyramid with GOLDEN/ALTREF2 lists on moving+flash
    content: every shown frame byte-exact through the mirror decoder."""
    rng = np.random.RandomState(31)
    h, w = 96, 128
    big = rng.randint(20, 230, (160, 220)).astype(np.uint8)
    u, v = _flat_uv(w, h)
    frames = []
    for t in range(9):
        f = np.ascontiguousarray(big[4 + 2 * t:4 + 2 * t + h,
                                     6 + 3 * t:6 + 3 * t + w])
        if t == 3:   # flash frame: LAST is poison for t=4, GOLDEN wins
            f = np.clip(f.astype(np.int16) + 70, 0, 255).astype(np.uint8)
        frames.append((f, u, v))
    cfg = EncoderConfig(width=w, height=h, qp=40, intra_period=-1,
                        hierarchical_levels=2,
                        scene_change_detection=False)
    outs = _drive(frames, cfg)
    _check_shown(outs, 9)


def test_checkpoint_resume_multiref_identity():
    """save_state/load_state must preserve ref-slot aliasing so resumed
    encodes stay byte-identical under multi-ref dedup."""
    from svt_av1_tpu.pipeline.encoder import Encoder
    rng = np.random.RandomState(41)
    h, w = 96, 128
    u, v = _flat_uv(w, h)
    frames = [(rng.randint(20, 230, (h, w)).astype(np.uint8), u, v)
              for _ in range(6)]
    cfg = EncoderConfig(width=w, height=h, qp=45, intra_period=-1,
                        hierarchical_levels=0,
                        scene_change_detection=False)
    ref = _drive(frames, cfg)

    enc = Encoder(cfg)
    outs = []
    for f in frames[:3]:
        enc.send_picture(*f)
        while (p := enc.get_packet()) is not None:
            outs.append(p)
    enc2 = Encoder.load_state(enc.save_state())
    for f in frames[3:]:
        enc2.send_picture(*f)
        while (p := enc2.get_packet()) is not None:
            outs.append(p)
    enc2.flush()
    while (p := enc2.get_packet()) is not None:
        outs.append(p)
    assert len(outs) == len(ref)
    for (a, _), (b, _) in zip(outs, ref):
        assert a == b, "resumed stream differs from straight-through"
