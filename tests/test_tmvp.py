"""Temporal MV prediction tests (spec 7.9 + the add_tpl_ref_mv stack
integration). The reference v0.4.0 stubs TMVP out, so correctness is
anchored on spec math (projection identities) and on stream-level
invariants (decode exactness, parallel-GOP identity, bit savings on
steady motion)."""

import io

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import mvp, tmvp
from svt_av1_tpu.pipeline.decode import decode_ivf
from svt_av1_tpu.pipeline.encoder import encode_ivf
from tests.test_intra_e2e import synth_frame


def test_mv_projection_math():
    # num == den -> identity (up to the divider rounding)
    assert tmvp.mv_projection((64, -64), 2, 2) == (64, -64)
    # half the distance -> half the MV, sign-symmetric rounding
    assert tmvp.mv_projection((64, -64), 1, 2) == (32, -32)
    assert tmvp.mv_projection((7, -7), 1, 2) == (4, -4)  # round away? no:
    # 7*1*8192 = 57344; (57344+8192)>>14 = 4; negative mirrors to -4
    # negative num flips direction
    assert tmvp.mv_projection((64, 0), -1, 2) == (-32, 0)


def test_lower_precision_evens():
    assert tmvp.lower_precision((5, -5)) == (4, -4)
    assert tmvp.lower_precision((4, -4)) == (4, -4)
    assert tmvp.lower_precision((1, -1)) == (0, 0)


def test_relative_dist_wraps():
    g = tmvp.get_relative_dist
    assert g(5, 3, 7) == 2
    assert g(3, 5, 7) == -2
    assert g(1, 126, 7) == 3      # wrap-around forward
    assert g(126, 1, 7) == -3


def test_temporal_candidate_enters_stack():
    """A projected co-located MV lands in an otherwise-empty stack and
    clears the zeromv context bit when it is close to gm."""
    st = mvp.MvpState(16, 16)
    rows8 = (16 + 1) >> 1
    tpl = np.zeros((rows8 + 9, rows8 + 9, 3), dtype=np.int32)
    tpl[4, 4] = (40, -24, 2)      # saved MV, ref_frame_offset 2
    st.tpl = tpl
    st.rel_dist = [0, 1, 0, 0, 0, 0, 0, -1]   # LAST one frame back
    # block at mi (8, 8) -> 8x8 cell (4, 4)
    res = mvp.find_mv_stack(st, 8, 8, 2, mvp.LAST_FRAME)
    # projection: 40 * 1/2 -> 20, -24 * 1/2 -> -12 (already even)
    assert (20, -12) in [e[0] for e in res.stack]
    assert res.zeromv_ctx == 1    # far from gm (0,0) -> bit set

    # near-gm projection keeps the bit clear
    st2 = mvp.MvpState(16, 16)
    tpl2 = np.zeros_like(tpl)
    tpl2[4, 4] = (8, 8, 2)        # projects to (4, 4): |.| < 16
    st2.tpl = tpl2
    st2.rel_dist = st.rel_dist
    res2 = mvp.find_mv_stack(st2, 8, 8, 2, mvp.LAST_FRAME)
    assert res2.zeromv_ctx == 0


def test_missing_center_sets_zeromv_ctx():
    st = mvp.MvpState(16, 16)
    st.tpl = np.zeros((18, 18, 3), dtype=np.int32)   # all invalid
    st.rel_dist = [0] * 8
    res = mvp.find_mv_stack(st, 8, 8, 2, mvp.LAST_FRAME)
    assert res.zeromv_ctx == 1


def _clip(w, h, n):
    fr = []
    for i in range(n):
        y, u, v = synth_frame(w, h, seed=1)
        fr.append((np.roll(np.roll(y, 4 * i, axis=1), 2 * i, axis=0),
                   np.roll(u, 2 * i, axis=1), np.roll(v, 2 * i, axis=1)))
    return fr


def test_tmvp_stream_decodes_and_saves_bits():
    import dataclasses
    frames = _clip(192, 128, 10)
    cfg = EncoderConfig(width=192, height=128, qp=40,
                        hierarchical_levels=3, intra_period=16,
                        fixed_partition_size=None)
    on = encode_ivf(frames, cfg)
    off = encode_ivf(frames, dataclasses.replace(cfg, enable_tmvp=False))
    assert len(decode_ivf(io.BytesIO(on))) == 10
    assert len(decode_ivf(io.BytesIO(off))) == 10
    # steady pan: temporal candidates must not cost bits overall
    assert len(on) <= len(off)


def test_motion_field_save_rules():
    """Only past-pointing MVs are stored; the second listed ref wins;
    huge MVs are dropped (spec 7.19)."""
    st = mvp.MvpState(4, 4)
    st.set_block(0, 0, 2, mvp.LAST_FRAME, (10, 12), mvp.NEARESTMV, h4=2)
    st.set_block(0, 2, 2, mvp.ALTREF_FRAME, (6, 6), mvp.NEARESTMV, h4=2)
    st.set_block(2, 0, 2, mvp.LAST_FRAME, (9000, 0), mvp.NEARESTMV,
                 h4=2)  # over REFMVS_LIMIT
    st.set_block(2, 2, 2, mvp.LAST_FRAME, (2, 2), mvp.NEARESTMV,
                 ref1=mvp.ALTREF_FRAME, mv1=(4, 4), h4=2)
    rel = [0] * 8
    rel[mvp.LAST_FRAME] = -1      # past
    rel[mvp.ALTREF_FRAME] = 2     # future
    ref8, mv8 = tmvp.save_motion_field(st, rel)
    assert ref8[0, 0] == mvp.LAST_FRAME and tuple(mv8[0, 0]) == (10, 12)
    assert ref8[0, 1] == -1                      # future ref not stored
    assert ref8[1, 0] == -1                      # magnitude cap
    assert ref8[1, 1] == mvp.LAST_FRAME          # compound: ref1 is
    assert tuple(mv8[1, 1]) == (2, 2)            # future -> ref0 stored


def test_field_from_decisions_matches_syntax_walk():
    """The post-compute motion-field extraction (what lets compute run
    ahead of host entropy) must equal the MvpState the syntax walk
    builds — same mi maps, same saved field."""
    import numpy as np
    from svt_av1_tpu.bitstream import obu
    from svt_av1_tpu.pipeline.inter import InterFrameEncoder

    rng = np.random.default_rng(7)
    w, h = 128, 96
    base = rng.integers(0, 255, (h + 32, w + 32)).astype(np.uint8)
    f0 = (base[:h, :w], np.full(((h + 1) // 2, (w + 1) // 2), 128,
                                np.uint8),
          np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint8))
    f1 = (base[3:3 + h, 2:2 + w], f0[1], f0[2])
    cfg = EncoderConfig(width=w, height=h, qp=40,
                        fixed_partition_size=None)
    seq = obu.SequenceHeader(width=w, height=h,
                             **obu.order_hint_fields(True))
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder
    kenc = WavefrontIntraEncoder(cfg)
    kenc.order_hint = 0
    kenc.encode(*f0)
    enc = InterFrameEncoder(cfg, seq)
    enc.encode_compute(*f1, kenc.recon)
    st_dec = tmvp.field_state_from_decisions(enc)
    enc.encode_syntax(kenc.final_entropy, ((0, 0),) * 7)
    st_syn = enc.mvp_state
    np.testing.assert_array_equal(st_dec.ref, st_syn.ref)
    np.testing.assert_array_equal(st_dec.ref1, st_syn.ref1)
    np.testing.assert_array_equal(st_dec.mv, st_syn.mv)
    np.testing.assert_array_equal(st_dec.mv1, st_syn.mv1)
    rel = [0, -1, 0, 0, 0, 0, 0, 2]
    a = tmvp.save_motion_field(st_dec, rel)
    b = tmvp.save_motion_field(st_syn, rel)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
