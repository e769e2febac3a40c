"""Spec-derived golden tests for uncompressed frame header bits.

These expectations are hand-derived from AV1 spec 5.9.2 pseudo-code (NOT
from the writer code), so a shared encoder/decoder misreading of header
syntax — invisible to the roundtrip suite — fails here. This guards the
class of bug where both the writer and the mirror parser agreed on wrong
syntax (e.g. emitting frame_size_with_refs() when error_resilient forces
the frame_size()+render_size() path).
"""

import numpy as np

from svt_av1_tpu.bitstream import obu
from svt_av1_tpu.bitstream.bitio import BitWriter


def _pack_bits(bits: str) -> bytes:
    """Independent MSB-first bit packer (test-local on purpose)."""
    bits = bits.replace(" ", "")
    out = bytearray()
    for i in range(0, len(bits), 8):
        chunk = bits[i:i + 8].ljust(8, "0")
        out.append(int(chunk, 2))
    return bytes(out)


def _header_bytes(seq, fh) -> bytes:
    w = BitWriter()
    obu._write_uncompressed_header(w, seq, fh)
    w.byte_align()
    return w.data()


def _seq_64():
    return obu.SequenceHeader(width=64, height=64)


def test_key_frame_header_bits():
    # spec 5.9.2 walk for KEY+show, no order hint/cdef/lr/grain, q=40:
    bits = (
        "0"        # show_existing_frame
        "00"       # frame_type = KEY
        "1"        # show_frame
        # error_resilient_mode: implied 1 for KEY+show, NOT coded
        "0"        # disable_cdf_update
        # allow_screen_content_tools: seq_force==0, not coded
        "0"        # frame_size_override_flag
        # order_hint: OrderHintBits==0 -> none
        # primary_ref_frame: FrameIsIntra -> not coded
        # refresh_frame_flags: KEY+show -> allFrames, not coded
        # frame_size(): override==0 -> from sequence header, no bits
        "0"        # render_and_frame_size_different
        # allow_intrabc: allow_screen_content_tools==0 -> not coded
        "1"        # disable_frame_end_update_cdf (cfg default True)
        "1"        # tile_info: uniform_tile_spacing (1x1 SB: no more bits)
        "00101000"  # base_q_idx = 40
        "0" "0" "0"  # DeltaQ Y dc / U dc / U ac
        "0"        # using_qmatrix
        "0"        # segmentation_enabled
        "0"        # delta_q_present
        "000000" "000000"  # loop filter levels 0, 0 (no lvl[2]/[3])
        "000"      # sharpness
        "0"        # loop_filter_delta_enabled
        "0"        # tx_mode_select (TX_MODE_LARGEST)
        # frame_reference_mode: intra -> not coded
        # skip_mode_params/allow_warped: no bits
        "0"        # reduced_tx_set
        # global motion / film grain: intra, grain off -> no bits
    )
    fh = obu.FrameHeader(frame_type=obu.KEY_FRAME, base_q_idx=40)
    assert _header_bytes(_seq_64(), fh) == _pack_bits(bits)


def test_inter_frame_header_bits():
    # INTER frame, error_resilient=1, override=0: spec 5.9.2 takes
    # frame_size() + render_size(), NOT frame_size_with_refs() — one
    # render_and_frame_size_different bit, value 0.
    bits = (
        "0"        # show_existing_frame
        "01"       # frame_type = INTER
        "1"        # show_frame
        "1"        # error_resilient_mode
        "0"        # disable_cdf_update
        "0"        # frame_size_override_flag
        # primary_ref_frame: error_resilient -> PRIMARY_REF_NONE, no bits
        "00000010"  # refresh_frame_flags = 0x02
        + "000" * 6 + "001"  # ref_frame_idx: LAST..ALTREF2 slot0, ALT slot1
        # !override || error_resilient -> frame_size() + render_size():
        + "0"      # render_and_frame_size_different
        "0"        # allow_high_precision_mv
        "0"        # is_filter_switchable
        "00"       # interpolation_filter = EIGHTTAP_REGULAR
        "0"        # is_motion_mode_switchable
        # use_ref_frame_mvs: error_resilient -> 0, not coded
        "1"        # disable_frame_end_update_cdf
        "1"        # tile_info uniform
        "00101000"  # base_q_idx = 40
        "0" "0" "0" "0" "0"  # deltaQ dc/ac, qmatrix, segmentation
        "0"        # delta_q_present
        "000000" "000000" "000" "0"  # loop filter
        "0"        # tx_mode_select
        "0"        # reference_select
        "0"        # reduced_tx_set
        + "0" * 7  # global motion: is_global == 0 for all 7 refs
    )
    fh = obu.FrameHeader(frame_type=obu.INTER_FRAME, base_q_idx=40,
                         refresh_frame_flags=0x02,
                         ref_frame_idx=(0, 0, 0, 0, 0, 0, 1))
    assert _header_bytes(_seq_64(), fh) == _pack_bits(bits)


def test_inter_header_roundtrip_after_fix():
    """Full OBU_FRAME roundtrip still parses with the corrected syntax."""
    seq = _seq_64()
    fh = obu.FrameHeader(frame_type=obu.INTER_FRAME, base_q_idx=64,
                         refresh_frame_flags=0x01)
    payload = obu.write_frame_obu(seq, fh, [b"\x00" * 4])
    # strip OBU framing: header byte + uleb size
    assert payload[0] >> 3 == obu.OBU_FRAME
    from svt_av1_tpu.bitstream.bitio import read_uleb128
    size, off = read_uleb128(payload, 1)
    fh2, tiles = obu.parse_frame_obu(payload[off:off + size], seq)
    assert fh2.frame_type == obu.INTER_FRAME
    assert fh2.base_q_idx == 64
    assert fh2.refresh_frame_flags == 0x01
    assert tiles == [b"\x00" * 4]


def test_inter_frame_header_bits_primary_ref_carry():
    # INTER frame, error_resilient=0 (forward CDF carry): spec 5.9.2
    # codes primary_ref_frame f(3) right after order_hint, and
    # disable_frame_end_update_cdf=0 so frame-end CDFs are saved.
    bits = (
        "0"        # show_existing_frame
        "01"       # frame_type = INTER
        "1"        # show_frame
        "0"        # error_resilient_mode = 0
        "0"        # disable_cdf_update
        "0"        # frame_size_override_flag
        # order_hint: OrderHintBits==0 -> none
        "000"      # primary_ref_frame = 0 (LAST)
        "00000010"  # refresh_frame_flags = 0x02
        + "000" * 6 + "001"  # ref_frame_idx
        # !override -> frame_size() + render_size():
        + "0"      # render_and_frame_size_different
        "0"        # allow_high_precision_mv
        "0"        # is_filter_switchable
        "00"       # interpolation_filter = EIGHTTAP_REGULAR
        "0"        # is_motion_mode_switchable
        # use_ref_frame_mvs: seq enable_ref_frame_mvs==0 -> not coded
        "0"        # disable_frame_end_update_cdf = 0 (save adapted CDFs)
        "1"        # tile_info uniform
        "00101000"  # base_q_idx = 40
        "0" "0" "0" "0" "0"  # deltaQ dc/ac, qmatrix, segmentation
        "0"        # delta_q_present
        "000000" "000000" "000" "0"  # loop filter
        "0"        # tx_mode_select
        "0"        # reference_select
        "0"        # reduced_tx_set
        + "0" * 7  # global motion: is_global == 0 for all 7 refs
    )
    fh = obu.FrameHeader(frame_type=obu.INTER_FRAME, base_q_idx=40,
                         error_resilient=False, primary_ref_frame=0,
                         disable_frame_end_update_cdf=False,
                         refresh_frame_flags=0x02,
                         ref_frame_idx=(0, 0, 0, 0, 0, 0, 1))
    assert _header_bytes(_seq_64(), fh) == _pack_bits(bits)


def test_gm_param_prev_prediction_roundtrip():
    """gm params delta-code against the primary ref's saved params
    (spec 5.9.24 read_global_param with PrevGmParams)."""
    seq = _seq_64()
    prev = ((4, -6),) + ((0, 0),) * 6
    fh = obu.FrameHeader(frame_type=obu.INTER_FRAME, base_q_idx=40,
                         error_resilient=False, primary_ref_frame=0,
                         disable_frame_end_update_cdf=False,
                         refresh_frame_flags=0x02,
                         gm_trans=((4, -8),) + ((0, 0),) * 6,
                         prev_gm_trans=prev,
                         ref_frame_idx=(2, 0, 0, 0, 0, 0, 1))
    payload = obu.write_frame_obu(seq, fh, [b"\x00" * 4])
    from svt_av1_tpu.bitstream.bitio import read_uleb128
    size, off = read_uleb128(payload, 1)
    slot_gm = [((0, 0),) * 7] * 8
    slot_gm[2] = prev   # slot of ref_frame_idx[primary_ref_frame=0] = 2
    fh2, _ = obu.parse_frame_obu(payload[off:off + size], seq,
                                 slot_gm=slot_gm)
    assert fh2.primary_ref_frame == 0
    assert fh2.gm_trans == fh.gm_trans
    # without the prev store the delta decodes to the wrong absolute
    fh3, _ = obu.parse_frame_obu(payload[off:off + size], seq)
    assert fh3.gm_trans != fh.gm_trans


def test_inter_header_bits_order_hints_tmvp():
    # INTER frame with order hints on (bits=7), enable_ref_frame_mvs,
    # reference_select and a fwd/bwd hint pair: spec 5.9.2 codes
    # order_hint f(7), frame_refs_short_signaling, use_ref_frame_mvs,
    # and skip_mode_params' skip_mode_present bit (5.9.22).
    bits = (
        "0"        # show_existing_frame
        "01"       # frame_type = INTER
        "1"        # show_frame
        "0"        # error_resilient_mode
        "0"        # disable_cdf_update
        "0"        # frame_size_override_flag
        "0000101"  # order_hint = 5 (OrderHintBits = 7)
        "000"      # primary_ref_frame = 0
        "00000010"  # refresh_frame_flags = 0x02
        # error_resilient==0 -> no ref_order_hint loop
        "0"        # frame_refs_short_signaling
        + "000" * 6 + "001"  # ref_frame_idx: LAST..ALTREF2 slot0, ALT slot1
        + "0"      # render_and_frame_size_different
        "0"        # allow_high_precision_mv
        "0"        # is_filter_switchable
        "00"       # interpolation_filter = EIGHTTAP_REGULAR
        "0"        # is_motion_mode_switchable
        "1"        # use_ref_frame_mvs (coded: !resilient && seq enable)
        "0"        # disable_frame_end_update_cdf
        "1"        # tile_info uniform
        "00101000"  # base_q_idx = 40
        "0" "0" "0" "0" "0"  # deltaQ dc/ac, qmatrix, segmentation
        "0"        # delta_q_present
        "000000" "000000" "000" "0"  # loop filter
        "0"        # tx_mode_select
        "1"        # reference_select
        # skip_mode_params: LAST hint 3 (past of 5), ALT hint 8 (future)
        # -> skipModeAllowed = 1 -> one bit:
        "0"        # skip_mode_present
        "0"        # reduced_tx_set
        + "0" * 7  # global motion: is_global == 0 for all 7 refs
    )
    seq = obu.SequenceHeader(width=64, height=64, enable_order_hint=True,
                             order_hint_bits=7, enable_ref_frame_mvs=True)
    fh = obu.FrameHeader(frame_type=obu.INTER_FRAME, base_q_idx=40,
                         error_resilient=False, primary_ref_frame=0,
                         order_hint=5, use_ref_frame_mvs=True,
                         refresh_frame_flags=0x02,
                         ref_frame_idx=(0, 0, 0, 0, 0, 0, 1),
                         ref_order_hints=(3, 8, 0, 0, 0, 0, 0, 0),
                         reference_select=True,
                         disable_frame_end_update_cdf=False)
    assert _header_bytes(seq, fh) == _pack_bits(bits)
