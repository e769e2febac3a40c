"""Reference-shaped API lifecycle (EbApi.h port: svt_av1_tpu.api)."""

import numpy as np

from svt_av1_tpu import api
from svt_av1_tpu.pipeline.decode import StreamDecoder


def test_eb_api_lifecycle():
    handle, params = api.eb_init_handle()
    params.width, params.height, params.qp = 128, 96, 40
    params.intra_period = 4
    assert api.eb_svt_enc_set_parameter(handle, params) == api.EB_ErrorNone
    assert api.eb_init_encoder(handle) == api.EB_ErrorNone
    hdr = api.eb_svt_enc_stream_header(handle)
    assert len(hdr.p_buffer) > 0
    rng = np.random.RandomState(5)
    base = rng.randint(40, 200, (96, 128)).astype(np.int32)
    frames = []
    for t in range(4):
        y = np.clip(base + 2 * t, 0, 255).astype(np.uint8)
        u = np.full((48, 64), 100, np.uint8)
        v = np.full((48, 64), 140, np.uint8)
        frames.append((y, u, v))
        assert api.eb_svt_enc_send_picture(
            handle, api.EbBufferHeaderType(pic=(y, u, v))) \
            == api.EB_ErrorNone
    api.eb_svt_enc_send_picture(handle, None)   # EOS
    dec = StreamDecoder()
    shown = 0
    saw_eos = False
    while True:
        buf = api.eb_svt_get_packet(handle, done=True)
        if buf is None:
            break
        out = dec.decode_tu(buf.p_buffer)
        if buf.recon is not None:
            shown += 1
            for p in range(3):
                assert (out[p] == buf.recon[p]).all()
        if buf.flags & api.EB_BUFFERFLAG_EOS:
            saw_eos = True
        api.eb_svt_release_out_buffer(buf)
    assert shown == len(frames)
    assert saw_eos
    assert api.eb_deinit_encoder(handle) == api.EB_ErrorNone
    assert api.eb_deinit_handle(handle) == api.EB_ErrorNone


def test_eb_api_bad_params():
    handle, params = api.eb_init_handle()
    params.width = 3   # invalid
    assert api.eb_svt_enc_set_parameter(handle, params) \
        == api.EB_ErrorBadParameter


def test_encode_ivf_frame_count_backpatched():
    """The IVF header's frame-count field must equal the number of frame
    packets actually written (back-patched at EOS like the reference app)."""
    import io
    import struct

    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import decode_ivf
    from svt_av1_tpu.pipeline.encoder import encode_ivf

    rng = np.random.RandomState(11)
    frames = []
    for t in range(3):
        y = rng.randint(0, 256, (64, 96)).astype(np.uint8)
        u = rng.randint(0, 256, (32, 48)).astype(np.uint8)
        v = rng.randint(0, 256, (32, 48)).astype(np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(width=96, height=64, qp=45, intra_period=16,
                        scene_change_detection=False)
    data = encode_ivf(frames, cfg)
    count = struct.unpack("<I", data[24:28])[0]
    outs = decode_ivf(io.BytesIO(data))
    assert count == 3
    assert len(outs) == 3


def test_color_config_and_qp_clamps():
    """CICP color description rides the sequence header's color_config
    (spec 5.5.2) and min/max-qp clamps bound per-frame qindex choices
    (reference min_qp_allowed/max_qp_allowed)."""
    import numpy as np
    from svt_av1_tpu.bitstream import obu
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.decode import StreamDecoder
    from svt_av1_tpu.pipeline.encoder import Encoder

    cfg = EncoderConfig(width=128, height=96, qp=40,
                        color_primaries=9,           # BT.2020
                        transfer_characteristics=16,  # PQ
                        matrix_coefficients=9, color_range=1,
                        min_qp_allowed=35, max_qp_allowed=45)
    enc = Encoder(cfg)
    rng = np.random.default_rng(5)
    enc.send_picture(rng.integers(0, 255, (96, 128), dtype=np.uint8),
                     np.full((48, 64), 128, np.uint8),
                     np.full((48, 64), 128, np.uint8))
    tu, disp = enc.get_packet()
    dec = StreamDecoder()
    out = dec.decode_tu(tu)
    for p in range(3):
        assert (out[p] == disp[p]).all()
    assert dec.seq.color_primaries == 9
    assert dec.seq.transfer_characteristics == 16
    assert dec.seq.matrix_coefficients == 9
    assert dec.seq.color_range == 1
    # qp scaling would pick qindex ~70 for the key frame at qp 40;
    # min_qp_allowed=35 clamps it to >= 140
    eff = enc._cfg_for(True).base_q_idx
    assert eff == 140, eff
