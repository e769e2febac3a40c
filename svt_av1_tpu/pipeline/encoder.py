"""Top-level encoder: GOP structure + reference management + streaming API.

The framework's equivalent of the reference's public lifecycle
(``EbApi.h:505-592``: eb_init_handle → set_parameter → init_encoder →
send_picture → get_packet): an ``Encoder`` accepts frames in display order
and yields temporal units. Low-delay GOP for now (KEY + P chain, intra
period per config); hierarchical-B lands with the RA rounds.
"""

from __future__ import annotations

import io
from typing import Iterable, List, Optional, Tuple

import numpy as np

from svt_av1_tpu.bitstream import obu
from svt_av1_tpu.bitstream.ivf import write_ivf_frame, write_ivf_header
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import common
from svt_av1_tpu.pipeline.inter import InterFrameEncoder
from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder


class Encoder:
    """Streaming encoder: send_picture / get_packet semantics."""

    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        self.seq = obu.SequenceHeader(width=cfg.width, height=cfg.height,
                                      bit_depth=cfg.bit_depth)
        self._ref = None          # padded recon planes of the last frame
        self._frame_idx = 0
        self._packets: List[bytes] = []
        self._recons: List[list] = []
        self._rc = None
        from svt_av1_tpu.config import RateControlMode
        if cfg.rate_control_mode == RateControlMode.VBR \
                and cfg.target_bit_rate > 0:
            from svt_av1_tpu.pipeline.rc import RateControl
            self._rc = RateControl(cfg.target_bit_rate,
                                   cfg.frame_rate_num / cfg.frame_rate_den,
                                   cfg.intra_period,
                                   start_qindex=cfg.base_q_idx)

    def _is_key(self) -> bool:
        period = self.cfg.intra_period
        if self._frame_idx == 0:
            return True
        if period < 0:
            return False
        if period == 0:
            return True
        return self._frame_idx % (period + 1) == 0

    def send_picture(self, y: np.ndarray, u: np.ndarray,
                     v: np.ndarray) -> None:
        cfg = self.cfg
        is_key = self._is_key()
        if self._rc is not None:
            import dataclasses
            cfg = dataclasses.replace(
                cfg, qindex_override=self._rc.frame_qindex(is_key))
        if is_key:
            enc = WavefrontIntraEncoder(cfg)
            tu, recon, _ = enc.encode(y, u, v)
            self._ref = enc.recon          # padded planes
        else:
            enc = InterFrameEncoder(cfg, self.seq)
            tu, padded = enc.encode(y, u, v, self._ref)
            self._ref = padded
            recon = [padded[0][:cfg.height, :cfg.width],
                     padded[1][:(cfg.height + 1) // 2,
                               :(cfg.width + 1) // 2],
                     padded[2][:(cfg.height + 1) // 2,
                               :(cfg.width + 1) // 2]]
        if self._rc is not None:
            self._rc.update(len(tu) * 8, is_key)
        self._packets.append(tu)
        self._recons.append(recon)
        self._frame_idx += 1

    def get_packet(self) -> Optional[Tuple[bytes, list]]:
        if not self._packets:
            return None
        return self._packets.pop(0), self._recons.pop(0)


def encode_ivf(frames: Iterable[tuple], cfg: EncoderConfig) -> bytes:
    """Encode an iterable of (y, u, v) frames to an IVF byte stream."""
    enc = Encoder(cfg)
    buf = io.BytesIO()
    frames = list(frames)
    write_ivf_header(buf, cfg.width, cfg.height, cfg.frame_rate_num,
                     cfg.frame_rate_den, len(frames))
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v)
        tu, _ = enc.get_packet()
        write_ivf_frame(buf, tu, i)
    return buf.getvalue()
