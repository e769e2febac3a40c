"""Symbol writer: range encoder + CDF adaptation (aom_write_symbol semantics).

Reference behavior: ``EbBitstreamUnit.h:260-295`` (aom_write / aom_write_symbol
update the CDF after coding unless update is disabled).
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.entropy.range_coder import RangeEncoder, update_cdf


class SymbolWriter:
    def __init__(self, disable_cdf_update: bool = False):
        self.ec = RangeEncoder()
        self.disable_cdf_update = disable_cdf_update

    def write_symbol(self, symbol: int, cdf: np.ndarray, nsyms: int) -> None:
        """cdf is a mutable view with nsyms+1 entries (last = counter)."""
        self.ec.encode_symbol(symbol, cdf, nsyms)
        if not self.disable_cdf_update:
            update_cdf(cdf, symbol, nsyms)

    def write_bit(self, bit: int) -> None:
        """Raw bit at probability 1/2 (aom_write_bit)."""
        self.ec.encode_bool(bit, 16384)

    def write_literal(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    def done(self) -> bytes:
        return self.ec.done()


class SymbolReader:
    """Mirror decoder twin of SymbolWriter."""

    def __init__(self, data: bytes, disable_cdf_update: bool = False):
        from svt_av1_tpu.entropy.range_coder import RangeDecoder
        self.ec = RangeDecoder(data)
        self.disable_cdf_update = disable_cdf_update

    def read_symbol(self, cdf: np.ndarray, nsyms: int) -> int:
        s = self.ec.decode_symbol(cdf, nsyms)
        if not self.disable_cdf_update:
            update_cdf(cdf, s, nsyms)
        return s

    def read_bit(self) -> int:
        return self.ec.decode_bool(16384)

    def read_literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v
