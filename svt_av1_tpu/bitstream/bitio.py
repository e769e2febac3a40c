"""Bit-level writers/readers for uncompressed AV1 header syntax.

AV1 OBU headers and the uncompressed frame header are plain MSB-first bit
packing (reference behavior: ``EbEntropyCoding.c:1647-1721`` aom_wb_write_*),
independent of the arithmetic coder.
"""

from __future__ import annotations


class BitWriter:
    """MSB-first bit writer (f(n) descriptor of the AV1 spec)."""

    def __init__(self):
        self._bytes = bytearray()
        self._bitpos = 0  # bits already written into the last byte (0..7)

    def write_bit(self, bit: int) -> None:
        if self._bitpos == 0:
            self._bytes.append(0)
        if bit & 1:
            self._bytes[-1] |= 0x80 >> self._bitpos
        self._bitpos = (self._bitpos + 1) & 7

    def write(self, value: int, nbits: int) -> None:
        """f(nbits): write ``value`` MSB first."""
        assert nbits >= 0 and 0 <= value < (1 << nbits) if nbits else value == 0
        for i in range(nbits - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    # alias so entropy-layer subexp primitives can ride raw header bits
    def write_literal(self, value: int, nbits: int) -> None:
        self.write(value, nbits)

    def write_uvlc(self, value: int) -> None:
        """uvlc(): Exp-Golomb, spec 4.10.3."""
        v = value + 1
        n = v.bit_length()
        self.write(0, n - 1)
        self.write(v, n)

    def write_su(self, value: int, nbits: int) -> None:
        """su(nbits): signed, two's complement in nbits."""
        self.write(value & ((1 << nbits) - 1), nbits)

    def byte_align(self) -> None:
        while self._bitpos != 0:
            self.write_bit(0)

    def trailing_bits(self) -> None:
        """trailing_bits(): a 1 then zeros to byte alignment (spec 5.3.4)."""
        self.write_bit(1)
        self.byte_align()

    @property
    def bit_count(self) -> int:
        return len(self._bytes) * 8 - ((8 - self._bitpos) & 7)

    def data(self) -> bytes:
        assert self._bitpos == 0, "call byte_align()/trailing_bits() first"
        return bytes(self._bytes)


class BitReader:
    """MSB-first bit reader (mirror of BitWriter, for the in-repo decoder)."""

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self._data[self._pos >> 3]
        bit = (byte >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return bit

    def read_literal(self, nbits: int) -> int:
        return self.read(nbits)

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v

    def read_uvlc(self) -> int:
        leading = 0
        while self.read_bit() == 0:
            leading += 1
            if leading >= 32:
                raise ValueError("uvlc overflow")
        v = self.read(leading)
        return v + (1 << leading) - 1

    def read_su(self, nbits: int) -> int:
        v = self.read(nbits)
        sign = 1 << (nbits - 1)
        return (v ^ sign) - sign

    def byte_align(self) -> None:
        self._pos = (self._pos + 7) & ~7

    @property
    def bit_pos(self) -> int:
        return self._pos


def write_uleb128(value: int) -> bytes:
    """leb128() encoder (spec 4.10.5), used for OBU sizes."""
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def read_uleb128(data: bytes, pos: int):
    """Returns (value, new_pos)."""
    value = 0
    for i in range(8):
        byte = data[pos + i]
        value |= (byte & 0x7F) << (7 * i)
        if not byte & 0x80:
            return value, pos + i + 1
    raise ValueError("leb128 too long")
