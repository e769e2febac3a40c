"""AV1 multi-symbol range coder (daala ``od_ec``), encoder + decoder.

The encoder follows the normative daala range-coding algorithm (the AV1 spec's
symbol decoder, section 8.2, is its exact inverse). Reference behavior:
``EbBitstreamUnit.c:187-449`` (encode side only — the reference ships no
decoder; ours is derived from the spec so encoded streams can be verified
in-repo).

This is the Phase-0 *host* coder of the two-phase entropy design (SURVEY.md
§7.4.1): the device produces (symbol, cdf-index) token streams in parallel;
this serial coder turns them into bits. A C implementation and a
``lax.scan`` device loop are planned follow-ups; this NumPy/Python version is
the bit-exactness oracle for both.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4
CDF_PROB_TOP = 1 << 15
WINDOW = 32  # od_ec_window bits
_WMASK = (1 << WINDOW) - 1
LOTS_OF_BITS = 0x4000


class RangeEncoder:
    """Multi-symbol range encoder.

    CDFs are in AOM "inverse" Q15 form: ``icdf[i] = 32768 - cum_prob(0..i)``,
    monotonically decreasing with ``icdf[nsyms-1] == 0``.
    """

    def __init__(self):
        self.low = 0
        self.rng = 0x8000
        self.cnt = -9
        self.precarry: List[int] = []

    # -- core ---------------------------------------------------------------
    def _normalize(self, low: int, rng: int) -> None:
        d = 16 - rng.bit_length()
        c = self.cnt
        s = c + d
        if s >= 0:
            c += 16
            m = (1 << c) - 1
            if s >= 8:
                self.precarry.append((low >> c) & 0xFFFF)
                low &= m
                c -= 8
                m >>= 8
            self.precarry.append((low >> c) & 0xFFFF)
            s = c + d - 24
            low &= m
        self.low = (low << d) & _WMASK
        self.rng = rng << d
        self.cnt = s

    def encode_symbol(self, s: int, icdf: Sequence[int], nsyms: int) -> None:
        """Encode symbol ``s`` from an alphabet of ``nsyms`` (<= 16)."""
        fl = CDF_PROB_TOP if s == 0 else int(icdf[s - 1])
        fh = int(icdf[s])
        l = self.low
        r = self.rng
        n = nsyms - 1
        if fl < CDF_PROB_TOP:
            u = (((r >> 8) * (fl >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
                + EC_MIN_PROB * (n - (s - 1))
            v = (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
                + EC_MIN_PROB * (n - s)
            l += r - u
            r = u - v
        else:
            r -= (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
                + EC_MIN_PROB * (n - s)
        self._normalize(l, r)

    def encode_bool(self, val: int, f_q15: int) -> None:
        """Encode one bool; ``f_q15`` = P(val==1) scaled by 32768."""
        l = self.low
        r = self.rng
        v = (((r >> 8) * (f_q15 >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
            + EC_MIN_PROB
        if val:
            l += r - v
            r = v
        else:
            r = r - v
        self._normalize(l, r)

    def encode_literal(self, value: int, nbits: int) -> None:
        """L(n): raw bits, MSB first, each at probability 1/2."""
        for i in range(nbits - 1, -1, -1):
            self.encode_bool((value >> i) & 1, 16384)

    def tell(self) -> int:
        """Upper bound on bits used so far (od_ec_enc_tell)."""
        return (self.cnt + 10) + len(self.precarry) * 8

    def done(self) -> bytes:
        """Finalize: flush, propagate carries, return the byte stream."""
        l = self.low
        c = self.cnt
        s = 10
        m = 0x3FFF
        e = ((l + m) & ~m) | (m + 1)
        s += c
        buf = list(self.precarry)
        if s > 0:
            n = (1 << (c + 16)) - 1
            while True:
                buf.append((e >> (c + 16)) & 0xFFFF)
                e &= n
                s -= 8
                c -= 8
                n >>= 8
                if s <= 0:
                    break
        # carry propagation (precarry entries are 16-bit: data + carry-in)
        out = bytearray(len(buf))
        carry = 0
        for i in range(len(buf) - 1, -1, -1):
            v = buf[i] + carry
            out[i] = v & 0xFF
            carry = v >> 8
        assert carry == 0, "carry out of first byte — encoder bug"
        return bytes(out)


class RangeDecoder:
    """Spec-equivalent symbol decoder (AV1 spec 8.2 / daala od_ec_dec)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bptr = 0
        self.dif = (1 << (WINDOW - 1)) - 1
        self.rng = 0x8000
        self.cnt = -15
        self._refill()

    def _refill(self) -> None:
        s = WINDOW - 9 - (self.cnt + 15)
        while s >= 0 and self.bptr < len(self.data):
            self.dif ^= self.data[self.bptr] << s
            self.cnt += 8
            s -= 8
            self.bptr += 1
        if self.bptr >= len(self.data):
            self.cnt = LOTS_OF_BITS

    def _normalize(self, dif: int, rng: int) -> None:
        d = 16 - rng.bit_length()
        self.cnt -= d
        self.dif = (((dif + 1) << d) - 1) & _WMASK
        self.rng = rng << d
        if self.cnt < 0:
            self._refill()

    def decode_symbol(self, icdf: Sequence[int], nsyms: int) -> int:
        dif = self.dif
        r = self.rng
        n = nsyms - 1
        c = dif >> (WINDOW - 16)
        v = r
        ret = -1
        while True:
            ret += 1
            u = v
            v = ((r >> 8) * (int(icdf[ret]) >> EC_PROB_SHIFT)) \
                >> (7 - EC_PROB_SHIFT)
            v += EC_MIN_PROB * (n - ret)
            if c >= v:
                break
        dif -= v << (WINDOW - 16)
        self._normalize(dif, u - v)
        return ret

    def decode_bool(self, f_q15: int) -> int:
        dif = self.dif
        r = self.rng
        v = (((r >> 8) * (f_q15 >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
            + EC_MIN_PROB
        c = dif >> (WINDOW - 16)
        if c < v:
            ret = 1
            r = v
        else:
            ret = 0
            dif -= v << (WINDOW - 16)
            r = r - v
        self._normalize(dif, r)
        return ret

    def decode_literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.decode_bool(16384)
        return v


# --- CDF adaptation -----------------------------------------------------------

# update rate speed-up per alphabet size (AV1 spec: 1 for nsyms==2, else 2;
# expressed as libaom's nsymbs2speed table)
_NSYMBS2SPEED = (0, 0, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2)


def update_cdf(cdf: np.ndarray, val: int, nsyms: int) -> None:
    """Adapt a CDF in place after coding symbol ``val``.

    ``cdf`` has ``nsyms + 1`` entries; the last is the adaptation counter.
    Matches the normative decoder-side update (AV1 spec 8.2.5 update_cdf).
    """
    count = int(cdf[nsyms])
    rate = 3 + (count > 15) + (count > 31) + _NSYMBS2SPEED[nsyms]
    tmp = CDF_PROB_TOP
    for i in range(nsyms - 1):
        if i == val:
            tmp = 0
        cur = int(cdf[i])
        if tmp < cur:
            cdf[i] = cur - ((cur - tmp) >> rate)
        else:
            cdf[i] = cur + ((tmp - cur) >> rate)
    cdf[nsyms] = count + (count < 32)


def make_icdf(probs: Sequence[float]) -> np.ndarray:
    """Build an AOM inverse CDF (with adaptation counter) from probabilities.

    Test/bootstrap helper: quantizes to Q15 with every symbol >= 1/32768.
    """
    p = np.asarray(probs, dtype=np.float64)
    p = p / p.sum()
    cum = np.round(np.cumsum(p) * CDF_PROB_TOP).astype(np.int64)
    cum = np.maximum.accumulate(np.clip(cum, 1, CDF_PROB_TOP))
    for i in range(len(cum)):  # enforce strict monotonicity
        if i and cum[i] <= cum[i - 1]:
            cum[i] = cum[i - 1] + 1
    cum = np.minimum(cum, CDF_PROB_TOP - (len(cum) - 1 - np.arange(len(cum))))
    cum[-1] = CDF_PROB_TOP
    icdf = CDF_PROB_TOP - cum
    return np.concatenate([icdf, [0]]).astype(np.int32)
