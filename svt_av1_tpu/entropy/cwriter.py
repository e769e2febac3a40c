"""C-backed symbol writer: drop-in replacement for ``writer.SymbolWriter``.

Same interface, same CDF arrays (mutated in place by the C side), and — by
test contract — byte-identical output. The per-txb coefficient fast path
(``write_coeffs_txb``) replaces thousands of Python symbol calls with one C
call.
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np

from svt_av1_tpu import native
from svt_av1_tpu.native import c_u8p
from svt_av1_tpu.entropy import coeff_ctx as cc
from svt_av1_tpu.utils.blocks import (TX_32X32, TX_TYPE_CLASS, TX_CLASS_2D,
                                      get_scan)


def _p32(arr: np.ndarray):
    """Raw address of a contiguous int32 array (hot path: the ctypes
    data_as/cast pair costs ~1.5 us/call; .ctypes.data is ~0.2 us)."""
    return arr.ctypes.data


@functools.lru_cache(maxsize=None)
def _scan16(tx_size: int, tx_type: int) -> np.ndarray:
    return np.ascontiguousarray(get_scan(tx_size, tx_type).astype(np.int16))


@functools.lru_cache(maxsize=None)
def _off2d(w: int, h: int) -> np.ndarray:
    return np.ascontiguousarray(
        cc.nz_map_ctx_offset_2d(w, h).astype(np.uint8))


class NativeEcShim:
    """Matches the .ec attribute surface (raw, non-adapting writes)."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._h = handle

    def encode_symbol(self, s: int, cdf: np.ndarray, nsyms: int) -> None:
        self._lib.svt_ec_symbol(self._h, int(s), _p32(cdf), nsyms, 0)

    def encode_bool(self, val: int, f_q15: int) -> None:
        self._lib.svt_ec_bool(self._h, int(val), f_q15)

    def tell(self) -> int:
        return self._lib.svt_ec_tell_bits(self._h)


class NativeSymbolWriter:
    """C range coder behind the SymbolWriter interface."""

    def __init__(self, disable_cdf_update: bool = False,
                 cap_bytes: int = 1 << 22):
        self._lib = native.lib()
        self._h = self._lib.svt_ec_create(cap_bytes // 2)
        self._cap = cap_bytes
        self._update = 0 if disable_cdf_update else 1
        self.disable_cdf_update = disable_cdf_update
        self.ec = NativeEcShim(self._lib, self._h)

    def write_symbol(self, symbol: int, cdf: np.ndarray, nsyms: int) -> None:
        self._lib.svt_ec_symbol(self._h, int(symbol), _p32(cdf), nsyms,
                                self._update)

    def write_bit(self, bit: int) -> None:
        self._lib.svt_ec_bool(self._h, int(bit), 16384)

    def write_literal(self, value: int, nbits: int) -> None:
        self._lib.svt_ec_literal(self._h, int(value), nbits)

    def write_coeffs_txb(self, fc, qcoeff: np.ndarray, tx_size: int,
                         tx_type: int, plane_type: int, txb_skip_ctx: int,
                         dc_sign_ctx: int, tx_type_signal=None) -> int:
        """One C call per transform block. qcoeff: [ch, cw] int32 raster
        (coded dims). tx_type_signal: None or (cdf_row, nsyms, symbol)."""
        ch, cw = qcoeff.shape
        tsc = cc.txs_ctx(tx_size)
        br_tsc = min(tsc, TX_32X32)
        tx_class = int(TX_TYPE_CLASS[tx_type])
        ems = cc.eob_multi_size(tx_size)
        eob_cdf = getattr(fc, f"eob_pt_{16 << ems}")
        emc = 0 if tx_class == TX_CLASS_2D else 1
        if tx_type_signal is None:
            tt_cdf, tt_nsyms, tt_sym = None, 0, 0
        else:
            tt_cdf, tt_nsyms, tt_sym = tx_type_signal
        q = np.ascontiguousarray(qcoeff, dtype=np.int32)
        return int(self._lib.svt_write_coeffs_txb(
            self._h, self._update, _p32(q), cw, ch,
            _scan16(tx_size, tx_type).ctypes.data, tx_class,
            _off2d(cw, ch).ctypes.data,
            _p32(fc.txb_skip[tsc][txb_skip_ctx]),
            _p32(eob_cdf[plane_type][emc]), 5 + ems,
            _p32(fc.eob_extra[tsc][plane_type]),
            _p32(fc.coeff_base_eob[tsc][plane_type]),
            _p32(fc.coeff_base[tsc][plane_type]),
            _p32(fc.coeff_br[br_tsc][plane_type]),
            _p32(fc.dc_sign[plane_type][dc_sign_ctx]),
            _p32(tt_cdf) if tt_cdf is not None else None, tt_nsyms, tt_sym))

    def done(self) -> bytes:
        out = np.empty(self._cap, dtype=np.uint8)
        n = self._lib.svt_ec_done(self._h, out.ctypes.data_as(c_u8p),
                                  self._cap)
        assert n >= 0, "native ec overflow"
        self._lib.svt_ec_free(self._h)
        self._h = None
        return out[:n].tobytes()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.svt_ec_free(self._h)
