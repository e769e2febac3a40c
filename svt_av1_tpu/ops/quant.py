"""Quantization / dequantization (batched, host NumPy oracle).

Quantizer matches the reference encoder (``EbFullLoop.c:46``
quantize_b_helper_c_II with log_scale = av1_get_tx_scale; parameter derivation
``EbModeDecisionConfigurationProcess.c:417`` av1_build_quantizer). The
dequant side is normative (spec 7.13.3): ``dq = (level * q) >> tx_scale``.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from svt_av1_tpu.entropy.cdf import default_tables
from svt_av1_tpu.utils.blocks import TX_HEIGHT, TX_WIDTH


def qlookup(bit_depth: int):
    t = default_tables()
    s = {8: "8", 10: "10", 12: "12"}[bit_depth]
    return t["dc_qlookup_" + s], t["ac_qlookup_" + s]


def dc_quant(qindex: int, delta: int, bit_depth: int = 8) -> int:
    dc, _ = qlookup(bit_depth)
    return int(dc[np.clip(qindex + delta, 0, 255)])


def ac_quant(qindex: int, delta: int, bit_depth: int = 8) -> int:
    _, ac = qlookup(bit_depth)
    return int(ac[np.clip(qindex + delta, 0, 255)])


def qindex_for_qstep_scale(base_qindex: int, scale: float,
                           bit_depth: int = 8) -> int:
    """Smallest qindex whose AC quantizer step is <= ``scale`` x the step
    at ``base_qindex`` (the reference's av1_compute_qdelta /
    av1_convert_qindex_to_q pair, EbRateControlProcess.c:1129: qp scaling
    targets a quantizer-step ratio, not a qindex offset)."""
    _, ac = qlookup(bit_depth)
    target = scale * float(ac[np.clip(base_qindex, 0, 255)])
    # first qindex whose step reaches the target (av1_compute_qdelta
    # scans upward and stops at q(i) >= qtarget)
    idx = int(np.searchsorted(np.asarray(ac, dtype=np.float64), target,
                              side="left"))
    return int(np.clip(idx, 1, 255))


def tx_scale(tx_size: int) -> int:
    """av1_get_tx_scale: 0 / 1 / 2 for <=256 / <=1024 / more pels."""
    pels = int(TX_WIDTH[tx_size]) * int(TX_HEIGHT[tx_size])
    return (pels > 256) + (pels > 1024)


def _invert_quant(d: int):
    """reference invert_quant: reciprocal in Q16 + shift."""
    t, l = d, 0
    while t > 1:
        t >>= 1
        l += 1
    m = 1 + (1 << (16 + l)) // d
    return m - (1 << 16), 1 << (16 - l)


@dataclasses.dataclass(frozen=True)
class QuantParams:
    """Per-plane quantizer vectors, index 0 = DC, 1 = AC."""
    zbin: tuple
    round: tuple
    quant: tuple
    quant_shift: tuple
    dequant: tuple
    qindex: int = 0


@functools.lru_cache(maxsize=256)
def make_quant_params(qindex: int, dc_delta: int = 0, ac_delta: int = 0,
                      bit_depth: int = 8) -> QuantParams:
    q = qindex
    dcq = dc_quant(q, dc_delta, bit_depth)
    acq = ac_quant(q, ac_delta, bit_depth)
    # get_qzbin_factor
    thresh = {8: 148, 10: 592, 12: 2368}[bit_depth]
    qzbin = 64 if q == 0 else (84 if dc_quant(q, 0, bit_depth) < thresh else 80)
    qround = 64 if q == 0 else 48
    zbin, rnd, quant, qshift, deq = [], [], [], [], []
    for qv in (dcq, acq):
        m, s = _invert_quant(qv)
        quant.append(m)
        qshift.append(s)
        zbin.append((qzbin * qv + 64) >> 7)
        rnd.append((qround * qv) >> 7)
        deq.append(qv)
    return QuantParams(tuple(zbin), tuple(rnd), tuple(quant), tuple(qshift),
                       tuple(deq), qindex)


def quantize(coeff: np.ndarray, scan: np.ndarray, qp: QuantParams,
             log_scale: int):
    """Quantize+dequantize a batch of transform blocks.

    coeff: [B, n] int (raster order, n = scanned coeff count); scan: [n]
    raster positions in scan order. Returns (qcoeff[B,n] raster,
    dqcoeff[B,n] raster, eob[B]) with eob in scan-order units (0 = all zero).
    Uses the native C twin (native/svt_quant.c) when available; the
    NumPy body below is the oracle it is tested against.
    """
    b, n = coeff.shape
    if _native_ok():
        return _quantize_native(coeff, scan, qp, log_scale)
    is_dc = np.zeros(n, dtype=bool)
    is_dc[0] = True  # raster position 0 is DC
    def rpot(v):  # ROUND_POWER_OF_TWO(v, log_scale)
        return ((v + ((1 << log_scale) >> 1)) >> log_scale) if log_scale else v
    zbin = np.where(is_dc, rpot(qp.zbin[0]), rpot(qp.zbin[1]))
    rnd = np.where(is_dc, rpot(qp.round[0]), rpot(qp.round[1]))
    quant = np.where(is_dc, qp.quant[0], qp.quant[1]).astype(np.int64)
    qshift = np.where(is_dc, qp.quant_shift[0], qp.quant_shift[1]).astype(
        np.int64)
    deq = np.where(is_dc, qp.dequant[0], qp.dequant[1]).astype(np.int64)

    c = coeff.astype(np.int64)
    sign = np.where(c < 0, -1, 1)
    abs_c = np.abs(c)
    over_zbin = abs_c >= zbin[None, :]
    tmp = np.clip(abs_c + rnd[None, :], -32768, 32767)
    tmp32 = ((((tmp * quant[None, :]) >> 16) + tmp) * qshift[None, :]) \
        >> (16 - log_scale)
    tmp32 = np.where(over_zbin, tmp32, 0)
    qcoeff = (sign * tmp32).astype(np.int32)
    dqcoeff = (sign * ((tmp32 * deq[None, :]) >> log_scale)).astype(np.int32)

    # eob: last nonzero position in scan order + 1
    nz_scan = tmp32[:, scan] != 0
    idx = np.arange(1, n + 1)
    eob = np.max(np.where(nz_scan, idx[None, :], 0), axis=1)
    return qcoeff, dqcoeff, eob.astype(np.int32)


@functools.lru_cache(maxsize=1)
def _native_ok() -> bool:
    from svt_av1_tpu import native
    return native.available()


def _quantize_native(coeff, scan, qp, log_scale):
    import ctypes

    from svt_av1_tpu import native
    b, n = coeff.shape
    L = native.lib()
    c32 = np.ascontiguousarray(coeff, dtype=np.int32)
    s32 = np.ascontiguousarray(scan, dtype=np.int32)
    qc = np.empty((b, n), dtype=np.int32)
    dq = np.empty((b, n), dtype=np.int32)
    eob = np.empty(b, dtype=np.int32)

    def rpot(v):
        return ((v + ((1 << log_scale) >> 1)) >> log_scale) \
            if log_scale else v

    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))  # noqa: E731
    rc = L.svt_quantize_b(
        p(c32), b, n, p(s32),
        rpot(qp.zbin[0]), rpot(qp.zbin[1]),
        rpot(qp.round[0]), rpot(qp.round[1]),
        qp.quant[0], qp.quant[1], qp.quant_shift[0], qp.quant_shift[1],
        qp.dequant[0], qp.dequant[1], log_scale, p(qc), p(dq), p(eob))
    assert rc == 0
    return qc, dq, eob


def dequantize(qcoeff: np.ndarray, qp: QuantParams, log_scale: int):
    """Normative dequant (mirror-decoder side): [B, n] raster order."""
    n = qcoeff.shape[1]
    deq = np.full(n, qp.dequant[1], dtype=np.int64)
    deq[0] = qp.dequant[0]
    c = qcoeff.astype(np.int64)
    sign = np.where(c < 0, -1, 1)
    return (sign * ((np.abs(c) * deq[None, :]) >> log_scale)).astype(np.int32)
