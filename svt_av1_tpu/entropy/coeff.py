"""Transform-coefficient syntax writer (AV1 residual coding).

Reference behavior: Av1WriteCoeffsTxb1D ``EbEntropyCoding.c:497-680``.
Context maps come vectorized from ``coeff_ctx`` (device-offloadable); the
serial part is only the symbol emission.
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.entropy import coeff_ctx as cc
from svt_av1_tpu.entropy import tx_sets
from svt_av1_tpu.entropy.writer import SymbolReader, SymbolWriter
from svt_av1_tpu.utils.blocks import (DCT_DCT, TX_32X32, TX_TYPE_CLASS,
                                      TX_CLASS_2D, get_scan)


def write_tx_type(w: SymbolWriter, fc, tx_type: int, tx_size: int,
                  intra_dir: int, is_inter: bool, reduced_tx_set: bool,
                  base_qindex: int) -> None:
    """Av1WriteTxType (EbEntropyCoding.c:449)."""
    if tx_sets.num_ext_tx_types(tx_size, is_inter, reduced_tx_set) <= 1 \
            or base_qindex == 0:
        return
    set_type = tx_sets.ext_tx_set_type(tx_size, is_inter, reduced_tx_set)
    eset = tx_sets.ext_tx_set(tx_size, is_inter, reduced_tx_set)
    assert eset > 0 and tx_sets.EXT_TX_USED[set_type][tx_type]
    from svt_av1_tpu.utils.blocks import TX_SIZE_SQR
    sqr = int(TX_SIZE_SQR[tx_size])
    nsyms = tx_sets.NUM_EXT_TX_SET[set_type]
    sym = int(tx_sets.EXT_TX_IND[set_type][tx_type])
    if is_inter:
        w.write_symbol(sym, fc.inter_ext_tx[eset][sqr], nsyms)
    else:
        w.write_symbol(sym, fc.intra_ext_tx[eset][sqr][intra_dir], nsyms)


def read_tx_type(r: SymbolReader, fc, tx_size: int, intra_dir: int,
                 is_inter: bool, reduced_tx_set: bool,
                 base_qindex: int) -> int:
    if tx_sets.num_ext_tx_types(tx_size, is_inter, reduced_tx_set) <= 1 \
            or base_qindex == 0:
        return DCT_DCT
    set_type = tx_sets.ext_tx_set_type(tx_size, is_inter, reduced_tx_set)
    eset = tx_sets.ext_tx_set(tx_size, is_inter, reduced_tx_set)
    from svt_av1_tpu.utils.blocks import TX_SIZE_SQR
    sqr = int(TX_SIZE_SQR[tx_size])
    nsyms = tx_sets.NUM_EXT_TX_SET[set_type]
    if is_inter:
        sym = r.read_symbol(fc.inter_ext_tx[eset][sqr], nsyms)
    else:
        sym = r.read_symbol(fc.intra_ext_tx[eset][sqr][intra_dir], nsyms)
    return int(tx_sets.EXT_TX_INV[set_type][sym])


def tx_type_signal_params(fc, tx_type: int, tx_size: int, intra_dir: int,
                          is_inter: bool, reduced_tx_set: bool,
                          base_qindex: int):
    """None if the tx type is not signaled, else (cdf_row, nsyms, symbol) —
    lets backends (Python or native) emit the symbol themselves."""
    if tx_sets.num_ext_tx_types(tx_size, is_inter, reduced_tx_set) <= 1 \
            or base_qindex == 0:
        return None
    set_type = tx_sets.ext_tx_set_type(tx_size, is_inter, reduced_tx_set)
    eset = tx_sets.ext_tx_set(tx_size, is_inter, reduced_tx_set)
    assert eset > 0 and tx_sets.EXT_TX_USED[set_type][tx_type]
    from svt_av1_tpu.utils.blocks import TX_SIZE_SQR
    sqr = int(TX_SIZE_SQR[tx_size])
    nsyms = tx_sets.NUM_EXT_TX_SET[set_type]
    sym = int(tx_sets.EXT_TX_IND[set_type][tx_type])
    if is_inter:
        return fc.inter_ext_tx[eset][sqr], nsyms, sym
    return fc.intra_ext_tx[eset][sqr][intra_dir], nsyms, sym


def write_coeffs_txb(w: SymbolWriter, fc, qcoeff: np.ndarray, tx_size: int,
                     tx_type: int, plane_type: int, txb_skip_ctx: int,
                     dc_sign_ctx: int, intra_dir: int = 0,
                     is_inter: bool = False, reduced_tx_set: bool = False,
                     base_qindex: int = 0, signal_tx_type: bool = True) -> int:
    """Write one transform block's coefficients. qcoeff: [h, w] raster
    (adjusted/coded dims). Returns the entropy-context byte (cul_level)."""
    if hasattr(w, "write_coeffs_txb"):  # native fast path (one C call)
        sig = None
        if plane_type == 0 and signal_tx_type:
            sig = tx_type_signal_params(fc, tx_type, tx_size, intra_dir,
                                        is_inter, reduced_tx_set,
                                        base_qindex)
        return w.write_coeffs_txb(fc, qcoeff, tx_size, tx_type, plane_type,
                                  txb_skip_ctx, dc_sign_ctx,
                                  tx_type_signal=sig)
    tw, th, bwl = cc.txb_dims(tx_size)
    assert qcoeff.shape == (th, tw)
    scan = get_scan(tx_size, tx_type)
    flat = qcoeff.reshape(-1)
    nz = np.nonzero(flat[scan])[0]
    eob = int(nz[-1]) + 1 if len(nz) else 0
    tsc = cc.txs_ctx(tx_size)

    w.write_symbol(int(eob == 0), fc.txb_skip[tsc][txb_skip_ctx], 2)
    if eob == 0:
        return 0
    if plane_type == 0 and signal_tx_type:
        write_tx_type(w, fc, tx_type, tx_size, intra_dir, is_inter,
                      reduced_tx_set, base_qindex)

    # eob position token
    eob_pt, eob_extra = cc.eob_pos_token(eob)
    ems = cc.eob_multi_size(tx_size)
    tx_class = int(TX_TYPE_CLASS[tx_type])
    emc = 0 if tx_class == TX_CLASS_2D else 1
    eob_cdf = getattr(fc, f"eob_pt_{16 << ems}")
    w.write_symbol(eob_pt - 1, eob_cdf[plane_type][emc], 5 + ems)
    bits = int(cc.EOB_OFFSET_BITS[eob_pt])
    if bits > 0:
        shift = bits - 1
        w.write_symbol((eob_extra >> shift) & 1,
                       fc.eob_extra[tsc][plane_type][eob_pt], 2)
        for i in range(1, bits):
            w.write_bit((eob_extra >> (bits - 1 - i)) & 1)

    # levels buffer + contexts (vectorized)
    levels = np.minimum(np.abs(flat.reshape(th, tw)), 127)[None]
    base_ctx = cc.nz_map_ctx(levels, tx_size, tx_class)[0]
    br_ctx_map = cc.br_ctx(np.minimum(levels, 127), tx_class)[0]
    n = tw * th

    # base levels, reverse scan
    for c in range(eob - 1, -1, -1):
        pos = int(scan[c])
        level = abs(int(flat[pos]))
        if c == eob - 1:
            ctx = int(cc.eob_base_ctx(np.array(c), n))
            w.write_symbol(min(level, 3) - 1,
                           fc.coeff_base_eob[tsc][plane_type][ctx], 3)
        else:
            w.write_symbol(min(level, 3),
                           fc.coeff_base[tsc][plane_type][int(base_ctx[pos])],
                           4)
        if level > cc.NUM_BASE_LEVELS:
            base_range = level - 1 - cc.NUM_BASE_LEVELS
            bctx = int(br_ctx_map[pos])
            br_tsc = min(tsc, TX_32X32)
            for idx in range(0, cc.COEFF_BASE_RANGE, cc.BR_CDF_SIZE - 1):
                k = min(base_range - idx, cc.BR_CDF_SIZE - 1)
                w.write_symbol(k, fc.coeff_br[br_tsc][plane_type][bctx],
                               cc.BR_CDF_SIZE)
                if k < cc.BR_CDF_SIZE - 1:
                    break

    # signs + golomb remainders, forward scan
    cul_level = 0
    for c in range(eob):
        pos = int(scan[c])
        v = int(flat[pos])
        level = abs(v)
        cul_level += level
        if level:
            sign = 1 if v < 0 else 0
            if c == 0:
                w.write_symbol(sign, fc.dc_sign[plane_type][dc_sign_ctx], 2)
            else:
                w.write_bit(sign)
            if level > cc.COEFF_BASE_RANGE + cc.NUM_BASE_LEVELS:
                _write_golomb(w, level - cc.COEFF_BASE_RANGE - 1
                              - cc.NUM_BASE_LEVELS)

    cul_level = min(cc.COEFF_CONTEXT_MASK, cul_level)
    dc = int(flat[0])
    if dc < 0:
        cul_level |= 1 << cc.COEFF_CONTEXT_BITS
    elif dc > 0:
        cul_level += 2 << cc.COEFF_CONTEXT_BITS
    return cul_level


def _write_golomb(w: SymbolWriter, level: int) -> None:
    x = level + 1
    length = x.bit_length()
    for _ in range(length - 1):
        w.write_bit(0)
    for i in range(length - 1, -1, -1):
        w.write_bit((x >> i) & 1)


def _read_golomb(r: SymbolReader) -> int:
    length = 1
    while r.read_bit() == 0:
        length += 1
        assert length < 32
    x = 1
    for _ in range(length - 1):
        x = (x << 1) | r.read_bit()
    return x - 1


def read_coeffs_txb(r: SymbolReader, fc, tx_size: int, plane_type: int,
                    txb_skip_ctx: int, dc_sign_ctx: int, intra_dir: int = 0,
                    is_inter: bool = False, reduced_tx_set: bool = False,
                    base_qindex: int = 0, signal_tx_type: bool = True,
                    uv_tx_type: int = DCT_DCT):
    """Mirror-decoder side. Returns (qcoeff [h,w] raster, tx_type, cul_level).

    For chroma the tx type is derived by the caller (pass uv_tx_type).
    """
    tw, th, bwl = cc.txb_dims(tx_size)
    tsc = cc.txs_ctx(tx_size)
    all_zero = r.read_symbol(fc.txb_skip[tsc][txb_skip_ctx], 2)
    if all_zero:
        return np.zeros((th, tw), dtype=np.int32), DCT_DCT, 0

    if plane_type == 0:
        tx_type = (read_tx_type(r, fc, tx_size, intra_dir, is_inter,
                                reduced_tx_set, base_qindex)
                   if signal_tx_type else DCT_DCT)
    else:
        tx_type = uv_tx_type
    scan = get_scan(tx_size, tx_type)
    tx_class = int(TX_TYPE_CLASS[tx_type])

    ems = cc.eob_multi_size(tx_size)
    emc = 0 if tx_class == TX_CLASS_2D else 1
    eob_cdf = getattr(fc, f"eob_pt_{16 << ems}")
    eob_pt = r.read_symbol(eob_cdf[plane_type][emc], 5 + ems) + 1
    eob = int(cc.EOB_GROUP_START[eob_pt])
    bits = int(cc.EOB_OFFSET_BITS[eob_pt])
    if bits > 0:
        b0 = r.read_symbol(fc.eob_extra[tsc][plane_type][eob_pt], 2)
        extra = b0 << (bits - 1)
        for i in range(1, bits):
            extra |= r.read_bit() << (bits - 1 - i)
        eob += extra

    n = tw * th
    levels = np.zeros((th, tw), dtype=np.int64)
    flat_levels = levels.reshape(-1)
    qcoeff = np.zeros(n, dtype=np.int64)

    for c in range(eob - 1, -1, -1):
        pos = int(scan[c])
        if c == eob - 1:
            ctx = int(cc.eob_base_ctx(np.array(c), n))
            level = r.read_symbol(fc.coeff_base_eob[tsc][plane_type][ctx],
                                  3) + 1
        else:
            ctx = cc.nz_map_ctx_at(levels, pos, tx_size, tx_class)
            level = r.read_symbol(fc.coeff_base[tsc][plane_type][ctx], 4)
        if level > cc.NUM_BASE_LEVELS:
            bctx = cc.br_ctx_at(levels, pos, tx_class)
            br_tsc = min(tsc, TX_32X32)
            for idx in range(0, cc.COEFF_BASE_RANGE, cc.BR_CDF_SIZE - 1):
                k = r.read_symbol(fc.coeff_br[br_tsc][plane_type][bctx],
                                  cc.BR_CDF_SIZE)
                level += k
                if k < cc.BR_CDF_SIZE - 1:
                    break
        flat_levels[pos] = min(level, 127)
        qcoeff[pos] = level

    # signs + golomb
    cul_level = 0
    for c in range(eob):
        pos = int(scan[c])
        level = int(qcoeff[pos])
        if level:
            if c == 0:
                sign = r.read_symbol(fc.dc_sign[plane_type][dc_sign_ctx], 2)
            else:
                sign = r.read_bit()
            if level > cc.COEFF_BASE_RANGE + cc.NUM_BASE_LEVELS:
                level += _read_golomb(r)
                qcoeff[pos] = level
            cul_level += level
            if sign:
                qcoeff[pos] = -level
        # note: cul_level accumulates |level| including golomb part

    cul_level = min(cc.COEFF_CONTEXT_MASK, cul_level)
    dc = int(qcoeff[0])
    if dc < 0:
        cul_level |= 1 << cc.COEFF_CONTEXT_BITS
    elif dc > 0:
        cul_level += 2 << cc.COEFF_CONTEXT_BITS
    return qcoeff.reshape(th, tw).astype(np.int32), tx_type, cul_level
