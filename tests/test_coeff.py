"""Coefficient coding roundtrip tests: encoder -> bits -> mirror decoder."""

import numpy as np
import pytest

from svt_av1_tpu.entropy import coeff_ctx as cc
from svt_av1_tpu.entropy.cdf import FrameContext
from svt_av1_tpu.entropy.coeff import read_coeffs_txb, write_coeffs_txb
from svt_av1_tpu.entropy.writer import SymbolReader, SymbolWriter
from svt_av1_tpu.utils.blocks import (ADST_ADST, DCT_DCT, IDTX, TX_16X16,
                                      TX_16X32, TX_32X32, TX_4X4, TX_4X8,
                                      TX_64X64, TX_8X8, V_DCT, H_DCT)


def roundtrip_blocks(blocks, qindex=100, disable_update=False):
    """blocks: list of (qcoeff[h,w], tx_size, tx_type, plane, skip_ctx,
    dc_ctx, intra_dir)."""
    fc_e = FrameContext(qindex)
    w = SymbolWriter(disable_update)
    culs = []
    for q, ts, tt, pl, sc, dc, idir in blocks:
        culs.append(write_coeffs_txb(w, fc_e, q, ts, tt, pl, sc, dc,
                                     intra_dir=idir, base_qindex=qindex))
    data = w.done()

    fc_d = FrameContext(qindex)
    r = SymbolReader(data, disable_update)
    for (q, ts, tt, pl, sc, dc, idir), cul in zip(blocks, culs):
        got, got_tt, got_cul = read_coeffs_txb(
            r, fc_d, ts, pl, sc, dc, intra_dir=idir, base_qindex=qindex,
            uv_tx_type=tt)
        np.testing.assert_array_equal(got, q, err_msg=f"ts={ts} tt={tt}")
        if pl == 0 and q.any():
            assert got_tt == tt
        assert got_cul == cul
    assert fc_e.equals(fc_d)
    return data


def rand_block(rng, ts, sparsity=0.8, mag=30):
    w, h, _ = cc.txb_dims(ts)
    q = rng.randint(-mag, mag + 1, size=(h, w))
    q[rng.rand(h, w) < sparsity] = 0
    return q.astype(np.int32)


@pytest.mark.parametrize("ts", [TX_4X4, TX_8X8, TX_16X16, TX_32X32,
                                TX_64X64, TX_4X8, TX_16X32])
def test_roundtrip_dct(ts):
    rng = np.random.RandomState(ts)
    blocks = [(rand_block(rng, ts), ts, DCT_DCT, pl, 0 if pl == 0 else 7,
               rng.randint(3), rng.randint(13))
              for pl in (0, 1) for _ in range(4)]
    roundtrip_blocks(blocks)


def test_roundtrip_tx_types():
    rng = np.random.RandomState(7)
    blocks = []
    for tt in (DCT_DCT, ADST_ADST, IDTX, V_DCT, H_DCT):
        for ts in (TX_4X4, TX_8X8, TX_16X16):
            if tt in (V_DCT, H_DCT) and ts == TX_16X16:
                continue  # 16x16 intra set is DTT4_IDTX (no V/H_DCT)
            blocks.append((rand_block(rng, ts), ts, tt, 0, 0,
                           rng.randint(3), rng.randint(13)))
    roundtrip_blocks(blocks)


def test_roundtrip_all_zero_and_dense():
    rng = np.random.RandomState(8)
    zero = np.zeros((16, 16), dtype=np.int32)
    dense = rng.randint(-500, 500, size=(16, 16)).astype(np.int32)
    dc_only = np.zeros((8, 8), dtype=np.int32)
    dc_only[0, 0] = -3
    one_high = np.zeros((4, 4), dtype=np.int32)
    one_high[3, 3] = 1  # eob at last position
    big = np.zeros((4, 4), dtype=np.int32)
    big[0, 0] = 2047  # golomb path
    big[1, 1] = -300
    blocks = [(zero, TX_16X16, DCT_DCT, 0, 0, 0, 0),
              (dense, TX_16X16, DCT_DCT, 0, 0, 1, 5),
              (dc_only, TX_8X8, DCT_DCT, 1, 8, 2, 0),
              (one_high, TX_4X4, DCT_DCT, 0, 0, 0, 12),
              (big, TX_4X4, DCT_DCT, 0, 0, 0, 3)]
    roundtrip_blocks(blocks)


def test_roundtrip_disable_cdf_update():
    rng = np.random.RandomState(9)
    blocks = [(rand_block(rng, TX_16X16), TX_16X16, DCT_DCT, 0, 0, 0, 1)
              for _ in range(5)]
    roundtrip_blocks(blocks, disable_update=True)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_mixed_blocks(seed):
    rng = np.random.RandomState(100 + seed)
    sizes = [TX_4X4, TX_8X8, TX_16X16, TX_32X32]
    blocks = []
    for _ in range(20):
        ts = sizes[rng.randint(len(sizes))]
        pl = rng.randint(2)
        blocks.append((rand_block(rng, ts, sparsity=rng.uniform(0.3, 0.99),
                                  mag=rng.choice([2, 10, 100, 1000])),
                       ts, DCT_DCT, pl,
                       (rng.randint(3) + rng.choice([7, 10])) if pl else 0,
                       rng.randint(3), rng.randint(13)))
    roundtrip_blocks(blocks, qindex=int(rng.randint(1, 255)))


def test_nz_ctx_offset_table_matches_reference_values():
    # pin generated 2D ctx offsets against literal spec table rows
    t44 = cc.nz_map_ctx_offset_2d(4, 4).reshape(4, 4)
    expect44 = np.array([[0, 1, 6, 6], [1, 6, 6, 21], [6, 6, 21, 21],
                         [6, 21, 21, 21]])
    np.testing.assert_array_equal(t44, expect44)
    t48 = cc.nz_map_ctx_offset_2d(4, 8).reshape(8, 4)  # TX_4X8: w=4 h=8 tall
    expect48 = np.array([[0, 11, 11, 11], [11, 11, 11, 11], [6, 6, 21, 21],
                         [6, 21, 21, 21], [21, 21, 21, 21], [21, 21, 21, 21],
                         [21, 21, 21, 21], [21, 21, 21, 21]])
    np.testing.assert_array_equal(t48, expect48)
    t84 = cc.nz_map_ctx_offset_2d(8, 4).reshape(4, 8)  # TX_8X4 wide
    expect84 = np.array([[0, 16, 6, 6, 21, 21, 21, 21],
                         [16, 16, 6, 21, 21, 21, 21, 21],
                         [16, 16, 21, 21, 21, 21, 21, 21],
                         [16, 16, 21, 21, 21, 21, 21, 21]])
    np.testing.assert_array_equal(t84, expect84)


def test_eob_pos_token():
    for eob, (pt, extra) in [(1, (1, 0)), (2, (2, 0)), (3, (3, 0)),
                             (4, (3, 1)), (5, (4, 0)), (8, (4, 3)),
                             (9, (5, 0)), (16, (5, 7)), (17, (6, 0)),
                             (32, (6, 15)), (33, (7, 0)), (64, (7, 31)),
                             (65, (8, 0)), (512, (10, 255)), (513, (11, 0)),
                             (1024, (11, 511))]:
        assert cc.eob_pos_token(eob) == (pt, extra), eob
