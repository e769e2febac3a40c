"""Bit-level writer/reader and container roundtrip tests."""

import io

import numpy as np

from svt_av1_tpu.bitstream.bitio import (BitReader, BitWriter, read_uleb128,
                                         write_uleb128)
from svt_av1_tpu.bitstream.ivf import read_ivf, write_ivf_frame, write_ivf_header
from svt_av1_tpu.utils.yuv import (Frame, pad_frame, read_y4m, read_yuv_frames,
                                   write_yuv_frame)


def test_bitwriter_roundtrip():
    rng = np.random.RandomState(0)
    ops = []
    w = BitWriter()
    for _ in range(500):
        kind = rng.randint(3)
        if kind == 0:
            n = int(rng.randint(1, 25))
            v = int(rng.randint(1 << n))
            w.write(v, n)
            ops.append(("f", v, n))
        elif kind == 1:
            v = int(rng.randint(1000))
            w.write_uvlc(v)
            ops.append(("uvlc", v, None))
        else:
            n = int(rng.randint(2, 12))
            v = int(rng.randint(-(1 << (n - 1)), 1 << (n - 1)))
            w.write_su(v, n)
            ops.append(("su", v, n))
    w.trailing_bits()
    r = BitReader(w.data())
    for kind, v, n in ops:
        if kind == "f":
            assert r.read(n) == v
        elif kind == "uvlc":
            assert r.read_uvlc() == v
        else:
            assert r.read_su(n) == v
    assert r.read_bit() == 1  # trailing one


def test_uleb128():
    for v in (0, 1, 127, 128, 300, 2**21, 2**32 - 1):
        data = write_uleb128(v)
        got, pos = read_uleb128(data + b"\xff", 0)
        assert got == v and pos == len(data)


def test_ivf_roundtrip():
    buf = io.BytesIO()
    write_ivf_header(buf, 854, 480, 30, 1, 2)
    write_ivf_frame(buf, b"hello", 0)
    write_ivf_frame(buf, b"world!", 1)
    buf.seek(0)
    info, frames = read_ivf(buf)
    assert info["fourcc"] == "AV01"
    assert info["width"] == 854 and info["height"] == 480
    assert list(frames) == [(0, b"hello"), (1, b"world!")]


def test_yuv_roundtrip_and_pad():
    rng = np.random.RandomState(1)
    f = Frame(y=rng.randint(0, 256, (48, 80), dtype=np.uint8),
              u=rng.randint(0, 256, (24, 40), dtype=np.uint8),
              v=rng.randint(0, 256, (24, 40), dtype=np.uint8))
    buf = io.BytesIO()
    write_yuv_frame(buf, f)
    buf.seek(0)
    g = next(read_yuv_frames(buf, 80, 48))
    np.testing.assert_array_equal(f.y, g.y)
    np.testing.assert_array_equal(f.v, g.v)
    p = pad_frame(f, 128, 64)
    assert p.y.shape == (64, 128) and p.u.shape == (32, 64)
    np.testing.assert_array_equal(p.y[:48, :80], f.y)
    assert (p.y[48:, :80] == f.y[-1:, :]).all()


def test_y4m():
    hdr = b"YUV4MPEG2 W80 H48 F25:1 Ip A1:1 C420mpeg2\n"
    rng = np.random.RandomState(2)
    raw = rng.randint(0, 256, 80 * 48 * 3 // 2, dtype=np.uint8).tobytes()
    buf = io.BytesIO(hdr + b"FRAME\n" + raw + b"FRAME\n" + raw)
    info, frames = read_y4m(buf)
    assert info["width"] == 80 and info["fps_num"] == 25
    fs = list(frames)
    assert len(fs) == 2
    assert fs[0].y.tobytes() == raw[:80 * 48]
