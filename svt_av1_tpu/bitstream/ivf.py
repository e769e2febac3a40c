"""IVF container writer/reader.

The reference app writes IVF via ``write_ivf_stream_header`` / per-frame
headers (``EbAppProcessCmd.c:1277-1319``); this is the same 32-byte header +
12-byte frame header format, plus a reader for tests.
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Iterator, Tuple


def write_ivf_header(fh: BinaryIO, width: int, height: int,
                     fps_num: int, fps_den: int, frame_count: int = 0) -> None:
    fh.write(struct.pack("<4sHH4sHHIII", b"DKIF", 0, 32, b"AV01",
                         width, height, fps_num, fps_den, frame_count))
    fh.write(b"\x00\x00\x00\x00")  # unused


def patch_ivf_frame_count(fh: BinaryIO, frame_count: int) -> None:
    """Back-patch the header frame count at EOS (reference app behavior:
    EbAppProcessCmd.c update of the stream header once totals are known)."""
    pos = fh.tell()
    fh.seek(24)
    fh.write(struct.pack("<I", frame_count))
    fh.seek(pos)


def write_ivf_frame(fh: BinaryIO, payload: bytes, pts: int) -> None:
    fh.write(struct.pack("<IQ", len(payload), pts))
    fh.write(payload)


def read_ivf(fh: BinaryIO) -> Tuple[dict, Iterator[Tuple[int, bytes]]]:
    hdr = fh.read(32)
    magic, version, hdr_size, fourcc, w, h, num, den, count = struct.unpack(
        "<4sHH4sHHIII", hdr[:28])
    if magic != b"DKIF":
        raise ValueError("not an IVF file")
    info = dict(fourcc=fourcc.decode(), width=w, height=h,
                fps_num=num, fps_den=den, frame_count=count)

    def frames():
        while True:
            fhdr = fh.read(12)
            if len(fhdr) < 12:
                return
            size, pts = struct.unpack("<IQ", fhdr)
            yield pts, fh.read(size)

    return info, frames()
