"""Native library loader: compiles ``native/svt_ec.c`` on demand.

The serial entropy stage runs as C (the TPU framework's equivalent of the
reference's hand-optimized bitstream path); everything batched runs as
JAX/XLA. Build is cached next to the sources and invalidated by source
content hash (mtime is unreliable across checkouts).
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import subprocess
from pathlib import Path

_REPO = Path(__file__).resolve().parents[2]
_SOURCES = [_REPO / "native" / "svt_ec.c",
            _REPO / "native" / "svt_txfm.c",
            _REPO / "native" / "svt_quant.c"]
_BUILD = _REPO / "native" / "build"

c_i32p = ctypes.POINTER(ctypes.c_int32)
c_i16p = ctypes.POINTER(ctypes.c_int16)
c_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build() -> Path:
    _BUILD.mkdir(parents=True, exist_ok=True)
    so = _BUILD / "libsvt_native.so"
    stamp = _BUILD / "sources.sha256"
    h = hashlib.sha256()
    for s in _SOURCES:
        h.update(s.read_bytes())
    digest = h.hexdigest()
    stale = (not so.exists() or not stamp.exists()
             or stamp.read_text().strip() != digest)
    if stale:
        cmd = ["gcc", "-O3", "-fPIC", "-shared", "-Wall", "-o", str(so)]
        cmd += [str(s) for s in _SOURCES]
        subprocess.check_call(cmd)
        stamp.write_text(digest)
    return so


@functools.lru_cache(maxsize=1)
def lib() -> ctypes.CDLL:
    L = ctypes.CDLL(str(_build()))
    L.svt_ec_create.restype = ctypes.c_void_p
    L.svt_ec_create.argtypes = [ctypes.c_int]
    L.svt_ec_free.argtypes = [ctypes.c_void_p]
    L.svt_ec_tell_bits.restype = ctypes.c_int
    L.svt_ec_tell_bits.argtypes = [ctypes.c_void_p]
    # hot entry points take raw address ints (arr.ctypes.data): the
    # data_as/cast pair costs ~1.5 us per call and the syntax pass makes
    # hundreds of thousands of them per frame
    L.svt_ec_symbol.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.c_void_p, ctypes.c_int,
                                ctypes.c_int]
    L.svt_ec_bool.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    L.svt_ec_literal.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    L.svt_ec_done.restype = ctypes.c_int
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i8p = ctypes.POINTER(ctypes.c_int8)
    L.svt_txfm_exec.argtypes = [c_i64p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, c_i32p, c_i32p, c_i64p,
                                c_i64p, c_i8p, ctypes.c_int, ctypes.c_int]
    L.svt_ec_done.argtypes = [ctypes.c_void_p, c_u8p, ctypes.c_int]
    L.svt_write_coeffs_txb.restype = ctypes.c_int32
    vp = ctypes.c_void_p
    L.svt_write_coeffs_txb.argtypes = [
        vp, ctypes.c_int, vp, ctypes.c_int, ctypes.c_int,
        vp, ctypes.c_int, vp,
        vp,                           # txb_skip row
        vp, ctypes.c_int,             # eob_pt row, nsyms
        vp, vp, vp, vp, vp,
        vp, ctypes.c_int, ctypes.c_int,
    ]
    L.svt_quantize_b.restype = ctypes.c_int
    L.svt_quantize_b.argtypes = [
        c_i32p, ctypes.c_int, ctypes.c_int, c_i32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_i32p, c_i32p, c_i32p,
    ]
    return L


def available() -> bool:
    try:
        lib()
        return True
    except Exception:
        return False
