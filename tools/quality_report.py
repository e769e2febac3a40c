#!/usr/bin/env python
"""RD quality dashboard: encode a fixed synthetic suite across QPs and
tool configurations, print bytes/PSNR per point. Used to eyeball RD
movements between rounds (no external anchor exists in this
environment; the numbers are self-relative).

Run:  python tools/quality_report.py [--quick]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from svt_av1_tpu.config import EncoderConfig  # noqa: E402
from svt_av1_tpu.pipeline.decode import StreamDecoder
from svt_av1_tpu.pipeline.encoder import Encoder


def _psnr(a, b, peak=255.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(peak * peak / mse)


def _suite(w, h, n):
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (120 + 55 * np.sin((yy + 2 * t) / 17.0)
             * np.cos((xx + 3 * t) / 23.0)
             + 25 * ((xx + yy + 4 * t) % 24 < 4)
             + rng.normal(0, 4, (h, w)))
        sx = 30 + 10 * t
        y[70:110, sx:sx + 50] = 220
        y = np.clip(y, 0, 255).astype(np.uint8)
        lu = y.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        u = np.clip(70 + 0.5 * lu, 0, 255).astype(np.uint8)
        v = np.clip(190 - 0.4 * lu, 0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def run_point(frames, **kw):
    cfg = EncoderConfig(width=frames[0][0].shape[1],
                        height=frames[0][0].shape[0],
                        scene_change_detection=False, **kw)
    enc = Encoder(cfg)
    outs = []
    t0 = time.perf_counter()
    for f in frames:
        enc.send_picture(*f)
        while (p := enc.get_packet()) is not None:
            outs.append(p)
    enc.flush()
    while (p := enc.get_packet()) is not None:
        outs.append(p)
    dt = time.perf_counter() - t0
    dec = StreamDecoder()
    total = 0
    psnrs = []
    shown = 0
    for tu, disp in outs:
        total += len(tu)
        out = dec.decode_tu(tu)
        if disp is None:
            continue
        for p in range(3):
            assert (out[p] == disp[p]).all(), "decode mismatch"
        psnrs.append(_psnr(frames[shown][0], out[0]))
        shown += 1
    return total, float(np.mean(psnrs)), dt


def main():
    quick = "--quick" in sys.argv
    w, h, n = (320, 192, 4) if quick else (640, 360, 8)
    if "--natural" in sys.argv:
        # real-photograph pan clip (utils/natural.py; provenance there)
        from svt_av1_tpu.utils import natural
        assert natural.available(), "natural-content asset missing"
        frames = natural.natural_clip(w, h, n)
    else:
        frames = _suite(w, h, n)
    qps = (30, 45) if quick else (25, 35, 45, 55)
    configs = [
        ("baseline (fixed16, no tools)",
         dict(fixed_partition_size=16, enable_dlf=False)),
        ("partition RD + DLF", dict(fixed_partition_size=None)),
        ("+ CDEF + LR", dict(fixed_partition_size=None, enable_cdef=True,
                             enable_restoration=True)),
        ("+ tx search + AQ", dict(fixed_partition_size=None,
                                  enable_cdef=True,
                                  enable_restoration=True,
                                  enable_tx_type_search=True,
                                  adaptive_quantization=1)),
        ("RA hl=2 all tools", dict(fixed_partition_size=None,
                                   enable_cdef=True,
                                   enable_restoration=True,
                                   enable_tx_type_search=True,
                                   adaptive_quantization=1,
                                   hierarchical_levels=2,
                                   intra_period=31)),
    ]
    print(f"# {w}x{h}, {n} frames")
    print(f"{'config':<28} {'qp':>3} {'bytes':>8} {'Y-PSNR':>7} {'enc s':>6}")
    for name, kw in configs:
        for qp in qps:
            total, psnr, dt = run_point(frames, qp=qp, **kw)
            print(f"{name:<28} {qp:>3} {total:>8} {psnr:>7.2f} {dt:>6.1f}")


if __name__ == "__main__":
    main()
