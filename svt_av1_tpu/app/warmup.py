"""AOT warmup: precompile the device program set for a configuration.

Cold-compiling through the axon tunnel costs minutes per program, so a
service must not pay it at first-frame time. This tool drives one tiny
synthetic clip (a keyframe + one full mini-GOP, which together touch
every program the configuration can reach: all shape groups, the fused
tile/flip/DLF/CDEF/LR programs, every temporal layer) through the real
encoder so every XLA program lands in the persistent compilation cache
(``.jax_cache`` at the repo root, keyed by traced shapes only — qindex,
lambda and strengths are traced operands, so one warmup covers every
quality point at that resolution).

Usage:
    python -m svt_av1_tpu.app.warmup --width 1920 --height 1080 \
        --preset 5 [--bit-depth 8] [--hierarchical-levels 3] [--qp 40]

Subsequent process starts at the same (resolution, preset, bit depth)
deserialize from the cache instead of compiling.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _warm_one(width: int, height: int, preset: int, qp: int,
              bit_depth: int, hierarchical_levels: int, frames: int,
              backend: str, verbose: bool, seed: int = 0,
              tag: str = "warmup") -> None:
    from types import SimpleNamespace
    from svt_av1_tpu.app.cli import preset_config
    from svt_av1_tpu.pipeline.encoder import Encoder

    rng = np.random.default_rng(seed)
    h, w = height, width
    yy, xx = np.mgrid[0:h + 32, 0:w + 32].astype(np.float32)
    # content varies with the seed so concurrent warmers reach DIFFERENT
    # partition outcomes (=> different batch-bucket program variants)
    # and their compiles overlap instead of queueing on the same keys
    base = 96 + 48 * np.sin(xx / (17.0 + 2 * seed)) \
        * np.cos(yy / (23.0 + 3 * seed)) \
        + rng.normal(0, 6.0 + 4.0 * (seed % 3), (h + 32, w + 32))
    shift = (bit_depth - 8)
    cfg = preset_config(SimpleNamespace(
        width=w, height=h, qp=qp, bit_depth=bit_depth, intra_period=-1,
        fps=30, film_grain=0, preset=preset,
        hierarchical_levels=hierarchical_levels, tbr=0, lad=0,
        backend=backend))
    enc = Encoder(cfg)
    dt = np.uint8 if bit_depth <= 8 else np.uint16
    t0 = time.perf_counter()
    for t in range(frames):
        y = (np.clip(base[2 * t:2 * t + h, 3 * t:3 * t + w], 0, 255)
             .astype(np.int32) << shift).astype(dt)
        u = np.full(((h + 1) // 2, (w + 1) // 2), 128 << shift, dtype=dt)
        v = u.copy()
        enc.send_picture(y, u, v)
        while enc.get_packet() is not None:
            pass
        if verbose:
            print(f"[{tag}] {t + 1}/{frames} "
                  f"t={time.perf_counter() - t0:.1f}s", file=sys.stderr,
                  flush=True)
    enc.flush()
    while enc.get_packet() is not None:
        pass


def warm(width: int, height: int, preset: int, qp: int = 40,
         bit_depth: int = 8, hierarchical_levels: int = 3,
         frames: int = 9, backend: str = "device",
         verbose: bool = True, jobs: int = 1) -> float:
    """Warm the program cache; ``jobs`` > 1 runs that many encoder
    instances on threads over content variants. XLA compiles through
    the tunnel parallelize across threads (measured: 2 distinct
    programs on 2 threads compile in the wall time of one), and
    concurrent calls into the SAME program signature dedupe in-process
    (second caller blocks on the first's executable instead of
    re-compiling), so extra jobs cost only the duplicate encode math —
    small next to minutes of compile wall."""
    t0 = time.perf_counter()
    if jobs <= 1:
        _warm_one(width, height, preset, qp, bit_depth,
                  hierarchical_levels, frames, backend, verbose)
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=jobs) as ex:
            futs = [ex.submit(_warm_one, width, height, preset, qp,
                              bit_depth, hierarchical_levels, frames,
                              backend, verbose and j == 0, j,
                              f"warmup#{j}")
                    for j in range(jobs)]
            for f in futs:
                f.result()
    dt_s = time.perf_counter() - t0
    if verbose:
        print(f"[warmup] done in {dt_s:.1f}s — program set cached "
              f"(jobs={jobs})", file=sys.stderr, flush=True)
    return dt_s


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--preset", type=int, default=5)
    ap.add_argument("--qp", type=int, default=40)
    ap.add_argument("--bit-depth", type=int, default=8)
    ap.add_argument("--hierarchical-levels", type=int, default=3)
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--backend", default="device")
    ap.add_argument("--jobs", type=int, default=1,
                    help="parallel warmers (threads); compiles overlap")
    a = ap.parse_args(argv)
    warm(a.width, a.height, a.preset, a.qp, a.bit_depth,
         a.hierarchical_levels, a.frames, a.backend, jobs=a.jobs)


if __name__ == "__main__":
    main()
