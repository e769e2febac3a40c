"""Traced end-to-end encode: per-stage timing of the production encoder.

Usage: python tools/trace_encode.py [W H frames preset backend [qp]]
Prints per-frame wall times and the span summary — the round-3 profiling
harness for the device-path speed work (VERDICT round 2, weak #2)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    w = int(args[0]) if args else 1920
    h = int(args[1]) if len(args) > 1 else 1080
    n = int(args[2]) if len(args) > 2 else 9
    preset = int(args[3]) if len(args) > 3 else 5
    backend = args[4] if len(args) > 4 else "device"
    qp = int(args[5]) if len(args) > 5 else 40

    from types import SimpleNamespace
    from svt_av1_tpu.app.cli import preset_config
    from svt_av1_tpu.pipeline.encoder import Encoder
    from svt_av1_tpu.utils.trace import TRACER

    import bench
    frames = bench.make_clip(w, h, frames=n)
    cfg = preset_config(SimpleNamespace(
        width=w, height=h, qp=qp, bit_depth=8, intra_period=-1, fps=30,
        film_grain=0, preset=preset, hierarchical_levels=3, tbr=0, lad=0,
        backend=backend))

    def run(tag):
        enc = Encoder(cfg)
        t0 = time.perf_counter()
        last = t0
        nbytes = 0
        for fi, (y, u, v) in enumerate(frames):
            enc.send_picture(y, u, v)
            while (pkt := enc.get_packet()) is not None:
                nbytes += len(pkt[0])
            now = time.perf_counter()
            print(f"[{tag}] fed {fi + 1}/{n} +{now - last:.2f}s "
                  f"total {now - t0:.1f}s", flush=True)
            last = now
        enc.flush()
        while (pkt := enc.get_packet()) is not None:
            nbytes += len(pkt[0])
        dt = time.perf_counter() - t0
        print(f"[{tag}] {n} frames in {dt:.2f}s = {n / dt:.3f} fps, "
              f"{nbytes} bytes", flush=True)
        return dt

    run("warmup")
    TRACER.enabled = True
    TRACER.reset()
    run("timed")
    import json
    print(json.dumps(TRACER.summary(), indent=1))
    for s in TRACER.spans:
        if len(s) > 3:   # spans with meta (counts)
            print(json.dumps(s))


if __name__ == "__main__":
    main()
