"""Benchmark: device compute-core throughput for 1080p all-intra analysis.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Current scope (round 1): the fused per-block device step (intra mode
decision + forward transform + quant + inverse transform + distortion) over
all 16x16 blocks of a 1080p frame — the encoder's hot compute loop
(reference equivalent: the EncDec stage fast+full loops,
``EbProductCodingLoop.c``). Entropy coding and the sequential syntax walk
are excluded until the native coder lands; ``vs_baseline`` is measured
against the whole-frame budget implied by SVT-AV1-class 1080p realtime
(~60 fps/socket for the fastest preset — BASELINE.md records that the
reference publishes no numbers, so this anchor is the target operating
point, not a measured one).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from svt_av1_tpu.ops.device import intra_analysis_step

    w, h, size = 1920, 1088, 16
    blocks = (w // size) * (h // size)          # 8160 blocks / frame
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 256, (blocks, size, size)), jnp.int32)
    above = jnp.asarray(rng.integers(0, 256, (blocks, 2 * size)), jnp.int32)
    left = jnp.asarray(rng.integers(0, 256, (blocks, 2 * size)), jnp.int32)
    tl = jnp.asarray(rng.integers(0, 256, blocks), jnp.int32)
    ha = jnp.ones(blocks, dtype=bool)
    hl = jnp.ones(blocks, dtype=bool)

    def step():
        return intra_analysis_step(src, above, left, tl, ha, hl,
                                   size=size, qindex=160)

    jax.block_until_ready(step())  # compile
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = step()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt
    baseline_fps = 60.0  # SVT-class 1080p fastest-preset operating point
    print(json.dumps({
        "metric": "1080p_intra_analysis_core_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
