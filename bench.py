"""Benchmark: device compute-core throughput for 1080p encoding.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Scope (round 1): the two per-frame device compute cores at 1080p —
(a) the fused intra analysis step (mode decision + transform + quant +
recon distortion over all 16x16 blocks) and (b) the inter core (full-pel
ME over a ±16 offset grid + MC + residual DCT + quant + recon). Reported
fps is the harmonic combination 1/(t_intra + t_inter): the compute budget
of one intra + one inter frame. The sequential syntax stage (native C
coder) is excluded; ``vs_baseline`` anchors against the SVT-class 1080p
realtime operating point (~60 fps/socket — BASELINE.md records that the
reference publishes no measured numbers).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from svt_av1_tpu.ops.device import inter_core_step, intra_analysis_step

    w, h, size = 1920, 1088, 16
    blocks = (w // size) * (h // size)          # 8160 blocks / frame
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 256, (blocks, size, size)), jnp.int32)
    above = jnp.asarray(rng.integers(0, 256, (blocks, 2 * size)), jnp.int32)
    left = jnp.asarray(rng.integers(0, 256, (blocks, 2 * size)), jnp.int32)
    tl = jnp.asarray(rng.integers(0, 256, blocks), jnp.int32)
    ha = jnp.ones(blocks, dtype=bool)
    hl = jnp.ones(blocks, dtype=bool)
    cur = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    refp = jnp.asarray(rng.integers(0, 256, (h + 32, w + 32)), jnp.int32)

    def intra():
        return intra_analysis_step(src, above, left, tl, ha, hl,
                                   size=size, qindex=160)

    def inter():
        return inter_core_step(cur, refp, size=size, qindex=160)

    jax.block_until_ready(intra())   # compile
    jax.block_until_ready(inter())

    def timeit(fn, n=20, reps=5):
        # best of repeated timed batches: the axon tunnel is shared and
        # contention swings batch times by >5x, so the minimum is the
        # only stable estimate of device capability
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / n)
        return min(times)

    t_intra = timeit(intra)
    t_inter = timeit(inter)
    fps = 1.0 / (t_intra + t_inter)
    baseline_fps = 60.0  # SVT-class 1080p realtime operating point
    print(json.dumps({
        "metric": "1080p_encode_core_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
