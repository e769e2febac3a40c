"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised in CI without TPUs via
``xla_force_host_platform_device_count`` (SURVEY.md §4); the driver's
``dryrun_multichip`` does the same.

The environment may pin ``JAX_PLATFORMS=axon`` (a tunneled TPU) via
sitecustomize before this file runs, and that pin wins over env-var
edits made here — so the platform is forced through ``jax.config``,
which takes effect as long as no device has been touched yet. Running
the suite over the TPU tunnel is ~10x slower (every compile crosses the
tunnel and processes serialize on the one chip) and flaky under
contention; the tests are bit-exactness checks whose results are
platform-independent by design, so CPU is the right CI target. Set
SVT_TPU_TEST_DEVICE=1 to run on the real chip instead.
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

if not os.environ.get("SVT_TPU_TEST_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # CPU test runs skip the persistent compile cache: jax's cache
    # writer (zstd) segfaults serializing the largest CPU executables
    # (the fused partition-DP program), and cross-process cache writes
    # can race a concurrent TPU warmup. TPU runs keep the cache.
    os.environ.setdefault("SVT_TPU_JAX_CACHE", "off")
    import jax

    jax.config.update("jax_platforms", "cpu")


# XLA-CPU hardening: compiling the largest fused programs after many
# prior compilations in one process aborts/segfaults inside
# backend_compile_and_load (reproduced WITHOUT the axon plugin, jax
# 0.8-era CPU backend; crash point jax/_src/compiler.py:362). Dropping
# the accumulated executables between test modules keeps the compiler
# healthy and costs only recompiles that the per-module tests would pay
# anyway on a fresh process.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    try:
        import jax
        jax.clear_caches()
    except Exception:
        pass
