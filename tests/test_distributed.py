"""Cross-host (DCN) GOP sharding smoke: two jax.distributed processes
encode disjoint closed GOPs and process 0 assembles the stream via a
cross-process collective — the multi-host layer above the single-mesh
ICI paths in parallel/tiles.py (SURVEY §7.2 step 10). CPU-only: each
"host" is a process with its own XLA CPU client.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(sys.argv[0]))))
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.encoder import encode_ivf
from svt_av1_tpu.bitstream.ivf import write_ivf_header

pid = int(sys.argv[2])
w, h, n = 128, 96, 4
rng = np.random.default_rng(7)
base = rng.integers(0, 255, (h + 32, w + 32)).astype(np.uint8)
frames = [(base[2*t:2*t+h, 3*t:3*t+w],
           np.full((h//2, w//2), 100 + 3*t, np.uint8),
           np.full((h//2, w//2), 140, np.uint8)) for t in range(2*n)]
cfg = EncoderConfig(width=w, height=h, qp=40)
# each process encodes ITS closed GOP (keyframe-delimited, independent)
mine = frames[pid*n:(pid+1)*n]
iv = encode_ivf(mine, cfg)
import io
from svt_av1_tpu.bitstream.ivf import read_ivf
_, pkts = read_ivf(io.BytesIO(iv))
payload = b"".join(p for _, p in pkts)
# DCN-style assembly: fixed-size all_gather of the GOP payloads
CAP = 1 << 20
buf = np.zeros(CAP, np.uint8)
arr = np.frombuffer(payload, np.uint8)
assert len(arr) <= CAP
buf[:len(arr)] = arr
from jax.experimental.multihost_utils import process_allgather
gathered = process_allgather(jnp.asarray(buf))
lens = process_allgather(jnp.asarray(np.int64(len(arr))))
if pid == 0:
    out = b"".join(np.asarray(gathered[i])[:int(lens[i])].tobytes()
                   for i in range(2))
    serial = encode_ivf(frames[:n], cfg) + encode_ivf(frames[n:], cfg)
    import io as _io
    sp = b""
    for half in (encode_ivf(frames[:n], cfg), encode_ivf(frames[n:], cfg)):
        _, pk = read_ivf(_io.BytesIO(half))
        sp += b"".join(p for _, p in pk)
    assert out == sp, "distributed GOP payloads != serial"
    print("DIST_OK", len(out))
"""


@pytest.mark.skipif(os.environ.get("SVT_TPU_SKIP_DIST") == "1",
                    reason="distributed smoke disabled")
def test_two_process_gop_sharding(tmp_path):
    script = tmp_path / "dist_worker.py"
    script.write_text(_WORKER)
    port = 12000 + os.getpid() % 2000
    coord = f"127.0.0.1:{port}"
    # the directory numpy actually loads from (robust under python -S
    # and venv/sysconfig layout differences)
    site_dir = os.path.dirname(os.path.dirname(np.__file__))
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               PYTHONPATH=site_dir + ":"
               + os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
               SVT_TPU_JAX_CACHE="off")
    procs = [subprocess.Popen(
        [sys.executable, "-S", str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=os.path.dirname(script))
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    assert "DIST_OK" in outs[0], outs[0][-2000:]
