"""svt_av1_tpu — a TPU-native AV1 encoder framework (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of SVT-AV1 (reference:
ateme-developers/SVT-AV1-1 v0.4.0) for TPU hardware:

- superblock compute (transforms, quant, intra/inter prediction, RD scoring,
  in-loop filters) runs as batched XLA/Pallas programs over tiles of 64x64
  superblocks (``svt_av1_tpu.ops``),
- entropy coding is a two-phase design: the device produces token + context
  streams in parallel, a serial range coder (host NumPy now, C later) emits
  the conformant bitstream (``svt_av1_tpu.entropy``),
- multi-chip scaling shards superblock tiles over a ``jax.sharding.Mesh``
  (``svt_av1_tpu.parallel``), GOPs shard across hosts,
- the public API mirrors the reference's 7-step lifecycle
  (``Source/API/EbApi.h:505-592``): init → set parameter → send pictures →
  get packets (``svt_av1_tpu.api``).
"""

__version__ = "0.1.0"

from svt_av1_tpu.config import EncoderConfig  # noqa: F401
