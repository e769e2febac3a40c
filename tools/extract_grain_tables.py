#!/usr/bin/env python
"""Extract the normative film-grain gaussian_sequence table (AV1 spec
constant; 2048 values) from the reference tree into an .npz data file.

Run:  python tools/extract_grain_tables.py [reference_root]
"""

import re
import sys
from pathlib import Path

import numpy as np

ref = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
src = (ref / "Source/Lib/Codec/grainSynthesis.c").read_text()

m = re.search(r"gaussian_sequence\[2048\]\s*=\s*\{(.*?)\};", src, re.S)
vals = [int(v) for v in re.findall(r"-?\d+", m.group(1))]
assert len(vals) == 2048, len(vals)
out = Path(__file__).parent.parent / "svt_av1_tpu/ops/data/grain_tables.npz"
np.savez_compressed(out, gaussian_sequence=np.array(vals, dtype=np.int32))
print(f"wrote {out} ({len(vals)} values)")
