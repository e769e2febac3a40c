#!/usr/bin/env python
"""Extract the intra top-right / bottom-left availability bitmap tables
(normative coding-order facts; reference EbIntraPrediction.c has_tr_* /
has_bl_* arrays) into an .npz file keyed by BLOCK_* index.

Run:  python tools/extract_avail_tables.py [reference_root]
"""

import re
import sys
from pathlib import Path

import numpy as np

ref = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
src = (ref / "Source/Lib/Codec/EbIntraPrediction.c").read_text()

# BLOCK_* enum order used by the has_*_tables aggregates
NAMES = ["4x4", "4x8", "8x4", "8x8", "8x16", "16x8", "16x16", "16x32",
         "32x16", "32x32", "32x64", "64x32", "64x64", "64x128", "128x64",
         "128x128", "4x16", "16x4", "8x32", "32x8", "16x64", "64x16"]

out = {}
for prefix in ("has_tr", "has_bl"):
    for i, n in enumerate(NAMES):
        m = re.search(rf"static uint8_t {prefix}_{n}\[\d+\] = \{{(.*?)\}};",
                      src, re.S)
        assert m, f"{prefix}_{n} not found"
        vals = [int(v) for v in re.findall(r"\d+", m.group(1))]
        out[f"{prefix}_{i}"] = np.array(vals, dtype=np.uint8)

# Partition-aware variants for square members of VERT_A/VERT_B T-shapes
# (coding order TL, BL, TR within the mixed vertical partition — reference
# EbIntraPrediction.c:5657-5888 has_tr_vert_* / has_bl_vert_* and the
# get_has_tr_table/get_has_bl_table selectors). Only the square sizes have
# distinct tables; rect members reuse the base tables above.
for prefix in ("has_tr", "has_bl"):
    for n in ("8x8", "16x16", "32x32", "64x64"):
        i = NAMES.index(n)
        m = re.search(
            rf"static uint8_t {prefix}_vert_{n}\[\d+\] = \{{(.*?)\}};",
            src, re.S)
        assert m, f"{prefix}_vert_{n} not found"
        vals = [int(v) for v in re.findall(r"\d+", m.group(1))]
        out[f"{prefix}_vert_{i}"] = np.array(vals, dtype=np.uint8)

dst = Path(__file__).resolve().parent.parent / \
    "svt_av1_tpu/pipeline/data/avail_tables.npz"
dst.parent.mkdir(exist_ok=True)
np.savez_compressed(dst, **out)
print(f"wrote {dst} ({len(out)} tables)")
