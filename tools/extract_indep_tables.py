"""Extract the normative constant tables the independent conformance
decoder needs (smooth weights, directional derivatives, sub-pel filter
kernels) from the reference tree into verify/data/indep_tables.npz.

These are spec constants (AV1 7.11.2 sm_weights / dr_intra_derivative,
7.11.3 interpolation filters); only the tables are extracted — all
algorithm code in svt_av1_tpu/verify/indep.py is written independently.

Run:  python tools/extract_indep_tables.py [reference_root]
"""

import re
import sys
from pathlib import Path

import numpy as np

ROOT = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_tpu" / "verify" \
    / "data" / "indep_tables.npz"


def _ints_in_braces(text: str, name: str, after: str = "") -> list:
    i = text.index(name, text.index(after) if after else 0)
    start = text.index("{", i)
    depth = 0
    for j in range(start, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                body = text[start:j + 1]
                break
    body = re.sub(r"//[^\n]*", "", body)
    return [int(t) for t in re.findall(r"-?\d+", body)]


intra = (ROOT / "Source/Lib/ASM_AVX2/EbIntraPrediction_AVX2.h").read_text()
sm = _ints_in_braces(intra, "sm_weight_arrays")
assert len(sm) == 128 and sm[4] == 255 and sm[-1] == 4

codec = (ROOT / "Source/Lib/Codec/EbIntraPrediction.c").read_text()
dr = _ints_in_braces(codec, "dr_intra_derivative")
assert len(dr) == 90 and dr[3] == 1023 and dr[45] == 64

inter = (ROOT / "Source/Lib/Codec/EbInterPrediction.c").read_text()
f8 = _ints_in_braces(inter, "sub_pel_filters_8[")
f4 = _ints_in_braces(inter, "sub_pel_filters_4[")
f8sm = _ints_in_braces(inter, "sub_pel_filters_8smooth[")
f8sh = _ints_in_braces(inter, "sub_pel_filters_8sharp[")
f4sm = _ints_in_braces(inter, "sub_pel_filters_4smooth[")
assert len(f8) == 128 and f8[3] == 128
assert len(f4) == 128 and f4[3] == 128
assert len(f8sm) == 128 and len(f8sh) == 128 and len(f4sm) == 128

np.savez_compressed(
    OUT,
    sm_weight_arrays=np.array(sm, dtype=np.int64),
    dr_intra_derivative=np.array(dr, dtype=np.int64),
    sub_pel_filters_8=np.array(f8, dtype=np.int64).reshape(16, 8),
    sub_pel_filters_4=np.array(f4, dtype=np.int64).reshape(16, 8),
    sub_pel_filters_8smooth=np.array(f8sm,
                                     dtype=np.int64).reshape(16, 8),
    sub_pel_filters_8sharp=np.array(f8sh,
                                    dtype=np.int64).reshape(16, 8),
    sub_pel_filters_4smooth=np.array(f4sm,
                                     dtype=np.int64).reshape(16, 8))
print(f"wrote {OUT}")
