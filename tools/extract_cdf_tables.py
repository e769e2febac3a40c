#!/usr/bin/env python
"""Extract AV1 default-CDF constant tables into an .npz data file.

The default probability tables are normative AV1 constants (identical in every
conformant implementation; spec section "Default CDF tables"). Rather than
hand-retyping ~20k numbers, this tool parses them out of the reference tree's
table file (``EbCabacContextModel.c``) — pure spec *data*, no code — expands
the AOM_CDF macro form (values stored as 32768-x with a trailing 0 count slot,
``EbCabacContextModel.h:37-107``) and writes
``svt_av1_tpu/entropy/data/default_cdfs.npz``.

Run:  python tools/extract_cdf_tables.py [reference_root]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

CDF_PROB_TOP = 1 << 15

# (array name in reference file, output key, shape incl. CDF_SIZE dim)
TABLES = [
    ("default_kf_y_mode_cdf", "kf_y_mode", (5, 5, 14)),
    ("default_angle_delta_cdf", "angle_delta", (8, 8)),
    ("default_if_y_mode_cdf", "if_y_mode", (4, 14)),
    ("default_uv_mode_cdf", "uv_mode", (2, 13, 15)),
    ("default_partition_cdf", "partition", (20, 11)),
    ("default_intra_ext_tx_cdf", "intra_ext_tx", (3, 4, 13, 17)),
    ("default_inter_ext_tx_cdf", "inter_ext_tx", (4, 4, 17)),
    ("default_cfl_sign_cdf", "cfl_sign", (9,)),
    ("default_cfl_alpha_cdf", "cfl_alpha", (6, 17)),
    ("default_skip_cdfs", "skip", (3, 3)),
    ("default_skip_mode_cdfs", "skip_mode", (3, 3)),
    ("default_intrabc_cdf", "intrabc", (3,)),
    ("default_filter_intra_mode_cdf", "filter_intra_mode", (6,)),
    ("default_filter_intra_cdfs", "filter_intra", (22, 3)),
    ("default_delta_q_cdf", "delta_q", (5,)),
    ("default_tx_size_cdf", "tx_size", (4, 3, 4)),
    ("default_txfm_partition_cdf", "txfm_partition", (21, 3)),
    ("default_intra_inter_cdf", "intra_inter", (4, 3)),
    ("default_newmv_cdf", "newmv", (6, 3)),
    ("default_zeromv_cdf", "zeromv", (2, 3)),
    ("default_refmv_cdf", "refmv", (6, 3)),
    ("default_drl_cdf", "drl", (3, 3)),
    ("default_comp_inter_cdf", "comp_inter", (5, 3)),
    ("default_single_ref_cdf", "single_ref", (3, 6, 3)),
    ("default_comp_ref_type_cdf", "comp_ref_type", (5, 3)),
    ("default_comp_ref_cdf", "comp_ref", (3, 3, 3)),
    ("default_comp_bwdref_cdf", "comp_bwdref", (3, 2, 3)),
    ("default_switchable_interp_cdf", "switchable_interp", (16, 4)),
    ("default_inter_compound_mode_cdf", "inter_compound_mode", (8, 9)),
    ("default_switchable_restore_cdf", "switchable_restore", (5,)),
    ("default_wiener_restore_cdf", "wiener_restore", (4,)),
    ("default_sgrproj_restore_cdf", "sgrproj_restore", (4,)),
    # coefficient coding (per qindex bucket)
    ("av1_default_dc_sign_cdfs", "dc_sign", (4, 2, 3, 3)),
    ("av1_default_txb_skip_cdfs", "txb_skip", (4, 5, 13, 3)),
    ("av1_default_eob_extra_cdfs", "eob_extra", (4, 5, 2, 22, 3)),
    ("av1_default_eob_multi16_cdfs", "eob_pt_16", (4, 2, 2, 6)),
    ("av1_default_eob_multi32_cdfs", "eob_pt_32", (4, 2, 2, 7)),
    ("av1_default_eob_multi64_cdfs", "eob_pt_64", (4, 2, 2, 8)),
    ("av1_default_eob_multi128_cdfs", "eob_pt_128", (4, 2, 2, 9)),
    ("av1_default_eob_multi256_cdfs", "eob_pt_256", (4, 2, 2, 10)),
    ("av1_default_eob_multi512_cdfs", "eob_pt_512", (4, 2, 2, 11)),
    ("av1_default_eob_multi1024_cdfs", "eob_pt_1024", (4, 2, 2, 12)),
    ("av1_default_coeff_lps_multi_cdfs", "coeff_br", (4, 5, 2, 21, 5)),
    ("av1_default_coeff_base_multi_cdfs", "coeff_base", (4, 5, 2, 42, 5)),
    ("av1_default_coeff_base_eob_multi_cdfs", "coeff_base_eob",
     (4, 5, 2, 4, 4)),
]

_CDF_MACRO = re.compile(r"AOM_CDF(\d+)\s*\(")


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def find_initializer(text: str, name: str) -> str:
    """Return the text between the outermost braces of ``name[...] = {...};``"""
    m = re.search(re.escape(name) + r"\s*(\[[^=]*)?=", text)
    if not m:
        raise KeyError(f"table {name} not found")
    start = text.index("{", m.end())
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start:i + 1]
    raise ValueError(f"unbalanced braces for {name}")


def expand_macros(init: str) -> str:
    """Expand AOM_CDFn(a0..a_{n-2}) -> 32768-a0, ..., 32768-a_{n-2}, 0, 0."""
    out = []
    pos = 0
    for m in _CDF_MACRO.finditer(init):
        out.append(init[pos:m.start()])
        n = int(m.group(1))
        # find matching close paren
        depth = 1
        j = m.end()
        while depth:
            if init[j] == "(":
                depth += 1
            elif init[j] == ")":
                depth -= 1
            j += 1
        # args may be simple constant expressions like "128 * 125"
        args = [int(eval(a.strip(), {"__builtins__": {}}))
                for a in init[m.end():j - 1].split(",")]
        assert len(args) == n - 1, (n, args)
        vals = [CDF_PROB_TOP - a for a in args] + [0, 0]
        out.append(", ".join(str(v) for v in vals))
        pos = j
    out.append(init[pos:])
    return "".join(out)


def _split_groups(init: str):
    """Split one brace level: '{a, {b}, {c}}' -> ['a', '{b}', '{c}'] items."""
    assert init[0] == "{" and init[-1] == "}"
    inner = init[1:-1]
    groups, depth, start = [], 0, 0
    for i, ch in enumerate(inner):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        elif ch == "," and depth == 0:
            groups.append(inner[start:i].strip())
            start = i + 1
    tail = inner[start:].strip()
    if tail:
        groups.append(tail)
    return groups


def _fill(init: str, shape, out, base):
    """C-style aggregate initialization with zero fill (handles ragged
    AOM_CDF13 rows inside CDF_SIZE(14) arrays etc.)."""
    if "{" not in init:
        nums = [int(t) for t in re.findall(r"-?\d+", init)]
        assert len(nums) <= int(np.prod(shape)), "too many initializers"
        flat = out.reshape(-1)
        off = base
        for v in nums:
            flat[off] = v
            off += 1
        return
    groups = _split_groups(init)
    sub = int(np.prod(shape[1:], dtype=int)) if len(shape) > 1 else 1
    assert len(groups) <= shape[0], f"too many groups {len(groups)}>{shape[0]}"
    for gi, g in enumerate(groups):
        if g.startswith("{"):
            _fill(g, shape[1:], out, base + gi * sub)
        else:  # flat numbers at this level — treat whole init as a leaf
            nums = [int(t) for t in re.findall(r"-?\d+", init)]
            assert len(nums) <= int(np.prod(shape)), "too many initializers"
            flat = out.reshape(-1)
            for k, v in enumerate(nums):
                flat[base + k] = v
            return


def parse_table(text: str, name: str, shape) -> np.ndarray:
    init = expand_macros(find_initializer(text, name))
    flat = np.zeros(int(np.prod(shape)), dtype=np.int64)
    _fill(init, tuple(shape), flat, 0)
    arr = flat.astype(np.uint16).reshape(shape)
    # sanity: every CDF row must be monotonically non-increasing and end 0,0
    rows = arr.reshape(-1, shape[-1])
    assert (rows[:, -1] == 0).all(), name
    assert (rows[:, -2] == 0).all(), name
    diffs = rows[:, :-2].astype(np.int32)
    assert (diffs[:, :-1] >= diffs[:, 1:]).all(), f"{name} not monotone"
    return arr


# quantizer step-size lookups (spec Dc_Qlookup/Ac_Qlookup), from
# EbModeDecisionConfigurationProcess.c:160-255
QUANT_TABLES = [
    ("dc_qlookup_Q3", "dc_qlookup_8", (256,)),
    ("dc_qlookup_10_Q3", "dc_qlookup_10", (256,)),
    ("dc_qlookup_12_Q3", "dc_qlookup_12", (256,)),
    ("ac_qlookup_Q3", "ac_qlookup_8", (256,)),
    ("ac_qlookup_10_Q3", "ac_qlookup_10", (256,)),
    ("ac_qlookup_12_Q3", "ac_qlookup_12", (256,)),
]


def parse_flat(text: str, name: str, shape) -> np.ndarray:
    init = find_initializer(text, name)
    nums = [int(t) for t in re.findall(r"-?\d+", init)]
    assert len(nums) == int(np.prod(shape)), (name, len(nums))
    return np.array(nums, dtype=np.int32).reshape(shape)


def main():
    ref = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference")
    src = (ref / "Source/Lib/Codec/EbCabacContextModel.c").read_text()
    text = strip_comments(src)
    out = {}
    for cname, key, shape in TABLES:
        out[key] = parse_table(text, cname, shape)
        print(f"{key:20s} {shape} ok")
    qsrc = strip_comments(
        (ref / "Source/Lib/Codec/EbModeDecisionConfigurationProcess.c")
        .read_text())
    for cname, key, shape in QUANT_TABLES:
        out[key] = parse_flat(qsrc, cname, shape)
        assert (np.diff(out[key]) >= 0).all(), key  # step sizes are monotone
        print(f"{key:20s} {shape} ok")
    dst = Path(__file__).resolve().parent.parent / \
        "svt_av1_tpu/entropy/data/default_cdfs.npz"
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} ({dst.stat().st_size} bytes, {len(out)} tables)")


if __name__ == "__main__":
    main()
