#!/usr/bin/env python
"""Extract the normative AV1 transform butterfly networks into an .npz file.

The AV1 inverse transforms are normative bit-exact integer butterfly networks
(spec 7.13.2); the forward ones are their libaom-standard counterparts. Like
the default CDFs, the network *structure* (stage op lists + cosine tables) is
spec data shared by every implementation. This tool parses the 1D transform
functions out of the reference tree (``EbTransforms.c`` av1_{i,f}dct*_new,
av1_{i,f}adst{8,16}_new) into flat op tables executed by our own batched
engine (``svt_av1_tpu/ops/txfm1d.py``) — so the ~3000 lines of scalar C
become a few gather/multiply-add stages over [batch, N] tensors.

Op encoding (one row per output element per stage):
  stage, out, a, b, w0, w1, kind
  kind 0: out = w0*x[a] + w1*x[b]                      (w in {-1,0,1})
  kind 1: out = round_shift(s0*cospi[i0]*x[a] + s1*cospi[i1]*x[b], cos_bit)
          (w0 = s0*(i0+1), w1 = s1*(i1+1) — index offset by 1 to keep sign)
  kind 2: out = clamp(w0*x[a] + w1*x[b], stage_clamp_bits)

Run: python tools/extract_txfm_networks.py [reference_root]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

FUNCS = [
    ("av1_idct4_new", "idct4", 4),
    ("av1_idct8_new", "idct8", 8),
    ("av1_idct16_new", "idct16", 16),
    ("av1_idct32_new", "idct32", 32),
    ("av1_idct64_new", "idct64", 64),
    ("av1_iadst8_new", "iadst8", 8),
    ("av1_iadst16_new", "iadst16", 16),
    ("av1_fdct4_new", "fdct4", 4),
    ("av1_fdct8_new", "fdct8", 8),
    ("av1_fdct16_new", "fdct16", 16),
    ("av1_fdct32_new", "fdct32", 32),
    ("av1_fdct64_new", "fdct64", 64),
    ("av1_fadst8_new", "fadst8", 8),
    ("av1_fadst16_new", "fadst16", 16),
]

RE_STAGE = re.compile(r"//\s*stage\s+(\d+)")
RE_COPY = re.compile(
    r"bf1\[(\d+)\]\s*=\s*(-?)\s*(input|bf0)\[(\d+)\]\s*;")
RE_ADD = re.compile(
    r"bf1\[(\d+)\]\s*=\s*(-?)\s*(input|bf0)\[(\d+)\]\s*([+-])\s*"
    r"(input|bf0)\[(\d+)\]\s*;")
RE_BTF = re.compile(
    r"bf1\[(\d+)\]\s*=\s*half_btf\(\s*(-?)cospi\[(\d+)\]\s*,\s*bf0\[(\d+)\]"
    r"\s*,\s*(-?)cospi\[(\d+)\]\s*,\s*bf0\[(\d+)\]\s*,\s*cos_bit\s*\)\s*;")
RE_CLAMP = re.compile(
    r"bf1\[(\d+)\]\s*=\s*clamp_value\(\s*(-?)\s*bf0\[(\d+)\]\s*"
    r"(?:([+-])\s*bf0\[(\d+)\]\s*)?,\s*stage_range\[stage\]\s*\)\s*;")


def extract_function(text: str, cname: str) -> str:
    m = re.search(r"void\s+" + re.escape(cname) + r"\s*\(", text)
    if not m:
        raise KeyError(cname)
    start = text.index("{", m.end())
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start:i + 1]
    raise ValueError(cname)


def parse_network(body: str, cname: str, size: int) -> np.ndarray:
    # strip commented-out lines to avoid matching them
    body = re.sub(r"//[^\n]*", "", body)
    body = re.sub(r"/\*.*?\*/", " ", body, flags=re.S)
    ops = []
    stage = 0
    # Walk statements in order; the "// stage" comments are stripped, but the
    # functions always alternate bf0/bf1 buffers, so a new stage begins each
    # time an output index repeats OR when a "bf1 = ..." buffer swap occurs.
    # Simpler & robust: detect stage boundaries by "stage++" statements.
    pos = 0
    stmts = re.split(r"stage\+\+\s*;", body)
    for si, chunk in enumerate(stmts):
        if si == 0:
            continue  # preamble before first stage++
        stage = si
        for m in RE_BTF.finditer(chunk):
            out, s0, i0, a, s1, i1, b = m.groups()
            w0 = (int(i0) + 1) * (-1 if s0 == "-" else 1)
            w1 = (int(i1) + 1) * (-1 if s1 == "-" else 1)
            ops.append((stage, int(out), int(a), int(b), w0, w1, 1))
        for m in RE_CLAMP.finditer(chunk):
            out, s0, a, sign1, b = m.groups()
            w0 = -1 if s0 == "-" else 1
            if b is None:
                ops.append((stage, int(out), int(a), 0, w0, 0, 2))
            else:
                w1 = -1 if sign1 == "-" else 1
                ops.append((stage, int(out), int(a), int(b), w0, w1, 2))
        for m in RE_ADD.finditer(chunk):
            out, s0, src0, a, sign1, src1, b = m.groups()
            assert src0 == src1
            w0 = -1 if s0 == "-" else 1
            w1 = -1 if sign1 == "-" else 1
            ops.append((stage, int(out), int(a), int(b), w0, w1, 0))
        for m in RE_COPY.finditer(chunk):
            out, s0, src, a = m.groups()
            w0 = -1 if s0 == "-" else 1
            ops.append((stage, int(out), int(a), 0, w0, 0, 0))
    arr = np.array(sorted(ops), dtype=np.int32)
    # validate: every stage defines each of the `size` outputs exactly once
    stages = np.unique(arr[:, 0])
    for s in stages:
        outs = np.sort(arr[arr[:, 0] == s][:, 1])
        assert np.array_equal(outs, np.arange(size)), \
            f"{cname} stage {s}: outputs {outs}"
    print(f"  {cname:18s} -> {len(stages)} stages, {len(arr)} ops")
    return arr


def parse_const_2d(text: str, name: str, shape) -> np.ndarray:
    m = re.search(re.escape(name) + r"[^=]*=\s*\{", text)
    start = text.index("{", m.start())
    depth, i = 0, start
    while True:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    nums = [int(t) for t in re.findall(r"-?\d+", text[start:i + 1])]
    assert len(nums) == int(np.prod(shape)), (name, len(nums), shape)
    return np.array(nums, dtype=np.int64).reshape(shape)


def main():
    ref = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference")
    text = (ref / "Source/Lib/Codec/EbTransforms.c").read_text()
    out = {}
    for cname, key, size in FUNCS:
        body = extract_function(text, cname)
        out["net_" + key] = parse_network(body, cname, size)
    out["cospi"] = parse_const_2d(text, "av1_cospi_arr_data", (7, 64))
    out["sinpi"] = parse_const_2d(text, "av1_sinpi_arr_data", (7, 5))
    # verify cosine tables against their defining formula
    for i in range(7):
        bit = 10 + i
        ref_cos = np.round(np.cos(np.pi * np.arange(64) / 128) * (1 << bit))
        assert np.array_equal(out["cospi"][i], ref_cos.astype(np.int64)), bit
        # sinpi is the rounded formula *adjusted* so sinpi[1]+sinpi[2]==sinpi[4]
        ref_sin = np.round(np.sqrt(2) * np.sin(np.arange(5) * np.pi / 9)
                           * 2 / 3 * (1 << bit))
        assert np.abs(out["sinpi"][i] - ref_sin).max() <= 1, bit
        s = out["sinpi"][i]
        assert s[1] + s[2] == s[4], bit
    dst = Path(__file__).resolve().parent.parent / \
        "svt_av1_tpu/ops/data/txfm_networks.npz"
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} ({dst.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
