"""Decoder CLI: IVF (this encoder's streams) -> raw YUV / y4m.

The in-repo verification decoder as a tool (the environment ships no
external AV1 decoder; SURVEY.md §4).

Usage: python -m svt_av1_tpu.app.decode_cli in.ivf out.yuv
"""

from __future__ import annotations

import argparse
import sys

from svt_av1_tpu.pipeline.decode import StreamDecoder
from svt_av1_tpu.bitstream.ivf import read_ivf
from svt_av1_tpu.utils import yuv


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="svt_av1_tpu.decode")
    p.add_argument("input", help="IVF file")
    p.add_argument("output", help="raw planar YUV output")
    args = p.parse_args(argv)
    dec = StreamDecoder()
    n = 0
    with open(args.input, "rb") as f, open(args.output, "wb") as out:
        info, frames = read_ivf(f)
        for _, payload in frames:
            recon = dec.decode_tu(payload)
            if recon is not None:
                yuv.write_yuv_frame(out, yuv.Frame(*recon))
                n += 1
    print(f"decoded {n} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
