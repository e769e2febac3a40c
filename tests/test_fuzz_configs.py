"""Cross-feature fuzz: random tool combinations x random content must
always produce byte-exact encode->decode roundtrips. This is the
interaction net over CDEF/LR/AQ/grain/tx-search/tiles/bit-depth/GOP
options that single-feature tests cannot cover."""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.decode import StreamDecoder
from svt_av1_tpu.pipeline.encoder import Encoder


def _content(rng, w, h, bd):
    peak = (1 << bd) - 1
    yy, xx = np.mgrid[0:h, 0:w]
    kind = rng.randint(3)
    if kind == 0:      # noise
        y = rng.randint(0, peak + 1, (h, w))
    elif kind == 1:    # structure + noise
        y = (peak / 2 + (peak / 3) * np.sin(yy / 9.0) * np.cos(xx / 13.0)
             + rng.normal(0, peak / 32, (h, w)))
    else:              # flat gradient
        y = np.tile(np.linspace(0, peak, w), (h, 1))
    dt = np.uint16 if bd > 8 else np.uint8
    y = np.clip(y, 0, peak).astype(dt)
    u = np.clip(rng.randint(0, peak + 1, ((h + 1) // 2, (w + 1) // 2)),
                0, peak).astype(dt)
    v = np.full(((h + 1) // 2, (w + 1) // 2), peak // 2, dt)
    return y, u, v


@pytest.mark.parametrize("seed", range(12))
def test_random_tool_combination_roundtrip(seed):
    rng = np.random.RandomState(1000 + seed)
    w = int(rng.choice([64, 128, 200, 192]))
    h = int(rng.choice([64, 96, 120, 128]))
    bd = int(rng.choice([8, 8, 10]))
    tiles = int(rng.choice([0, 1])) if w >= 128 else 0
    enable_restoration = bool(rng.randint(2))
    cfg = EncoderConfig(
        width=w, height=h, bit_depth=bd,
        qp=int(rng.randint(15, 60)),
        intra_period=int(rng.choice([-1, 0, 4])),
        hierarchical_levels=int(rng.choice([0, 1, 2])),
        enable_cdef=bool(rng.randint(2)),
        enable_restoration=enable_restoration,
        enable_dlf=bool(rng.randint(2)),
        enable_tx_type_search=bool(rng.randint(2)),
        enable_interp_filter_search=bool(rng.randint(2)),
        adaptive_quantization=int(rng.randint(3)),  # 2 = TPL AQ
        film_grain_strength=int(rng.choice([0, 0, 12])),
        tile_cols_log2=tiles,
        fixed_partition_size=[None, 16, 32][rng.randint(3)],
        nfl=int(rng.randint(1, 4)),
        scene_change_detection=False,
        native_entropy=bool(rng.randint(2)),
    )
    n_frames = 3 if cfg.intra_period != 0 else 2
    frames = [_content(rng, w, h, bd) for _ in range(n_frames)]
    enc = Encoder(cfg)
    outs = []
    for f in frames:
        enc.send_picture(*f)
        while (p := enc.get_packet()) is not None:
            outs.append(p)
    enc.flush()
    while (p := enc.get_packet()) is not None:
        outs.append(p)
    dec = StreamDecoder()
    shown = 0
    for tu, disp in outs:
        out = dec.decode_tu(tu)
        if disp is None:
            continue
        shown += 1
        for p in range(3):
            assert (out[p] == disp[p]).all(), \
                f"seed {seed} cfg {cfg} frame {shown} plane {p}"
    assert shown == n_frames, (seed, shown, n_frames)
