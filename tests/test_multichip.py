"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

These exercise the shard_map/Mesh paths in-tree (they previously ran
only in the driver's dryrun): tile-sharded keyframe byte-identity with
halo verification, the halo-CONSUMING distributed DLF (ppermute seam
exchange + write-back merge + psum'd level search), and the tile-sharded
inter shape group patched into the production encoder.

Reference analogues: segment fan-out EbCdefProcess.c:469,
EbRestProcess.c:269, ME segments EbMotionEstimationProcess.c:434.
"""

import dataclasses
import io

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig


def _mesh(n):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("tile",))


def _clip(w, h, n, seed=9):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 64, w + 64)).astype(np.uint8)
    out = []
    for t in range(n):
        y = base[2 * t:2 * t + h, 3 * t:3 * t + w]
        u = np.full(((h + 1) // 2, (w + 1) // 2), 100 + 5 * t, np.uint8)
        v = rng.integers(100, 160, ((h + 1) // 2, (w + 1) // 2)) \
            .astype(np.uint8)
        out.append((y, u, v))
    return out


def test_keyframe_tiles_sharded_byte_identity():
    from svt_av1_tpu.parallel.tiles import encode_keyframe_tiles_sharded
    from svt_av1_tpu.pipeline.wavefront import encode_keyframe_wavefront

    mesh = _mesh(8)
    w, h = 64 * 8, 128
    (y, u, v), = _clip(w, h, 1)
    cfg = EncoderConfig(width=w, height=h, qp=40, tile_cols_log2=3,
                        fixed_partition_size=16,
                        enable_intra_edge_filter=False)
    tu_sharded, halo_ok, stats = encode_keyframe_tiles_sharded(
        y, u, v, cfg, mesh)
    assert halo_ok, "ppermute halo exchange mismatch"
    assert stats > 0
    tu_serial, _, _ = encode_keyframe_wavefront(y, u, v, cfg)
    assert tu_sharded == tu_serial


def _blocky(src, step=16):
    """Blockwise-mean version of src (a deblockable reconstruction)."""
    h, w = src.shape
    out = src.astype(np.int64).copy()
    for r in range(0, h, step):
        for c in range(0, w, step):
            out[r:r + step, c:c + step] = \
                int(src[r:r + step, c:c + step].mean())
    return out.astype(src.dtype)


def test_dlf_sharded_matches_host():
    from svt_av1_tpu.ops import dlf
    from svt_av1_tpu.parallel.tiles import dlf_search_apply_sharded

    mesh = _mesh(8)
    w, h = 64 * 8, 64
    mi_cols, mi_rows = w // 4, h // 4
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    src_y = np.clip(120 + 60 * np.sin(xx / 37) + 40 * np.cos(yy / 23),
                    0, 255).astype(np.uint8)
    src_u = np.clip(110 + 40 * np.sin((xx + yy)[: h // 2, : w // 2] / 31),
                    0, 255).astype(np.uint8)
    src_v = np.clip(130 + 40 * np.cos((xx - yy)[: h // 2, : w // 2] / 29),
                    0, 255).astype(np.uint8)
    rec = [_blocky(src_y), _blocky(src_u), _blocky(src_v)]
    src = [src_y.astype(np.int64), src_u.astype(np.int64),
           src_v.astype(np.int64)]
    leaf_sizes = {(r, c): 16 for r in range(0, mi_rows, 4)
                  for c in range(0, mi_cols, 4)}
    qindex = 180

    levels_host = dlf.pick_levels(rec, src, leaf_sizes, mi_rows,
                                  mi_cols, qindex, 8)
    host_planes = [p.copy() for p in rec]
    dlf.loop_filter_frame(host_planes, leaf_sizes, mi_rows, mi_cols,
                          levels_host, bd=8)
    assert levels_host[0] > 0, "test content must engage the filter"

    planes, levels = dlf_search_apply_sharded(
        rec, src, leaf_sizes, mi_rows, mi_cols, qindex, 8, mesh)
    assert levels == levels_host
    for p_sharded, p_host in zip(planes, host_planes):
        np.testing.assert_array_equal(p_sharded, p_host)


def test_inter_shape_group_sharded_byte_identity():
    """Low-delay P encode with the fused inter shape group fanned out
    over the mesh must emit the exact serial-device bitstream."""
    from svt_av1_tpu.ops import device_inter as di
    from svt_av1_tpu.parallel.tiles import make_sharded_shape_group_issue
    from svt_av1_tpu.pipeline.encoder import encode_ivf

    mesh = _mesh(8)
    w, h = 64 * 8, 64
    frames = _clip(w, h, 3)
    cfg = EncoderConfig(width=w, height=h, qp=40,
                        hierarchical_levels=0, backend="device",
                        fixed_partition_size=16)
    serial = encode_ivf(frames, cfg)

    patched = make_sharded_shape_group_issue(mesh, strip_w=w // 8)
    orig = di.shape_group_issue
    di.shape_group_issue = patched
    try:
        sharded = encode_ivf(frames, cfg)
    finally:
        di.shape_group_issue = orig
    assert sharded == serial

    from svt_av1_tpu.pipeline.decode import decode_ivf
    assert len(decode_ivf(io.BytesIO(sharded))) == 3
