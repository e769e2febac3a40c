"""Multi-chip tile-parallel keyframe encode (shard_map over a tile axis).

The TPU-native form of SURVEY.md §2.2's segment parallelism: AV1 tiles
have no cross-tile prediction or entropy dependencies, so each device
runs the fused whole-tile analysis program (ops.device_tile) on its own
tile shard. The mesh program additionally exercises the two ICI
communication patterns the multi-chip design needs:

- **halo exchange**: each device ppermutes its rightmost reconstruction
  columns to the right neighbor (the filter-halo pattern — DLF/CDEF/LR
  need <= 8 px of neighbor pixels at tile seams);
- **stats reduction**: per-tile coded-level sums are psum'd into the
  frame totals the rate controller consumes.

The assembled bitstream is asserted byte-identical to the single-device
encoder: decisions are computed by the same integer tile body, filters
and the per-tile entropy pass run on host exactly as in the serial path.

Reference analogue: per-segment CDEF/REST fan-out (EbCdefProcess.c:469)
and the row/segment counters of EbEncDecSegments.h — here replaced by
SPMD collectives over a jax Mesh.
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.config import EncoderConfig


def encode_keyframe_tiles_sharded(y, u, v, cfg: EncoderConfig, mesh):
    """Encode a keyframe with per-tile analysis sharded over ``mesh``
    (1-D, axis name "tile"; one equal-size tile per device).

    Returns (tu_bytes, halo_ok, stats) where halo_ok confirms the
    ppermuted halo strips match the neighbor tiles' recon and stats is
    the psum'd frame-level coded-level total."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from svt_av1_tpu.ops import device_tile
    from svt_av1_tpu.pipeline import common
    from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder

    n_dev = mesh.devices.size
    enc = WavefrontIntraEncoder(cfg)
    frame_src = [common.pad_to_multiple(y, 64).astype(np.int32),
                 common.pad_to_multiple(u, 32).astype(np.int32),
                 common.pad_to_multiple(v, 32).astype(np.int32)]
    from svt_av1_tpu.bitstream import obu
    tile_log2 = obu.clamp_tile_log2(enc.seq, cfg.tile_cols_log2,
                                    cfg.tile_rows_log2)
    rects = common.tile_rects(enc.seq.sb_cols, enc.seq.sb_rows,
                              enc.mi_cols, enc.mi_rows, *tile_log2)
    assert len(rects) == n_dev, \
        f"need one tile per device ({len(rects)} tiles, {n_dev} devices)"
    # collect per-tile fused-program inputs (all tiles must share the
    # program key = equal dims and uniform leaves)
    frame_recon = [np.zeros(p.shape, dtype=common.pixel_dtype(
        cfg.bit_depth)) for p in frame_src]
    enc.qmap = None
    cands = common.intra_candidates(cfg)
    keys, args_list = [], []
    for rect in rects:
        enc._enter_tile(frame_src, frame_recon, rect)
        enc.leaf_sizes = enc._fixed_leaf_sizes(cfg.fixed_partition_size)
        enc.max_wh = [(enc.mi_cols * 4, enc.mi_rows * 4),
                      (enc.mi_cols * 2, enc.mi_rows * 2),
                      (enc.mi_cols * 2, enc.mi_rows * 2)]
        leaves = enc._leaves()
        n = len(leaves)
        enc.leaf_index = {(r, c): i for i, (r, c, s) in
                          enumerate(leaves)}
        for name, shape, dt in (("y_mode", n, np.int32),
                                ("uv_mode", n, np.int32),
                                ("y_delta", n, np.int32),
                                ("uv_delta", n, np.int32),
                                ("y_tx_type", n, np.int32)):
            setattr(enc, name, np.zeros(shape, dtype=dt))
        enc.alpha_u = np.zeros(n, dtype=np.int64)
        enc.alpha_v = np.zeros(n, dtype=np.int64)
        enc.eobs = np.zeros((3, n), dtype=np.int32)
        enc.qcoeff = [[None] * n, [None] * n, [None] * n]
        meta = device_tile.tile_metadata(enc, cands)
        assert meta is not None, "tiles must have uniform leaf maps"
        keys.append(meta[0])
        args_list.append(meta[1])
    assert len(set(keys)) == 1, "tiles must share one program shape"
    key = keys[0]
    body = device_tile.make_tile_body(*key)
    halo_w = 8  # filter halo width (DLF/CDEF/LR <= 8 px)

    def per_tile(*args):
        args = [a[0] for a in args]          # drop the sharded tile axis
        ry, ru, rv, out = body(*args)
        # halo exchange: send my rightmost columns to the right neighbor
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        halo = lax.ppermute(ry[:, -halo_w:], "tile", perm)
        # frame stats reduction (RC consumes frame totals)
        stats = lax.psum(jnp.sum(jnp.abs(out["qc_y"])), "tile")
        return (ry[None], ru[None], rv[None],
                {k: v[None] for k, v in out.items()}, halo[None],
                stats[None])

    stacked = [np.stack([a[i] for a in args_list])
               for i in range(len(args_list[0]))]
    spec = P("tile")
    sharded = shard_map(
        per_tile, mesh=mesh, in_specs=tuple(spec for _ in stacked),
        out_specs=(spec, spec, spec,
                   {k: spec for k in ("y_mode", "y_delta", "uv_mode",
                                      "uv_delta", "alpha_u", "alpha_v",
                                      "y_tt", "eob_y", "eob_u", "eob_v",
                                      "qc_y", "qc_u", "qc_v")},
                   spec, spec), check_rep=False)
    put = [jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
           for a in stacked]
    ry, ru, rv, out, halos, stats = jax.jit(sharded)(*put)
    jax.block_until_ready(stats)
    ry = np.asarray(ry)
    halos = np.asarray(halos)
    # the halo that device t received must equal tile t-1's right edge
    halo_ok = all(
        np.array_equal(halos[t], ry[(t - 1) % n_dev][:, -halo_w:])
        for t in range(n_dev))

    # inject per-tile results and let the serial encoder do filters +
    # entropy + packaging (identical host code -> byte-identity check)
    results = [(np.asarray(ry[t]), np.asarray(ru[t]), np.asarray(rv[t]),
                {k: np.asarray(v[t]) for k, v in out.items()})
               for t in range(n_dev)]
    it = iter(results)

    def injected(enc2, cands2):
        meta = device_tile.tile_metadata(enc2, cands2)
        assert meta is not None
        r = next(it)
        device_tile.inject_results(enc2, meta[0][7], *r)
        return True

    orig = device_tile.analyze_tile_fused
    device_tile.analyze_tile_fused = injected
    import dataclasses
    try:
        tu, recon, st = WavefrontIntraEncoder(
            dataclasses.replace(cfg, backend="device")).encode(y, u, v)
    finally:
        device_tile.analyze_tile_fused = orig
    return tu, halo_ok, int(np.asarray(stats)[0])
