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
        enc3 = WavefrontIntraEncoder(
            dataclasses.replace(cfg, backend="device"))
        # consume the MESH results: the frame-batched defer path would
        # silently recompute everything single-device
        enc3._no_defer = True
        tu, recon, st = enc3.encode(y, u, v)
    finally:
        device_tile.analyze_tile_fused = orig
    return tu, halo_ok, int(np.asarray(stats)[0])


# --- distributed DLF: halo-consuming filter over column strips -----------------

def dlf_search_apply_sharded(recon_planes, src_planes, leaf_sizes,
                             mi_rows, mi_cols, qindex: int, bd: int,
                             mesh):
    """DLF level search + apply with the frame sharded into column
    strips over ``mesh`` (axis "tile") — the round-4 answer to
    "consume the halo instead of assert-and-discard": every vertical
    seam edge is filtered from an 8-px ppermuted halo of neighbor
    pixels, the filtered overhang writes travel BACK over ICI to their
    owning device, and the per-strip SSEs are psum'd into the frame
    totals that pick the levels — the reference's segment fan-out +
    completion-counter pattern (EbDlfProcess.c:87, EbCdefProcess.c:469)
    as SPMD collectives.

    Byte-exact twin of ops.dlf.pick_levels + loop_filter_frame (host)
    and ops.device.dlf_search_apply_dev: same candidate levels, same
    first-min scan, same integer filters. Returns
    ([y, u, v] filtered np planes, (ly, ly, luv, luv))."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from svt_av1_tpu.ops import dlf
    from svt_av1_tpu.ops.device import _dlf_dir_pass_j

    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    H, W = recon_planes[0].shape
    w_eff, h_eff = mi_cols * 4, mi_rows * 4
    assert W == w_eff and W % (8 * n_dev) == 0, \
        "sharded DLF needs width == padded width, strips %8==0"
    sw = W // n_dev            # luma strip width
    g = dlf.level_guess(qindex, bd)
    cl = sorted({0, max(0, g // 2), g, min(63, (3 * g) // 2)})
    cands = np.asarray((cl + [cl[-1]] * 4)[:4], np.int32)
    ymaps = dlf.build_tx_maps(leaf_sizes, mi_rows, mi_cols, 0)
    cmaps = dlf.build_tx_maps(leaf_sizes, mi_rows, mi_cols, 1)

    def pad_maps(maps):
        """2 ext units of horizontal padding so every device can take a
        uniform (su + 4)-unit slice."""
        (txw, txh), sx, sy = maps
        pw = np.pad(txw, ((0, 0), (2, 2)), mode="edge")
        ps = np.pad(sx, ((0, 0), (2, 2)))
        return (pw.astype(np.int32), ps.astype(bool),
                txh.astype(np.int32), sy.astype(bool))

    ytxw_e, ysx_e, ytxh, ysy = pad_maps(ymaps)
    ctxw_e, csx_e, ctxh, csy = pad_maps(cmaps)

    perm_fwd = [(i, i + 1) for i in range(n_dev - 1)]   # send right
    perm_bwd = [(i + 1, i) for i in range(n_dev - 1)]   # send left

    def strip_filter(strip, txw_ep, sx_ep, txh_r, sy_r, lvl,
                     is_luma, h_e, sw_p):
        """One strip's full DLF (vertical pass w/ halo exchange + merge,
        then local horizontal pass), == _dlf_filter_plane_j per strip."""
        idx = lax.axis_index(axis)
        su = sw_p // 4
        strip = strip.astype(jnp.int32)
        # original-pixel halos (frame edges replicate, like the frame
        # pass's mode="edge" padding)
        from_left = lax.ppermute(strip[:, -8:], axis, perm_fwd)
        from_left = jnp.where(idx == 0,
                              jnp.repeat(strip[:, :1], 8, axis=1),
                              from_left)
        from_right = lax.ppermute(strip[:, :8], axis, perm_bwd)
        from_right = jnp.where(idx == n_dev - 1,
                               jnp.repeat(strip[:, -1:], 8, axis=1),
                               from_right)
        ext = jnp.concatenate([from_left, strip, from_right], axis=1)
        # per-device map slice (+ owned-edge mask; the frame's column-0
        # boundary is not an edge)
        z = jnp.int32(0)
        off = (idx * su).astype(jnp.int32)
        txw_s = lax.dynamic_slice(
            txw_ep, (z, off), (txw_ep.shape[0], su + 4))
        sx_s = lax.dynamic_slice(
            sx_ep, (z, off), (sx_ep.shape[0], su + 4))
        own = jnp.zeros(su + 4, dtype=bool).at[2:2 + su].set(True)
        sx_s = sx_s & own[None, :]
        sx_s = sx_s.at[:, 2].set(jnp.where(idx == 0, False, sx_s[:, 2]))
        out_ext = _dlf_dir_pass_j(ext, txw_s, sx_s, lvl, is_luma,
                                  4 * (su + 4), h_e, bd)
        changed = (out_ext != ext).astype(jnp.int32)
        # filtered overhang writes go home to their owners
        to_left = jnp.stack([out_ext[:, :8], changed[:, :8]])
        to_right = jnp.stack([out_ext[:, -8:], changed[:, -8:]])
        rcv_r = lax.ppermute(to_left, axis, perm_bwd)    # from i+1
        rcv_l = lax.ppermute(to_right, axis, perm_fwd)   # from i-1
        work = out_ext[:, 8:8 + sw_p]
        work = work.at[:, -8:].set(
            jnp.where(rcv_r[1].astype(bool), rcv_r[0], work[:, -8:]))
        work = work.at[:, :8].set(
            jnp.where(rcv_l[1].astype(bool), rcv_l[0], work[:, :8]))
        # horizontal pass is strip-local (column strips hold full rows)
        txh_s = lax.dynamic_slice(
            txh_r, (z, off), (txh_r.shape[0], su))
        sy_s = lax.dynamic_slice(
            sy_r, (z, off), (sy_r.shape[0], su))
        work = _dlf_dir_pass_j(work.T, txh_s.T, sy_s.T, lvl, is_luma,
                               h_e, 4 * su, bd).T
        return jnp.clip(work, 0, (1 << bd) - 1)

    def body(y, u, v, sy_, su_, sv_):
        def sse(a, b, h_e):
            d = a[:h_e].astype(jnp.int64) - b[:h_e].astype(jnp.int64)
            return lax.psum(jnp.sum(d * d), axis)

        ysses, csses = [], []
        for k in range(cands.shape[0]):
            lvl = jnp.int32(cands[k])
            fy = strip_filter(y, ytxw_e, ysx_e, ytxh, ysy, lvl, True,
                              h_eff, sw)
            ysses.append(sse(fy, sy_, h_eff))
            fu = strip_filter(u, ctxw_e, csx_e, ctxh, csy, lvl, False,
                              h_eff // 2, sw // 2)
            fv = strip_filter(v, ctxw_e, csx_e, ctxh, csy, lvl, False,
                              h_eff // 2, sw // 2)
            csses.append(sse(fu, su_, h_eff // 2)
                         + sse(fv, sv_, h_eff // 2))
        ly = jnp.int32(cands)[jnp.argmin(jnp.stack(ysses))]
        luv = jnp.int32(cands)[jnp.argmin(jnp.stack(csses))]
        luv = jnp.where(ly > 0, luv, 0)
        oy = strip_filter(y, ytxw_e, ysx_e, ytxh, ysy, ly, True,
                          h_eff, sw)
        ou = strip_filter(u, ctxw_e, csx_e, ctxh, csy, luv, False,
                          h_eff // 2, sw // 2)
        ov = strip_filter(v, ctxw_e, csx_e, ctxh, csy, luv, False,
                          h_eff // 2, sw // 2)
        pix = jnp.uint8 if bd <= 8 else jnp.uint16
        return (oy.astype(pix), ou.astype(pix), ov.astype(pix),
                ly, luv)

    col = P(None, axis)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(col,) * 6,
        out_specs=(col, col, col, P(), P()), check_rep=False)
    put = [jax.device_put(jnp.asarray(p), NamedSharding(mesh, col))
           for p in (recon_planes[0], recon_planes[1], recon_planes[2],
                     src_planes[0].astype(recon_planes[0].dtype),
                     src_planes[1].astype(recon_planes[0].dtype),
                     src_planes[2].astype(recon_planes[0].dtype))]
    oy, ou, ov, ly, luv = jax.jit(sharded)(*put)
    ly, luv = int(np.asarray(ly)), int(np.asarray(luv))
    planes = [np.asarray(oy), np.asarray(ou), np.asarray(ov)]
    levels = (0, 0, 0, 0) if ly == 0 else (ly, ly, luv, luv)
    return planes, levels


# --- tile-sharded inter shape-group (ME + RD + recon per device) ---------------

def make_sharded_shape_group_issue(mesh, strip_w: int):
    """A drop-in replacement for device_inter.shape_group_issue that
    fans the shape group's blocks out over ``mesh`` by column strip:
    each device runs the SAME fused ME+RD+chroma program
    (device_inter._build_shape_group — identical integer decisions) on
    its own strip's blocks against replicated reference pyramids, and
    the per-strip recons come back as one column-sharded frame. The
    reference's rectangular ME segment fan-out
    (EbMotionEstimationProcess.c:434) as SPMD data parallelism.

    Bidirectional compound folds shard unchanged (per-block), so the
    hierarchical default preset runs under the same fan-out."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from svt_av1_tpu.ops import device_inter as di
    from svt_av1_tpu.ops.device_md import quant_vectors

    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    def issue(recon_planes, ref_pyrs_list, refs_u, refs_v, src_pyr,
              src_u, src_v, xs, ys, size, qp, lam, fwd_pos, bwd_pos,
              bd=8, rdoq=False, qv=None, lamv=None):
        b = len(xs)
        xs = np.asarray(xs, np.int64)
        ys = np.asarray(ys, np.int64)
        strip = xs // strip_w
        assert strip.max() < n_dev
        order = np.argsort(strip, kind="stable")
        counts = np.bincount(strip, minlength=n_dev)
        per = int(counts.max())
        nb = di._bucket(per)
        qvec, lamqv = quant_vectors(qp, lam, b, qv, lamv)

        def shards(a):
            """[n_dev, nb, ...] — each strip's entries padded with its
            lane 0 (padded lanes re-scatter lane 0's own values)."""
            out = np.empty((n_dev, nb) + a.shape[1:], a.dtype)
            pos = 0
            for d in range(n_dev):
                k = int(counts[d])
                sel = a[order[pos:pos + k]]
                if k == 0:
                    sel = a[:1]
                    k = 1
                out[d] = np.concatenate(
                    [sel, np.repeat(sel[:1], nb - k, axis=0)], axis=0)
                pos += int(counts[d])
            return out

        # compound folds are per-block, so the bidirectional program
        # shards over strips exactly like the single-direction one
        fn = di._build_shape_group(
            size if isinstance(size, int) else tuple(size),
            len(ref_pyrs_list), tuple(fwd_pos), tuple(bwd_pos), bd,
            rdoq=rdoq)
        H, W = np.asarray(recon_planes[0]).shape

        def body(rec_y, rec_u, rec_v, xs_s, ys_s, qv_s, lq_s, *planes):
            outs = fn(rec_y, rec_u, rec_v, *planes, xs_s[0], ys_s[0],
                      qv_s[0], lq_s[0])
            idx = lax.axis_index(axis)
            z = jnp.int32(0)
            ry = lax.dynamic_slice(
                outs[0], (z, (idx * strip_w).astype(jnp.int32)),
                (H, strip_w))
            ru = lax.dynamic_slice(
                outs[1], (z, (idx * (strip_w // 2)).astype(jnp.int32)),
                (H // 2, strip_w // 2))
            rv = lax.dynamic_slice(
                outs[2], (z, (idx * (strip_w // 2)).astype(jnp.int32)),
                (H // 2, strip_w // 2))
            return (ry, ru, rv) + tuple(o[None] for o in outs[3:])

        pdt = di._pix_dt(bd)
        flat = []
        for pyr in ref_pyrs_list:
            flat.extend(jnp.asarray(np.asarray(p).astype(pdt))
                        for p in pyr[:3])
        flat.extend(jnp.asarray(np.asarray(p).astype(pdt))
                    for p in refs_u)
        flat.extend(jnp.asarray(np.asarray(p).astype(pdt))
                    for p in refs_v)
        flat.extend(jnp.asarray(np.asarray(p).astype(pdt))
                    for p in src_pyr[:3])
        flat.append(jnp.asarray(np.asarray(src_u).astype(pdt)))
        flat.append(jnp.asarray(np.asarray(src_v).astype(pdt)))

        col = P(None, axis)
        sh = P(axis)
        n_out_small = 13
        sharded = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(), sh, sh, sh, sh)
            + tuple(P() for _ in flat),
            out_specs=(col, col, col) + (sh,) * n_out_small,
            check_rep=False)
        outs = jax.jit(sharded)(
            jnp.asarray(np.asarray(recon_planes[0])),
            jnp.asarray(np.asarray(recon_planes[1])),
            jnp.asarray(np.asarray(recon_planes[2])),
            shards(xs), shards(ys), shards(qvec), shards(lamqv), *flat)
        rec = tuple(jnp.asarray(np.asarray(p)) for p in outs[:3])
        # un-shard the decisions back to the caller's block order
        inv = np.empty(b, dtype=np.int64)
        pos = 0
        rows = []
        for d in range(n_dev):
            k = int(counts[d])
            rows.append(d * nb + np.arange(k))
            pos += k
        rows = np.concatenate(rows) if rows else np.zeros(0, np.int64)
        inv[order] = np.arange(b)
        dec = []
        for o in outs[3:]:
            a = np.asarray(o).reshape((n_dev * nb,) + o.shape[2:])
            dec.append(jnp.asarray(a[rows][inv]))
        return rec, tuple(dec), b

    return issue
