"""Fused whole-tile intra analysis: one XLA program per tile.

The per-wave device path dispatches hundreds of small programs per
keyframe (edge-prep -> decide -> scatter for every anti-diagonal x plane);
this module fuses the entire tile into a single ``lax.fori_loop`` over
dependency waves with the reconstruction planes carried on device — the
TPU-shaped form of the reference's EncDec wavefront (EbEncDecProcess.c:489
AssignEncDecSegments), with zero host round-trips inside a tile.

Restrictions (host wavefront falls back to the per-wave path otherwise):
uniform square leaf maps (fixed_partition_size presets; frame dims such
that no edge leaf splits) and no per-SB delta-q. Decisions are
bit-identical to the host path: the loop body inlines the same integer
decide core (ops.device_md.make_decide_core).
"""

from __future__ import annotations

import functools

import numpy as np

import jax

from svt_av1_tpu.ops import device_md as dmd

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from svt_av1_tpu.pipeline import common  # noqa: E402


def _edges_j(recon, xs, ys, bw: int, bh: int, ha, hl, htr, hbl,
             bd: int, max_w, max_h):
    """Traced twin of intra_ops.prepare_edges_av1 (dynamic coords).
    max_w/max_h: scalar or per-lane [B] pixel bounds (tile right/bottom
    edges — replication clamps there, spec 7.11.2)."""
    base = 1 << (bd - 1)
    Hp, Wp = recon.shape
    W = jnp.minimum(Wp, max_w)
    H = jnp.minimum(Hp, max_h)
    b = xs.shape[0]
    # above row (offset-1 layout, index 0 = corner)
    lim = jnp.minimum(W - 1, xs + jnp.where(htr, 2 * bw, bw) - 1)
    cols = jnp.minimum(xs[:, None] + jnp.arange(bw + bh)[None, :],
                       lim[:, None])
    rowy = jnp.clip(ys - 1, 0, Hp - 1)
    above_row = recon[rowy[:, None], cols]
    left_px = recon[jnp.clip(ys, 0, Hp - 1), jnp.clip(xs - 1, 0, Wp - 1)]
    above_tail = jnp.where(ha[:, None], above_row,
                           jnp.where(hl[:, None], left_px[:, None],
                                     base - 1))
    # left column
    lim2 = jnp.minimum(H - 1, ys + jnp.where(hbl, 2 * bh, bh) - 1)
    rows = jnp.minimum(ys[:, None] + jnp.arange(bh + bw)[None, :],
                       lim2[:, None])
    colx = jnp.clip(xs - 1, 0, Wp - 1)
    left_col = recon[rows, colx[:, None]]
    above_px = recon[rowy, jnp.clip(xs, 0, Wp - 1)]
    left_tail = jnp.where(hl[:, None], left_col,
                          jnp.where(ha[:, None], above_px[:, None],
                                    base + 1))
    corner = jnp.where(ha & hl, recon[rowy, colx],
                       jnp.where(ha, above_px,
                                 jnp.where(hl, left_px, base)))
    above1 = jnp.concatenate([corner[:, None], above_tail], axis=1) \
        .astype(jnp.int32)
    left1 = jnp.concatenate([corner[:, None], left_tail], axis=1) \
        .astype(jnp.int32)
    return above1, left1


def _narrow_out(out: dict) -> dict:
    """Wire-narrow the per-leaf output dict: enum fields to int8,
    eob/levels to int16 (|level| <= 32767 by the quantizer's int16
    clamp) — the tunnel downloads at ~30 MB/s, so dtype width is
    latency."""
    n8 = ("y_mode", "y_delta", "uv_mode", "uv_delta", "alpha_u",
          "alpha_v", "y_tt")
    n16 = ("eob_y", "eob_u", "eob_v", "qc_y", "qc_u", "qc_v")
    out = dict(out)
    for k in n8:
        out[k] = out[k].astype(jnp.int8)
    for k in n16:
        out[k] = out[k].astype(jnp.int16)
    return out


def _gather(plane, xs, ys, bw: int, bh: int):
    iy = ys[:, None, None] + jnp.arange(bh)[None, :, None]
    ix = xs[:, None, None] + jnp.arange(bw)[None, None, :]
    return plane[iy, ix]


def _scatter(plane, xs, ys, blocks, valid, bw: int, bh: int):
    """Write [B, bh, bw] blocks; invalid lanes dropped (OOB indices)."""
    big = plane.shape[0] + plane.shape[1]
    iy = jnp.where(valid, ys, big)[:, None, None] \
        + jnp.arange(bh)[None, :, None]
    ix = xs[:, None, None] + jnp.arange(bw)[None, None, :]
    return plane.at[iy, ix].set(blocks.astype(plane.dtype), mode="drop")


@functools.lru_cache(maxsize=64)
def make_tile_body(size: int, cands: tuple,
                   bd: int, nfl: int, tx_search: bool,
                   n_waves: int, wmax: int, n_leaves: int,
                   shapes: tuple, max_wh: tuple, rdoq: bool = False):
    """The traceable full-tile intra analysis function (jitted by
    _build_tile_program; also the per-device body of the tile-sharded
    multi-chip program in parallel/tiles.py). qindex/lambda arrive as
    traced scalar operands (``qv``/``lamqv``), not program keys.

    shapes: ((Hy, Wy), (Hc, Wc)) padded plane dims; max_wh: mi-area
    [(wy, hy), (wc, hc)] clamp bounds."""
    S = size
    Sc = S >> 1
    cfl_ok = S <= 32
    (Hy, Wy), (Hc, Wc) = shapes
    (mwy, mhy), (mwc, mhc) = max_wh
    tx_y = common.tx_size_for_rect(S, S, 0)
    tx_uv = common.tx_size_for_rect(Sc, Sc, 1)
    cwy, chy = common.coded_dims(tx_y)
    cwc, chc = common.coded_dims(tx_uv)

    decide_y = dmd.make_decide_core(0, cands, S, bd, nfl,
                                    False, False, False, tx_search,
                                    rdoq=rdoq)
    decide_u = dmd.make_decide_core(1, cands, Sc, bd, nfl,
                                    False, False, cfl_ok, False,
                                    rdoq=rdoq)
    decide_v = dmd.make_decide_core(2, cands, Sc, bd, nfl,
                                    False, True, cfl_ok, False,
                                    rdoq=rdoq)

    pix = jnp.uint8 if bd <= 8 else jnp.uint16

    def program(src_y, src_u, src_v, xsw, ysw, validw, htrw, hblw, idxw,
                qv, lamqv):
        qvw = jnp.broadcast_to(qv.astype(jnp.int32), (wmax,))
        lamw = jnp.broadcast_to(lamqv.astype(jnp.int64), (wmax,))
        recon_y = jnp.zeros((Hy + S, Wy), dtype=jnp.int32)
        recon_u = jnp.zeros((Hc + Sc, Wc), dtype=jnp.int32)
        recon_v = jnp.zeros((Hc + Sc, Wc), dtype=jnp.int32)
        n1 = n_leaves + 1
        out = dict(
            y_mode=jnp.zeros(n1, jnp.int64),
            y_delta=jnp.zeros(n1, jnp.int64),
            uv_mode=jnp.zeros(n1, jnp.int64),
            uv_delta=jnp.zeros(n1, jnp.int64),
            alpha_u=jnp.zeros(n1, jnp.int64),
            alpha_v=jnp.zeros(n1, jnp.int64),
            y_tt=jnp.zeros(n1, jnp.int32),
            eob_y=jnp.zeros(n1, jnp.int64),
            eob_u=jnp.zeros(n1, jnp.int64),
            eob_v=jnp.zeros(n1, jnp.int64),
            qc_y=jnp.zeros((n1, chy, cwy), jnp.int32),
            qc_u=jnp.zeros((n1, chc, cwc), jnp.int32),
            qc_v=jnp.zeros((n1, chc, cwc), jnp.int32),
        )

        def body(w, carry):
            recon_y, recon_u, recon_v, out = carry
            xs = xsw[w]
            ys = ysw[w]
            valid = validw[w]
            htr = htrw[w]
            hbl = hblw[w]
            idx = jnp.where(valid, idxw[w], n_leaves)
            ha, hl = ys > 0, xs > 0
            # --- luma ---
            a1, l1 = _edges_j(recon_y, xs, ys, S, S, ha, hl, htr, hbl,
                              bd, mwy, mhy)
            srcs = _gather(src_y, xs, ys, S, S).astype(jnp.int64)
            ym, yd, qcy, eoy, recy, _, _, ytt = decide_y(
                srcs, a1, l1, ha, hl, None, qvw, lamw)
            recon_y = _scatter(recon_y, xs, ys, recy, valid, S, S)
            # --- chroma U (CfL reads this wave's luma recon) ---
            cxs, cys = xs >> 1, ys >> 1
            cfl = None
            if cfl_ok:
                cfl = _gather(recon_y, xs, ys, S, S).astype(jnp.int64)
            a1u, l1u = _edges_j(recon_u, cxs, cys, Sc, Sc, ha, hl, htr,
                                hbl, bd, mwc, mhc)
            srcs_u = _gather(src_u, cxs, cys, Sc, Sc).astype(jnp.int64)
            um, ud, qcu, eou, recu, _, au, _ = decide_u(
                srcs_u, a1u, l1u, ha, hl, cfl, qvw, lamw)
            recon_u = _scatter(recon_u, cxs, cys, recu, valid, Sc, Sc)
            # --- chroma V (forced to U's choice) ---
            a1v, l1v = _edges_j(recon_v, cxs, cys, Sc, Sc, ha, hl, htr,
                                hbl, bd, mwc, mhc)
            srcs_v = _gather(src_v, cxs, cys, Sc, Sc).astype(jnp.int64)
            vm, vd, qcv, eov, recv, _, av, _ = decide_v(
                srcs_v, a1v, l1v, ha, hl, um, ud, cfl, qvw, lamw)
            recon_v = _scatter(recon_v, cxs, cys, recv, valid, Sc, Sc)

            out = dict(out)
            out["y_mode"] = out["y_mode"].at[idx].set(ym, mode="drop")
            out["y_delta"] = out["y_delta"].at[idx].set(yd, mode="drop")
            out["uv_mode"] = out["uv_mode"].at[idx].set(um, mode="drop")
            out["uv_delta"] = out["uv_delta"].at[idx].set(ud,
                                                          mode="drop")
            out["alpha_u"] = out["alpha_u"].at[idx].set(au, mode="drop")
            out["alpha_v"] = out["alpha_v"].at[idx].set(av, mode="drop")
            out["y_tt"] = out["y_tt"].at[idx].set(ytt, mode="drop")
            out["eob_y"] = out["eob_y"].at[idx].set(eoy, mode="drop")
            out["eob_u"] = out["eob_u"].at[idx].set(eou, mode="drop")
            out["eob_v"] = out["eob_v"].at[idx].set(eov, mode="drop")
            out["qc_y"] = out["qc_y"].at[idx].set(qcy, mode="drop")
            out["qc_u"] = out["qc_u"].at[idx].set(qcu, mode="drop")
            out["qc_v"] = out["qc_v"].at[idx].set(qcv, mode="drop")
            return recon_y, recon_u, recon_v, out

        recon_y, recon_u, recon_v, out = lax.fori_loop(
            0, n_waves, body, (recon_y, recon_u, recon_v, out))
        return (recon_y[:Hy].astype(pix), recon_u[:Hc].astype(pix),
                recon_v[:Hc].astype(pix), _narrow_out(out))

    return program


@functools.lru_cache(maxsize=64)
def _build_tile_program(*key):
    return jax.jit(make_tile_body(*key))


def tile_metadata(enc, cands):
    """(program_key, input_arrays) for the fused tile program, or None
    when the tile is unsupported (mixed leaf sizes / per-SB delta-q)."""
    cfg = enc.cfg
    sizes = set(enc.leaf_sizes.values())
    if len(sizes) != 1 or enc.qmap_t is not None:
        return None
    S = sizes.pop()
    if not isinstance(S, int) or S < 8:
        return None
    leaves = enc._leaves()
    from svt_av1_tpu.pipeline import avail
    waves = enc._dependency_waves(leaves, enc.mi_cols, enc.mi_rows)
    n = len(leaves)
    n_waves = int(waves.max()) + 1 if n else 0
    wmax = int(np.bincount(waves).max())
    xsw = np.zeros((n_waves, wmax), dtype=np.int64)
    ysw = np.zeros((n_waves, wmax), dtype=np.int64)
    validw = np.zeros((n_waves, wmax), dtype=bool)
    htrw = np.zeros((n_waves, wmax), dtype=bool)
    hblw = np.zeros((n_waves, wmax), dtype=bool)
    idxw = np.zeros((n_waves, wmax), dtype=np.int64)
    fill = np.zeros(n_waves, dtype=np.int64)
    for i, (r, c, wh) in enumerate(leaves):
        w = int(waves[i])
        j = fill[w]
        fill[w] = j + 1
        xsw[w, j] = c * 4
        ysw[w, j] = r * 4
        validw[w, j] = True
        vab = avail.leaf_vert_ab(enc.leaf_sizes, r, c, wh[0] >> 2,
                                 wh[1] >> 2, enc.mi_rows, enc.mi_cols)
        htrw[w, j] = avail.has_top_right_wh(r, c, wh[0] >> 2,
                                            wh[1] >> 2, enc.mi_cols,
                                            vert_ab=vab)
        hblw[w, j] = avail.has_bottom_left_wh(r, c, wh[0] >> 2,
                                              wh[1] >> 2, enc.mi_rows,
                                              vert_ab=vab)
        idxw[w, j] = enc.leaf_index[(r, c)]
    shapes = (tuple(enc.recon[0].shape), tuple(enc.recon[1].shape))
    max_wh = (tuple(enc.max_wh[0]), tuple(enc.max_wh[1]))
    from svt_av1_tpu.pipeline import md as md_mod
    key = (S, tuple(map(tuple, cands)), cfg.bit_depth, cfg.nfl,
           bool(cfg.enable_tx_type_search and cfg.base_q_idx > 0),
           n_waves, wmax, n, shapes, max_wh, bool(cfg.enable_rdoq))
    npix = np.uint8 if cfg.bit_depth <= 8 else np.uint16
    args = (np.ascontiguousarray(enc.src[0], dtype=npix),
            np.ascontiguousarray(enc.src[1], dtype=npix),
            np.ascontiguousarray(enc.src[2], dtype=npix),
            xsw, ysw, validw, htrw, hblw, idxw,
            np.full((), int(enc.qp.qindex), np.int32),
            np.full((), md_mod.lam_to_q(enc.lam), np.int64))
    return key, args


def analyze_tile_fused(enc, cands) -> bool:
    """Run the fused tile program for WavefrontIntraEncoder ``enc``
    (uniform square leaves only). Fills enc.y_mode/... and enc.recon;
    returns False when the tile shape is unsupported (caller falls back
    to the per-wave path)."""
    meta = tile_metadata(enc, cands)
    if meta is None:
        return False
    key, args = meta
    prog = _build_tile_program(*key)
    res = prog(*args)
    if getattr(enc, "_tile_count", 1) == 1:
        # device-resident: planes stay on device for the filter chain
        # and the reference slots; coefficients resolve lazily on the
        # entropy thread (one async-prefetched fetch)
        ry, ru, rv, out = res
        enc.recon[0] = ry
        enc.recon[1] = ru
        enc.recon[2] = rv
        small = jax.device_get({k: v for k, v in out.items()
                                if not k.startswith("qc_")})
        n_leaf = key[7]
        for pl in ("qc_y", "qc_u", "qc_v"):
            out[pl] = out[pl][:n_leaf]
            out[pl].copy_to_host_async()
        inject_results(enc, n_leaf, None, None, None, small,
                       qc_dev=(out["qc_y"], out["qc_u"], out["qc_v"]))
        return True
    ry, ru, rv, out = jax.device_get(res)
    inject_results(enc, key[7], ry, ru, rv, out)
    return True


def inject_results(enc, n, ry, ru, rv, out, qc_dev=None) -> None:
    """Write fused-program outputs back into the encoder state."""
    from svt_av1_tpu.pipeline.common import PendingQC
    cfg = enc.cfg
    pix = np.uint16 if cfg.bit_depth > 8 else np.uint8
    if ry is not None:
        enc.recon[0][...] = np.asarray(ry).astype(pix)
        enc.recon[1][...] = np.asarray(ru).astype(pix)
        enc.recon[2][...] = np.asarray(rv).astype(pix)
    enc.y_mode[:] = np.asarray(out["y_mode"])[:n]
    enc.y_delta[:] = np.asarray(out["y_delta"])[:n]
    enc.uv_mode[:] = np.asarray(out["uv_mode"])[:n]
    enc.uv_delta[:] = np.asarray(out["uv_delta"])[:n]
    enc.alpha_u[:] = np.asarray(out["alpha_u"])[:n]
    enc.alpha_v[:] = np.asarray(out["alpha_v"])[:n]
    enc.y_tx_type[:] = np.asarray(out["y_tt"])[:n]
    enc.eobs[0, :] = np.asarray(out["eob_y"])[:n]
    enc.eobs[1, :] = np.asarray(out["eob_u"])[:n]
    enc.eobs[2, :] = np.asarray(out["eob_v"])[:n]
    if qc_dev is not None:
        for p in range(3):
            pend = PendingQC(qc_dev[p])
            for i in range(n):
                enc.qcoeff[p][i] = (pend, i)
        return
    qc_y = np.asarray(out["qc_y"])
    qc_u = np.asarray(out["qc_u"])
    qc_v = np.asarray(out["qc_v"])
    for i in range(n):
        enc.qcoeff[0][i] = qc_y[i]
        enc.qcoeff[1][i] = qc_u[i]
        enc.qcoeff[2][i] = qc_v[i]


# --- mixed-size fused tile program ---------------------------------------------
# Partition-RD leaf maps mix square and rectangular blocks (8..64 with
# 2:1 and 4:1 arms), which previously fell back to the per-wave path:
# ~3 device dispatches per (wave x shape) group, thousands of host round
# trips per 1080p keyframe. This program keeps the SAME dependency waves
# but processes every shape class inside one lax.fori_loop — one
# dispatch per tile. The wave count is padded to powers of two and the
# class list depends only on which shapes the frame's partition map
# contains, so a stream converges onto a handful of compiled variants.

def _pow2(n: int, lo: int = 1) -> int:
    v = lo
    while v < n:
        v <<= 1
    return v


def _class_stage(shape: tuple, cands: tuple,
                 bd: int, nfl: int, tx_search: bool, max_wh: tuple,
                 rdoq: bool = False):
    """Per-wave processing step for one (bw, bh) shape class: the Y/U/V
    decide chain of make_tile_body factored for reuse across classes."""
    bw, bh = shape
    cw_, ch_ = bw >> 1, bh >> 1
    cfl_ok = bw <= 32 and bh <= 32    # cfl_allowed (host wavefront rule)
    (mwy, mhy), (mwc, mhc) = max_wh
    tx_y = common.tx_size_for_rect(bw, bh, 0)
    tx_uv = common.tx_size_for_rect(cw_, ch_, 1)
    cwy, chy = common.coded_dims(tx_y)
    cwc, chc = common.coded_dims(tx_uv)
    ysz = bw if bw == bh else (bw, bh)
    csz = cw_ if cw_ == ch_ else (cw_, ch_)
    decide_y = dmd.make_decide_core(0, cands, ysz, bd,
                                    nfl, False, False, False, tx_search,
                                    rdoq=rdoq)
    decide_u = dmd.make_decide_core(1, cands, csz, bd,
                                    nfl, False, False, cfl_ok, False,
                                    rdoq=rdoq)
    decide_v = dmd.make_decide_core(2, cands, csz, bd,
                                    nfl, False, True, cfl_ok, False,
                                    rdoq=rdoq)

    def out_zeros(n_cls: int):
        n1 = n_cls + 1
        return dict(
            y_mode=jnp.zeros(n1, jnp.int64),
            y_delta=jnp.zeros(n1, jnp.int64),
            uv_mode=jnp.zeros(n1, jnp.int64),
            uv_delta=jnp.zeros(n1, jnp.int64),
            alpha_u=jnp.zeros(n1, jnp.int64),
            alpha_v=jnp.zeros(n1, jnp.int64),
            y_tt=jnp.zeros(n1, jnp.int32),
            eob_y=jnp.zeros(n1, jnp.int64),
            eob_u=jnp.zeros(n1, jnp.int64),
            eob_v=jnp.zeros(n1, jnp.int64),
            qc_y=jnp.zeros((n1, chy, cwy), jnp.int32),
            qc_u=jnp.zeros((n1, chc, cwc), jnp.int32),
            qc_v=jnp.zeros((n1, chc, cwc), jnp.int32),
        )

    def step(recon_y, recon_u, recon_v, out, src_y, src_u, src_v, xs,
             ys, valid, htr, hbl, ha, hl, mwv, mhv, idx, n_cls, qv,
             lamqv):
        qvw = jnp.broadcast_to(qv.astype(jnp.int32), xs.shape)
        lamw = jnp.broadcast_to(lamqv.astype(jnp.int64), xs.shape)
        idx = jnp.where(valid, idx, n_cls)
        a1, l1 = _edges_j(recon_y, xs, ys, bw, bh, ha, hl, htr, hbl,
                          bd, mwv, mhv)
        srcs = _gather(src_y, xs, ys, bw, bh).astype(jnp.int64)
        ym, yd, qcy, eoy, recy, _, _, ytt = decide_y(
            srcs, a1, l1, ha, hl, None, qvw, lamw)
        recon_y = _scatter(recon_y, xs, ys, recy, valid, bw, bh)
        cxs, cys = xs >> 1, ys >> 1
        cfl = None
        if cfl_ok:
            cfl = _gather(recon_y, xs, ys, bw, bh).astype(jnp.int64)
        a1u, l1u = _edges_j(recon_u, cxs, cys, cw_, ch_, ha, hl, htr,
                            hbl, bd, mwv >> 1, mhv >> 1)
        srcs_u = _gather(src_u, cxs, cys, cw_, ch_).astype(jnp.int64)
        um, ud, qcu, eou, recu, _, au, _ = decide_u(
            srcs_u, a1u, l1u, ha, hl, cfl, qvw, lamw)
        recon_u = _scatter(recon_u, cxs, cys, recu, valid, cw_, ch_)
        a1v, l1v = _edges_j(recon_v, cxs, cys, cw_, ch_, ha, hl, htr,
                            hbl, bd, mwv >> 1, mhv >> 1)
        srcs_v = _gather(src_v, cxs, cys, cw_, ch_).astype(jnp.int64)
        vm, vd, qcv, eov, recv, _, av, _ = decide_v(
            srcs_v, a1v, l1v, ha, hl, um, ud, cfl, qvw, lamw)
        recon_v = _scatter(recon_v, cxs, cys, recv, valid, cw_, ch_)
        out = dict(out)
        out["y_mode"] = out["y_mode"].at[idx].set(ym, mode="drop")
        out["y_delta"] = out["y_delta"].at[idx].set(yd, mode="drop")
        out["uv_mode"] = out["uv_mode"].at[idx].set(um, mode="drop")
        out["uv_delta"] = out["uv_delta"].at[idx].set(ud, mode="drop")
        out["alpha_u"] = out["alpha_u"].at[idx].set(au, mode="drop")
        out["alpha_v"] = out["alpha_v"].at[idx].set(av, mode="drop")
        out["y_tt"] = out["y_tt"].at[idx].set(ytt, mode="drop")
        out["eob_y"] = out["eob_y"].at[idx].set(eoy, mode="drop")
        out["eob_u"] = out["eob_u"].at[idx].set(eou, mode="drop")
        out["eob_v"] = out["eob_v"].at[idx].set(eov, mode="drop")
        out["qc_y"] = out["qc_y"].at[idx].set(
            qcy.astype(jnp.int32), mode="drop")
        out["qc_u"] = out["qc_u"].at[idx].set(
            qcu.astype(jnp.int32), mode="drop")
        out["qc_v"] = out["qc_v"].at[idx].set(
            qcv.astype(jnp.int32), mode="drop")
        return recon_y, recon_u, recon_v, out

    return step, out_zeros


@functools.lru_cache(maxsize=32)
def make_mixed_tile_body(class_spec: tuple, n_waves: int, cands: tuple,
                         bd: int, nfl: int,
                         tx_search: bool, shapes: tuple, max_wh: tuple,
                         rdoq: bool = False):
    """class_spec: (((bw, bh), wmax, n_cls), ...) active shape classes,
    descending area; wave count pre-quantized by the metadata builder.
    qindex/lambda are traced scalar operands (qv/lamqv)."""
    (Hy, Wy), (Hc, Wc) = shapes
    stages = [(sh, wmax, n_cls)
              + _class_stage(sh, cands, bd, nfl,
                             tx_search, max_wh, rdoq=rdoq)
              for (sh, wmax, n_cls) in class_spec]

    def program(src_y, src_u, src_v, nw_dyn, qv, lamqv, *arrs):
        recon_y = jnp.zeros((Hy + 64, Wy), dtype=jnp.int32)
        recon_u = jnp.zeros((Hc + 32, Wc), dtype=jnp.int32)
        recon_v = jnp.zeros((Hc + 32, Wc), dtype=jnp.int32)
        outs = tuple(oz(n_cls) for (_, _, n_cls, _, oz) in stages)

        def body(w, carry):
            recon_y, recon_u, recon_v, outs = carry
            outs = list(outs)
            for ci, (S, wmax, n_cls, step, _) in enumerate(stages):
                a = arrs[10 * ci:10 * ci + 10]
                recon_y, recon_u, recon_v, outs[ci] = step(
                    recon_y, recon_u, recon_v, outs[ci], src_y, src_u,
                    src_v, a[0][w], a[1][w], a[2][w], a[3][w], a[4][w],
                    a[5][w], a[6][w], a[7][w], a[8][w], a[9][w], n_cls,
                    qv, lamqv)
            return recon_y, recon_u, recon_v, tuple(outs)

        recon_y, recon_u, recon_v, outs = lax.fori_loop(
            0, jnp.minimum(nw_dyn, n_waves), body,
            (recon_y, recon_u, recon_v, outs))
        pix = jnp.uint8 if bd <= 8 else jnp.uint16
        return (recon_y[:Hy].astype(pix), recon_u[:Hc].astype(pix),
                recon_v[:Hc].astype(pix)) \
            + tuple(_narrow_out(o) for o in outs)

    return program


@functools.lru_cache(maxsize=32)
def _build_mixed_program(*key):
    return jax.jit(make_mixed_tile_body(*key))


def mixed_tile_metadata(enc, cands):
    """(program_key, input_arrays, per-class leaf-id lists) for the
    mixed-shape fused program, or None (per-SB delta-q / shapes below
    8px). Classes are the (bw, bh) shapes present in the partition map
    (squares + 2:1 + 4:1 rects); the jit key depends only on that shape
    set and the frame geometry, so a stream compiles a few variants."""
    cfg = enc.cfg
    if enc.qmap_t is not None:
        return None
    leaves = enc._leaves()
    n = len(leaves)
    if n == 0:
        return None
    if any(wh[0] < 8 or wh[1] < 8 for _, _, wh in leaves):
        return None
    from svt_av1_tpu.pipeline import avail
    waves = enc._dependency_waves(leaves, enc.mi_cols, enc.mi_rows)
    n_waves = int(waves.max()) + 1
    nwq = _pow2(n_waves, 8)
    # lane capacity: leaf y is always a multiple of bh (quadtree + H/V
    # + 4:1 splits keep it aligned), and two same-class blocks in the
    # same bh-band are chained through left-edge deps into different
    # waves -> at most one block per band per wave.
    classes = sorted({tuple(wh) for _, _, wh in leaves},
                     key=lambda s: (-s[0] * s[1], -s[0]))
    h_px = enc.mi_rows * 4
    w_px = enc.mi_cols * 4
    class_spec = []
    args = []
    cls_ids = []
    for bwc, bhc in classes:
        ids = [i for i, (_, _, wh) in enumerate(leaves)
               if wh == (bwc, bhc)]
        # lane width = bucketed MAX per-wave occupancy (per-step compute
        # is width x waves; band capacity over-padded sparse classes)
        occ = np.bincount([int(waves[i]) for i in ids],
                          minlength=n_waves)
        wq = _wbucket(int(occ.max()) if len(ids) else 1,
                      (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048))
        ncq = max(1, ((h_px + bhc - 1) // bhc)
                  * ((w_px + bwc - 1) // bwc))
        xsw = np.zeros((nwq, wq), dtype=np.int64)
        ysw = np.zeros((nwq, wq), dtype=np.int64)
        validw = np.zeros((nwq, wq), dtype=bool)
        htrw = np.zeros((nwq, wq), dtype=bool)
        hblw = np.zeros((nwq, wq), dtype=bool)
        idxw = np.zeros((nwq, wq), dtype=np.int64)
        fill = np.zeros(n_waves, dtype=np.int64)
        for li, i in enumerate(ids):
            r, c, wh = leaves[i]
            w = int(waves[i])
            j = fill[w]
            fill[w] = j + 1
            xsw[w, j] = c * 4
            ysw[w, j] = r * 4
            validw[w, j] = True
            vab = avail.leaf_vert_ab(enc.leaf_sizes, r, c, wh[0] >> 2,
                                     wh[1] >> 2, enc.mi_rows,
                                     enc.mi_cols)
            htrw[w, j] = avail.has_top_right_wh(r, c, wh[0] >> 2,
                                                wh[1] >> 2, enc.mi_cols,
                                                vert_ab=vab)
            hblw[w, j] = avail.has_bottom_left_wh(r, c, wh[0] >> 2,
                                                  wh[1] >> 2,
                                                  enc.mi_rows,
                                                  vert_ab=vab)
            idxw[w, j] = li
        class_spec.append(((bwc, bhc), wq, ncq))
        # single-tile: ha/hl from tile-local coords, edge clamp at the
        # tile's own padded extent (matches the former in-program rule)
        args += [xsw, ysw, validw, htrw, hblw,
                 validw & (ysw > 0), validw & (xsw > 0),
                 np.full((nwq, wq), w_px, np.int32),
                 np.full((nwq, wq), h_px, np.int32), idxw]
        cls_ids.append(ids)
    shapes = (tuple(enc.recon[0].shape), tuple(enc.recon[1].shape))
    max_wh = (tuple(enc.max_wh[0]), tuple(enc.max_wh[1]))
    from svt_av1_tpu.pipeline import md as md_mod
    key = (tuple(class_spec), nwq, tuple(map(tuple, cands)),
           cfg.bit_depth, cfg.nfl,
           bool(cfg.enable_tx_type_search and cfg.base_q_idx > 0),
           shapes, max_wh, bool(cfg.enable_rdoq))
    npix = np.uint8 if cfg.bit_depth <= 8 else np.uint16
    full_args = (np.ascontiguousarray(enc.src[0], dtype=npix),
                 np.ascontiguousarray(enc.src[1], dtype=npix),
                 np.ascontiguousarray(enc.src[2], dtype=npix),
                 np.int32(n_waves),
                 np.full((), int(enc.qp.qindex), np.int32),
                 np.full((), md_mod.lam_to_q(enc.lam), np.int64)) \
        + tuple(args)
    return key, full_args, cls_ids


def analyze_tile_fused_mixed(enc, cands) -> bool:
    meta = mixed_tile_metadata(enc, cands)
    if meta is None:
        return False
    key, args, cls_ids = meta
    prog = _build_mixed_program(*key)
    res = prog(*args)
    cfg = enc.cfg
    pix = np.uint16 if cfg.bit_depth > 8 else np.uint8
    resident = getattr(enc, "_tile_count", 1) == 1
    if resident:
        from svt_av1_tpu.pipeline.common import PendingQC
        enc.recon[0], enc.recon[1], enc.recon[2] = res[0], res[1], res[2]
        smalls = jax.device_get([
            {k: v for k, v in res[3 + ci].items()
             if not k.startswith("qc_")}
            for ci in range(len(cls_ids))])
        for ci in range(len(cls_ids)):
            for pl in ("qc_y", "qc_u", "qc_v"):
                res[3 + ci][pl] = res[3 + ci][pl][:len(cls_ids[ci])]
                res[3 + ci][pl].copy_to_host_async()
    else:
        res = jax.device_get(res)
        ry, ru, rv = res[0], res[1], res[2]
        enc.recon[0][...] = np.asarray(ry).astype(pix)
        enc.recon[1][...] = np.asarray(ru).astype(pix)
        enc.recon[2][...] = np.asarray(rv).astype(pix)
        smalls = [res[3 + ci] for ci in range(len(cls_ids))]
    for ci, ids in enumerate(cls_ids):
        out = smalls[ci]
        ids = np.asarray(ids)
        enc.y_mode[ids] = np.asarray(out["y_mode"])[:len(ids)]
        enc.y_delta[ids] = np.asarray(out["y_delta"])[:len(ids)]
        enc.uv_mode[ids] = np.asarray(out["uv_mode"])[:len(ids)]
        enc.uv_delta[ids] = np.asarray(out["uv_delta"])[:len(ids)]
        enc.alpha_u[ids] = np.asarray(out["alpha_u"])[:len(ids)]
        enc.alpha_v[ids] = np.asarray(out["alpha_v"])[:len(ids)]
        enc.y_tx_type[ids] = np.asarray(out["y_tt"])[:len(ids)]
        enc.eobs[0, ids] = np.asarray(out["eob_y"])[:len(ids)]
        enc.eobs[1, ids] = np.asarray(out["eob_u"])[:len(ids)]
        enc.eobs[2, ids] = np.asarray(out["eob_v"])[:len(ids)]
        if resident:
            pends = [PendingQC(res[3 + ci][f"qc_{pl}"])
                     for pl in ("y", "u", "v")]
            for li, i in enumerate(ids):
                enc.qcoeff[0][i] = (pends[0], li)
                enc.qcoeff[1][i] = (pends[1], li)
                enc.qcoeff[2][i] = (pends[2], li)
            continue
        qc_y = np.asarray(out["qc_y"])
        qc_u = np.asarray(out["qc_u"])
        qc_v = np.asarray(out["qc_v"])
        for li, i in enumerate(ids):
            enc.qcoeff[0][i] = qc_y[li]
            enc.qcoeff[1][i] = qc_u[li]
            enc.qcoeff[2][i] = qc_v[li]
    return True


# --- frame-batched MULTI-TILE fused intra analysis -------------------------------
# With T tile columns the per-tile fused programs would run sequentially
# on one chip — total scan steps T x (w/T + 2h) >= single-tile. This
# path instead merges every tile's dependency waves BY INDEX into one
# program over the frame planes: scan step w processes wave w of every
# tile at once (tiles are independent), so the critical path is the MAX
# tile wave count — the whole point of tile columns on a latency-bound
# wavefront (reference segment fan-out, EbEncDecProcess.c:489).

def tile_lane_meta(enc, cands):
    """Lane metadata for one tile of the frame-batched program, or None
    when the tile is unsupported (per-SB delta-q / sub-8px leaves /
    band-capacity violation). Call with ``enc`` entered into the tile;
    captures references to the tile's decision arrays for the deferred
    injection."""
    if enc.qmap_t is not None:
        return None
    leaves = enc._leaves()
    if not leaves or any(wh[0] < 8 or wh[1] < 8 for _, _, wh in leaves):
        return None
    from svt_av1_tpu.pipeline import avail
    waves = enc._dependency_waves(leaves, enc.mi_cols, enc.mi_rows)
    n_waves = int(waves.max()) + 1
    classes = {}
    for i, (r, c, wh) in enumerate(leaves):
        w4, h4 = wh[0] >> 2, wh[1] >> 2
        vab = avail.leaf_vert_ab(enc.leaf_sizes, r, c, w4, h4,
                                 enc.mi_rows, enc.mi_cols)
        htr = avail.has_top_right_wh(r, c, w4, h4, enc.mi_cols,
                                     vert_ab=vab)
        hbl = avail.has_bottom_left_wh(r, c, w4, h4, enc.mi_rows,
                                       vert_ab=vab)
        classes.setdefault(tuple(wh), []).append(
            (int(waves[i]), r, c, htr, hbl, i))
    h_px = enc.mi_rows * 4
    spec = {}
    for sh, ents in classes.items():
        wq = max(1, (h_px + sh[1] - 1) // sh[1])
        occ = {}
        for (w, *_rest) in ents:
            occ[w] = occ.get(w, 0) + 1
            if occ[w] > wq:
                return None       # band-chaining bound violated
        spec[sh] = wq
    arrays = {k: getattr(enc, k) for k in
              ("y_mode", "y_delta", "uv_mode", "uv_delta", "alpha_u",
               "alpha_v", "y_tx_type", "eobs", "qcoeff")}
    return dict(rect=enc._cur_rect, n_waves=n_waves, classes=classes,
                spec=spec, arrays=arrays)


def run_tiles_fused(enc, metas, frame_src, frame_recon, cands):
    """Run ONE fused program covering every deferred tile's lanes and
    inject results into each tile's decision arrays. Returns the frame
    recon planes — device-resident when every tile deferred, else the
    host planes with the deferred tiles' regions copied in."""
    from svt_av1_tpu.pipeline import md as md_mod
    cfg = enc.cfg
    n_waves = max(m["n_waves"] for m in metas)
    nwq = _pow2(n_waves, 8)
    shapes_u = sorted({sh for m in metas for sh in m["classes"]},
                      key=lambda s: (-s[0] * s[1], -s[0]))
    class_spec = []
    args = []
    placements = []   # per class: [(meta, tile-leaf ids, entry base j0)]
    for sh in shapes_u:
        total = sum(len(m["classes"].get(sh, ())) for m in metas)
        ncq = _wbucket(total, (8, 32, 128, 512, 2048, 8192))
        # lane width = the MAX real per-wave occupancy across all tiles
        # (bucketed), not the sum of band capacities — the per-step
        # compute is width x waves, and most waves touch only the
        # active anti-diagonal of each tile
        occ = np.zeros(nwq, np.int64)
        for m in metas:
            for (w, *_rest) in m["classes"].get(sh, ()):
                occ[w] += 1
        wq = _wbucket(int(occ.max()), (8, 16, 32, 64, 128, 256, 512,
                                       1024, 2048))
        xsw = np.zeros((nwq, wq), np.int64)
        ysw = np.zeros((nwq, wq), np.int64)
        validw = np.zeros((nwq, wq), bool)
        htrw = np.zeros((nwq, wq), bool)
        hblw = np.zeros((nwq, wq), bool)
        haw = np.zeros((nwq, wq), bool)
        hlw = np.zeros((nwq, wq), bool)
        mwvw = np.full((nwq, wq), enc.seq.mi_cols * 4, np.int32)
        mhvw = np.full((nwq, wq), enc.seq.mi_rows * 4, np.int32)
        idxw = np.full((nwq, wq), total, np.int64)
        fill = np.zeros(nwq, np.int64)   # contiguous packing over tiles
        j = 0
        place = []
        for m in metas:
            ents = m["classes"].get(sh)
            if not ents:
                continue
            mi_r0, mi_c0, mi_rs, mi_cs = m["rect"][:4]
            y0, x0 = mi_r0 * 4, mi_c0 * 4
            mxw, mxh = x0 + mi_cs * 4, y0 + mi_rs * 4
            ids = []
            j0 = j
            for (w, r, c, htr_, hbl_, li) in ents:
                k = int(fill[w])
                fill[w] += 1
                xsw[w, k], ysw[w, k] = x0 + c * 4, y0 + r * 4
                validw[w, k] = True
                htrw[w, k], hblw[w, k] = htr_, hbl_
                haw[w, k], hlw[w, k] = r > 0, c > 0
                mwvw[w, k], mhvw[w, k] = mxw, mxh
                idxw[w, k] = j
                j += 1
                ids.append(li)
            place.append((m, ids, j0))
        class_spec.append((sh, wq, ncq))
        args += [xsw, ysw, validw, htrw, hblw, haw, hlw, mwvw, mhvw,
                 idxw]
        placements.append(place)
    shapes = (tuple(frame_recon[0].shape), tuple(frame_recon[1].shape))
    max_wh = ((enc.seq.mi_cols * 4, enc.seq.mi_rows * 4),
              (enc.seq.mi_cols * 2, enc.seq.mi_rows * 2))
    key = (tuple(class_spec), nwq, tuple(map(tuple, cands)),
           cfg.bit_depth, cfg.nfl,
           bool(cfg.enable_tx_type_search and cfg.base_q_idx > 0),
           shapes, max_wh, bool(cfg.enable_rdoq))
    npix = np.uint8 if cfg.bit_depth <= 8 else np.uint16
    full_args = (np.ascontiguousarray(frame_src[0], dtype=npix),
                 np.ascontiguousarray(frame_src[1], dtype=npix),
                 np.ascontiguousarray(frame_src[2], dtype=npix),
                 np.int32(n_waves),
                 np.full((), int(enc.qp.qindex), np.int32),
                 np.full((), md_mod.lam_to_q(enc.lam), np.int64)) \
        + tuple(args)
    prog = _build_mixed_program(*key)
    res = prog(*full_args)
    all_tiles = len(metas) == enc._tile_count
    from svt_av1_tpu.pipeline.common import PendingQC
    if all_tiles:
        out_recon = [res[0], res[1], res[2]]   # device-resident
        smalls = jax.device_get([
            {k: v for k, v in res[3 + ci].items()
             if not k.startswith("qc_")} for ci in range(len(placements))])
        for ci, place in enumerate(placements):
            nent = sum(len(ids) for _, ids, _ in place)
            for pl in ("qc_y", "qc_u", "qc_v"):
                res[3 + ci][pl] = res[3 + ci][pl][:nent]
                res[3 + ci][pl].copy_to_host_async()
    else:
        res = jax.device_get(res)
        pix = np.uint16 if cfg.bit_depth > 8 else np.uint8
        out_recon = frame_recon
        for m in metas:            # copy only the deferred tiles' pixels
            mi_r0, mi_c0, mi_rs, mi_cs = m["rect"][:4]
            y0, x0 = mi_r0 * 4, mi_c0 * 4
            h, w = mi_rs * 4, mi_cs * 4
            out_recon[0][y0:y0 + h, x0:x0 + w] = \
                np.asarray(res[0])[y0:y0 + h, x0:x0 + w].astype(pix)
            for p in (1, 2):
                out_recon[p][y0 // 2:(y0 + h) // 2,
                             x0 // 2:(x0 + w) // 2] = \
                    np.asarray(res[p])[y0 // 2:(y0 + h) // 2,
                                       x0 // 2:(x0 + w) // 2].astype(pix)
        smalls = [res[3 + ci] for ci in range(len(placements))]
    for ci, place in enumerate(placements):
        o = smalls[ci]
        pends = None
        if all_tiles:
            pends = [PendingQC(res[3 + ci][f"qc_{pl}"])
                     for pl in ("y", "u", "v")]
        else:
            qcs = [np.asarray(o["qc_y"]), np.asarray(o["qc_u"]),
                   np.asarray(o["qc_v"])]
        for m, ids, j0 in place:
            a = m["arrays"]
            ids = np.asarray(ids)
            js = np.arange(j0, j0 + len(ids))
            a["y_mode"][ids] = np.asarray(o["y_mode"])[js]
            a["y_delta"][ids] = np.asarray(o["y_delta"])[js]
            a["uv_mode"][ids] = np.asarray(o["uv_mode"])[js]
            a["uv_delta"][ids] = np.asarray(o["uv_delta"])[js]
            a["alpha_u"][ids] = np.asarray(o["alpha_u"])[js]
            a["alpha_v"][ids] = np.asarray(o["alpha_v"])[js]
            a["y_tx_type"][ids] = np.asarray(o["y_tt"])[js]
            a["eobs"][0, ids] = np.asarray(o["eob_y"])[js]
            a["eobs"][1, ids] = np.asarray(o["eob_u"])[js]
            a["eobs"][2, ids] = np.asarray(o["eob_v"])[js]
            for li, jj in zip(ids, js):
                if pends is not None:
                    a["qcoeff"][0][li] = (pends[0], int(jj))
                    a["qcoeff"][1][li] = (pends[1], int(jj))
                    a["qcoeff"][2][li] = (pends[2], int(jj))
                else:
                    a["qcoeff"][0][li] = qcs[0][jj]
                    a["qcoeff"][1][li] = qcs[1][jj]
                    a["qcoeff"][2][li] = qcs[2][jj]
    return out_recon


# --- fused intra-flip APPLY (inter frames) ---------------------------------------
# The exact re-code of accepted intra flips is wavefront-sequential
# (each flip's prediction edges may read earlier flips' recon). The
# former host path re-coded every (wave x shape x qindex x mode) group
# with host NumPy full loops — ~500 tiny dispatch groups and ~2.5 s per
# 1080p frame. This runs the whole pass as ONE device program: a
# lax.fori_loop over dependency waves carrying the frame recon, with
# per-lane forced modes and traced per-lane quantizers. Integer math is
# identical to inter._flip_apply_wave by construction.

def _flip_stage(shape: tuple, cands: tuple, bd: int, max_wh: tuple,
                rdoq: bool = False):
    from svt_av1_tpu.ops import device as dev
    from svt_av1_tpu.ops.device_md import (_full_loop_j, _rdcost_j,
                                           cfl_fit_alpha_j,
                                           cfl_predict_j, luma_ac_420_j,
                                           predict_any_j)
    from svt_av1_tpu.pipeline import md as md_mod
    bw, bh = shape
    cw_, ch_ = bw >> 1, bh >> 1
    cfl_ok = bw <= 32 and bh <= 32
    (mwy, mhy), (mwc, mhc) = max_wh
    tx_y = common.tx_size_for_rect(bw, bh, 0)
    tx_uv = common.tx_size_for_rect(cw_, ch_, 1)
    cwy, chy = common.coded_dims(tx_y)
    cwc, chc = common.coded_dims(tx_uv)
    modes = tuple(int(m) for m, _ in cands)
    tt_lut = np.zeros(16, np.int32)
    for m in modes:
        tt_lut[m] = common.chroma_tx_type(m, tx_uv, False)
    tt_set = tuple(sorted({int(tt_lut[m]) for m in modes}))

    def out_zeros(n_cls: int):
        n1 = n_cls + 1
        return dict(
            qc_y=jnp.zeros((n1, chy, cwy), jnp.int32),
            qc_u=jnp.zeros((n1, chc, cwc), jnp.int32),
            qc_v=jnp.zeros((n1, chc, cwc), jnp.int32),
            eob_y=jnp.zeros(n1, jnp.int64),
            eob_u=jnp.zeros(n1, jnp.int64),
            eob_v=jnp.zeros(n1, jnp.int64),
            use_cfl=jnp.zeros(n1, bool),
            alpha_u=jnp.zeros(n1, jnp.int64),
            alpha_v=jnp.zeros(n1, jnp.int64),
        )

    def step(recon_y, recon_u, recon_v, out, src_y, src_u, src_v, xs,
             ys, valid, htr, hbl, ha, hl, mwv, mhv, fm, idx, n_cls, qv,
             lamqv):
        b = xs.shape[0]
        idx = jnp.where(valid, idx, n_cls)
        rlq = lamqv if rdoq else None
        zeros_tt = jnp.zeros(b, dtype=jnp.int32)
        # --- luma (forced mode per lane) ---
        a1, l1 = _edges_j(recon_y, xs, ys, bw, bh, ha, hl, htr, hbl,
                          bd, mwv, mhv)
        srcs = _gather(src_y, xs, ys, bw, bh).astype(jnp.int64)
        pred = jnp.zeros((b, bh, bw), dtype=jnp.int64)
        for m in modes:
            p = predict_any_j(m, 0, a1, l1, bw, bh, ha, hl, bd)
            pred = jnp.where((fm == m)[:, None, None],
                             p.astype(jnp.int64), pred)
        qcy, eoy, recy, _, _ = _full_loop_j(
            srcs, pred, zeros_tt, (0,), tx_y, (bw, bh), qv, bd, 0,
            rdoq_lam_qv=rlq)
        recon_y = _scatter(recon_y, xs, ys, recy, valid, bw, bh)
        # --- chroma: per-lane {luma mode, CfL} joint pick ---
        cxs, cys = xs >> 1, ys >> 1
        ac = None
        if cfl_ok:
            luma = _gather(recon_y, xs, ys, bw, bh).astype(jnp.int64)
            ac = luma_ac_420_j(luma)
        res = {}
        for plane, (rc, sp) in ((1, (recon_u, src_u)),
                                (2, (recon_v, src_v))):
            a1c, l1c = _edges_j(rc, cxs, cys, cw_, ch_, ha, hl, htr,
                                hbl, bd, mwv >> 1, mhv >> 1)
            srcs_c = _gather(sp, cxs, cys, cw_, ch_).astype(jnp.int64)
            predc = jnp.zeros((b, ch_, cw_), dtype=jnp.int64)
            for m in modes:
                p = predict_any_j(m, 0, a1c, l1c, cw_, ch_, ha, hl, bd)
                predc = jnp.where((fm == m)[:, None, None],
                                  p.astype(jnp.int64), predc)
            tts = jnp.asarray(tt_lut)[fm.astype(jnp.int32)]
            qcp, eop, recp, dist, rate = _full_loop_j(
                srcs_c, predc, tts, tt_set, tx_uv, (cw_, ch_), qv, bd,
                1, rdoq_lam_qv=rlq)
            cost_m = _rdcost_j(dist, lamqv, rate)
            if cfl_ok:
                dc = dev.predict_modes((0,), a1c[:, 1:], l1c[:, 1:],
                                       a1c[:, 0], ha, hl, cw_, ch_,
                                       bd)[0]
                alpha = cfl_fit_alpha_j(ac, srcs_c, dc)
                cpred = cfl_predict_j(dc, ac, alpha,
                                      bd).astype(jnp.int64)
                qc2, eo2, rec2, dist2, rate2 = _full_loop_j(
                    srcs_c, cpred, zeros_tt, (0,), tx_uv, (cw_, ch_),
                    qv, bd, 1, rdoq_lam_qv=rlq)
                cost_c = _rdcost_j(
                    dist2, lamqv, rate2 + (4 << md_mod.RATE_Q))
            else:
                qc2 = eo2 = rec2 = cost_c = alpha = None
            res[plane] = (qcp, eop, recp, cost_m, qc2, eo2, rec2,
                          cost_c, alpha)
        if cfl_ok:
            use = (res[1][7] + res[2][7] < res[1][3] + res[2][3]) \
                & ~((res[1][8] == 0) & (res[2][8] == 0))
        else:
            use = jnp.zeros(b, dtype=bool)
        out = dict(out)
        for plane, (rc, qk, ek, ak) in ((1, ("u", "qc_u", "eob_u",
                                             "alpha_u")),
                                        (2, ("v", "qc_v", "eob_v",
                                             "alpha_v"))):
            qcp, eop, recp, _, qc2, eo2, rec2, _, alpha = res[plane]
            if cfl_ok:
                qsel = jnp.where(use[:, None, None], qc2, qcp)
                esel = jnp.where(use, eo2, eop)
                rsel = jnp.where(use[:, None, None], rec2, recp)
                asel = jnp.where(use, alpha, 0)
            else:
                qsel, esel, rsel = qcp, eop, recp
                asel = jnp.zeros(b, dtype=jnp.int64)
            target = recon_u if plane == 1 else recon_v
            target = _scatter(target, cxs, cys, rsel, valid, cw_, ch_)
            if plane == 1:
                recon_u = target
            else:
                recon_v = target
            out[qk] = out[qk].at[idx].set(qsel.astype(jnp.int32),
                                          mode="drop")
            out[ek] = out[ek].at[idx].set(esel, mode="drop")
            out[ak] = out[ak].at[idx].set(asel, mode="drop")
        out["qc_y"] = out["qc_y"].at[idx].set(qcy.astype(jnp.int32),
                                              mode="drop")
        out["eob_y"] = out["eob_y"].at[idx].set(eoy, mode="drop")
        out["use_cfl"] = out["use_cfl"].at[idx].set(use, mode="drop")
        return recon_y, recon_u, recon_v, out

    return step, out_zeros


def make_flip_body(class_spec: tuple, n_waves: int, cands: tuple,
                   bd: int, shapes: tuple, max_wh: tuple,
                   rdoq: bool = False):
    """class_spec: (((bw, bh), wq, n_cls), ...). The program takes the
    CURRENT inter recon planes (this pass repairs poorly-predicted
    blocks in place) and per-class per-wave lane arrays."""
    (Hy, Wy), (Hc, Wc) = shapes
    stages = [(sh, wq, n_cls)
              + _flip_stage(sh, cands, bd, max_wh, rdoq=rdoq)
              for (sh, wq, n_cls) in class_spec]
    pix = jnp.uint8 if bd <= 8 else jnp.uint16

    def program(ry, ru, rv, src_y, src_u, src_v, nw_dyn, *arrs):
        recon_y = ry.astype(jnp.int32)
        recon_u = ru.astype(jnp.int32)
        recon_v = rv.astype(jnp.int32)
        outs = tuple(oz(n_cls) for (_, _, n_cls, _, oz) in stages)

        def body(w, carry):
            recon_y, recon_u, recon_v, outs = carry
            outs = list(outs)
            for ci, (sh, wq, n_cls, step, _) in enumerate(stages):
                a = arrs[13 * ci:13 * ci + 13]
                recon_y, recon_u, recon_v, outs[ci] = step(
                    recon_y, recon_u, recon_v, outs[ci], src_y, src_u,
                    src_v, a[0][w], a[1][w], a[2][w], a[3][w], a[4][w],
                    a[5][w], a[6][w], a[7][w], a[8][w], a[9][w],
                    a[10][w], n_cls, a[11][w], a[12][w])
            return recon_y, recon_u, recon_v, tuple(outs)

        recon_y, recon_u, recon_v, outs = lax.fori_loop(
            0, jnp.minimum(nw_dyn, n_waves), body,
            (recon_y, recon_u, recon_v, outs))
        narrow = []
        for o in outs:
            o = dict(o)
            for k in ("qc_y", "qc_u", "qc_v"):
                o[k] = o[k].astype(jnp.int16)
            for k in ("eob_y", "eob_u", "eob_v"):
                o[k] = o[k].astype(jnp.int16)
            for k in ("alpha_u", "alpha_v"):
                o[k] = o[k].astype(jnp.int8)
            narrow.append(o)
        return (recon_y.astype(pix), recon_u.astype(pix),
                recon_v.astype(pix)) + tuple(narrow)

    return program


@functools.lru_cache(maxsize=32)
def _build_flip_program(*key):
    return jax.jit(make_flip_body(*key))


_WAVE_BUCKETS = (4, 8, 16, 32, 64, 128, 512, 1024, 2048, 4096)


def _wbucket(n: int, ladder=_WAVE_BUCKETS) -> int:
    for v in ladder:
        if n <= v:
            return v
    return n


FLIP_LANE_CAP = 8


def _balance_waves(waves, cap: int = FLIP_LANE_CAP):
    """Split dependency waves into fixed-width scan steps.

    The flip program's per-step compute is sized by each class's MAX
    per-wave occupancy, so one 60-lane wave makes every one of ~500
    steps pay 64 padded lane evaluations — ~20x the real work on dense
    flip fields. Same-wave lanes are mutually edge-independent (the
    _flip_waves invariant), so a wave can split into consecutive steps
    of at most ``cap`` lanes PER SHAPE CLASS without changing any
    block's prediction edges: earlier sub-steps only write pixels no
    later same-wave lane reads. Net: per-step width is pinned to the
    cap's bucket and total padded lane evaluations drop to
    ~steps*classes*cap."""
    from svt_av1_tpu.pipeline import common as _c
    out = []
    for wave in waves:
        byc = {}
        for e in wave:
            byc.setdefault(_c.leaf_wh(e[2]), []).append(e)
        k = max((len(v) + cap - 1) // cap for v in byc.values())
        if k == 1:
            out.append(wave)
            continue
        sub = [[] for _ in range(k)]
        for v in byc.values():
            for i, e in enumerate(v):
                sub[i % k].append(e)
        out.extend(sub)
    return out


def flip_apply_fused(enc, waves) -> bool:
    """Run the whole intra-flip apply pass (inter.InterFrameEncoder.
    _flip_apply_wave over every wave) as ONE device program; returns
    False to request the host fallback. ``waves``: output of
    enc._flip_waves — lists of (r, c, size, li, mode) in coding order."""
    from svt_av1_tpu.ops.device_inter import _dput, _pix_dt
    from svt_av1_tpu.pipeline import avail, md
    cfg = enc.cfg
    if not waves:
        return True
    waves = _balance_waves(waves)
    qcache = {}

    def lane_q(r, c):
        qidx = None if enc.qmap is None \
            else int(enc.qmap[r // 16, c // 16])
        ent = qcache.get(qidx)
        if ent is None:
            qp, lam = enc._qp_for(qidx)
            ent = (int(qp.qindex), md.lam_to_q(lam))
            qcache[qidx] = ent
        return ent

    # group by shape class; remember each flip's (wave, lane) placement
    classes = {}
    for w, wave in enumerate(waves):
        for (r, c, size, li, m) in wave:
            qi, lamq = lane_q(r, c)
            if cfg.enable_rdoq and qi == 0:
                return False       # host path gates RDOQ per qindex
            classes.setdefault(common.leaf_wh(size), []) \
                .append((w, r, c, li, m, qi, lamq))
    rdoq = bool(cfg.enable_rdoq)
    nwb = _wbucket(len(waves))
    cands = tuple((int(m), 0) for m in cfg.intra_modes) or ((0, 0),)
    shapes = (tuple(enc.recon[0].shape), tuple(enc.recon[1].shape))
    max_wh = ((enc.mi_cols * 4, enc.mi_rows * 4),
              (enc.mi_cols * 2, enc.mi_rows * 2))
    class_spec = []
    arrs = []
    order = sorted(classes)
    for sh in order:
        entries = classes[sh]
        occ = np.zeros(len(waves), np.int64)
        for (w, *_rest) in entries:
            occ[w] += 1
        wq = _wbucket(int(occ.max()), (8, 32, 128, 512, 2048))
        n_cls = _wbucket(len(entries), (8, 32, 128, 512, 2048, 8192))
        class_spec.append((sh, wq, n_cls))
        xs = np.zeros((nwb, wq), np.int32)
        ys = np.zeros((nwb, wq), np.int32)
        valid = np.zeros((nwb, wq), bool)
        htr = np.zeros((nwb, wq), bool)
        hbl = np.zeros((nwb, wq), bool)
        haw = np.zeros((nwb, wq), bool)
        hlw = np.zeros((nwb, wq), bool)
        fm = np.zeros((nwb, wq), np.int32)
        idx = np.full((nwb, wq), n_cls, np.int32)
        qv = np.ones((nwb, wq), np.int32)
        lamqv = np.ones((nwb, wq), np.int64)
        slot = np.zeros(len(waves), np.int64)
        w4, h4 = sh[0] >> 2, sh[1] >> 2
        by_wave = {}
        for j, (w, r, c, li, m, qi, lamq) in enumerate(entries):
            k = int(slot[w])
            slot[w] += 1
            xs[w, k], ys[w, k] = c * 4, r * 4
            valid[w, k] = True
            fm[w, k] = m
            idx[w, k] = j
            qv[w, k] = qi
            lamqv[w, k] = lamq
            by_wave.setdefault(w, []).append((k, r, c))
        mwv = np.full((nwb, wq), enc.mi_cols * 4, np.int32)
        mhv = np.full((nwb, wq), enc.mi_rows * 4, np.int32)
        for w, lanes in by_wave.items():
            rs = np.array([r for _, r, _ in lanes])
            cs = np.array([c for _, _, c in lanes])
            kk = np.array([k for k, _, _ in lanes])
            # availability + edge replication clip at tile bounds
            # (spec 7.10.2 / 7.11.2)
            lr_, lc_, trs, tcs = enc._tile_local_coords(rs, cs)
            vab = avail.leaf_vert_ab_flags(enc.leaf_sizes, rs, cs, w4,
                                           h4, enc.mi_rows, enc.mi_cols)
            htr[w, kk] = avail.has_top_right_wh_vec(
                lr_, lc_, w4, h4, tcs, vert_ab=vab)
            hbl[w, kk] = avail.has_bottom_left_wh_vec(
                lr_, lc_, w4, h4, trs, vert_ab=vab)
            haw[w, kk] = lr_ > 0
            hlw[w, kk] = lc_ > 0
            mwv[w, kk] = (cs - lc_ + tcs) * 4
            mhv[w, kk] = (rs - lr_ + trs) * 4
        arrs += [xs, ys, valid, htr, hbl, haw, hlw, mwv, mhv, fm, idx,
                 qv, lamqv]
    prog = _build_flip_program(tuple(class_spec), nwb, cands,
                               cfg.bit_depth, shapes, max_wh, rdoq)
    pdt = _pix_dt(cfg.bit_depth)
    res = prog(
        jax.device_put(enc.recon[0]), jax.device_put(enc.recon[1]),
        jax.device_put(enc.recon[2]), _dput(enc.src[0], pdt),
        _dput(enc.src[1], pdt), _dput(enc.src[2], pdt),
        np.int32(len(waves)), *arrs)
    # planes stay device-resident; the big (bucket-padded) coefficient
    # tensors defer to PendingQC markers resolved on the entropy thread
    from svt_av1_tpu.pipeline.common import PendingQC
    enc.recon[0] = res[0]
    enc.recon[1] = res[1]
    enc.recon[2] = res[2]
    smalls = jax.device_get([
        {k: v for k, v in res[3 + ci].items()
         if not k.startswith("qc_")} for ci in range(len(order))])
    for ci, sh in enumerate(order):
        nent = len(classes[sh])
        for pl in ("qc_y", "qc_u", "qc_v"):
            res[3 + ci][pl] = res[3 + ci][pl][:nent]
            res[3 + ci][pl].copy_to_host_async()
    for ci, sh in enumerate(order):
        o = smalls[ci]
        pends = [PendingQC(res[3 + ci][f"qc_{pl}"])
                 for pl in ("y", "u", "v")]
        entries = classes[sh]
        for j, (w, r, c, li, m, qi, lamq) in enumerate(entries):
            enc.block_is_inter[li] = False
            enc.intra_mode[li] = m
            enc.qcoeff[0][li] = (pends[0], j)
            enc.qcoeff[1][li] = (pends[1], j)
            enc.qcoeff[2][li] = (pends[2], j)
            enc.eobs[0, li] = o["eob_y"][j]
            enc.eobs[1, li] = o["eob_u"][j]
            enc.eobs[2, li] = o["eob_v"][j]
            enc.intra_uv_cfl[li] = o["use_cfl"][j]
            enc.intra_alpha_u[li] = o["alpha_u"][j]
            enc.intra_alpha_v[li] = o["alpha_v"][j]
    return True
