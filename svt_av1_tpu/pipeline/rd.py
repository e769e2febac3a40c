"""Partition RD search: batched per-depth analysis + block-tree DP.

The reference's recursive ``mode_decision_sb`` (EbProductCodingLoop.c:2690,
d1/d2 partition decisions) re-expressed for TPU (SURVEY.md §7.1/§7.4.4):
evaluate ALL blocks of each depth (64/32/16/8) in one batched open-loop
pass — prediction from *source* neighbors, so there is no sequential recon
dependency and every depth is a single full-frame tensor step — then choose
the partition by bottom-up dynamic programming over the square tree with an
RD cost ``dist + lambda * rate_proxy``.

The final encode pass (wavefront) re-decides modes closed-loop on the
chosen leaves; this module only fixes the tree shape, mirroring how the
reference's MD stage hands a block list to the encode pass.
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.ops import intra as intra_ops
from svt_av1_tpu.ops import quant as quant_ops
from svt_av1_tpu.ops import transforms as tx_ops
from svt_av1_tpu.pipeline import common
from svt_av1_tpu.utils.blocks import DCT_DCT, get_scan


def rd_lambda(qindex: int, bit_depth: int = 8) -> float:
    """RD multiplier from qindex (shape follows av1_compute_rd_mult:
    lambda ~ q_step^2; constant calibrated on synthetic sweeps).
    SVT_TPU_LAMBDA_SCALE (env) rescales for calibration experiments."""
    import os
    q = quant_ops.dc_quant(qindex, 0, bit_depth) / 8.0
    scale = float(os.environ.get("SVT_TPU_LAMBDA_SCALE", "1"))
    return 0.1 * scale * q * q


def _block_grid(w_eff: int, h_eff: int, size: int):
    """Top-left coords of all size-aligned blocks with origin inside the
    mi area."""
    xs = np.arange(0, w_eff, size)
    ys = np.arange(0, h_eff, size)
    gx, gy = np.meshgrid(xs, ys)
    return gx.reshape(-1), gy.reshape(-1)


def _analyze_depth(src: np.ndarray, xs, ys, size, cands, qp,
                   max_w: int, max_h: int, mi_cols: int, mi_rows: int,
                   lam: float, bd: int = 8, backend: str = "host"):
    """Open-loop analysis of all blocks at one depth via the shared mode
    decision kernel. ``size``: int (square) or (w, h) rect. Returns
    (rd_cost [B], best_mode [B])."""
    from svt_av1_tpu.pipeline import avail, md
    bw, bh = common.leaf_wh(size)
    ha, hl = ys > 0, xs > 0
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    htr = avail.has_top_right_wh_vec(ys >> 2, xs >> 2, bw >> 2,
                                     bh >> 2, mi_cols)
    hbl = avail.has_bottom_left_wh_vec(ys >> 2, xs >> 2, bw >> 2,
                                       bh >> 2, mi_rows)
    above1, left1 = intra_ops.prepare_edges_av1(
        src, xs, ys, bw, bh, ha, hl, htr, hbl, bd=bd,
        max_w=max_w, max_h=max_h)
    iy = ys[:, None, None] + np.arange(bh)[None, :, None]
    ix = xs[:, None, None] + np.arange(bw)[None, None, :]
    srcs = src[iy, ix].astype(np.int64)
    if backend == "device":
        from svt_av1_tpu.ops.device_md import decide_block_batch_dev
        decide = decide_block_batch_dev
    else:
        decide = md.decide_block_batch
    best_mode, _, _, _, _, rd_cost, _, _ = decide(
        0, srcs, above1, left1, ha, hl, cands, qp, size, lam, bd=bd)
    # per-leaf syntax floor: skip + partition share + chroma mode and
    # coefficient overhead invisible to this luma-only open-loop score
    # (empirically ~16 bits; keeps the DP from over-splitting now that
    # the CDF-derived coefficient rates are well-calibrated). rd_cost is
    # integer q9-scaled (md.rdcost); the DP continues in float64, which
    # is exact for these magnitudes (< 2^53).
    from svt_av1_tpu.pipeline import md as md_mod
    return rd_cost.astype(np.float64) \
        + lam * float(16 << md_mod.RATE_Q), best_mode


def _analyze_depth_issue(src, xs, ys, size, cands, qp, max_w: int,
                         max_h: int, mi_cols: int, mi_rows: int,
                         lam: float, bd: int = 8):
    """Dispatch-only device variant of _analyze_depth: host edge prep +
    one cost-only program issue (device_md.decide_cost_issue). Returns
    a handle; resolve with _analyze_depth_fetch AFTER issuing every
    depth so tunnel round trips overlap. Costs are bit-identical to
    _analyze_depth's device branch."""
    from svt_av1_tpu.ops.device_md import decide_cost_issue
    from svt_av1_tpu.pipeline import avail
    bw, bh = common.leaf_wh(size)
    ha, hl = ys > 0, xs > 0
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    htr = avail.has_top_right_wh_vec(ys >> 2, xs >> 2, bw >> 2,
                                     bh >> 2, mi_cols)
    hbl = avail.has_bottom_left_wh_vec(ys >> 2, xs >> 2, bw >> 2,
                                       bh >> 2, mi_rows)
    above1, left1 = intra_ops.prepare_edges_av1(
        src, xs, ys, bw, bh, ha, hl, htr, hbl, bd=bd,
        max_w=max_w, max_h=max_h)
    iy = ys[:, None, None] + np.arange(bh)[None, :, None]
    ix = xs[:, None, None] + np.arange(bw)[None, None, :]
    srcs = src[iy, ix].astype(np.int64)
    out, b = decide_cost_issue(0, srcs, above1, left1, ha, hl, cands,
                               qp, size, lam, bd=bd)
    return (out, b, lam)


def _analyze_depth_fetch(handle):
    from svt_av1_tpu.pipeline import md as md_mod
    out, b, lam = handle
    return np.asarray(out)[:b].astype(np.float64) \
        + lam * float(16 << md_mod.RATE_Q)


def _satd_modes_host(srcs, above1, left1, ha, hl, modes, size, bd):
    """Host twin of device_md.satd_modes_dev: min-over-modes SATD of
    the open-loop intra residual (size-matched Hadamard |coeff| sum,
    tile cap 32 like the tx sizes — a transform the block's own size
    sees the energy concentration that makes large smooth blocks cheap,
    which per-8x8 tiling cannot). Reference OIS scoring model
    (EbMotionEstimation.c:7419)."""
    bw, bh = common.leaf_wh(size)
    tw, th = min(bw, 32), min(bh, 32)
    Hh, Hw = common.hadamard_n(th), common.hadamard_n(tw)
    best = None
    for m in modes:
        p = intra_ops.predict_any(m, 0, above1, left1, bw, bh, ha, hl,
                                  bd=bd).astype(np.int64)
        r = (srcs - p).reshape(-1, bh // th, th, bw // tw, tw) \
            .transpose(0, 1, 3, 2, 4)
        t = np.matmul(np.matmul(Hh, r), Hw)
        s = np.abs(t).sum(axis=(1, 2, 3, 4))
        best = s if best is None else np.minimum(best, s)
    return best


def _dp_intra_overhead() -> float:
    """Per-leaf fixed syntax-overhead (bits) for the SATD intra DP
    model; env-overridable for calibration sweeps."""
    import os
    return float(os.environ.get("SVT_TPU_DP_INTRA_OVERHEAD", "24.0"))


def _analyze_depth_satd(src, xs, ys, size, modes, max_w: int, max_h: int,
                        mi_cols: int, mi_rows: int, lam: float,
                        qstep: float, bd: int = 8,
                        backend: str = "host"):
    """SATD-based open-loop depth cost (plain-bit rate scale, same
    quantization-aware model family as choose_partition_inter's
    rd_model). ~10x cheaper than the full-T/Q _analyze_depth."""
    from svt_av1_tpu.pipeline import avail
    bw, bh = common.leaf_wh(size)
    ha, hl = ys > 0, xs > 0
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    htr = avail.has_top_right_wh_vec(ys >> 2, xs >> 2, bw >> 2,
                                     bh >> 2, mi_cols)
    hbl = avail.has_bottom_left_wh_vec(ys >> 2, xs >> 2, bw >> 2,
                                       bh >> 2, mi_rows)
    above1, left1 = intra_ops.prepare_edges_av1(
        src, xs, ys, bw, bh, ha, hl, htr, hbl, bd=bd,
        max_w=max_w, max_h=max_h)
    iy = ys[:, None, None] + np.arange(bh)[None, :, None]
    ix = xs[:, None, None] + np.arange(bw)[None, None, :]
    srcs = src[iy, ix].astype(np.int64)
    if backend == "device":
        from svt_av1_tpu.ops.device_md import satd_modes_dev
        satd = satd_modes_dev(srcs, above1, left1, ha, hl, modes, size,
                              bd)
    else:
        satd = _satd_modes_host(srcs, above1, left1, ha, hl, modes,
                                size, bd)
    # SSE estimate from the Hadamard L1 (transform gain sqrt(Ntx) per
    # axis): SSE ~ (satd/sqrt(Ntx))^2 / N x pi/2; the distortion floor
    # and R(D) shape mirror choose_partition_inter.rd_model
    n = float(bw * bh)
    ntx = float(min(bw, 32) * min(bh, 32))
    sse = 1.5 * (satd.astype(np.float64) ** 2) / (ntx * n)
    nq = n * qstep * qstep
    dist = np.minimum(sse, sse * 0.05 + 0.125 * nq)
    rate = _dp_intra_overhead() + 0.6 * n * np.log2(1.0 + sse / nq)
    return dist + lam * rate


def _leaves_from_choices(choice: dict, min_size: int, mi_rows: int,
                         mi_cols: int) -> dict:
    """Materialize a DP decision grid into the leaf map. Kind encoding
    (shared by both partition DPs): 0 NONE, 1 SPLIT, 2 HORZ, 3 VERT,
    4 HORZ_4, 5 VERT_4, 6 HORZ_A, 7 HORZ_B, 8 VERT_A, 9 VERT_B."""
    leaves = {}

    def walk(r, c, size):  # r, c in mi units
        if r >= mi_rows or c >= mi_cols:
            return
        hbs = size >> 3
        crosses = (r + hbs) >= mi_rows or (c + hbs) >= mi_cols
        kind = 1  # split
        if not (crosses and size > 8):
            if size <= min_size:
                kind = 0
            elif size in choice:
                kind = int(choice[size][(r * 4) // size,
                                        (c * 4) // size])
        if kind == 0:
            leaves[(r, c)] = size
            return
        half = size // 2
        if kind == 2:      # HORZ
            leaves[(r, c)] = (size, half)
            if r + hbs < mi_rows:
                leaves[(r + hbs, c)] = (size, half)
            return
        if kind == 3:      # VERT
            leaves[(r, c)] = (half, size)
            if c + hbs < mi_cols:
                leaves[(r, c + hbs)] = (half, size)
            return
        if kind in (4, 5):  # HORZ_4 / VERT_4
            qbs = size >> 4
            wh = (size, size // 4) if kind == 4 else (size // 4, size)
            for i in range(4):
                rr = r + (i * qbs if kind == 4 else 0)
                cc = c + (0 if kind == 4 else i * qbs)
                if rr < mi_rows and cc < mi_cols:
                    leaves[(rr, cc)] = wh
            return
        if kind in (6, 7, 8, 9):  # T-shapes: 2 squares + 1 rect half
            rh, rv = (size, half), (half, size)
            pat = {6: [((0, 0), half), ((0, hbs), half), ((hbs, 0), rh)],
                   7: [((0, 0), rh), ((hbs, 0), half), ((hbs, hbs), half)],
                   8: [((0, 0), half), ((hbs, 0), half), ((0, hbs), rv)],
                   9: [((0, 0), rv), ((0, hbs), half),
                       ((hbs, hbs), half)]}[kind]
            for (dr, dc), v in pat:
                if r + dr < mi_rows and c + dc < mi_cols:
                    leaves[(r + dr, c + dc)] = v
            return
        walk(r, c, half)
        walk(r, c + hbs, half)
        walk(r + hbs, c, half)
        walk(r + hbs, c + hbs, half)

    for sb_r in range(0, mi_rows, 16):
        for sb_c in range(0, mi_cols, 16):
            walk(sb_r, sb_c, 64)
    return leaves


def choose_partition(y_plane: np.ndarray, cfg: EncoderConfig,
                     mi_cols: int, mi_rows: int):
    """Returns the chosen leaf set {(mi_row, mi_col): size} for the frame.

    DP over the square tree: split iff sum of child costs + split syntax
    < leaf cost. Edge-crossing blocks are forced to split (the emit rule).
    """
    lam = rd_lambda(cfg.base_q_idx, cfg.bit_depth)
    src = common.pad_to_multiple(y_plane, 64).astype(np.int32)
    w_eff, h_eff = mi_cols * 4, mi_rows * 4
    qp = quant_ops.make_quant_params(cfg.base_q_idx,
                                     bit_depth=cfg.bit_depth)
    # the DP's open-loop scores only shape the tree; a trimmed candidate
    # set (no angle sweep, core modes) keeps the estimates faithful at a
    # fraction of the cost — the final encode re-decides closed-loop with
    # the full configured set
    cands = [c for c in common.intra_candidates(cfg)
             if c[1] == 0 and c[0] in (0, 1, 2, 3, 7, 9, 12)]
    if not cands:
        cands = common.intra_candidates(cfg)
    # SATD scoring (reference OIS model): swaps the per-depth full-T/Q
    # loop for Hadamard-residual costs in the plain-bit rate scale —
    # the DP only needs relative costs. ~10x cheaper per keyframe.
    satd_mode = cfg.intra_dp_satd
    qstep = quant_ops.ac_quant(cfg.base_q_idx, 0, cfg.bit_depth) / 8.0
    satd_modes = tuple(m for m, _ in cands)
    bitq = 1.0 if satd_mode else 512.0

    # device path: dispatch EVERY depth/arm cost program before fetching
    # any result — the former per-depth synchronous fetch serialized
    # ~20 tunnel round trips (and pulled unused qc/recon tensors)
    dev_async = cfg.backend == "device" and not satd_mode
    pending = []   # (handle, store-callback)

    def depth_cost(xs, ys, wh, store):
        if satd_mode:
            store(_analyze_depth_satd(src, xs, ys, wh, satd_modes,
                                      w_eff, h_eff, mi_cols, mi_rows,
                                      lam, qstep, cfg.bit_depth,
                                      backend=cfg.backend))
        elif dev_async:
            pending.append((_analyze_depth_issue(
                src, xs, ys, wh, cands, qp, w_eff, h_eff, mi_cols,
                mi_rows, lam, cfg.bit_depth), store))
        else:
            c, _ = _analyze_depth(src, xs, ys, wh, cands, qp, w_eff,
                                  h_eff, mi_cols, mi_rows, lam,
                                  cfg.bit_depth, backend=cfg.backend)
            store(c)

    sizes = [s for s in (64, 32, 16, 8)
             if cfg.min_partition_size <= s <= cfg.max_partition_size]
    if 64 not in sizes:
        sizes = [64] + sizes  # tree root is always evaluated
    cost = {}
    for size in sizes:
        xs, ys = _block_grid(w_eff, h_eff, size)
        cols = (w_eff + size - 1) // size
        rows = (h_eff + size - 1) // size

        def st_sq(c, size=size, rows=rows, cols=cols):
            cost[size] = c.reshape(rows, cols)

        depth_cost(xs, ys, size, st_sq)

    # rectangular arms (PARTITION_HORZ / PARTITION_VERT): two half-blocks
    # per square node, evaluated at the node grid (min leaf dim 8 keeps
    # chroma >= 4x4)
    rect_cost = {}
    if cfg.enable_rect_partitions:
        for size in sizes[:-1]:
            if size < 16:
                continue
            half = size // 2
            cols = (w_eff + size - 1) // size
            rows = (h_eff + size - 1) // size
            gx, gy = _block_grid(w_eff, h_eff, size)
            quarter = size // 4
            arms = [("h", (size, half), [(0, 0), (0, half)]),
                    ("v", (half, size), [(0, 0), (half, 0)])]
            if size >= 32:
                # 4-way strips (PARTITION_HORZ_4 / VERT_4); parent >= 32
                # keeps the 4:1 children's chroma at >= 4 px per side
                arms += [("h4", (size, quarter),
                          [(0, i * quarter) for i in range(4)]),
                         ("v4", (quarter, size),
                          [(i * quarter, 0) for i in range(4)])]
            for key, wh, offs in arms:
                xs = np.concatenate([gx + dx for dx, _ in offs])
                ys = np.concatenate([gy + dy for _, dy in offs])
                # skip out-of-area sub-blocks cleanly (cost -> inf)
                ok = (xs + wh[0] <= ((w_eff + 63) // 64) * 64) \
                    & (ys + wh[1] <= ((h_eff + 63) // 64) * 64)
                sel = np.nonzero(ok)[0]

                def st_arm(cc, size=size, key=key, sel=sel, n_all=len(xs),
                           n=len(gx), rows=rows, cols=cols,
                           n_offs=len(offs)):
                    c = np.full(n_all, np.inf)
                    c[sel] = cc
                    halves = [c[i * n:(i + 1) * n].reshape(rows, cols)
                              for i in range(n_offs)]
                    rect_cost[(size, key)] = sum(halves)
                    if key in ("h", "v"):
                        # individual half grids feed the T-shape arms
                        rect_cost[(size, key + "0")] = halves[0]
                        rect_cost[(size, key + "1")] = halves[1]

                if len(sel):
                    depth_cost(xs[sel], ys[sel], wh, st_arm)
                else:
                    st_arm(np.zeros(0))
    for h, store in pending:
        store(_analyze_depth_fetch(h))

    # bottom-up DP. "crosses" must mirror the emit/_leaves rule exactly:
    # a block is forced to split when its HALF-point falls outside the mi
    # area (has_rows/has_cols, EncodePartitionAv1 EbEntropyCoding.c:950).
    min_size = sizes[-1]
    best = cost[min_size].copy()
    choice = {}
    split_bits = bitq  # partition symbol proxy (1 bit; q9 or plain)
    for size in reversed(sizes[:-1]):
        rows, cols = cost[size].shape
        ch_rows, ch_cols = best.shape
        cpad = np.pad(best, ((0, (-ch_rows) % 2), (0, (-ch_cols) % 2)))
        sum4 = (cpad[0::2, 0::2] + cpad[0::2, 1::2]
                + cpad[1::2, 0::2] + cpad[1::2, 1::2])
        sum4 = sum4[:rows, :cols] + lam * split_bits
        leaf_c = cost[size]
        ys_b = np.arange(rows)[:, None] * size
        xs_b = np.arange(cols)[None, :] * size
        crosses = ((ys_b + size // 2 >= h_eff)
                   | (xs_b + size // 2 >= w_eff))
        options = [(0, np.where(crosses, np.inf, leaf_c)),
                   (1, sum4)]
        if (size, "h") in rect_cost:
            rb = lam * (split_bits + bitq)
            options.append((2, np.where(crosses, np.inf,
                                        rect_cost[(size, "h")] + rb)))
            options.append((3, np.where(crosses, np.inf,
                                        rect_cost[(size, "v")] + rb)))
        if (size, "h4") in rect_cost:
            rb4 = lam * (split_bits + 2 * bitq)  # rarer symbol + 3 leaves
            options.append((4, np.where(crosses, np.inf,
                                        rect_cost[(size, "h4")] + rb4)))
            options.append((5, np.where(crosses, np.inf,
                                        rect_cost[(size, "v4")] + rb4)))
        if (size, "h0") in rect_cost and (size // 2) in cost:
            # T-shapes (HORZ_A/B, VERT_A/B): two child squares + one
            # rect half, reusing the child-depth and rect-half grids
            ch = cost[size // 2]
            chp = np.full((2 * rows, 2 * cols), np.inf)
            chp[:min(ch.shape[0], 2 * rows), :min(ch.shape[1], 2 * cols)] \
                = ch[:2 * rows, :2 * cols]
            tl, tr = chp[0::2, 0::2], chp[0::2, 1::2]
            bl, br = chp[1::2, 0::2], chp[1::2, 1::2]
            rbt = lam * (split_bits + 2 * bitq)  # symbol + 2 extra leaves
            tarms = [(6, tl + tr + rect_cost[(size, "h1")]),
                     (7, rect_cost[(size, "h0")] + bl + br),
                     (8, tl + bl + rect_cost[(size, "v1")]),
                     (9, rect_cost[(size, "v0")] + tr + br)]
            options += [(k, np.where(crosses, np.inf, v + rbt))
                        for k, v in tarms]
        stackc = np.stack([o[1] for o in options])
        pick = np.argmin(stackc, axis=0)
        choice[size] = np.array([o[0] for o in options])[pick]
        best = np.take_along_axis(stackc, pick[None], axis=0)[0]

    return _leaves_from_choices(choice, min_size, mi_rows, mi_cols)


def _dp_leaf_overhead() -> float:
    """Per-leaf fixed syntax-overhead estimate (bits) in the inter
    partition DP's open-loop RD model. Env-overridable for calibration
    sweeps (tools/rd_experiment.py).

    Calibrated round 4: swept 12..480 on the synthetic RA ladder and
    the natural pan/occluder clips (utils/natural.py). The open-loop
    model can't see the full-loop's per-leaf mode/MV/coefficient fixed
    costs, so the DP was splitting far too eagerly: raising the
    overhead to 160 cut bits at EVERY rung at flat PSNR (640x360 RA
    hier3: q25 -4.8%, q35 -4.6%, q45 -9.4%, q55 -15%; natural pan q35
    -27% bits for -0.15 dB; occluder -6% flat) — a pure BD-rate win.
    Above ~320 the finest rung starts losing PSNR."""
    import os
    return float(os.environ.get("SVT_TPU_DP_OVERHEAD", "160.0"))


def choose_partition_inter(y_plane: np.ndarray, ref_padded: np.ndarray,
                           cfg: EncoderConfig, mi_cols: int,
                           mi_rows: int, ref_pyr=None, src_pyr=None):
    """Square partition DP for inter frames from motion-compensated
    residual energy (the inter analogue of the intra DP above; the
    reference derives inter partitions from the same ME-driven MD
    search). Per depth: full-pel HME, SSE of the compensated block,
    per-leaf syntax overhead; bottom-up split decision."""
    from svt_av1_tpu.ops import me
    lam = rd_lambda(cfg.base_q_idx, cfg.bit_depth)
    # quantizer step in pixel units (same scale as the SSE operands)
    qstep = quant_ops.ac_quant(cfg.base_q_idx, 0, cfg.bit_depth) / 8.0
    src = common.pad_to_multiple(y_plane, 64).astype(
        common.pixel_dtype(cfg.bit_depth))
    w_eff, h_eff = mi_cols * 4, mi_rows * 4
    pad = 32
    ref_core = ref_padded  # already padded by caller (REF_PAD border)
    sizes = [s for s in (64, 32, 16, 8)
             if cfg.min_partition_size <= s <= cfg.max_partition_size]
    if 64 not in sizes:
        sizes = [64] + sizes
    use_dev = cfg.backend == "device"
    if use_dev:
        from svt_av1_tpu.ops import device_inter as di
    if ref_pyr is None:
        ref_pyr = me.build_pyramid(ref_core)
    if src_pyr is None:
        src_pyr = me.src_pyramid(src)

    def rd_model(sse, wh, mvs):
        """Quantization-aware open-loop RD estimate from full-pel SSE.

        Raw SSE always prefers smaller blocks (per-block MVs fit the
        residual better), but at coarse quantizers those gains vanish
        after T/Q while the per-leaf syntax stays — the reference sees
        this because its MD runs the actual full loop per depth
        (EbProductCodingLoop.c). Model: distortion saturates at the
        coding floor ~N*qstep^2/12 and rate follows the Gaussian R(D)
        shape N*log2(1+SSE/(N*qstep^2)), so when residuals die after
        quantization the leaf-overhead term decides and the DP merges."""
        bw, bh = common.leaf_wh(wh)
        n = float(bw * bh)
        sse = np.asarray(sse, dtype=np.float64)
        nq = n * qstep * qstep
        mv_bits = 4.0 + 0.5 * (np.abs(mvs).sum(axis=1) > 0)
        dist = np.minimum(sse, sse * 0.05 + 0.125 * nq)
        rate = _dp_leaf_overhead() + mv_bits \
            + 0.6 * n * np.log2(1.0 + sse / nq)
        return dist + lam * rate

    def depth_cost(xs, ys, wh, seeds=None):
        """Per-block ME cost. ``seeds``: [B, 2] full-pel centers from a
        coarser depth — a +-3 refinement around the parent MV replaces a
        fresh HME (one full HME at the root is enough; children refine,
        the reference's HME seeding pattern). Backend-dispatched: the
        device path runs ME + SSE as one jitted program per depth
        (device_inter.dp_depth_dev), bit-identical to this host path."""
        bw, bh = common.leaf_wh(wh)
        if use_dev:
            mvs, sse_i = di.dp_depth_dev(ref_pyr, src_pyr, xs, ys, wh,
                                         seeds)
            return rd_model(sse_i, wh, mvs), mvs
        if seeds is None:
            mvs, _ = me.fullpel_search(ref_core, src, xs, ys, wh,
                                       ref_pyr=ref_pyr, src_pyr=src_pyr)
        else:
            cands = np.concatenate([seeds, np.zeros_like(seeds)])
            xs2 = np.concatenate([xs, xs])
            ys2 = np.concatenate([ys, ys])
            mv2, cost2 = me._exhaustive(ref_core, src, xs2, ys2, wh,
                                        cands, 3)
            n = len(xs)
            better = cost2[n:] < cost2[:n]
            mvs = np.where(better[:, None], mv2[n:], mv2[:n])
        xs = np.asarray(xs, dtype=np.int64)
        ys = np.asarray(ys, dtype=np.int64)
        ry = (ys + mvs[:, 0] + pad)[:, None, None] \
            + np.arange(bh)[None, :, None]
        rx = (xs + mvs[:, 1] + pad)[:, None, None] \
            + np.arange(bw)[None, None, :]
        iy = ys[:, None, None] + np.arange(bh)[None, :, None]
        ix = xs[:, None, None] + np.arange(bw)[None, None, :]
        d = srcf[iy, ix] - ref_core[ry, rx].astype(np.int64)
        sse = (d * d).sum(axis=(1, 2))
        return rd_model(sse, wh, mvs), mvs

    cost = {}
    rect_cost = {}
    srcf = src.astype(np.int64)

    def arms_for(size):
        half, quarter = size // 2, size // 4
        arms = [("h", (size, half), ((0, 0), (0, half))),
                ("v", (half, size), ((0, 0), (half, 0)))]
        if size >= 32:
            arms += [("h4", (size, quarter),
                      tuple((0, i * quarter) for i in range(4))),
                     ("v4", (quarter, size),
                      tuple((i * quarter, 0) for i in range(4)))]
        return arms

    dp_res = None
    if use_dev:
        # the whole DP's device work (every depth + every arm) runs as
        # ONE program — see device_inter._build_dp_all
        arm_spec = [(size, wh, offs) for size in sizes
                    if cfg.enable_rect_partitions and size >= 16
                    for (_, wh, offs) in arms_for(size)]
        dp_res = di.dp_all_dev(ref_pyr, src_pyr, w_eff, h_eff, sizes,
                               arm_spec)
    parent_mvs = None   # [rows, cols, 2] of the previous (coarser) depth
    for size in sizes:
        xs, ys = _block_grid(w_eff, h_eff, size)
        rows = (h_eff + size - 1) // size
        cols = (w_eff + size - 1) // size
        if dp_res is not None:
            mvs, sse = dp_res[size]
            c = rd_model(sse, size, mvs)
        else:
            seeds = None
            if parent_mvs is not None:
                seeds = parent_mvs[(ys // (size * 2)).astype(int),
                                   (xs // (size * 2)).astype(int)]
            c, mvs = depth_cost(xs, ys, size, seeds)
        cost[size] = c.reshape(rows, cols)
        parent_mvs = mvs.reshape(rows, cols, 2)
        if cfg.enable_rect_partitions and size >= 16:
            gx, gy = xs, ys
            for key, wh, offs in arms_for(size):
                xs2 = np.concatenate([gx + dx for dx, _ in offs])
                ys2 = np.concatenate([gy + dy for _, dy in offs])
                pw = src.shape[1]
                ph = src.shape[0]
                ok = (xs2 + wh[0] <= pw) & (ys2 + wh[1] <= ph)
                c2 = np.full(len(xs2), np.inf)
                sel = np.nonzero(ok)[0]
                if dp_res is not None:
                    amvs, asse = dp_res[(size, tuple(wh))]
                    c2full = rd_model(asse, wh, amvs)
                    c2 = np.where(ok, c2full, np.inf)
                elif len(sel):
                    rseeds = np.concatenate([mvs] * len(offs))[sel]
                    c2[sel], _ = depth_cost(xs2[sel], ys2[sel], wh,
                                            rseeds)
                n = len(gx)
                halves = [c2[i * n:(i + 1) * n].reshape(rows, cols)
                          for i in range(len(offs))]
                rect_cost[(size, key)] = sum(halves)
                if key in ("h", "v"):
                    rect_cost[(size, key + "0")] = halves[0]
                    rect_cost[(size, key + "1")] = halves[1]

    min_size = sizes[-1]
    best = cost[min_size].copy()
    choice = {}
    for size in reversed(sizes[:-1]):
        rows, cols = cost[size].shape
        ch_rows, ch_cols = best.shape
        cpad = np.pad(best, ((0, (-ch_rows) % 2), (0, (-ch_cols) % 2)))
        sum4 = (cpad[0::2, 0::2] + cpad[0::2, 1::2]
                + cpad[1::2, 0::2] + cpad[1::2, 1::2])
        sum4 = sum4[:rows, :cols] + lam * 1.0
        ys_b = np.arange(rows)[:, None] * size
        xs_b = np.arange(cols)[None, :] * size
        crosses = ((ys_b + size // 2 >= h_eff)
                   | (xs_b + size // 2 >= w_eff))
        options = [(0, np.where(crosses, np.inf, cost[size])),
                   (1, sum4)]
        if (size, "h") in rect_cost:
            rb = lam * 2.0
            options.append((2, np.where(crosses, np.inf,
                                        rect_cost[(size, "h")] + rb)))
            options.append((3, np.where(crosses, np.inf,
                                        rect_cost[(size, "v")] + rb)))
        if (size, "h4") in rect_cost:
            rb4 = lam * 3.0  # rarer symbol + 3 extra leaves of overhead
            options.append((4, np.where(crosses, np.inf,
                                        rect_cost[(size, "h4")] + rb4)))
            options.append((5, np.where(crosses, np.inf,
                                        rect_cost[(size, "v4")] + rb4)))
        if (size, "h0") in rect_cost and (size // 2) in cost:
            # T-shapes: two child squares + one rect half
            ch = cost[size // 2]
            chp = np.full((2 * rows, 2 * cols), np.inf)
            chp[:min(ch.shape[0], 2 * rows), :min(ch.shape[1], 2 * cols)] \
                = ch[:2 * rows, :2 * cols]
            tl, tr = chp[0::2, 0::2], chp[0::2, 1::2]
            bl, br = chp[1::2, 0::2], chp[1::2, 1::2]
            rbt = lam * 2.0  # T symbol + 2 extra leaves of overhead
            tarms = [(6, tl + tr + rect_cost[(size, "h1")]),
                     (7, rect_cost[(size, "h0")] + bl + br),
                     (8, tl + bl + rect_cost[(size, "v1")]),
                     (9, rect_cost[(size, "v0")] + tr + br)]
            options += [(k, np.where(crosses, np.inf, v + rbt))
                        for k, v in tarms]
        stackc = np.stack([o[1] for o in options])
        pick = np.argmin(stackc, axis=0)
        choice[size] = np.array([o[0] for o in options])[pick]
        best = np.take_along_axis(stackc, pick[None], axis=0)[0]

    return _leaves_from_choices(choice, min_size, mi_rows, mi_cols)
