"""Top-level encoder: GOP structure + reference management + streaming API.

The framework's equivalent of the reference's public lifecycle
(``EbApi.h:505-592``: eb_init_handle → set_parameter → init_encoder →
send_picture → get_packet) and of its PictureDecision stage's mini-GOP
assembly (``EbPictureDecisionProcess.c:816``): frames arrive in display
order; with ``hierarchical_levels`` > 0 they are re-ordered into a
hierarchical-B pyramid (anchor coded first, non-shown; middles reference
past+future anchors; display via show_existing_frame), otherwise a
low-delay KEY + P chain.
"""

from __future__ import annotations

import dataclasses
import io
from typing import Iterable, List, Optional, Tuple

import numpy as np

from svt_av1_tpu.bitstream import obu
from svt_av1_tpu.bitstream.ivf import (patch_ivf_frame_count,
                                       write_ivf_frame, write_ivf_header)
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.entropy.inter_modes import ALTREF2_FRAME as mvp_ALTREF2
from svt_av1_tpu.entropy.inter_modes import GOLDEN_FRAME as mvp_GOLDEN
from svt_av1_tpu.entropy.inter_modes import LAST2_FRAME as mvp_LAST2
from svt_av1_tpu.pipeline.inter import InterFrameEncoder
from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder


class Encoder:
    """Streaming encoder: send_picture / get_packet semantics.

    get_packet returns (tu_bytes, display_recon_or_None): a None recon
    means the TU coded a non-shown frame (its display arrives later via a
    show_existing TU).
    """

    def __init__(self, cfg: EncoderConfig):
        assert cfg.hierarchical_levels <= 5, \
            "pyramid depth capped at 5 (reference MAX_HIERARCHICAL_LEVELS)"
        self.cfg = cfg
        self.seq = obu.SequenceHeader(width=cfg.width, height=cfg.height,
                                      bit_depth=cfg.bit_depth,
                                      enable_cdef=cfg.enable_cdef,
                                      enable_restoration=cfg.enable_restoration,
                                      enable_intra_edge_filter=(
                                          cfg.enable_intra_edge_filter),
                                      film_grain_params_present=(
                                          cfg.film_grain_strength > 0
                                          or cfg.film_grain_params
                                          is not None),
                                      color_primaries=cfg.color_primaries,
                                      transfer_characteristics=(
                                          cfg.transfer_characteristics),
                                      matrix_coefficients=(
                                          cfg.matrix_coefficients),
                                      color_range=cfg.color_range,
                                      **obu.order_hint_fields(
                                          cfg.enable_tmvp))
        self._grain = None
        if self.seq.film_grain_params_present:
            from svt_av1_tpu.ops import grain as grain_ops
            self._grain = grain_ops.resolved_params(cfg)
        self._slots = [None] * 8   # padded recon per slot
        # per-slot saved entropy state (FrameContext, NmvContext) and gm
        # params — the decoder-side SavedCdfs/SavedGmParams stores that
        # primary_ref_frame CDF carry reads from (spec 6.8.2)
        self._slot_entropy = [None] * 8
        self._slot_gm = [((0, 0),) * 7] * 8
        # per-slot TMVP facts (order hint, that frame's ref hints, its
        # 8x8 motion field) — the encoder-side mirror of the decoder's
        # slot_info store
        self._slot_info = [None] * 8
        # entropy pipeline: host entropy (keyframes AND inter frames)
        # trails the compute front by up to SYNTAX_DEPTH frames on this
        # worker (the reference overlaps its EC process pool the same
        # way, EbEncHandle.c:1056). Jobs run in order on the single
        # worker, so the CDF-carry chain is identical to serial
        # execution. Under rate control the depth is SYNTAX_DEPTH_RC=1,
        # making the controller's actual-bits feedback exactly one
        # frame late and deterministic (the reference's own
        # packetization->RC latency, EbPacketizationProcess.c:177).
        self._syntax_pool = None
        self._syntax_pending: List = []  # [(future, is_key, layer)]
        self._base_slot = 0        # slot of the most recent past anchor
        self._golden_slot = 7      # slot of the last keyframe (GOLDEN)
        self._ld_last2 = None      # low-delay: slot of the frame before LAST
        self._frame_idx = 0        # display-order index of next input
        self._key_disp = 0         # display index of the last keyframe
                                   # (order hints are coded relative to
                                   # it so closed GOPs are position-
                                   # independent — parallel GOP workers
                                   # must emit serial-identical bytes)
        self._group: List[tuple] = []
        self._out: List[Tuple[bytes, Optional[list]]] = []
        self._scd = None
        if cfg.scene_change_detection:
            from svt_av1_tpu.pipeline.scd import SceneChangeDetector
            self._scd = SceneChangeDetector()
        self._la: List[tuple] = []   # lookahead queue (frame, complexity, hist)
        self._la_prev = None
        self._la_weight = 1.0
        self._rc = None
        from svt_av1_tpu.config import RateControlMode
        if cfg.rate_control_mode == RateControlMode.VBR \
                and cfg.target_bit_rate > 0:
            from svt_av1_tpu.pipeline.rc import RateControl
            self._rc = RateControl(cfg.target_bit_rate,
                                   cfg.frame_rate_num / cfg.frame_rate_den,
                                   cfg.intra_period,
                                   start_qindex=cfg.base_q_idx,
                                   hierarchical_levels=cfg.hierarchical_levels)

    # CQP qp-scaling quantizer-step ratios per temporal layer (the
    # reference's delta_rate_new, EbRateControlProcess.c:1143; key
    # frames target 0.25x the nominal step, EbRateControlProcess.c:1129)
    QPS_KEY_RATIO = 0.25
    QPS_LAYER_RATIO = (0.40, 0.7, 0.85, 1.0, 1.0, 1.0)

    # --- internals -----------------------------------------------------------
    def _cfg_for(self, is_key: bool, layer: int = 0) -> EncoderConfig:
        cfg = self.cfg
        if self._rc is not None:
            cfg = dataclasses.replace(
                cfg, qindex_override=self._rc.frame_qindex(
                    is_key, self._la_weight, layer))
        elif cfg.enable_qp_scaling and cfg.qindex_override is None:
            from svt_av1_tpu.ops.quant import qindex_for_qstep_scale
            ratio = self.QPS_KEY_RATIO if is_key else \
                self.QPS_LAYER_RATIO[min(layer,
                                         len(self.QPS_LAYER_RATIO) - 1)]
            if ratio < 1.0:
                cfg = dataclasses.replace(
                    cfg, qindex_override=qindex_for_qstep_scale(
                        cfg.base_q_idx, ratio, cfg.bit_depth))
        if cfg.qindex_override is not None and (
                cfg.min_qp_allowed > 0 or cfg.max_qp_allowed < 63):
            # reference min_qp_allowed/max_qp_allowed clamps (CLIP3 at
            # every per-frame qp assignment, EbRateControlProcess.c)
            cfg = dataclasses.replace(cfg, qindex_override=int(np.clip(
                cfg.qindex_override, max(1, cfg.min_qp_allowed * 4),
                cfg.max_qp_allowed * 4)))
        return cfg

    def _qp_file_qp(self, disp_idx):
        """qp-file override for display frame ``disp_idx`` or None
        (reference --use-q-file semantics: value replaces the frame qp,
        -1/absent keeps it; ignored under rate control)."""
        qf = self.cfg.qp_file
        if (qf is None or disp_idx is None or self._rc is not None
                or disp_idx >= len(qf) or qf[disp_idx] < 0):
            return None
        return int(qf[disp_idx])

    def _crop(self, padded):
        cfg = self.cfg
        out = [padded[0][:cfg.height, :cfg.width],
               padded[1][:(cfg.height + 1) // 2, :(cfg.width + 1) // 2],
               padded[2][:(cfg.height + 1) // 2, :(cfg.width + 1) // 2]]
        if self._grain is not None:
            # display-path grain only: reference slots stay grain-free
            # (spec 7.18.3 applies grain after the frame is output, not
            # to the reference buffers; grainSynthesis.c:1174)
            from svt_av1_tpu.ops import grain as grain_ops
            out = grain_ops.apply_grain(out, self._grain, cfg.bit_depth)
        return out

    def _aq_prev(self, y):
        """Previous source luma padded like this frame (TPL-lite AQ
        hint); updates the tracker."""
        from svt_av1_tpu.pipeline.common import pad_to_multiple
        cur = pad_to_multiple(y, 64)
        prev = getattr(self, "_prev_luma", None)
        self._prev_luma = cur
        return prev

    # how many frames of host entropy may trail the compute front. CQP
    # qindex choices don't depend on coded bits, so the only bound is
    # memory (each in-flight frame holds its coefficient downloads);
    # under RC the depth is 1 so the controller's actual-bits feedback
    # is exactly one frame late — the reference's own latency
    # (packetization -> RC feedback task, EbPacketizationProcess.c:177)
    # — and, crucially, DETERMINISTIC: frame N+1's qindex always sees
    # bits through frame N-1 no matter how fast the worker runs.
    SYNTAX_DEPTH = 4
    SYNTAX_DEPTH_RC = 1

    def _reap_one(self) -> None:
        """Join the oldest in-flight entropy job and apply its RC
        feedback (join order == submit order keeps rc.update in coding
        order)."""
        fut, is_key, layer = self._syntax_pending.pop(0)
        tu = fut.result()
        if self._rc is not None:
            self._rc.update(len(tu) * 8, is_key, layer)

    def _join_syntax(self) -> None:
        """Wait for all in-flight entropy jobs."""
        while self._syntax_pending:
            self._reap_one()

    def _encode_key(self, y, u, v, disp_idx=None) -> None:
        from svt_av1_tpu.utils.trace import span
        self._join_syntax()
        cfg = self._cfg_for(True)
        qv = self._qp_file_qp(disp_idx)
        if qv is not None:
            cfg = dataclasses.replace(cfg, qp=qv, qindex_override=None)
        enc = WavefrontIntraEncoder(cfg)
        enc.aq_prev_luma = self._aq_prev(y)
        self._key_disp = disp_idx or 0
        hint = 0
        enc.order_hint = hint
        from svt_av1_tpu.pipeline import tmvp
        async_syntax = (self.cfg.backend == "device"
                        and self._rc is None)
        with span("keyframe"):
            if async_syntax:
                recon = enc.encode_compute(y, u, v)
            else:
                tu, recon, _ = enc.encode(y, u, v)
        if self._rc is not None:
            self._rc.update(len(tu) * 8, True)
        for i in range(8):
            self._slots[i] = enc.recon
            self._slot_gm[i] = ((0, 0),) * 7
            self._slot_info[i] = tmvp.SlotInfo(order_hint=hint,
                                               is_intra=True)
        self._base_slot = 0
        self._golden_slot = 7
        self._ld_last2 = None
        if self.cfg.adaptive_quantization == 2:
            self._tpl_prev_luma = y   # the anchor the next GOP refs
        if async_syntax:
            # keyframe host entropy runs on the ordered syntax worker —
            # the GOP's inter computes stream right behind it. The slot
            # entropy stores are written inside the job; only later
            # syntax jobs read them, and the single worker serializes
            # those after this one.
            def key_syntax_job(enc=enc):
                tu, _ = enc.package_syntax()
                for i in range(8):
                    self._slot_entropy[i] = enc.final_entropy
                return tu

            if self._syntax_pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._syntax_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="entropy")
            fut = self._syntax_pool.submit(key_syntax_job)
            self._syntax_pending.append((fut, True, 0))
            self._out.append((fut, recon))
        else:
            for i in range(8):
                self._slot_entropy[i] = enc.final_entropy
            self._out.append((tu, recon))

    def _encode_inter(self, y, u, v, last_slot, alt_slot, refresh_slot,
                      show, layer: int = 0, extra_slots=None,
                      disp_idx=None) -> list:
        """Encode one inter frame; returns its padded recon.
        refresh_slot None = non-reference frame (refresh_frame_flags 0,
        the leaf-B case of the reference's hierarchical pyramid).
        layer: temporal layer (pyramid level; 0 = anchor/P) — with RC
        active the controller assigns per-layer budgets, otherwise a
        fixed qp-scaling offset applies (reference av1_compute_qdelta
        path, EbRateControlProcess.c:953).
        extra_slots: {ref_id: slot} additional named references (the
        multi-ref lists of Av1GenerateRpsInfo); slots whose content is
        identical (same object) to an already-chosen ref are dropped —
        searching a duplicate reference buys nothing."""
        cfg = self._cfg_for(False, layer)
        if layer and self._rc is None and not self.cfg.enable_qp_scaling:
            cfg = dataclasses.replace(
                cfg, qindex_override=int(np.clip(
                    cfg.base_q_idx + 12 * layer, 1, 255)))
        qv = self._qp_file_qp(disp_idx)
        if qv is not None:   # qp-file pins the frame qp exactly
            cfg = dataclasses.replace(cfg, qp=qv, qindex_override=None)
        enc = InterFrameEncoder(cfg, self.seq)
        enc.aq_prev_luma = self._aq_prev(y)
        enc.tpl_qmap = getattr(self, "_tpl_maps", {}).get(disp_idx)
        idx = [last_slot] * 7
        alt = None
        used = [self._slots[last_slot]]
        if alt_slot is not None:
            idx[6] = alt_slot
            alt = self._slots[alt_slot]
            used.append(alt)
        extra = {}
        for rid, slot in (extra_slots or {}).items():
            if slot is None:
                continue
            planes = self._slots[slot]
            if planes is None or any(planes is u_ for u_ in used):
                continue
            idx[rid - 1] = slot
            extra[rid] = planes
            used.append(planes)
        rff = 0 if refresh_slot is None else 1 << refresh_slot
        # temporal MV context: current hint, per-slot hints, projected
        # field from the slot stores (decoder rebuilds the same from its
        # own slots — spec 7.9). Slot TMVP/gm stores are refreshed on
        # the main thread right after each frame's compute
        # (field_state_from_decisions), so no in-flight syntax job is
        # ever waited on here — compute streams frame after frame with
        # host entropy trailing up to SYNTAX_DEPTH frames behind.
        from svt_av1_tpu.bitstream.obu import get_relative_dist
        from svt_av1_tpu.pipeline import tmvp
        hint = ((disp_idx or 0) - self._key_disp) & 127
        bits = self.seq.order_hint_bits
        slot_hints = tuple(si.order_hint if si is not None else 0
                           for si in self._slot_info)
        named_hints = [slot_hints[idx[r - 1]] for r in range(1, 8)]
        rel_dist = [0] * 8       # dist(cur, ref) per named ref
        sign_bias = [0] * 8
        for r in range(1, 8):
            rel_dist[r] = get_relative_dist(hint, named_hints[r - 1],
                                            bits)
            sign_bias[r] = int(get_relative_dist(named_hints[r - 1],
                                                 hint, bits) > 0)
        use_tmvp = (self.seq.enable_ref_frame_mvs
                    and not cfg.error_resilient)
        from svt_av1_tpu.utils.trace import span
        tpl = None
        if use_tmvp:
            with span("tmvp_build"):
                tpl = tmvp.build_tpl_field(self.seq.mi_rows,
                                           self.seq.mi_cols, hint, idx,
                                           self._slot_info, bits)
        with span("inter_frame"):
            enc.tmvp_ctx = dict(order_hint=hint,
                                ref_order_hints=slot_hints,
                                use=use_tmvp, tpl=tpl,
                                rel_dist=rel_dist, sign_bias=sign_bias)
            padded = enc.encode_compute(
                y, u, v, self._slots[last_slot], alt_planes=alt,
                refresh_frame_flags=rff, ref_frame_idx=idx,
                show_frame=show, extra_refs=extra)
        if refresh_slot is not None:
            # all slot stores a LATER frame's COMPUTE may read are
            # refreshed here, on the main thread, straight from the
            # decisions — syntax owns only the entropy store (read
            # exclusively by later syntax jobs, which the single ordered
            # worker serializes after this frame's job)
            self._slots[refresh_slot] = padded
            self._slot_gm[refresh_slot] = tuple(
                enc.gm_mv.get(ref, (0, 0)) for ref in range(1, 8))
            fr, fm = tmvp.save_motion_field(
                tmvp.field_state_from_decisions(enc),
                [-d for d in rel_dist])
            self._slot_info[refresh_slot] = tmvp.SlotInfo(
                order_hint=hint,
                ref_order_hints=tuple(named_hints),
                is_intra=False, field_ref=fr, field_mv=fm)
        # gm prediction base for the frame header: captured NOW — a
        # later frame may refresh this slot's gm store before the
        # worker runs this frame's job
        prev_gm_val = self._slot_gm[last_slot]

        def syntax_job(enc=enc, last=last_slot, refresh=refresh_slot,
                       prev_gm=prev_gm_val):
            tu = enc.encode_syntax(self._slot_entropy[last], prev_gm)
            if refresh is not None:
                self._slot_entropy[refresh] = enc.final_entropy
            return tu

        recon_out = self._crop(padded) if show else None
        # overlap pays on the device backend (compute blocks on the TPU
        # with the GIL released); on the host backend the two stages
        # would fight over the GIL
        if self.cfg.backend == "device":
            if self._syntax_pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._syntax_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="entropy")
            depth = self.SYNTAX_DEPTH if self._rc is None \
                else self.SYNTAX_DEPTH_RC
            fut = self._syntax_pool.submit(syntax_job)
            self._syntax_pending.append((fut, False, layer))
            while len(self._syntax_pending) > depth:
                self._reap_one()
            self._out.append((fut, recon_out))
        else:
            tu = syntax_job()
            if self._rc is not None:
                self._rc.update(len(tu) * 8, False, layer)
            self._out.append((tu, recon_out))
        return padded

    def _flush_group(self) -> None:
        """Encode the buffered mini-GOP as a hierarchical pyramid with
        interleaved display (decode order = reference RA pattern: anchor
        first, then an in-order traversal where leaf Bs are coded shown
        with refresh_frame_flags 0 and interior Bs surface later via
        show_existing_frame; PictureDecision mini-GOP analogue)."""
        group = self._group
        self._group = []
        if not group:
            return
        g = len(group)
        self._tpl_maps = {}
        if self.cfg.adaptive_quantization == 2:
            # MV-propagated TPL over the mini-GOP window (display
            # order): frames that future frames predict FROM get finer
            # quantization (InitialRateControl TPL analogue,
            # EbInitialRateControlProcess.c:954)
            from svt_av1_tpu.pipeline import analysis
            maps = analysis.tpl_group_qmaps(
                [e[1] for e in group], self.cfg.base_q_idx,
                InterFrameEncoder.DELTA_Q_RES,
                (self.cfg.height + 63) // 64,
                (self.cfg.width + 63) // 64,
                prev_luma=getattr(self, "_tpl_prev_luma", None))
            self._tpl_maps = {e[0]: m for e, m in zip(group, maps)}
            self._tpl_prev_luma = group[-1][1]
        base = self._base_slot
        anchor_slot = 1 if base != 1 else 2
        golden = self._golden_slot
        free = [s for s in range(8)
                if s not in (base, anchor_slot, golden)]
        adi, ay, au, av = group[-1]
        # multi-ref lists (Av1GenerateRpsInfo analogue): every frame also
        # sees the GOP's base anchor (GOLDEN, long-term past) and the
        # GOP-end anchor (ALTREF2, far future) beyond its nearest pair
        self._encode_inter(ay, au, av, base, None, anchor_slot,
                           show=(g == 1),
                           extra_slots={mvp_GOLDEN: golden},
                           disp_idx=adi)

        def rec(lo_idx, hi_idx, lo_slot, hi_slot, level):
            """Code + display frames lo_idx+1 .. hi_idx-1 in display
            order; slots are released once a subtree is displayed."""
            if hi_idx - lo_idx <= 1:
                return
            extra = {mvp_GOLDEN: base if lo_slot != base else golden,
                     mvp_ALTREF2: anchor_slot}
            mid = (lo_idx + hi_idx) // 2
            mdi, my, mu, mv_ = group[mid]
            if hi_idx - lo_idx == 2:
                # leaf B: nothing references it -> code it shown directly
                self._encode_inter(my, mu, mv_, lo_slot, hi_slot, None,
                                   show=True, layer=level,
                                   extra_slots=extra, disp_idx=mdi)
                return
            s = free.pop(0)
            self._encode_inter(my, mu, mv_, lo_slot, hi_slot, s,
                               show=False, layer=level,
                               extra_slots=extra, disp_idx=mdi)
            rec(lo_idx, mid, lo_slot, s, level + 1)
            self._out.append((obu.show_existing_frame_tu(s),
                              self._crop(self._slots[s])))
            rec(mid, hi_idx, s, hi_slot, level + 1)
            free.append(s)

        rec(-1, g - 1, base, anchor_slot, 1)
        if g > 1:
            self._out.append((obu.show_existing_frame_tu(anchor_slot),
                              self._crop(self._slots[anchor_slot])))
        self._base_slot = anchor_slot

    def _is_key(self, idx: int) -> bool:
        period = self.cfg.intra_period
        if idx == 0:
            return True
        if period < 0:
            return False
        if period == 0:
            return True
        return idx % (period + 1) == 0

    # --- public ---------------------------------------------------------------
    def _resolve_auto_grain(self, y) -> None:
        """film_grain_strength == -1: full noise-model estimation from
        the first frame (PictureAnalysis denoise_estimate_film_grain +
        noise_model.c analogue): AR(2) spectral fit + per-intensity
        scaling points, carried in cfg so every frame header resends
        the same parameters."""
        from svt_av1_tpu.pipeline import analysis
        params = analysis.estimate_grain_params(
            y, self.cfg.bit_depth, seed=self.cfg.film_grain_seed)
        use = params.apply_grain
        self.cfg = dataclasses.replace(
            self.cfg, film_grain_strength=0,
            film_grain_params=params if use else None)
        self.seq.film_grain_params_present = use
        self._grain = params if use else None

    def send_picture(self, y: np.ndarray, u: np.ndarray,
                     v: np.ndarray) -> None:
        """Accept one frame (display order). With lookahead, encoding of a
        frame is deferred until its complexity window fills (the
        InitialRateControl look-ahead analogue)."""
        if self.cfg.film_grain_strength == -1:
            self._resolve_auto_grain(y)
        if self.cfg.enable_source_denoise:
            from svt_av1_tpu.pipeline import analysis
            nc = analysis.classify_picture_noise(y)
            y, u, v = analysis.denoise_source(y, u, v, nc, self.cfg.qp)
        lad = self.cfg.look_ahead_distance
        if lad > 0 and self._rc is not None:
            from svt_av1_tpu.pipeline.scd import luma_stats
            # the decimated-luma histogram doubles as the histogram-
            # queue entry (GetHistogramQueueData analogue): it rides
            # the lookahead so the drain can spot in-window scene cuts
            d, hist = luma_stats(y)
            c = 1.0
            if self._la_prev is not None and self._la_prev.shape == d.shape:
                c = float(np.mean(np.abs(
                    d.astype(np.int32) - self._la_prev.astype(np.int32))))
                # BEA-style cap: a frame never costs more than its
                # open-loop intra coding estimate — a scene cut onto
                # simple content has a huge temporal diff but cheap
                # intra blocks (reference OIS feeding InitialRateControl,
                # EbMotionEstimation.c:7419 / EbInitialRateControl
                # Process.c:467). Both terms are per-pixel SAD scale.
                from svt_av1_tpu.pipeline.analysis import ois_intra_cost
                ois = ois_intra_cost(d)
                if ois.size:
                    c = min(c, float(ois.mean()) / 256.0)
            self._la_prev = d
            self._la.append((y, u, v, max(c, 1e-3), hist))
            if len(self._la) <= lad:
                return
            self._drain_lookahead()
            return
        self._encode_one(y, u, v)

    def _drain_lookahead(self, all_frames: bool = False) -> None:
        from svt_av1_tpu.pipeline import analysis
        while self._la and (all_frames or len(self._la) >
                            self.cfg.look_ahead_distance):
            y, u, v, c, *rest = self._la.pop(0)
            window = [c] + [e[3] for e in self._la]
            # histogram queue: truncate the window at the first
            # in-window scene cut — post-cut complexity must not shape
            # the pre-cut frames' bit share
            # (UpdateHistogramQueueEntry role). Entries restored from a
            # pre-histogram checkpoint lack the hists; skip truncation.
            hists = [rest[0] if rest else None] \
                + [e[4] if len(e) > 4 else None for e in self._la]
            if all(h is not None for h in hists):
                cut = analysis.histogram_cut_index(hists)
                if cut is not None:
                    window = window[:cut]
            self._la_weight = c / max(np.mean(window), 1e-3)
            if self._rc is not None:
                self._rc.set_lookahead(window)
            self._encode_one(y, u, v)
            self._la_weight = 1.0

    def _encode_one(self, y, u, v) -> None:
        cfg = self.cfg
        is_key = self._is_key(self._frame_idx)
        if self._scd is not None and self._scd.is_scene_change(y):
            is_key = True  # CRA/IDR on detected scene cut
        self._frame_idx += 1
        disp = self._frame_idx - 1
        if cfg.hierarchical_levels == 0:
            if is_key:
                self._encode_key(y, u, v, disp_idx=disp)
            else:
                # low-delay P: LAST/LAST2 rotate through slots 0 and 1,
                # GOLDEN pins the last keyframe (slot 7) — the reference's
                # LDP ref list (Av1GenerateRpsInfo low-delay branch)
                prev = self._base_slot
                refresh = 1 - prev if prev in (0, 1) else 0
                extra = {mvp_GOLDEN: self._golden_slot}
                if self._ld_last2 is not None:
                    extra[mvp_LAST2] = self._ld_last2
                self._encode_inter(y, u, v, prev, None, refresh,
                                   show=True, extra_slots=extra,
                                   disp_idx=disp)
                self._ld_last2 = prev
                self._base_slot = refresh
            return
        if is_key:
            self._flush_group()
            self._encode_key(y, u, v, disp_idx=disp)
            return
        self._group.append((self._frame_idx - 1, y, u, v))
        if len(self._group) == (1 << cfg.hierarchical_levels):
            self._flush_group()

    def flush(self) -> None:
        """Encode any buffered frames (end of stream)."""
        self._drain_lookahead(all_frames=True)
        self._flush_group()
        self._join_syntax()

    # --- state serialization (checkpoint/resume) -------------------------------
    def save_state(self) -> dict:
        """Serializable encoder state: reference slots, GOP buffer, RC
        and lookahead state (the role of the reference's implicit
        state-in-process-memory; explicit here so long encodes can
        checkpoint/resume across host restarts)."""
        import copy
        self._join_syntax()
        self._out = [(tu if isinstance(tu, bytes) else tu.result(), rec)
                     for tu, rec in self._out]
        # slots are saved with aliasing preserved (after a keyframe all 8
        # share one recon object); the multi-ref dedup keys on object
        # identity, so resume must restore the same sharing to stay
        # byte-identical
        uniq, alias, seen = [], [], {}
        for s in self._slots:
            if s is None:
                alias.append(None)
                continue
            if id(s) not in seen:
                seen[id(s)] = len(uniq)
                uniq.append([p.copy() for p in s])
            alias.append(seen[id(s)])
        # entropy slot states share the same aliasing concern
        euniq, ealias, eseen = [], [], {}
        for e in self._slot_entropy:
            if e is None:
                ealias.append(None)
                continue
            if id(e) not in eseen:
                eseen[id(e)] = len(euniq)
                euniq.append((e[0].copy(), e[1].copy()))
            ealias.append(eseen[id(e)])
        return {
            "version": 3,
            "cfg": dataclasses.asdict(self.cfg),
            "slots_uniq": uniq,
            "slots_alias": alias,
            "entropy_uniq": euniq,
            "entropy_alias": ealias,
            "slot_gm": list(self._slot_gm),
            "slot_info": [
                None if si is None else {
                    "order_hint": si.order_hint,
                    "ref_order_hints": tuple(si.ref_order_hints),
                    "is_intra": si.is_intra,
                    "field_ref": None if si.field_ref is None
                    else si.field_ref.copy(),
                    "field_mv": None if si.field_mv is None
                    else si.field_mv.copy(),
                } for si in self._slot_info],
            "base_slot": self._base_slot,
            "golden_slot": self._golden_slot,
            "ld_last2": self._ld_last2,
            "frame_idx": self._frame_idx,
            "key_disp": self._key_disp,
            "group": copy.deepcopy(self._group),
            "la": copy.deepcopy(self._la),
            "la_prev": None if self._la_prev is None
            else self._la_prev.copy(),
            "rc": None if self._rc is None else self._rc.__dict__.copy(),
            "scd": None if self._scd is None else self._scd.__dict__.copy(),
        }

    @classmethod
    def load_state(cls, state: dict) -> "Encoder":
        """Rebuild an Encoder mid-stream from save_state() output."""
        assert state.get("version") == 3  # v3: display-indexed group entries
        cfg = EncoderConfig(**state["cfg"])
        enc = cls(cfg)
        uniq = [[p.copy() for p in s] for s in state["slots_uniq"]]
        enc._slots = [None if a is None else uniq[a]
                      for a in state["slots_alias"]]
        euniq = [(e[0].copy(), e[1].copy())
                 for e in state.get("entropy_uniq", [])]
        enc._slot_entropy = [None if a is None else euniq[a]
                             for a in state.get("entropy_alias",
                                                [None] * 8)]
        enc._slot_gm = [tuple(map(tuple, g))
                        for g in state.get("slot_gm",
                                           [((0, 0),) * 7] * 8)]
        from svt_av1_tpu.pipeline import tmvp
        enc._slot_info = [
            None if d is None else tmvp.SlotInfo(**d)
            for d in state.get("slot_info", [None] * 8)]
        enc._base_slot = state["base_slot"]
        enc._golden_slot = state.get("golden_slot", 7)
        enc._ld_last2 = state.get("ld_last2")
        enc._frame_idx = state["frame_idx"]
        enc._key_disp = state.get("key_disp", 0)
        enc._group = list(state["group"])
        enc._la = list(state["la"])
        enc._la_prev = state["la_prev"]
        if state["rc"] is not None:
            enc._rc.__dict__.update(state["rc"])
        if state["scd"] is not None and enc._scd is not None:
            enc._scd.__dict__.update(state["scd"])
        return enc

    def get_packet(self) -> Optional[Tuple[bytes, Optional[list]]]:
        if not self._out:
            return None
        tu, recon = self._out.pop(0)
        if not isinstance(tu, bytes):   # pending entropy job
            tu = tu.result()
        return tu, recon


def encode_ivf(frames: Iterable[tuple], cfg: EncoderConfig) -> bytes:
    """Encode an iterable of (y, u, v) frames to an IVF byte stream."""
    enc = Encoder(cfg)
    buf = io.BytesIO()
    frames = list(frames)
    write_ivf_header(buf, cfg.width, cfg.height, cfg.frame_rate_num,
                     cfg.frame_rate_den, len(frames))
    n = 0
    for f in frames:
        enc.send_picture(*f)
        while True:
            pkt = enc.get_packet()
            if pkt is None:
                break
            write_ivf_frame(buf, pkt[0], n)
            n += 1
    enc.flush()
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        write_ivf_frame(buf, pkt[0], n)
        n += 1
    patch_ivf_frame_count(buf, n)
    return buf.getvalue()