"""Scene-change detection (reference: SceneTransitionDetector,
``EbPictureDecisionProcess.c:88``; histogram stats from PictureAnalysis).

Decision from two cheap whole-frame statistics on decimated luma — mean
absolute difference and histogram distance — both one-shot batched
reductions (TPU-trivial)."""

from __future__ import annotations

import numpy as np

from svt_av1_tpu.ops.me import decimate2


def luma_stats(y: np.ndarray):
    """(decimated plane, 64-bin histogram) for scene comparison."""
    d = decimate2(decimate2(y))
    hist = np.bincount((d >> 2).astype(np.int64).reshape(-1),
                       minlength=64)[:64]
    return d, hist / max(d.size, 1)


class SceneChangeDetector:
    """Returns True when a frame starts a new scene (keyframe insertion)."""

    def __init__(self, mad_threshold: float = 28.0,
                 hist_threshold: float = 0.55):
        self.mad_threshold = mad_threshold
        self.hist_threshold = hist_threshold
        self._prev = None

    def is_scene_change(self, y: np.ndarray) -> bool:
        d, hist = luma_stats(y)
        prev = self._prev
        self._prev = (d, hist)
        if prev is None:
            return False
        pd, ph = prev
        if pd.shape != d.shape:
            return True
        mad = float(np.mean(np.abs(d.astype(np.int32)
                                   - pd.astype(np.int32))))
        hist_dist = float(np.abs(hist - ph).sum())
        return mad > self.mad_threshold or hist_dist > self.hist_threshold
