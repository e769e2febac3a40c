"""Rate control: frame-level VBR with a virtual buffer model.

The reference's RC stage (EbRateControlProcess.c: HighLevelRcInputPictureMode2
:349, virtual buffer + per-temporal-layer budgets; ATEME GOP model
RateControlModel.c) redesigned as frame-granular feedback (SURVEY.md §7.4.5:
avoid fine-grained device ping-pong): each frame gets a qindex from the
buffer state before encode; actual bits feed back after.
"""

from __future__ import annotations

import numpy as np


class RateControl:
    """Virtual-buffer VBR controller.

    qindex control law: proportional on log2(bits ratio) with a buffer
    pressure term — about 24 qindex steps halve the bitrate (the qindex
    scale is ~exponential in step size).
    """

    KEY_BOOST = 3.0  # keyframes get ~3x a P-frame budget

    def __init__(self, target_bps: float, fps: float,
                 intra_period: int = -1, start_qindex: int = 120):
        self.fps = fps
        self.frame_budget = target_bps / fps
        self.q = float(start_qindex)
        self.buffer = 0.0          # bits over (+) / under (-) target
        self.buffer_cap = target_bps  # one second window
        self._n = 0

    def budget_for(self, is_key: bool) -> float:
        # amortize the key boost over the stream: scale so long-run average
        # stays on target (keys are rare; approximation is fine)
        return self.frame_budget * (self.KEY_BOOST if is_key else 0.95)

    def frame_qindex(self, is_key: bool, complexity: float = 1.0) -> int:
        """complexity: lookahead weight (1.0 = average frame; > 1 means
        the lookahead saw this frame is harder — spend proportionally
        more bits by lowering q)."""
        q = self.q
        # buffer pressure: full positive buffer pushes q up ~40 steps
        q += 40.0 * np.clip(self.buffer / max(self.buffer_cap, 1), -1, 1)
        if is_key:
            q -= 18.0              # hierarchical qp offset for keys
        if complexity != 1.0:
            q -= 14.0 * np.log2(np.clip(complexity, 0.5, 2.0))
        return int(np.clip(round(q), 1, 255))

    def update(self, actual_bits: float, is_key: bool) -> None:
        target = self.budget_for(is_key)
        self.buffer += actual_bits - self.frame_budget
        self.buffer = float(np.clip(self.buffer, -self.buffer_cap,
                                    self.buffer_cap))
        ratio = max(actual_bits, 1.0) / max(target, 1.0)
        # proportional step, stronger while converging
        gain = 14.0 if self._n < 4 else 7.0
        self.q = float(np.clip(self.q + gain * np.log2(ratio), 1, 255))
        self._n += 1
