"""Chroma-from-luma (CfL) prediction, batched (host NumPy oracle).

Normative prediction (AV1 spec 7.11.5; reference behavior: CflPrediction
``EbProductCodingLoop.c:1884``, cfl_rd_pick_alpha :1720): the chroma block
is predicted as its DC prediction plus a scaled version of the co-located
reconstructed luma's AC (mean-removed, Q3) signal. 4:2:0 subsampling only.

Encoder-side alpha selection is a closed-form least-squares fit per plane
(replacing the reference's 16-alpha RD sweep — one batched regression
instead of a search; the full loop still RD-checks CfL against the other
chroma modes).
"""

from __future__ import annotations

import numpy as np

CFL_SIGN_ZERO = 0
CFL_SIGN_NEG = 1
CFL_SIGN_POS = 2


def luma_ac_420(luma: np.ndarray):
    """[B, 2h, 2w] reconstructed luma -> Q3 AC [B, h, w] (subsample + mean
    removal, spec cfl_luma_subsampling_420 + compute the average)."""
    l32 = luma.astype(np.int32)
    sub = (l32[:, 0::2, 0::2] + l32[:, 0::2, 1::2]
           + l32[:, 1::2, 0::2] + l32[:, 1::2, 1::2]) << 1
    b, h, w = sub.shape
    n_log2 = int(np.log2(h * w))
    avg = (sub.reshape(b, -1).sum(axis=1) + (1 << (n_log2 - 1))) >> n_log2
    return sub - avg[:, None, None]


def predict(dc_pred: np.ndarray, ac: np.ndarray, alpha_q3,
            bd: int = 8) -> np.ndarray:
    """dc_pred [B, h, w] (the chroma DC prediction), ac [B, h, w] Q3,
    alpha_q3 [B] signed. (spec cfl_predict)."""
    a = np.asarray(alpha_q3, dtype=np.int64)[:, None, None]
    scaled = a * ac.astype(np.int64)
    # Round2Signed(x, 6)
    scaled = np.where(scaled >= 0, (scaled + 32) >> 6, -((-scaled + 32) >> 6))
    return np.clip(dc_pred.astype(np.int64) + scaled, 0, (1 << bd) - 1)


def fit_alpha(ac: np.ndarray, src: np.ndarray, dc_pred: np.ndarray):
    """Least-squares alpha_q3 per block in [-16, 16]: the prediction adds
    Round2Signed(alpha_q3 * AC_q3, 6), so
    argmin_a || (src - dc) - a*AC/64 ||^2 -> a = 64 * <AC, r> / <AC, AC>."""
    r = (src.astype(np.int64) - dc_pred.astype(np.int64)).reshape(
        ac.shape[0], -1)
    a2 = (ac.astype(np.int64) ** 2).reshape(ac.shape[0], -1).sum(axis=1)
    ar = (ac.reshape(ac.shape[0], -1).astype(np.int64) * r).sum(axis=1)
    # pure-integer round(64*ar/a2): round-half-away-from-zero on the
    # magnitude (device twin reproduces this exactly)
    den = np.maximum(a2, 1)
    mag = (128 * np.abs(ar) + den) // (2 * den)
    alpha = np.where(a2 > 0, np.sign(ar) * mag, 0)
    return np.clip(alpha, -16, 16)


# --- joint sign / alpha index coding helpers (spec 5.11.45) --------------------
def sign_of(alpha: int) -> int:
    if alpha == 0:
        return CFL_SIGN_ZERO
    return CFL_SIGN_POS if alpha > 0 else CFL_SIGN_NEG


def joint_sign(sign_u: int, sign_v: int) -> int:
    return sign_u * 3 + sign_v - 1   # both-zero (0) excluded -> 0..7


def signs_from_joint(js: int):
    return (js + 1) // 3, (js + 1) % 3


def ctx_u(js: int) -> int:
    return js + 1 - 3


def ctx_v(js: int) -> int:
    sign_u, sign_v = signs_from_joint(js)
    return sign_v * 3 + sign_u - 3


def alpha_from_idx(idx: int, sign: int) -> int:
    if sign == CFL_SIGN_ZERO:
        return 0
    mag = idx + 1
    return mag if sign == CFL_SIGN_POS else -mag


def write_cfl_alphas(w, fc, alpha_u: int, alpha_v: int) -> None:
    su, sv = sign_of(alpha_u), sign_of(alpha_v)
    if su == CFL_SIGN_ZERO and sv == CFL_SIGN_ZERO:
        sv = CFL_SIGN_POS  # joint-zero not codable; signal v=+ with idx 0?
        # (encoder avoids this: alpha (0,0) never selects CfL)
        raise ValueError("CfL with both alphas zero must not be signaled")
    js = joint_sign(su, sv)
    w.write_symbol(js, fc.cfl_sign, 8)
    if su != CFL_SIGN_ZERO:
        w.write_symbol(abs(alpha_u) - 1, fc.cfl_alpha[ctx_u(js)], 16)
    if sv != CFL_SIGN_ZERO:
        w.write_symbol(abs(alpha_v) - 1, fc.cfl_alpha[ctx_v(js)], 16)


def read_cfl_alphas(r, fc):
    js = r.read_symbol(fc.cfl_sign, 8)
    su, sv = signs_from_joint(js)
    alpha_u = alpha_v = 0
    if su != CFL_SIGN_ZERO:
        alpha_u = alpha_from_idx(r.read_symbol(fc.cfl_alpha[ctx_u(js)], 16),
                                 su)
    if sv != CFL_SIGN_ZERO:
        alpha_v = alpha_from_idx(r.read_symbol(fc.cfl_alpha[ctx_v(js)], 16),
                                 sv)
    return alpha_u, alpha_v
