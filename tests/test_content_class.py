"""SourceBasedOperations content classifiers: grass/skin/contrast/dark
maps and their AQ shaping (reference EbSourceBasedOperationsProcess.c:
GrassLcu :473, SpatialHighContrastClassifier :798,
DeriveHighDarkAreaDensityFlag :715, SetDefaultDeltaQpRange :633)."""

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import analysis
from svt_av1_tpu.pipeline.decode import decode_temporal_unit
from svt_av1_tpu.pipeline.wavefront import WavefrontIntraEncoder


def _planes(w, h, fill=(128, 128, 128)):
    y = np.full((h, w), fill[0], np.uint8)
    u = np.full((h // 2, w // 2), fill[1], np.uint8)
    v = np.full((h // 2, w // 2), fill[2], np.uint8)
    return y, u, v


def test_grass_and_skin_maps():
    w, h = 256, 128   # 4x2 SBs -> 16x8 16px units
    y, u, v = _planes(w, h)
    rng = np.random.RandomState(0)
    # grass patch: left half — mid luma, cb low-mid, cr mid
    y[:, :128] = np.clip(100 + rng.normal(0, 8, (h, 128)), 0, 255)
    u[:, :64] = 95
    v[:, :64] = 120
    # skin patch: right quarter
    y[:, 192:] = 105
    u[:, 96:] = 110
    v[:, 96:] = 145
    c = analysis.content_classes(y, u, v, sb_rows=2, sb_cols=4)
    assert c.grass16[:, :8].all(), "grass half not fully flagged"
    assert not c.grass16[:, 8:].any(), "non-grass flagged as grass"
    assert c.skin16[:, 12:].all(), "skin quarter not flagged"
    assert not c.skin16[:, :12].any()
    assert c.grass_pct == 50
    assert not c.dark


def test_dark_area_flag():
    w, h = 256, 128
    y, u, v = _planes(w, h, (20, 128, 128))   # mostly black frame
    y[:32] = 220                              # plus a bright band
    c = analysis.content_classes(y, u, v, sb_rows=2, sb_cols=4)
    assert c.dark
    assert c.dark_low_light


def test_contrast_isolation_gate():
    """A frame-wide 'contrast' texture must NOT be flagged (isolated
    shapes only); a single qualifying SB must be."""
    w, h = 512, 256   # 8x4 SBs
    rng = np.random.RandomState(1)
    y = np.clip(100 + rng.normal(0, 12, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 140, np.uint8)
    v = np.full((h // 2, w // 2), 115, np.uint8)
    c_all = analysis.content_classes(y, u, v, sb_rows=4, sb_cols=8)
    assert not c_all.contrast_sb.any(), "frame-wide texture not gated"
    y2, u2, v2 = _planes(w, h, (200, 128, 128))  # bright flat frame
    y2[:64, :64] = y[:64, :64]                   # one textured SB
    u2[:32, :32] = 140
    v2[:32, :32] = 115
    c_one = analysis.content_classes(y2, u2, v2, sb_rows=4, sb_cols=8)
    assert c_one.contrast_sb[0, 0]
    assert c_one.contrast_sb.sum() == 1


def test_classes_shape_qmap():
    """Busy grass SBs must not degrade under variance AQ."""
    w, h = 256, 128
    rng = np.random.RandomState(2)
    # left half: heavy-texture grass; right half: flat bright
    y = np.full((h, w), 200, np.uint8)
    y[:, :128] = np.clip(100 + rng.normal(0, 45, (h, 128)), 0, 255)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    u[:, :64] = 95
    v[:, :64] = 120
    c = analysis.content_classes(y, u, v, sb_rows=2, sb_cols=4)
    assert c.grass16[:, :8].all()
    qm_plain = analysis.variance_qmap(y, 2, 4, 120, 2)
    qm_cls = analysis.variance_qmap(y, 2, 4, 120, 2, classes=c)
    assert (qm_plain[:, :2] > 120).any(), \
        "busy half should degrade without classes"
    assert (qm_cls[:, :2] <= 120).all(), "grass SBs must not degrade"
    assert (qm_cls[:, 2:] == qm_plain[:, 2:]).all(), \
        "non-grass SBs unchanged"


def test_content_aq_stream_conformant():
    """Classifier-shaped AQ still decodes identically."""
    w, h = 192, 128
    rng = np.random.RandomState(3)
    y = np.full((h, w), 210, np.uint8)
    y[:, :64] = np.clip(100 + rng.normal(0, 35, (h, 64)), 0, 255)
    u = np.full((h // 2, w // 2), 95, np.uint8)
    v = np.full((h // 2, w // 2), 120, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=45, adaptive_quantization=1)
    enc = WavefrontIntraEncoder(cfg)
    tu, recon, _ = enc.encode(y, u, v)
    assert enc.qmap is not None
    _, dec = decode_temporal_unit(tu)
    for p in range(3):
        assert (dec[p] == recon[p]).all(), f"plane {p} mismatch"
