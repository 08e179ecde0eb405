"""Anchor generation for the single-level DC5 RPN (stride 16).

Matches the SELSA Faster R-CNN DC5 configuration: scales (4, 8, 16, 32),
ratios (0.5, 1.0, 2.0), base size = stride.
"""

from __future__ import annotations

import numpy as np


def base_anchors(stride=16, scales=(4, 8, 16, 32), ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """(A, 4) anchors centered on (stride/2, stride/2)."""
    out = []
    cx = cy = 0.0
    for r in ratios:
        for s in scales:
            size = s * stride
            w = size * np.sqrt(1.0 / r)
            h = size * np.sqrt(r)
            out.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    return np.asarray(out, dtype=np.float32)


def grid_anchors(feat_h: int, feat_w: int, stride: int = 16,
                 scales=(4, 8, 16, 32), ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """(H*W*A, 4) anchors over the feature grid."""
    base = base_anchors(stride, scales, ratios)  # (A, 4)
    xs = (np.arange(feat_w, dtype=np.float32)) * stride
    ys = (np.arange(feat_h, dtype=np.float32)) * stride
    shift_x, shift_y = np.meshgrid(xs, ys)
    shifts = np.stack(
        [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()], axis=1
    )  # (HW, 4)
    all_anchors = shifts[:, None, :] + base[None, :, :]
    return all_anchors.reshape(-1, 4).astype(np.float32)
