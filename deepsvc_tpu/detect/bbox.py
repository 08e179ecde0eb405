"""Box utilities: IoU, delta encode/decode, clipping (pure JAX).

Native replacements for the mmdet box ops the reference leans on through
mmtracking (SURVEY.md §2.5 "mmcv-full CUDA ops").  Boxes are (x1, y1,
x2, y2) in pixels.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes):
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def iou_matrix(a, b):
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def encode_deltas(anchors, gt, means=(0.0, 0.0, 0.0, 0.0), stds=(1.0, 1.0, 1.0, 1.0)):
    """Boxes -> regression targets (dx, dy, dw, dh)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-6)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-6)
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    d = jnp.stack(
        [
            (gx - ax) / jnp.maximum(aw, 1e-6),
            (gy - ay) / jnp.maximum(ah, 1e-6),
            jnp.log(gw / jnp.maximum(aw, 1e-6)),
            jnp.log(gh / jnp.maximum(ah, 1e-6)),
        ],
        axis=-1,
    )
    return (d - jnp.asarray(means)) / jnp.asarray(stds)


def decode_deltas(anchors, deltas, means=(0.0, 0.0, 0.0, 0.0),
                  stds=(1.0, 1.0, 1.0, 1.0), max_wh_ratio=16.0):
    """Regression deltas -> boxes (clamped log-scale like mmdet)."""
    deltas = deltas * jnp.asarray(stds) + jnp.asarray(means)
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    dx, dy, dw, dh = (deltas[..., i] for i in range(4))
    max_log = jnp.log(max_wh_ratio)
    dw = jnp.clip(dw, -max_log, max_log)
    dh = jnp.clip(dh, -max_log, max_log)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def clip_boxes(boxes, img_h, img_w):
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, img_w),
            jnp.clip(boxes[..., 1], 0, img_h),
            jnp.clip(boxes[..., 2], 0, img_w),
            jnp.clip(boxes[..., 3], 0, img_h),
        ],
        axis=-1,
    )
