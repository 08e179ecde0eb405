"""Region proposal network (single DC5 level, stride 16).

Native equivalent of the mmdet RPNHead used by the reference's detection
stack: 3x3 conv + 1x1 objectness / 1x1 box-delta heads over 12 anchors
per cell; proposal generation = top-k by score -> decode -> clip -> NMS.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import optax

from .anchors import grid_anchors
from .bbox import clip_boxes, decode_deltas, encode_deltas, iou_matrix
from .nms import nms


class RPNHead(nn.Module):
    num_anchors: int = 12
    channels: int = 512

    @nn.compact
    def __call__(self, feat):
        """feat (B, H, W, C) -> (cls (B, H, W, A), deltas (B, H, W, A*4))."""
        h = nn.relu(nn.Conv(self.channels, (3, 3), padding="SAME")(feat))
        cls = nn.Conv(self.num_anchors, (1, 1))(h)
        reg = nn.Conv(self.num_anchors * 4, (1, 1))(h)
        return cls, reg


def rpn_proposals(cls_logits, deltas, img_hw, stride=16, pre_nms_top=6000,
                  post_nms_top=300, iou_thresh=0.7, min_size=0.0):
    """Single-image proposal generation.

    cls_logits (H, W, A), deltas (H, W, A*4) -> (boxes (post, 4),
    scores (post,), valid (post,)).
    """
    H, W, A = cls_logits.shape
    anchors = jnp.asarray(grid_anchors(H, W, stride))
    scores = jax.nn.sigmoid(cls_logits.reshape(-1))
    d = deltas.reshape(-1, 4)

    k = min(pre_nms_top, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    boxes = decode_deltas(anchors[top_idx], d[top_idx])
    boxes = clip_boxes(boxes, img_hw[0], img_hw[1])

    wh_ok = (
        (boxes[:, 2] - boxes[:, 0] > min_size) & (boxes[:, 3] - boxes[:, 1] > min_size)
    )
    top_scores = jnp.where(wh_ok, top_scores, -1.0)
    keep_idx, valid = nms(boxes, top_scores, iou_thresh, post_nms_top, 0.0)
    out_boxes = jnp.where(
        valid[:, None], boxes[jnp.maximum(keep_idx, 0)], 0.0
    )
    out_scores = jnp.where(valid, top_scores[jnp.maximum(keep_idx, 0)], 0.0)
    return out_boxes, out_scores, valid


def rpn_loss(cls_logits, deltas, gt_boxes, gt_valid, img_hw, stride=16,
             pos_iou=0.7, neg_iou=0.3, num_samples=256):
    """Anchor-matching RPN loss for one image.

    gt_boxes (G, 4) with gt_valid (G,) mask (padded).  Assignment follows
    mmdet MaxIoU: anchors with IoU>pos_iou positive, <neg_iou negative,
    plus the best anchor per gt; balanced BCE over sampled anchors and
    L1 on positives.  (Sampling is soft: weights normalized by counts
    rather than random subsampling — deterministic and jit-friendly.)
    """
    H, W, A = cls_logits.shape
    anchors = jnp.asarray(grid_anchors(H, W, stride))
    n = anchors.shape[0]
    logits = cls_logits.reshape(-1)
    d = deltas.reshape(-1, 4)

    # mask invalid gt by moving them far away
    gt = jnp.where(gt_valid[:, None], gt_boxes, -1e4)
    ious = iou_matrix(anchors, gt)  # (n, G)
    ious = jnp.where(gt_valid[None, :], ious, 0.0)
    best_iou = ious.max(axis=1)
    best_gt = ious.argmax(axis=1)

    # inside-image anchors only
    inside = (
        (anchors[:, 0] >= -stride)
        & (anchors[:, 1] >= -stride)
        & (anchors[:, 2] <= img_hw[1] + stride)
        & (anchors[:, 3] <= img_hw[0] + stride)
    )

    pos = (best_iou >= pos_iou) & inside
    # best anchor for each valid gt is positive too
    best_anchor_per_gt = jnp.argmax(ious, axis=0)  # (G,)
    pos = pos.at[best_anchor_per_gt].set(
        pos[best_anchor_per_gt] | gt_valid
    )
    neg = (best_iou < neg_iou) & inside & ~pos

    n_pos = jnp.maximum(pos.sum(), 1)
    n_neg = jnp.maximum(neg.sum(), 1)
    half = num_samples / 2.0

    labels = pos.astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    w = pos * jnp.minimum(1.0, half / n_pos) + neg * jnp.minimum(1.0, half / n_neg)
    cls_loss = (bce * w).sum() / jnp.maximum((w > 0).sum(), 1)

    targets = encode_deltas(anchors, gt[best_gt])
    reg_l1 = jnp.abs(d - targets).sum(axis=-1)
    reg_loss = (reg_l1 * pos).sum() / n_pos
    return cls_loss, reg_loss
