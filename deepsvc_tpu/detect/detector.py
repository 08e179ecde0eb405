"""Scalable video object detector (machine-vision consumer of the
semantic bitstream).

Native re-design of the reference's SELSA video detector
(/root/reference/temporal_roi_align.py:45-639), which pastes a modified
detector into mmtracking: a Faster R-CNN DC5 two-stage detector whose
P-frame backbone consumes the *semantic layer bitstream* (student
backbone with coded stage-1 features) instead of pixels, with SELSA
cross-frame RoI aggregation and Temporal ROI Align over a rolling memo
of support feature maps.

The reference's undefined ``self.multi_supp`` flag
(temporal_roi_align.py:294-303) is an explicit config here
(SemanticConfig.multi_supp).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.resnet import ResNetTeacher
from ..models.semantic import StudentBackbone
from .bbox import clip_boxes, decode_deltas, encode_deltas, iou_matrix
from .nms import nms
from .roi_align import roi_align
from .rpn import RPNHead, rpn_loss, rpn_proposals
from .selsa import SelsaBBoxHead, TemporalRoIAlign

# lambda/beta schedule mapping (temporal_roi_align.py:86-96,
# test_video.py:164-174): fea distill weight -> (I-codec lambda, beta)
FEA_TO_LAMBDA = {4: 0.0067, 8: 0.013, 16: 0.025, 20: 0.0483}
FEA_TO_BETA = {4: 3, 8: 6, 16: 12, 20: 16}


class SELSADetector(nn.Module):
    """Backbones + neck + RPN + SELSA/TROI RoI head."""

    num_classes: int = 30
    sem_N: int = 72
    neck_channels: int = 512
    proposals_per_frame: int = 128
    depth: int = 50

    def setup(self):
        self.teacher = ResNetTeacher(depth=self.depth, out_indices=(0, 3))
        self.student = StudentBackbone(N=self.sem_N, depth=self.depth,
                                       out_indices=(0, 3))
        self.neck = nn.Conv(self.neck_channels, (3, 3), padding="SAME")
        self.rpn = RPNHead(channels=self.neck_channels)
        self.troi = TemporalRoIAlign(channels=self.neck_channels)
        self.bbox_head = SelsaBBoxHead(
            num_classes=self.num_classes, in_channels=self.neck_channels
        )

    # --------------------------- feature paths ---------------------------

    def extract_i(self, x_norm):
        """I-frame (teacher, uncoded): returns (stage1 feature, neck map)."""
        outs = self.teacher(x_norm)
        return outs[0], self.neck(outs[-1])

    def extract_p(self, x_norm, supp, *, rng=None, training=True):
        """P-frame through the semantic feature codec."""
        out = self.student(x_norm, supp, rng=rng, training=training)
        return {
            "sm": out["outs"][0],
            "s4": out["outs"][-1],  # raw stage-4 (distillation target space)
            "fmap": self.neck(out["outs"][-1]),
            "likelihoods": out["likelihoods"],
            "y": out["y"],
        }

    def student_post(self, x_hat, supp):
        """Real-bitstream decode tail of the student backbone."""
        outs, fea = self.student.post_decode(x_hat, supp)
        return {"sm": outs[0], "fmap": self.neck(outs[-1])}

    # --------------------------- detection head ---------------------------

    def rpn_forward(self, fmap):
        return self.rpn(fmap[None])

    def propose(self, fmap, img_hw, post_nms_top=300):
        cls, reg = self.rpn(fmap[None])
        return rpn_proposals(cls[0], reg[0], img_hw, post_nms_top=post_nms_top)

    def roi_forward(self, fmap, proposals, memo_maps, ref_proposal_feats):
        """Head over current proposals.

        fmap (H, W, C); proposals (R, 4); memo_maps (T, H, W, C);
        ref_proposal_feats (R_ref, P, P, C).
        """
        feats = roi_align(fmap, proposals)
        feats = self.troi(feats, memo_maps)
        return self.bbox_head(feats, ref_proposal_feats)

    def ref_roi_feats(self, memo_maps, img_hw):
        """Proposals + RoI features from each memo frame (SELSA refs)."""
        feats = []
        for t in range(memo_maps.shape[0]):
            boxes, scores, valid = self.propose(
                memo_maps[t], img_hw, post_nms_top=self.proposals_per_frame
            )
            f = roi_align(memo_maps[t], boxes)
            feats.append(f * valid[:, None, None, None])
        return jnp.concatenate(feats, axis=0)

    # ----------------------------- training ------------------------------

    def losses(self, fmap, memo_maps, ref_proposal_feats, gt_boxes, gt_labels,
               gt_valid, img_hw, rng):
        """RPN + RoI losses for one frame (temporal_roi_align.py:367-385
        structure; deterministic soft sampling instead of random)."""
        cls_l, reg_l = self.rpn(fmap[None])
        rpn_cls, rpn_reg = rpn_loss(cls_l[0], reg_l[0], gt_boxes, gt_valid, img_hw)

        boxes, scores, valid = self.propose(fmap, img_hw, post_nms_top=256)
        # append gt boxes to proposals (standard two-stage trick)
        boxes = jnp.concatenate([boxes, gt_boxes], axis=0)
        valid = jnp.concatenate([valid, gt_valid], axis=0)

        ious = iou_matrix(boxes, jnp.where(gt_valid[:, None], gt_boxes, -1e4))
        ious = jnp.where(gt_valid[None, :], ious, 0.0)
        best_iou = ious.max(axis=1)
        best_gt = ious.argmax(axis=1)
        pos = (best_iou >= 0.5) & valid
        neg = (best_iou < 0.5) & valid

        cls_t, reg_t = self.roi_forward(fmap, boxes, memo_maps, ref_proposal_feats)
        labels = jnp.where(pos, gt_labels[best_gt] + 1, 0)  # 0 = background
        w = pos * 1.0 + neg * jnp.minimum(1.0, 3.0 * pos.sum() / jnp.maximum(neg.sum(), 1))
        ce = optax.softmax_cross_entropy_with_integer_labels(cls_t, labels)
        roi_cls = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

        targets = encode_deltas(boxes, gt_boxes[best_gt])
        reg_per_class = reg_t.reshape(boxes.shape[0], self.num_classes + 1, 4)
        reg_sel = jnp.take_along_axis(
            reg_per_class, labels[:, None, None].repeat(4, -1), axis=1
        )[:, 0]
        roi_reg = (jnp.abs(reg_sel - targets).sum(-1) * pos).sum() / jnp.maximum(
            pos.sum(), 1
        )
        return {
            "rpn_cls": rpn_cls,
            "rpn_reg": rpn_reg,
            "roi_cls": roi_cls,
            "roi_reg": roi_reg,
        }


def decode_detections(proposals, cls_logits, deltas, img_hw, num_classes=30,
                      score_thresh=0.05, iou_thresh=0.5, max_per_img=100):
    """Per-class decode + NMS -> (boxes (M,4), scores (M,), labels (M,),
    valid (M,)).  Runs under jit with fixed shapes."""
    probs = jax.nn.softmax(cls_logits, axis=-1)[:, 1:]  # drop background
    R = proposals.shape[0]
    reg = deltas.reshape(R, num_classes + 1, 4)[:, 1:]

    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    per_class = max(max_per_img // 2, 10)
    for c in range(num_classes):
        boxes_c = clip_boxes(decode_deltas(proposals, reg[:, c]), img_hw[0], img_hw[1])
        scores_c = jnp.where(probs[:, c] > score_thresh, probs[:, c], -1.0)
        idx, valid = nms(boxes_c, scores_c, iou_thresh, per_class, 0.0)
        take = jnp.maximum(idx, 0)
        all_boxes.append(jnp.where(valid[:, None], boxes_c[take], 0.0))
        all_scores.append(jnp.where(valid, scores_c[take], -1.0))
        all_labels.append(jnp.full((per_class,), c, jnp.int32))
        all_valid.append(valid)
    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    labels = jnp.concatenate(all_labels)
    valid = jnp.concatenate(all_valid)

    k = min(max_per_img, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return (
        boxes[top_idx],
        top_scores,
        labels[top_idx],
        valid[top_idx] & (top_scores > 0),
    )
