"""Video object detection over the semantic bitstream
(reference: temporal_roi_align.py:403-635 ``extract_feats``/``simple_test``).

GOP-12 protocol on a sequence:
  - frame 0 / every 12th: I-frame through the learned image codec; the
    teacher extracts support features from the reconstruction; the
    support FIFO and the neck-map memo are (re)seeded.
  - other frames: the student consumes the REAL semantic bitstream
    (feature codec compress->decompress), support FIFO rolls, and the
    memo FIFO of neck maps feeds Temporal ROI Align.
  - detection: RPN proposals on the current map; SELSA refs are RoI
    features from memo frames; per-class NMS decodes detections.

Returns per-frame detections plus {ibpp, pfeabpp, ipsnr} like the
reference (temporal_roi_align.py:626-635).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.image import Normalizer, crop_to_size, pad_to_multiple, psnr
from ..models.codec_runtime import CodecRuntime
from .rd_eval import GOPEvaluator  # noqa: F401  (shared protocol helpers)


@dataclass
class DetectionResult:
    frame_index: int
    boxes: np.ndarray      # (M, 4)
    scores: np.ndarray     # (M,)
    labels: np.ndarray     # (M,)
    is_iframe: bool
    bpp: float


class VideoDetectionEvaluator:
    """Runs the detector over a sequence consuming real bitstreams."""

    def __init__(
        self,
        detector,              # SELSADetector module
        variables,
        i_runtime: CodecRuntime,
        sm_codec_runtime: CodecRuntime,   # SemanticFeatureCodec runtime
        gop: int = 12,
        memo_len: int = 3,
        multi_supp: bool = True,  # SemanticConfig.multi_supp
    ):
        self.detector = detector
        self.variables = variables
        self.i_rt = i_runtime
        self.sm_rt = sm_codec_runtime
        self.gop = gop
        self.memo_len = memo_len
        self.multi_supp = multi_supp
        self.norm = Normalizer()

        mt = type(detector)
        self._extract_i = jax.jit(
            lambda v, x: detector.apply(v, x, method=mt.extract_i)
        )
        self._student_post = jax.jit(
            lambda v, x_hat, supp: detector.apply(v, x_hat, supp,
                                                  method=mt.student_post)
        )
        self._propose = jax.jit(
            lambda v, fmap, hw: detector.apply(v, fmap, hw, method=mt.propose),
            static_argnums=(2,),
        )
        self._ref_feats = jax.jit(
            lambda v, memo, hw: detector.apply(v, memo, hw, method=mt.ref_roi_feats),
            static_argnums=(2,),
        )
        self._roi = jax.jit(
            lambda v, fmap, props, memo, refs: detector.apply(
                v, fmap, props, memo, refs, method=mt.roi_forward
            )
        )

    def evaluate_sequence(self, frames_iter, org_size, max_frames=96):
        from ..detect.detector import decode_detections

        results = []
        supp = None
        memo = None
        ipsnr_acc, ibpp_acc, pbpp_acc = [], [], []
        org_h, org_w = org_size

        for i, frame in enumerate(frames_iter):
            if i >= max_frames:
                break
            x_org = jnp.asarray(frame)[None]
            x = pad_to_multiple(x_org, 64)
            num_pixels = org_h * org_w
            img_hw = (x.shape[1], x.shape[2])

            if i % self.gop == 0:
                bs = self.i_rt.compress(x)
                rec = jnp.clip(self.i_rt.decompress(bs)["x_hat"], 0.0, 1.0)
                bpp = bs.num_bytes * 8.0 / num_pixels
                ibpp_acc.append(bpp)
                ipsnr_acc.append(
                    float(psnr(x_org, crop_to_size(rec, (org_h, org_w))))
                )
                x_n = self.norm(rec * 255.0)
                sm0, fmap = self._extract_i(self.variables, x_n)
                supp = jnp.stack([sm0, sm0])
                memo = jnp.repeat(fmap, self.memo_len, axis=0)
                is_i = True
            else:
                from ..core.factory import select_support

                x_n = self.norm(x * 255.0)
                sm_bs = self.sm_rt.compress(x_n, cond=supp[-1])
                dec = self.sm_rt.decompress(sm_bs, cond=supp[-1])
                out = self._student_post(
                    self.variables, dec["x_hat"],
                    select_support(supp, self.multi_supp),
                )
                supp = jnp.concatenate([supp[1:], out["sm"][None]], axis=0)
                fmap = out["fmap"]
                memo = jnp.concatenate([memo[1:], fmap], axis=0)
                bpp = sm_bs.num_bytes * 8.0 / num_pixels
                pbpp_acc.append(bpp)
                is_i = False

            props, scores, valid = self._propose(self.variables, fmap[0], img_hw)
            refs = self._ref_feats(self.variables, memo, img_hw)
            cls_logits, deltas = self._roi(self.variables, fmap[0], props, memo, refs)
            boxes, det_scores, labels, det_valid = decode_detections(
                props, cls_logits, deltas, img_hw,
                num_classes=self.detector.num_classes,
            )
            m = np.asarray(det_valid)
            results.append(
                DetectionResult(
                    frame_index=i,
                    boxes=np.asarray(boxes)[m],
                    scores=np.asarray(det_scores)[m],
                    labels=np.asarray(labels)[m],
                    is_iframe=is_i,
                    bpp=float(bpp),
                )
            )

        stats = {
            "ibpp": float(np.mean(ibpp_acc)) if ibpp_acc else 0.0,
            "pfeabpp": float(np.mean(pbpp_acc)) if pbpp_acc else 0.0,
            "ipsnr": float(np.mean(ipsnr_acc)) if ipsnr_acc else 0.0,
        }
        return results, stats


# ---------------------------------------------------------------------------
# VID mAP (the reference's accuracy metric, computed externally by
# mmtracking tools/test.py + VOC-style AP; temporal_roi_align.py:626-635
# only returns the raw detections)
# ---------------------------------------------------------------------------


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(M,4) x (N,4) xyxy -> (M,N) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return (inter / np.maximum(union, 1e-9)).astype(np.float32)


def average_precision(recall: np.ndarray, precision: np.ndarray) -> float:
    """Area-mode AP (the mmdet eval_map default): integral of the
    precision envelope over recall."""
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def vid_map(
    detections: list,
    annotations: list[dict],
    num_classes: int = 30,
    iou_thr: float = 0.5,
) -> dict:
    """mAP@iou_thr over a sequence (or dataset).

    detections: list of DetectionResult (or any obj with .boxes/.scores/
    .labels) aligned 1:1 with ``annotations`` (dicts with "boxes" (G,4)
    and "labels" (G,)).  Returns {"mAP": float, "ap_per_class": {cls: ap}}
    following the standard VOC/mmdet greedy matching: detections sorted
    by score, each greedily matched to the best unmatched GT of its
    class with IoU >= thr.
    """
    assert len(detections) == len(annotations)
    aps = {}
    for cls in range(num_classes):
        scores, matched = [], []
        n_gt = 0
        for det, ann in zip(detections, annotations):
            gt_mask = np.asarray(ann["labels"]) == cls
            gt_boxes = np.asarray(ann["boxes"], np.float32).reshape(-1, 4)[gt_mask]
            n_gt += len(gt_boxes)
            d_mask = np.asarray(det.labels) == cls
            d_boxes = np.asarray(det.boxes, np.float32).reshape(-1, 4)[d_mask]
            d_scores = np.asarray(det.scores, np.float32)[d_mask]
            order = np.argsort(-d_scores)
            iou = _iou_matrix(d_boxes[order], gt_boxes)
            taken = np.zeros(len(gt_boxes), bool)
            for i in range(len(order)):
                scores.append(d_scores[order][i])
                j = int(np.argmax(iou[i])) if len(gt_boxes) else -1
                if j >= 0 and iou[i, j] >= iou_thr and not taken[j]:
                    taken[j] = True
                    matched.append(True)
                else:
                    matched.append(False)
        if n_gt == 0:
            continue  # class absent from GT: skip (VOC convention)
        if not scores:
            aps[cls] = 0.0
            continue
        order = np.argsort(-np.asarray(scores))
        tp = np.asarray(matched)[order]
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(~tp)
        recall = tp_cum / n_gt
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1)
        aps[cls] = average_precision(recall, precision)
    mAP = float(np.mean(list(aps.values()))) if aps else 0.0
    return {"mAP": mAP, "ap_per_class": aps}
