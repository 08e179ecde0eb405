from .anchors import base_anchors, grid_anchors
from .bbox import clip_boxes, decode_deltas, encode_deltas, iou_matrix
from .detector import FEA_TO_BETA, FEA_TO_LAMBDA, SELSADetector, decode_detections
from .nms import nms
from .roi_align import roi_align
from .rpn import RPNHead, rpn_loss, rpn_proposals
from .selsa import SelsaAggregator, SelsaBBoxHead, TemporalRoIAlign

__all__ = [
    "base_anchors",
    "grid_anchors",
    "clip_boxes",
    "decode_deltas",
    "encode_deltas",
    "iou_matrix",
    "SELSADetector",
    "decode_detections",
    "FEA_TO_BETA",
    "FEA_TO_LAMBDA",
    "nms",
    "roi_align",
    "RPNHead",
    "rpn_loss",
    "rpn_proposals",
    "SelsaAggregator",
    "SelsaBBoxHead",
    "TemporalRoIAlign",
]
