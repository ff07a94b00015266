"""Evaluation: prediction parsing, NMS, VOC AP, test-time IoU optimization."""
from .ap_helper import parse_predictions, parse_groundtruths, APCalculator
from .eval_det import eval_det, eval_det_multiprocessing, voc_ap, get_iou_obb
from .iou_opt import iou_optimize

__all__ = [
    "parse_predictions",
    "parse_groundtruths",
    "APCalculator",
    "eval_det",
    "eval_det_multiprocessing",
    "voc_ap",
    "get_iou_obb",
    "iou_optimize",
]
