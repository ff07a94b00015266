"""Axis-aligned IoU + scene precision/recall metrics.

Mirrors `utils/metric_util.py` of the reference: ``calc_iou`` on
(center, extent) boxes and greedy per-scene precision/recall used as the
default ``get_iou_func`` fallback in detection eval.
"""
import numpy as np


def calc_iou(box_a, box_b):
    """Axis-aligned 3D IoU of two boxes given as corner arrays (8, 3) or
    min/max form; computed on the AABB of the inputs (metric_util.calc_iou)."""
    box_a, box_b = np.asarray(box_a), np.asarray(box_b)
    a_min, a_max = box_a.reshape(-1, 3).min(0), box_a.reshape(-1, 3).max(0)
    b_min, b_max = box_b.reshape(-1, 3).min(0), box_b.reshape(-1, 3).max(0)
    inter = np.maximum(np.minimum(a_max, b_max) - np.maximum(a_min, b_min), 0)
    vi = inter.prod()
    va = (a_max - a_min).prod()
    vb = (b_max - b_min).prod()
    denom = va + vb - vi
    return float(vi / denom) if denom > 0 else 0.0


def eval_det_scene(pred, gt, iou_thresh=0.25, get_iou_func=calc_iou):
    """Greedy matching of one scene's detections to GT; returns
    (tp, fp, fn). pred: list of boxes (already score-sorted), gt: list."""
    matched = np.zeros(len(gt), bool)
    tp = fp = 0
    for p in pred:
        best, best_iou = -1, iou_thresh
        for j, g in enumerate(gt):
            if matched[j]:
                continue
            iou = get_iou_func(p, g)
            if iou >= best_iou:
                best, best_iou = j, iou
        if best >= 0:
            matched[best] = True
            tp += 1
        else:
            fp += 1
    fn = int((~matched).sum())
    return tp, fp, fn


def precision_recall(preds, gts, iou_thresh=0.25, get_iou_func=calc_iou):
    """Dataset-level precision/recall over per-scene lists."""
    tp = fp = fn = 0
    for p, g in zip(preds, gts):
        t, f, n = eval_det_scene(p, g, iou_thresh, get_iou_func)
        tp, fp, fn = tp + t, fp + f, fn + n
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return prec, rec
