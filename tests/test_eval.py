"""Eval-pipeline tests: corners, box3d_iou oracle parity, AP math,
parse_predictions on constructed outputs."""
import numpy as np
import jax.numpy as jnp
import pytest

from iou3dmatch_tpu.data.config import ScannetConfig
from iou3dmatch_tpu.eval import (
    parse_predictions, parse_groundtruths, APCalculator, voc_ap,
)
from iou3dmatch_tpu.eval.box3d_iou_np import box3d_iou
from iou3dmatch_tpu.geometry.boxes import get_3d_box_np, flip_axis_to_camera


def test_box3d_iou_known_values():
    c1 = get_3d_box_np(np.array([2.0, 2.0, 2.0]), 0.0, np.array([0.0, 0.0, 0.0]))
    c2 = get_3d_box_np(np.array([2.0, 2.0, 2.0]), 0.0, np.array([1.0, 0.0, 0.0]))
    iou, iou2d = box3d_iou(c1, c2)
    # unit shift of a 2-cube: inter=1*2*2=4, union=8+8-4=12
    assert abs(iou - 4.0 / 12.0) < 1e-6
    iou_same, _ = box3d_iou(c1, c1)
    assert abs(iou_same - 1.0) < 1e-6
    # rotated by 90deg, square cross-section -> same footprint
    c3 = get_3d_box_np(np.array([2.0, 2.0, 2.0]), np.pi / 2, np.array([0.0, 0.0, 0.0]))
    iou_rot, _ = box3d_iou(c1, c3)
    assert abs(iou_rot - 1.0) < 1e-4


def test_voc_ap_simple():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(voc_ap(rec, prec) - 1.0) < 1e-9
    rec = np.array([0.5])
    prec = np.array([0.5])
    assert abs(voc_ap(rec, prec) - 0.25) < 1e-9


def _fake_ep(cfg, centers, cls, good=True):
    """Construct end_points where proposal i predicts box i exactly."""
    b, k = 1, centers.shape[0]
    obj = np.full((b, k, 2), [-5.0, 5.0], np.float32)
    sem = np.full((b, k, cfg.num_class), -5.0, np.float32)
    for i in range(k):
        sem[0, i, cls[i]] = 5.0
    size_scores = np.full((b, k, cfg.num_size_cluster), -5.0, np.float32)
    for i in range(k):
        size_scores[0, i, cls[i]] = 5.0
    return {
        "center": jnp.asarray(centers[None]),
        "objectness_scores": jnp.asarray(obj),
        "sem_cls_scores": jnp.asarray(sem),
        "heading_scores": jnp.zeros((b, k, cfg.num_heading_bin)),
        "heading_residuals": jnp.zeros((b, k, cfg.num_heading_bin)),
        "size_scores": jnp.asarray(size_scores),
        "size_residuals": jnp.zeros((b, k, cfg.num_size_cluster, 3)),
        "iou_scores": jnp.full((b, k, cfg.num_class), 5.0),
    }


def _config_dict(cfg, use_iou=False):
    return {
        "dataset_config": cfg, "remove_empty_box": False, "use_3d_nms": True,
        "nms_iou": 0.25, "use_old_type_nms": False, "cls_nms": True,
        "use_iou_for_nms": use_iou, "per_class_proposal": True,
        "conf_thresh": 0.05,
    }


def test_parse_predictions_and_ap():
    cfg = ScannetConfig()
    rng = np.random.RandomState(0)
    centers = rng.uniform(-3, 3, (4, 3)).astype(np.float32)
    cls = np.array([0, 1, 2, 3])
    ep = _fake_ep(cfg, centers, cls)
    cd = _config_dict(cfg)
    preds = parse_predictions(ep, cd)
    assert len(preds) == 1 and len(preds[0]) > 0

    # GT identical to predictions -> mAP == 1 for present classes
    batch = {
        "center_label": jnp.asarray(centers[None]),
        "heading_class_label": jnp.zeros((1, 4), jnp.int32),
        "heading_residual_label": jnp.zeros((1, 4)),
        "size_class_label": jnp.asarray(cls[None]),
        "size_residual_label": jnp.zeros((1, 4, 3)),
        "sem_cls_label": jnp.asarray(cls[None]),
        "box_label_mask": jnp.ones((1, 4)),
    }
    gts = parse_groundtruths(batch, cd)
    calc = APCalculator(0.5, cfg.class2type, processes=2)
    calc.step(preds, gts)
    metrics = calc.compute_metrics()
    # classes present in GT must score AP == 1; classes with predictions but
    # zero GT instances give npos=0 -> NaN AP (reference behavior: the full
    # val set always contains every class)
    for c in [0, 1, 2, 3]:
        name = cfg.class2type[c]
        assert abs(metrics[f"{name} Average Precision"] - 1.0) < 1e-6
        assert abs(metrics[f"{name} Recall"] - 1.0) < 1e-6


def test_duplicate_proposals_suppressed_by_nms():
    cfg = ScannetConfig()
    centers = np.zeros((4, 3), np.float32)  # 4 identical boxes, same class
    cls = np.array([2, 2, 2, 2])
    ep = _fake_ep(cfg, centers, cls)
    cd = _config_dict(cfg)
    preds = parse_predictions(ep, cd)
    # NMS keeps exactly one; per-class proposal emits one tuple per class
    kept = set()
    for c, corners, score in preds[0]:
        kept.add(tuple(np.asarray(corners).ravel().round(4)))
    assert len(kept) == 1


def test_get_iou_dispatchers():
    """eval_det.get_iou (6-dim axis-aligned default) + get_iou_main."""
    from iou3dmatch_tpu.eval.eval_det import get_iou, get_iou_main

    bb = np.array([0, 0, 0, 2.0, 2.0, 2.0])
    assert get_iou(bb, bb) == 1.0
    shifted = bb.copy()
    shifted[0] = 1.0
    np.testing.assert_allclose(get_iou(bb, shifted), 1 / 3)
    assert get_iou_main(get_iou, (bb, bb)) == 1.0


def test_groundtruths2corners3d_align_and_roi():
    """groundtruths2corners3d params/corners; align_predictions_groundtruths
    matches identical boxes with fitness 1; get_roi_ptcloud crops + samples
    (ap_helper.py:238-275,294-338,341-379)."""
    from iou3dmatch_tpu.eval.ap_helper import (
        align_predictions_groundtruths, get_roi_ptcloud,
        groundtruths2corners3d, predictions2corners3d)

    cfg = ScannetConfig()
    rng = np.random.RandomState(3)
    centers = rng.uniform(-3, 3, (4, 3)).astype(np.float32)
    cls = np.array([0, 1, 2, 3])
    batch = {
        "center_label": jnp.asarray(centers[None]),
        "heading_class_label": jnp.zeros((1, 4), jnp.int32),
        "heading_residual_label": jnp.zeros((1, 4)),
        "size_class_label": jnp.asarray(cls[None]),
        "size_residual_label": jnp.zeros((1, 4, 3)),
        "sem_cls_label": jnp.asarray(cls[None]),
        "box_label_mask": jnp.asarray(np.array([[1, 1, 1, 0]], np.float32)),
    }
    gt_corners, gt_params = groundtruths2corners3d(batch, _config_dict(cfg))
    assert gt_corners.shape == (1, 4, 8, 3) and gt_params.shape == (1, 4, 7)
    np.testing.assert_allclose(gt_params[0, :3, 0:3], centers[:3], atol=1e-6)
    np.testing.assert_allclose(
        gt_params[0, :3, 3:6], cfg.mean_size_arr[cls[:3]], atol=1e-6)
    # masked slot -> zero corners/size
    assert np.all(gt_corners[0, 3] == 0) and np.all(gt_params[0, 3, 3:] == 0)

    # predictions == GT -> perfect alignment for every proposal
    ep = _fake_ep(cfg, centers, cls)
    pred_corners, pred_params = predictions2corners3d(ep, _config_dict(cfg))
    aligned, conf, sem = align_predictions_groundtruths(
        pred_corners, gt_corners, batch, iou_threshold=0.5)
    np.testing.assert_allclose(conf[0, :3, 0], 1.0)
    np.testing.assert_array_equal(sem[0, :3, 0], cls[:3])
    np.testing.assert_allclose(aligned[0, :3], gt_corners[0, :3], atol=1e-5)

    # ROI crop: points packed inside box 0 are kept, far points exclude box
    box = pred_params[:, :1, :]  # (1, 1, 7)
    inside = centers[0] + rng.uniform(-0.05, 0.05, (400, 3))
    cloud = np.concatenate([inside, np.full((100, 3), 50.0)]).astype(np.float32)
    roi, mask = get_roi_ptcloud(
        {"point_clouds": cloud[None]}, box, num_point_roi=64,
        min_num_point=100, rng=np.random.RandomState(0))
    assert roi.shape == (1, 1, 64, 3) and mask[0, 0] == 1
    assert np.abs(roi[0, 0] - centers[0]).max() < 0.2
    far_box = box.copy()
    far_box[..., 0:3] += 200.0
    _, mask2 = get_roi_ptcloud({"point_clouds": cloud[None]}, far_box)
    assert mask2[0, 0] == 0
