"""Prediction/GT parsing and AP accumulation.

Mirrors `models/ap_helper.py:51-435`. The box decode + corner generation is
vectorized NumPy (the reference loops per box in Python); the NMS pick logic
and per-class proposal emission match the reference exactly, including the
IoU-guided NMS score (obj_prob * sigmoid(iou)) behind ``use_iou_for_nms``.
"""
import numpy as np

from ..geometry.boxes import flip_axis_to_camera, get_3d_box_batch_np
from ..geometry.nms import nms_2d_faster, nms_3d_faster, nms_3d_faster_samecls
from .eval_det import eval_det_multiprocessing, get_iou_obb


def softmax_np(x):
    probs = np.exp(x - np.max(x, axis=-1, keepdims=True))
    return probs / np.sum(probs, axis=-1, keepdims=True)


def _to_np(x):
    return np.asarray(x)


def predictions2corners3d(ep, config_dict):
    """Decode predictions to camera-frame corners + (B, K, 7) params
    (ap_helper.py:51-93), vectorized."""
    cfg = config_dict["dataset_config"]
    pred_center = _to_np(ep["center"])
    heading_scores = _to_np(ep["heading_scores"])
    heading_residuals = _to_np(ep["heading_residuals"])
    size_scores = _to_np(ep["size_scores"])
    size_residuals = _to_np(ep["size_residuals"])

    pred_heading_class = np.argmax(heading_scores, -1)
    pred_heading_residual = np.take_along_axis(
        heading_residuals, pred_heading_class[..., None], axis=2
    )[..., 0]
    pred_size_class = np.argmax(size_scores, -1)
    pred_size_residual = np.take_along_axis(
        size_residuals, pred_size_class[..., None, None], axis=2
    )[:, :, 0, :]

    heading_angle = cfg.class2angle(pred_heading_class, pred_heading_residual)
    box_size = cfg.mean_size_arr[pred_size_class] + pred_size_residual

    params = np.zeros(pred_center.shape[:2] + (7,), dtype=np.float32)
    params[..., 0:3] = pred_center
    params[..., 3:6] = box_size
    params[..., 6] = heading_angle

    center_cam = flip_axis_to_camera(pred_center)
    corners = get_3d_box_batch_np(box_size, heading_angle, center_cam)
    return corners.astype(np.float32), params


def parse_predictions(ep, config_dict):
    """NMS + per-class proposal list (ap_helper.py:96-221).

    Returns batch_pred_map_cls: [[(cls, corners(8,3), score), ...], ...].
    """
    cfg = config_dict["dataset_config"]
    pred_center = _to_np(ep["center"])
    sem_cls_probs = softmax_np(_to_np(ep["sem_cls_scores"]))
    pred_sem_cls = np.argmax(sem_cls_probs, -1)

    corners, _ = predictions2corners3d(ep, config_dict)
    bsize, k = corners.shape[:2]
    nonempty = np.ones((bsize, k))

    if config_dict.get("remove_empty_box"):
        # drop boxes holding < 5 scene points (ap_helper.py:119-135)
        from ..data.sunrgbd_calib import extract_pc_in_box3d
        from ..geometry.boxes import flip_axis_to_depth

        if "point_clouds" not in ep:
            raise KeyError(
                "parse_predictions(remove_empty_box=True) needs the scene "
                "clouds: pass ep['point_clouds'] (B, N, C) alongside the "
                "model outputs (the jitted eval forward does not return "
                "inputs; see cli/common.py evaluate())")
        batch_pc = _to_np(ep["point_clouds"])[:, :, 0:3]
        for i in range(bsize):
            for j in range(k):
                box3d = flip_axis_to_depth(corners[i, j])
                pc_in_box, _ = extract_pc_in_box3d(batch_pc[i], box3d)
                if len(pc_in_box) < 5:
                    nonempty[i, j] = 0

    obj_prob = softmax_np(_to_np(ep["objectness_scores"]))[:, :, 1]

    mins = corners.min(axis=2)  # (B, K, 3) camera-frame AABB
    maxs = corners.max(axis=2)

    pred_mask = np.zeros((bsize, k))
    if not config_dict["use_3d_nms"]:
        for i in range(bsize):
            boxes2d = np.stack(
                [mins[i, :, 0], mins[i, :, 2], maxs[i, :, 0], maxs[i, :, 2],
                 obj_prob[i]], axis=1,
            )
            keep = np.where(nonempty[i] == 1)[0]
            pick = nms_2d_faster(
                boxes2d[keep], config_dict["nms_iou"], config_dict["use_old_type_nms"]
            )
            assert len(pick) > 0
            pred_mask[i, keep[pick]] = 1
    elif not config_dict["cls_nms"]:
        for i in range(bsize):
            boxes3d = np.concatenate([mins[i], maxs[i], obj_prob[i, :, None]], axis=1)
            keep = np.where(nonempty[i] == 1)[0]
            pick = nms_3d_faster(
                boxes3d[keep], config_dict["nms_iou"], config_dict["use_old_type_nms"]
            )
            assert len(pick) > 0
            pred_mask[i, keep[pick]] = 1
    else:
        scores = obj_prob
        if config_dict.get("use_iou_for_nms"):
            iou_logits = 1.0 / (1.0 + np.exp(-_to_np(ep["iou_scores"])))
            if iou_logits.shape[2] > 1:
                iou_logits = np.take_along_axis(
                    iou_logits, pred_sem_cls[..., None], axis=2
                )
            scores = scores * iou_logits[..., 0]
        for i in range(bsize):
            boxes3d = np.concatenate(
                [mins[i], maxs[i], scores[i, :, None],
                 pred_sem_cls[i, :, None].astype(np.float64)], axis=1,
            )
            keep = np.where(nonempty[i] == 1)[0]
            pick = nms_3d_faster_samecls(
                boxes3d[keep], config_dict["nms_iou"], config_dict["use_old_type_nms"]
            )
            assert len(pick) > 0
            pred_mask[i, keep[pick]] = 1

    batch_pred_map_cls = []
    conf = config_dict["conf_thresh"]
    for i in range(bsize):
        if config_dict["per_class_proposal"]:
            cur = []
            for c in range(cfg.num_class):
                cur += [
                    (c, corners[i, j], sem_cls_probs[i, j, c] * obj_prob[i, j])
                    for j in range(pred_center.shape[1])
                    if pred_mask[i, j] == 1 and obj_prob[i, j] > conf
                ]
            batch_pred_map_cls.append(cur)
        else:
            batch_pred_map_cls.append(
                [
                    (int(pred_sem_cls[i, j]), corners[i, j], obj_prob[i, j])
                    for j in range(pred_center.shape[1])
                    if pred_mask[i, j] == 1 and obj_prob[i, j] > conf
                ]
            )
    return batch_pred_map_cls


def groundtruths2corners3d(batch, config_dict):
    """Decode GT labels to camera-frame corners (B, MAX_NUM_OBJ, 8, 3) and
    depth-frame params (B, MAX_NUM_OBJ, 7) (ap_helper.py:238-275),
    vectorized. Rows with box_label_mask==0 keep zero params/corners like
    the reference's `continue`."""
    cfg = config_dict["dataset_config"]
    center = _to_np(batch["center_label"])[..., 0:3]
    heading_class = _to_np(batch["heading_class_label"])
    heading_residual = _to_np(batch["heading_residual_label"])
    size_class = _to_np(batch["size_class_label"])
    size_residual = _to_np(batch["size_residual_label"])
    mask = _to_np(batch["box_label_mask"])

    heading_angle = cfg.class2angle(heading_class, heading_residual)
    box_size = cfg.mean_size_arr[size_class] + size_residual
    corners = get_3d_box_batch_np(
        box_size, heading_angle, flip_axis_to_camera(center)
    ).astype(np.float32)
    params = np.zeros(center.shape[:2] + (7,), dtype=np.float32)
    params[..., 0:3] = center
    params[..., 3:6] = np.where(mask[..., None] == 1, box_size, 0.0)
    params[..., 6] = np.where(mask == 1, heading_angle, 0.0)
    corners = np.where(mask[..., None, None] == 1, corners, 0.0)
    return corners, params


def parse_groundtruths(batch, config_dict):
    """GT corners list (ap_helper.py:224-290), vectorized decode."""
    mask = _to_np(batch["box_label_mask"])
    sem = _to_np(batch["sem_cls_label"])
    corners, _ = groundtruths2corners3d(batch, config_dict)

    batch_gt_map_cls = []
    for i in range(corners.shape[0]):
        batch_gt_map_cls.append(
            [
                (int(sem[i, j]), corners[i, j])
                for j in range(corners.shape[1])
                if mask[i, j] == 1
            ]
        )
    return batch_gt_map_cls


def align_predictions_groundtruths(batch_pred_corners_3d, batch_gt_corners_3d,
                                   batch, iou_threshold=0.5):
    """For each predicted box, the best-overlapping GT box, a 0/1 fitness
    flag (IoU >= threshold), and its semantic class (ap_helper.py:294-338).

    batch_pred_corners_3d: (B, K, 8, 3) upright-camera corners;
    batch_gt_corners_3d: (B, MAX_NUM_OBJ, 8, 3); batch provides
    box_label_mask and sem_cls_label.
    """
    from .box3d_iou_np import box3d_iou

    bsize, num_proposal = batch_pred_corners_3d.shape[:2]
    box_label_mask = _to_np(batch["box_label_mask"])
    sem_cls_label = _to_np(batch["sem_cls_label"])

    batch_sem_cls_labels = np.zeros((bsize, num_proposal, 1), dtype=np.int64)
    batch_confidence_scores = np.zeros((bsize, num_proposal, 1), np.float32)
    batch_gt_corners_3d_aligned = np.zeros(
        (bsize, num_proposal, 8, 3), dtype=np.float32)

    for i in range(bsize):
        cur_mask = np.nonzero(box_label_mask[i])
        gt_corners_3d = batch_gt_corners_3d[i][cur_mask]
        gt_classes = sem_cls_label[i][cur_mask]
        for j in range(num_proposal):
            bb = batch_pred_corners_3d[i, j]
            iou_list = [box3d_iou(bb, bbgt)[0] for bbgt in gt_corners_3d]
            if iou_list:
                iou_list = np.array(iou_list)
                max_ind = np.argmax(iou_list)
                batch_gt_corners_3d_aligned[i, j] = gt_corners_3d[max_ind]
                batch_sem_cls_labels[i, j] = gt_classes[max_ind]
                if iou_list.max() >= iou_threshold:
                    batch_confidence_scores[i, j] = 1.0
    return (batch_gt_corners_3d_aligned, batch_confidence_scores,
            batch_sem_cls_labels)


def get_roi_ptcloud(inputs, batch_pred_boxes_params, enlarge_ratio=1.2,
                    num_point_roi=512, min_num_point=100, rng=None):
    """Crop + resample the scene cloud inside each (enlarged) predicted box
    (ap_helper.py:341-379). Returns ((B, K, num_point_roi, C) clouds,
    (B, K) nonempty mask; boxes with < min_num_point points stay zero with
    mask 0)."""
    from ..data.pc_util import random_sampling
    from ..data.sunrgbd_calib import extract_pc_in_box3d
    from ..geometry.boxes import flip_axis_to_depth, get_3d_box_np

    batch_pc = _to_np(inputs["point_clouds"])
    batch_pred_boxes_params = _to_np(batch_pred_boxes_params)
    bsize, k = batch_pred_boxes_params.shape[:2]
    batch_pc_roi = np.zeros(
        (bsize, k, num_point_roi, batch_pc.shape[2]), dtype=np.float32)
    nonempty_roi_mask = np.ones((bsize, k))

    for i in range(bsize):
        pc = batch_pc[i]
        for j in range(k):
            box_params = batch_pred_boxes_params[i, j]
            center_upright_camera = flip_axis_to_camera(box_params[0:3])
            box3d = get_3d_box_np(
                box_params[3:6] * enlarge_ratio, box_params[6],
                center_upright_camera)
            box3d = flip_axis_to_depth(box3d)
            pc_in_box, _ = extract_pc_in_box3d(pc, box3d)
            if len(pc_in_box) >= min_num_point:
                batch_pc_roi[i, j] = random_sampling(
                    pc_in_box, num_point_roi, rng=rng)
            else:
                nonempty_roi_mask[i, j] = 0
    return batch_pc_roi, nonempty_roi_mask


class APCalculator:
    """AP accumulator (ap_helper.py:382-435)."""

    def __init__(self, ap_iou_thresh=0.25, class2type_map=None, processes=1):
        # processes=1 (serial) by default: worker processes re-run this
        # image's sitecustomize, which initializes the TPU backend and can
        # hang; the reference's 10-proc pool (ap_helper.py:430) is opt-in.
        self.ap_iou_thresh = ap_iou_thresh
        self.class2type_map = class2type_map
        self.processes = processes
        self.reset()

    def step(self, batch_pred_map_cls, batch_gt_map_cls):
        assert len(batch_pred_map_cls) == len(batch_gt_map_cls)
        for i in range(len(batch_pred_map_cls)):
            self.gt_map_cls[self.scan_cnt] = batch_gt_map_cls[i]
            self.pred_map_cls[self.scan_cnt] = batch_pred_map_cls[i]
            self.scan_cnt += 1

    def compute_metrics(self):
        rec, _, ap = eval_det_multiprocessing(
            self.pred_map_cls, self.gt_map_cls, ovthresh=self.ap_iou_thresh,
            get_iou_func=get_iou_obb, processes=self.processes,
        )
        ret = {}
        for key in sorted(ap.keys()):
            clsname = self.class2type_map[key] if self.class2type_map else str(key)
            ret["%s Average Precision" % clsname] = ap[key]
        ret["mAP"] = np.mean(list(ap.values())) if ap else 0.0
        rec_list = []
        for key in sorted(ap.keys()):
            clsname = self.class2type_map[key] if self.class2type_map else str(key)
            try:
                ret["%s Recall" % clsname] = rec[key][-1]
                rec_list.append(rec[key][-1])
            except (TypeError, IndexError):
                ret["%s Recall" % clsname] = 0
                rec_list.append(0)
        ret["AR"] = np.mean(rec_list) if rec_list else 0.0
        return ret

    def reset(self):
        self.gt_map_cls = {}
        self.pred_map_cls = {}
        self.scan_cnt = 0
