"""SSL loss on unlabeled scenes: teacher pseudo-labels -> student loss.

Mirrors `models/loss_helper_unlabeled.py`. Key difference from the
reference: the pseudo-label pipeline (threshold filter -> top-64 sort ->
lower-half suppression -> teacher->student frame transforms) runs entirely
ON-DEVICE with fixed shapes inside the jitted SSL step — the reference
round-trips teacher boxes through NumPy for corner math + LHS
(`loss_helper_unlabeled.py:441-492`). Same boxes, no host sync.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import huber_loss, nn_distance, nn_distance_withcls
from ..geometry.boxes import corners_aabb
from ..geometry.nms import lhs_3d_samecls_jax
from .common import (
    FAR_THRESHOLD, NEAR_THRESHOLD, OBJECTNESS_CLS_WEIGHTS,
    cross_entropy, masked_mean,
)

MAX_NUM_OBJ = 64


# --------------------------------------------------------------- transforms
def trans_center(center, flip_x, flip_y, rot_mat, scale):
    """Teacher-frame box centers -> student-frame
    (loss_helper_unlabeled.py:24-36)."""
    x = jnp.where(flip_x[:, None] > 0, -center[..., 0], center[..., 0])
    y = jnp.where(flip_y[:, None] > 0, -center[..., 1], center[..., 1])
    c = jnp.stack([x, y, center[..., 2]], axis=-1)
    # bmm with rot_mat^T; full f32 (geometric transform, not a NN matmul)
    c = jnp.einsum("bkc,bdc->bkd", c, rot_mat, precision=jax.lax.Precision.HIGHEST)
    return c * scale


def trans_size(size_class, size_residual, scale, cfg):
    """Teacher-frame size residuals -> student-frame
    (loss_helper_unlabeled.py:39-50)."""
    mean_size = jnp.asarray(cfg.mean_size_arr, dtype=jnp.float32)
    size_base = mean_size[size_class]
    size_all = (size_base + size_residual) * scale
    return size_all - size_base


def trans_angle(angle_class, angle_residual, flip_x, flip_y, rot_angle, cfg):
    """Teacher-frame heading -> student-frame, re-binned (SUN RGB-D only,
    loss_helper_unlabeled.py:54-64)."""
    angle = cfg.class2angle_jnp(angle_class, angle_residual)
    angle = jnp.where(flip_x[:, None] > 0, np.pi - angle, angle)
    angle = jnp.where(flip_y[:, None] > 0, -angle, angle)
    angle = angle - rot_angle[:, None]
    return cfg.angle2class_jnp(angle)


def reverse_trans_center(center, flip_x, flip_y, rot_mat, scale):
    """Student-frame box centers -> teacher-frame: the inverse of
    trans_center (loss_helper_unlabeled.py:67-79; note the NON-transposed
    rot_mat bmm and the 1/scale)."""
    x = jnp.where(flip_x[:, None] > 0, -center[..., 0], center[..., 0])
    y = jnp.where(flip_y[:, None] > 0, -center[..., 1], center[..., 1])
    c = jnp.stack([x, y, center[..., 2]], axis=-1)
    c = jnp.einsum("bkc,bcd->bkd", c, rot_mat,
                   precision=jax.lax.Precision.HIGHEST)
    return c * (1.0 / scale)


def compute_objectness_gt(ep, gt_labels, num_labeled):
    """Cheating objectness diagnostics against the REAL labels of the
    unlabeled rows (view-stats only, loss_helper_unlabeled.py:82-135).

    Returns (objectness_loss, objectness_label, objectness_mask,
    object_assignment, stats) where stats carries 'true_unlabeled_obj_acc'.
    """
    nl = num_labeled
    aggregated_vote_xyz = ep["aggregated_vote_xyz"][nl:]
    gt_center = jnp.where(
        gt_labels["box_label_mask"][..., None] > 0,
        gt_labels["center_label"][..., 0:3], -1000.0)

    dist1, ind1, _, _ = nn_distance(aggregated_vote_xyz, gt_center)
    euclid = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)
    objectness_mask = ((euclid < NEAR_THRESHOLD)
                       | (euclid > FAR_THRESHOLD)).astype(jnp.float32)

    objectness_scores = ep["objectness_scores"][nl:]
    per = cross_entropy(
        objectness_scores, objectness_label, OBJECTNESS_CLS_WEIGHTS)
    mask_sum = jnp.sum(objectness_mask) + 1e-6
    objectness_loss = jnp.sum(per * objectness_mask) / mask_sum

    obj_pred = jnp.argmax(objectness_scores, axis=2)
    obj_acc = jnp.sum(
        (obj_pred == objectness_label).astype(jnp.float32) * objectness_mask
    ) / mask_sum
    # the reference logs the same value under both names
    # (loss_helper_unlabeled.py:132 and :355-359)
    stats = {"true_unlabeled_obj_acc": obj_acc, "unlabeled_obj_acc": obj_acc}
    return objectness_loss, objectness_label, objectness_mask, ind1, stats


# ------------------------------------------------------------ pseudo labels
def get_pseudo_labels(teacher: Dict, cfg, obj_threshold, cls_threshold,
                      iou_threshold, nms_iou, use_lhs=True, gt_labels=None):
    """teacher: dict of EMA-model outputs already sliced to unlabeled rows.

    Returns a dict of fixed-shape (B_u, MAX_NUM_OBJ[,...]) pseudo labels in
    the TEACHER frame + metrics. Mirrors get_pseudo_labels
    (loss_helper_unlabeled.py:364-538) with the LHS dedup on device.

    ``gt_labels``: optional dict of real GT labels for the unlabeled rows
    (the --view_stats "cheating" diagnostics, loss_helper_unlabeled.py
    :392-414, :494-523) — adds pseudo-label quality metrics, never losses.
    """
    pred_center = teacher["center"]
    b, k = pred_center.shape[:2]
    kmax = min(MAX_NUM_OBJ, k)

    pred_objectness = jax.nn.softmax(teacher["objectness_scores"], axis=2)
    pos_obj = pred_objectness[..., 1]
    neg_obj_mask = pred_objectness[..., 0] > 0.9  # deprecated path, kept
    sem_probs = jax.nn.softmax(teacher["sem_cls_scores"], axis=2)
    max_cls = jnp.max(sem_probs, axis=2)
    argmax_cls = jnp.argmax(sem_probs, axis=2)

    iou_pred = jax.nn.sigmoid(teacher["iou_scores"])
    if iou_pred.shape[2] > 1:
        iou_pred = jnp.take_along_axis(iou_pred, argmax_cls[..., None], axis=2)[..., 0]
    else:
        iou_pred = iou_pred[..., 0]

    final_mask = (
        (max_cls > cls_threshold)
        & (pos_obj > obj_threshold)
        & (iou_pred > iou_threshold)
    )

    # keep top MAX_NUM_OBJ by pos_obj * max_cls * mask (ties: stable argsort)
    sort_key = pos_obj * max_cls * final_mask.astype(pos_obj.dtype)
    inds = jnp.argsort(-sort_key, axis=1)[:, :kmax]
    take1 = lambda a: jnp.take_along_axis(a, inds, axis=1)
    take3 = lambda a: jnp.take_along_axis(a, inds[..., None], axis=1)

    final_mask_sorted = take1(final_mask)
    metrics = {
        "pseudo_gt_ratio": jnp.mean(final_mask_sorted.astype(jnp.float32))
    }
    neg_obj_mask = take1(neg_obj_mask)

    if gt_labels is not None:
        from .iou_labels import compute_iou_labels

        iou_labels, vs_obj_label, vs_assignment = compute_iou_labels(
            gt_labels, teacher["aggregated_vote_xyz"], pred_center,
            teacher["heading_scores"], teacher["heading_residuals"],
            teacher["size_scores"], teacher["size_residuals"], cfg,
        )
        vs_obj = vs_obj_label.astype(jnp.float32)
        metrics["unlabeled_pred_iou_value"] = jnp.mean(iou_labels)
        metrics["unlabeled_pred_iou_obj_value"] = jnp.sum(iou_labels * vs_obj) / (
            jnp.sum(vs_obj) + 1e-6)
        iou_err = jnp.abs(iou_pred - iou_labels)
        metrics["unlabeled_iou_acc"] = jnp.mean(iou_err)
        metrics["unlabeled_iou_obj_acc"] = jnp.sum(iou_err * vs_obj) / (
            jnp.sum(vs_obj) + 1e-6)

    argmax_size = jnp.argmax(teacher["size_scores"], axis=2)
    argmax_heading = jnp.argmax(teacher["heading_scores"], axis=2)
    heading_res = jnp.take_along_axis(
        teacher["heading_residuals"], argmax_heading[..., None], axis=2
    )[..., 0]
    size_res = jnp.take_along_axis(
        teacher["size_residuals"], argmax_size[..., None, None], axis=2
    )[:, :, 0, :]

    center_sel = take3(pred_center)
    heading_cls_sel = take1(argmax_heading)
    heading_res_sel = take1(heading_res)
    size_cls_sel = take1(argmax_size)
    size_res_sel = take3(size_res)
    sem_cls_sel = take1(argmax_cls)
    pos_obj_sel = take1(pos_obj)
    iou_sel = take1(iou_pred)
    vote_xyz_sel = take3(teacher["aggregated_vote_xyz"])

    if use_lhs:
        # on-device LHS over axis-aligned envelopes of the decoded boxes,
        # scored by pos_obj * predicted IoU — same-class suppression only
        box_size = cfg.class2size_jnp(size_cls_sel, size_res_sel)
        heading = cfg.class2angle_jnp(heading_cls_sel, heading_res_sel)
        mins, maxs = corners_aabb(center_sel, box_size, heading)
        scores = pos_obj_sel * iou_sel
        keep = jax.vmap(
            lambda mn, mx, sc, cl: lhs_3d_samecls_jax(mn, mx, sc, cl, nms_iou)
        )(mins, maxs, scores, sem_cls_sel.astype(jnp.float32))
        final_mask_sorted = final_mask_sorted & keep

    if gt_labels is not None:
        # Selected-pseudo-label quality + GT coverage
        # (loss_helper_unlabeled.py:494-523).
        fmask = final_mask_sorted.astype(jnp.float32)
        picked_iou = take1(iou_labels)
        sel_obj = take1(vs_obj)
        metrics["final_iou_avg_value"] = jnp.sum(picked_iou * fmask) / (
            jnp.sum(fmask) + 1e-6)
        metrics["final_iou_avg_obj_value"] = jnp.sum(picked_iou * fmask * sel_obj) / (
            jnp.sum(fmask * sel_obj) + 1e-6)
        sel_assignment = take1(vs_assignment)
        sel_cls_gt = jnp.take_along_axis(
            gt_labels["sem_cls_label"], sel_assignment, axis=1)
        correct_cls = (sem_cls_sel == sel_cls_gt).astype(jnp.float32)
        metrics["final_cls_value"] = jnp.sum(correct_cls * fmask) / (
            jnp.sum(fmask) + 1e-6)
        metrics["final_cls_obj_value"] = jnp.sum(correct_cls * fmask * sel_obj) / (
            jnp.sum(fmask * sel_obj) + 1e-6)

        gt_to_pred = compute_iou_labels(
            gt_labels, teacher["aggregated_vote_xyz"], pred_center,
            teacher["heading_scores"], teacher["heading_residuals"],
            teacher["size_scores"], teacher["size_residuals"], cfg,
            reverse=True,
        )  # (B, G, K)
        gt_to_sel = jnp.take_along_axis(
            gt_to_pred, inds[:, None, :].repeat(gt_to_pred.shape[1], axis=1), axis=2
        ) * fmask[:, None, :]
        best_cover = jnp.max(gt_to_sel, axis=2)  # (B, G)
        gt_count = jnp.sum(gt_labels["box_label_mask"]) + 1e-6
        metrics["final_coverage_0.25_value"] = jnp.sum(
            (best_cover > 0.25).astype(jnp.float32)) / gt_count
        metrics["final_coverage_0.5_value"] = jnp.sum(
            (best_cover > 0.5).astype(jnp.float32)) / gt_count

    label_mask = final_mask_sorted.astype(jnp.int32)
    center_label = jnp.where(label_mask[..., None] > 0, center_sel, -1000.0)
    false_center_label = jnp.where(
        neg_obj_mask[..., None], vote_xyz_sel, -1000.0
    )  # kept for parity; unused by the default loss config

    return {
        "unlabeled_box_label_mask": label_mask,
        "unlabeled_center_label": center_label,
        "unlabeled_sem_cls_label": sem_cls_sel,
        "unlabeled_heading_class_label": heading_cls_sel,
        "unlabeled_heading_residual_label": heading_res_sel,
        "unlabeled_size_class_label": size_cls_sel,
        "unlabeled_size_residual_label": size_res_sel,
        "unlabeled_false_center_label": false_center_label,
        "unlabeled_iou_label": iou_sel,
    }, metrics


# ----------------------------------------------------------- student losses
def _pseudo_objectness(ep, pseudo, nl, samecls_match=False):
    """loss_helper_unlabeled.py:137-196."""
    aggregated_vote_xyz = ep["aggregated_vote_xyz"][nl:]
    gt_center = pseudo["unlabeled_center_label"][..., 0:3]

    if samecls_match:
        dist1, ind1, _, _ = nn_distance_withcls(
            aggregated_vote_xyz, gt_center,
            jnp.argmax(ep["sem_cls_scores"][nl:], axis=2),
            pseudo["unlabeled_sem_cls_label"],
        )
    else:
        dist1, ind1, _, _ = nn_distance(aggregated_vote_xyz, gt_center)
    euclid = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)
    objectness_mask = (
        (euclid < NEAR_THRESHOLD) | (euclid > FAR_THRESHOLD)
    ).astype(jnp.float32)
    loss = cross_entropy(
        ep["objectness_scores"][nl:], objectness_label, OBJECTNESS_CLS_WEIGHTS
    )
    return masked_mean(loss, objectness_mask), objectness_label, objectness_mask, ind1


def _pseudo_box_and_sem_cls_loss(ep, pseudo, nl, cfg, object_assignment, objectness_label):
    """loss_helper_unlabeled.py:199-289."""
    nh, ns = cfg.num_heading_bin, cfg.num_size_cluster
    mean_size = jnp.asarray(cfg.mean_size_arr, dtype=jnp.float32)
    obj = objectness_label.astype(jnp.float32)
    box_label_mask = pseudo["unlabeled_box_label_mask"].astype(jnp.float32)
    take = jnp.take_along_axis

    dist1, _, dist2, _ = nn_distance(
        ep["center"][nl:], pseudo["unlabeled_center_label"][..., 0:3]
    )
    center_loss = masked_mean(dist1, obj) + masked_mean(dist2, box_label_mask)

    heading_class_label = take(
        pseudo["unlabeled_heading_class_label"], object_assignment, axis=1
    )
    heading_cls_loss = masked_mean(
        cross_entropy(ep["heading_scores"][nl:], heading_class_label), obj
    )
    heading_residual_label = take(
        pseudo["unlabeled_heading_residual_label"], object_assignment, axis=1
    )
    hr_norm_label = heading_residual_label / (np.pi / nh)
    h_onehot = jax.nn.one_hot(heading_class_label, nh, dtype=jnp.float32)
    hr_pred = jnp.sum(ep["heading_residuals_normalized"][nl:] * h_onehot, axis=-1)
    heading_reg_loss = masked_mean(huber_loss(hr_pred - hr_norm_label, 1.0), obj)

    size_class_label = take(
        pseudo["unlabeled_size_class_label"], object_assignment, axis=1
    )
    size_cls_loss = masked_mean(
        cross_entropy(ep["size_scores"][nl:], size_class_label), obj
    )
    size_residual_label = take(
        pseudo["unlabeled_size_residual_label"], object_assignment[..., None], axis=1
    )
    s_onehot = jax.nn.one_hot(size_class_label, ns, dtype=jnp.float32)
    sr_pred = jnp.sum(ep["size_residuals_normalized"][nl:] * s_onehot[..., None], axis=2)
    mean_size_label = jnp.sum(s_onehot[..., None] * mean_size[None, None], axis=2)
    sr_label = size_residual_label / mean_size_label
    size_reg_loss = masked_mean(
        jnp.mean(huber_loss(sr_pred - sr_label, 1.0), axis=-1), obj
    )

    sem_cls_label = take(pseudo["unlabeled_sem_cls_label"], object_assignment, axis=1)
    sem_cls_loss = masked_mean(
        cross_entropy(ep["sem_cls_scores"][nl:], sem_cls_label), obj
    )
    return (center_loss, heading_cls_loss, heading_reg_loss,
            size_cls_loss, size_reg_loss, sem_cls_loss)


def get_unlabeled_loss(ep, ema_ep, batch, cfg, num_labeled, *,
                       obj_threshold=0.9, cls_threshold=0.9, iou_threshold=0.25,
                       nms_iou=0.25, use_lhs=True, samecls_match=False,
                       dataset="scannet", view_stats=False,
                       ema_rows_are_unlabeled=False):
    """Returns (loss, metrics). Mirrors get_unlabeled_loss
    (loss_helper_unlabeled.py:541-600): pseudo-label the teacher's unlabeled
    rows, transform to the student frame, then center/heading/size/sem-cls
    losses; total = (box + 0.1 * sem_cls) * 10.

    ``ema_rows_are_unlabeled``: the caller already ran the teacher on only
    the unlabeled scenes (see make_ssl_step reference_exact=False), so
    ``ema_ep`` needs no slicing."""
    nl = num_labeled
    t0 = 0 if ema_rows_are_unlabeled else nl
    teacher = {k: v[t0:] for k, v in ema_ep.items() if k in (
        "center", "sem_cls_scores", "objectness_scores", "heading_scores",
        "heading_residuals", "size_scores", "size_residuals",
        "aggregated_vote_xyz", "iou_scores",
    )}

    gt_labels = None
    if view_stats:
        # Real labels of the "unlabeled" rows (datasets built with
        # load_labels=True); diagnostics only, never a training signal.
        label_keys = ("center_label", "box_label_mask", "sem_cls_label",
                      "heading_class_label", "heading_residual_label",
                      "size_class_label", "size_residual_label")
        if all(k in batch and batch[k].shape[0] > nl for k in label_keys):
            gt_labels = {k: batch[k][nl:] for k in label_keys}

    pseudo, m = get_pseudo_labels(
        teacher, cfg, obj_threshold, cls_threshold, iou_threshold, nms_iou,
        use_lhs, gt_labels=gt_labels,
    )

    # teacher-frame -> student-frame (loss_helper_unlabeled.py:562-573)
    flip_x = batch["flip_x_axis"][nl:]
    flip_y = batch["flip_y_axis"][nl:]
    rot_mat = batch["rot_mat"][nl:]
    scale = batch["scale"][nl:]
    pseudo["unlabeled_center_label"] = trans_center(
        pseudo["unlabeled_center_label"], flip_x, flip_y, rot_mat, scale
    )
    pseudo["unlabeled_false_center_label"] = trans_center(
        pseudo["unlabeled_false_center_label"], flip_x, flip_y, rot_mat, scale
    )
    pseudo["unlabeled_size_residual_label"] = trans_size(
        pseudo["unlabeled_size_class_label"],
        pseudo["unlabeled_size_residual_label"], scale, cfg,
    )
    if dataset == "sunrgbd":
        hcls, hres = trans_angle(
            pseudo["unlabeled_heading_class_label"],
            pseudo["unlabeled_heading_residual_label"],
            flip_x, flip_y, batch["rot_angle"][nl:], cfg,
        )
        pseudo["unlabeled_heading_class_label"] = hcls
        pseudo["unlabeled_heading_residual_label"] = hres

    obj_loss, obj_label, obj_mask, assignment = _pseudo_objectness(
        ep, pseudo, nl, samecls_match
    )
    if gt_labels is not None:
        # cheating objectness accuracy vs the real labels (view-stats,
        # loss_helper_unlabeled.py:321-323). The reference transforms the
        # GT labels into the STUDENT frame first (:575-589 runs before
        # get_pseudo_detection_loss at :598); placeholder masking to -1000
        # happens inside compute_objectness_gt on the transformed centers.
        gt_student = dict(gt_labels)
        gt_student["center_label"] = trans_center(
            gt_labels["center_label"][..., 0:3], flip_x, flip_y, rot_mat,
            scale)
        *_, gt_stats = compute_objectness_gt(ep, gt_student, nl)
        m.update(gt_stats)
        # the reference normalizes GT coverage by the FULL mixed-batch GT
        # count — labeled rows included (loss_helper_unlabeled.py:498);
        # the pseudo-label path computed it over unlabeled GTs only.
        full_count = jnp.sum(batch["box_label_mask"]) + 1e-6
        unl_count = jnp.sum(gt_labels["box_label_mask"]) + 1e-6
        for key in ("final_coverage_0.25_value", "final_coverage_0.5_value"):
            if key in m:
                m[key] = m[key] * (unl_count / full_count)
    m["unlabeled_objectness_loss"] = obj_loss
    total_props = obj_label.size
    m["unlabeled_pos_ratio"] = jnp.sum(obj_label.astype(jnp.float32)) / total_props
    m["unlabeled_neg_ratio"] = jnp.sum(obj_mask) / total_props - m["unlabeled_pos_ratio"]

    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss) = _pseudo_box_and_sem_cls_loss(
        ep, pseudo, nl, cfg, assignment, obj_label
    )
    m["unlabeled_center_loss"] = center_loss
    m["unlabeled_heading_cls_loss"] = heading_cls_loss
    m["unlabeled_heading_reg_loss"] = heading_reg_loss
    m["unlabeled_size_cls_loss"] = size_cls_loss
    m["unlabeled_size_reg_loss"] = size_reg_loss
    m["unlabeled_sem_cls_loss"] = sem_cls_loss
    box_loss = (
        0.1 * heading_cls_loss + heading_reg_loss
        + 0.1 * size_cls_loss + size_reg_loss + center_loss
    )
    m["unlabeled_box_loss"] = box_loss

    total = (box_loss + 0.1 * sem_cls_loss) * 10.0
    m["unlabeled_detection_loss"] = total
    return total, m
