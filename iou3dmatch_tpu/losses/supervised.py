"""Evaluation-path loss (full-batch supervised metrics).

Mirrors `models/loss_helper.py:25-291` (``get_loss``): same structure as the
labeled training loss but WITHOUT placeholder-center masking in the
objectness assignment, without the jitter term, and with the IoU loss
masked by objectness (not an unmasked mean). Used by evaluate_one_epoch.
"""
import jax
import jax.numpy as jnp

from ..geometry import huber_loss, nn_distance
from .common import (
    FAR_THRESHOLD, NEAR_THRESHOLD, OBJECTNESS_CLS_WEIGHTS,
    cross_entropy, masked_mean,
)
from .iou_labels import compute_iou_labels
from .labeled import compute_vote_loss, _box_and_sem_cls_losses


def _objectness_loss_eval(ep, batch, nl):
    """loss_helper.py:72-113 — raw center_label, no placeholder masking."""
    aggregated_vote_xyz = ep["aggregated_vote_xyz"][:nl]
    gt_center = batch["center_label"][..., 0:3]
    dist1, ind1, _, _ = nn_distance(aggregated_vote_xyz, gt_center)
    euclid = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)
    objectness_mask = (
        (euclid < NEAR_THRESHOLD) | (euclid > FAR_THRESHOLD)
    ).astype(jnp.float32)
    loss = cross_entropy(
        ep["objectness_scores"][:nl], objectness_label, OBJECTNESS_CLS_WEIGHTS
    )
    return masked_mean(loss, objectness_mask), objectness_label, objectness_mask, ind1


def get_loss(ep, batch, cfg):
    """Returns (loss, metrics); total =
    (vote + 0.5*objectness + box + 0.1*sem_cls [+ iou]) * 10."""
    nl = batch["center_label"].shape[0]
    m = {}
    vote_loss = compute_vote_loss(ep, batch, nl)
    m["vote_loss"] = vote_loss

    objectness_loss, objectness_label, objectness_mask, object_assignment = (
        _objectness_loss_eval(ep, batch, nl)
    )
    m["objectness_loss"] = objectness_loss
    total_props = objectness_label.size
    m["pos_ratio"] = jnp.sum(objectness_label.astype(jnp.float32)) / total_props
    m["neg_ratio"] = jnp.sum(objectness_mask) / total_props - m["pos_ratio"]

    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss, sem_cls_label, m2) = _box_and_sem_cls_losses(
        ep, batch, nl, cfg, object_assignment, objectness_label
    )
    m.update(m2)
    # eval-path cls_acc is unmasked over all proposals (loss_helper.py:188-189)
    m["cls_acc"] = jnp.mean(
        (sem_cls_label == jnp.argmax(ep["sem_cls_scores"][:nl], -1)).astype(jnp.float32)
    )
    m["cls_acc_obj"] = m2["cls_acc"]
    m["center_loss"] = center_loss
    m["heading_cls_loss"] = heading_cls_loss
    m["heading_reg_loss"] = heading_reg_loss
    m["size_cls_loss"] = size_cls_loss
    m["size_reg_loss"] = size_reg_loss
    m["sem_cls_loss"] = sem_cls_loss
    box_loss = (
        0.1 * heading_cls_loss + heading_reg_loss
        + 0.1 * size_cls_loss + size_reg_loss + center_loss
    )
    m["box_loss"] = box_loss

    iou_labels, _, _ = compute_iou_labels(
        batch,
        ep["aggregated_vote_xyz"][:nl],
        ep["center"][:nl],
        ep["heading_scores"][:nl],
        ep["heading_residuals"][:nl],
        ep["size_scores"][:nl],
        ep["size_residuals"][:nl],
        cfg,
    )
    obj_f = objectness_label.astype(jnp.float32)
    m["pred_iou_value"] = jnp.mean(iou_labels)
    m["pred_iou_obj_value"] = masked_mean(iou_labels, obj_f)

    total = vote_loss + 0.5 * objectness_loss + box_loss + 0.1 * sem_cls_loss
    if "iou_scores" in ep:
        iou_pred = jax.nn.sigmoid(ep["iou_scores"][:nl])
        if iou_pred.shape[2] > 1:
            # eval path gathers at PREDICTED class (loss_helper.py:208-212)
            pred_cls = jnp.argmax(ep["sem_cls_scores"][:nl], axis=-1)
            iou_pred = jnp.take_along_axis(iou_pred, pred_cls[..., None], axis=2)[..., 0]
        else:
            iou_pred = iou_pred[..., 0]
        iou_err = jnp.abs(iou_pred - iou_labels)
        m["iou_acc"] = jnp.mean(iou_err)
        m["iou_acc_obj"] = masked_mean(iou_err, obj_f)
        iou_loss = masked_mean(huber_loss(iou_pred - iou_labels, 1.0), obj_f)
        m["iou_loss"] = iou_loss
        total = total + iou_loss

    total = total * 10.0
    m["detection_loss"] = total
    obj_pred = jnp.argmax(ep["objectness_scores"][:nl], axis=2)
    m["obj_acc"] = masked_mean(
        (obj_pred == objectness_label).astype(jnp.float32), objectness_mask
    )
    return total, m
