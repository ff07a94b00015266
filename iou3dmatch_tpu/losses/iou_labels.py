"""Rotated-IoU training labels for the IoU-prediction branch.

Mirrors `models/loss_helper_iou.py:52-112` (``compute_iou_labels``): build
(B, K, 7) predicted and (B, G, 7) ground-truth boxes — note the heading
NEGATION when packing into the (x, y, z, dx, dy, dz, heading) IoU format and
the -1000 placeholder centers for empty GT slots — then take the max IoU over
same-scene GTs. The reference computes the full (B*K, B*G) cross product and
gathers the same-row block; we compute only the same-row block
(`boxes_iou3d_paired_rows`), which is numerically identical and B-x cheaper.
"""
import jax
import jax.numpy as jnp

from ..geometry import boxes_iou3d_paired_rows, nn_distance
from .common import NEAR_THRESHOLD


def _gt_boxes(labels: dict, cfg) -> jax.Array:
    center = labels["center_label"][..., 0:3]
    mask = labels["box_label_mask"]
    center = jnp.where(mask[..., None] > 0, center, -1000.0)
    gt_size = cfg.class2size_jnp(labels["size_class_label"], labels["size_residual_label"])
    gt_angle = cfg.class2angle_jnp(
        labels["heading_class_label"], labels["heading_residual_label"]
    )
    return jnp.concatenate(
        [center, gt_size, -gt_angle[..., None]], axis=-1
    ).astype(jnp.float32)


def pred_boxes_from_scores(
    pred_center, pred_heading_scores, pred_heading_residuals,
    pred_size_scores, pred_size_residuals, cfg,
):
    """Argmax-decode predictions into the (x,y,z,dx,dy,dz,-heading) format."""
    pred_heading_class = jnp.argmax(pred_heading_scores, axis=-1)
    pred_heading_residual = jnp.take_along_axis(
        pred_heading_residuals, pred_heading_class[..., None], axis=2
    )[..., 0]
    pred_size_class = jnp.argmax(pred_size_scores, axis=-1)
    pred_size_residual = jnp.take_along_axis(
        pred_size_residuals, pred_size_class[..., None, None], axis=2
    )[:, :, 0, :]
    pred_size = cfg.class2size_jnp(pred_size_class, pred_size_residual)
    pred_size = jnp.where(pred_size <= 0, 1e-6, pred_size)
    if cfg.num_heading_bin == 1:
        pred_angle = jnp.zeros(pred_size.shape[:2], dtype=jnp.float32)
    else:
        pred_angle = cfg.class2angle_jnp(pred_heading_class, pred_heading_residual)
    box = jnp.concatenate(
        [pred_center, pred_size, -pred_angle[..., None]], axis=-1
    ).astype(jnp.float32)
    return jax.lax.stop_gradient(box)


def compute_iou_labels(
    labels: dict,
    pred_votes: jax.Array,
    pred_center: jax.Array,
    pred_heading_scores: jax.Array,
    pred_heading_residuals: jax.Array,
    pred_size_scores: jax.Array,
    pred_size_residuals: jax.Array,
    cfg,
    reverse: bool = False,
):
    """labels: already-sliced GT dict. Returns
    (iou_labels (B, K), objectness_label (B, K), object_assignment (B, K)),
    or the full (B, G, K) matrix when ``reverse`` (coverage stats)."""
    gt_bbox = _gt_boxes(labels, cfg)
    pred_bbox = pred_boxes_from_scores(
        pred_center, pred_heading_scores, pred_heading_residuals,
        pred_size_scores, pred_size_residuals, cfg,
    )
    iou = boxes_iou3d_paired_rows(pred_bbox, gt_bbox)  # (B, K, G)
    iou = jax.lax.stop_gradient(iou)
    if reverse:
        return jnp.swapaxes(iou, 1, 2)  # (B, G, K)

    center_label = jnp.where(
        labels["box_label_mask"][..., None] > 0, labels["center_label"][..., 0:3], -1000.0
    )
    dist1, _, _, _ = nn_distance(pred_votes, center_label)
    euclid = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)

    iou_labels = jnp.max(iou, axis=2)
    object_assignment = jnp.argmax(iou, axis=2)
    return iou_labels, objectness_label, object_assignment


def compute_iou_from_given_size(labels: dict, pred_center, pred_size,
                                pred_heading, cfg):
    """Rotated-IoU labels for explicitly provided box parameters
    (loss_helper_iou.py:22-49; used for refined boxes, e.g. after IoU
    optimization). Returns (iou_labels (B,K), pred_bbox (B,K,7),
    object_assignment (B,K)) — the reference stashes pred_bbox in
    end_points and returns None in its place."""
    gt_bbox = _gt_boxes(labels, cfg)
    pred_size = jnp.where(pred_size <= 0, 1e-6, pred_size)
    pred_bbox = jnp.concatenate(
        [pred_center, pred_size, -pred_heading[..., None]], axis=-1
    ).astype(jnp.float32)
    iou = boxes_iou3d_paired_rows(pred_bbox, gt_bbox)  # (B, K, G)
    iou = jax.lax.stop_gradient(iou)
    return jnp.max(iou, axis=2), pred_bbox, jnp.argmax(iou, axis=2)


def compute_iou_labels_axis_aligned(labels: dict, pred_votes, pred_center,
                                    pred_size_scores, pred_size_residuals,
                                    origin_object_assignment, cfg):
    """Axis-aligned (differentiable-form) IoU labels
    (loss_helper_iou.py:115-152). Returns (iou_labels (B,K),
    iou_zero_mask (B,K) int, final_object_assignment (B,K), stats dict
    {acc_pred_iou, acc_pred_iou_obj})."""
    from ..geometry import box3d_iou_axis_aligned

    center_label = jnp.where(
        labels["box_label_mask"][..., None] > 0,
        labels["center_label"][..., 0:3], -1000.0)

    dist1, _, _, _ = nn_distance(pred_votes, center_label)
    euclid = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)

    pred_size_class = jnp.argmax(pred_size_scores, axis=-1)
    pred_size_residual = jnp.take_along_axis(
        pred_size_residuals,
        jax.lax.stop_gradient(pred_size_class)[..., None, None], axis=2
    )[:, :, 0, :]

    gt_size = cfg.class2size_jnp(
        labels["size_class_label"], labels["size_residual_label"]) / 2
    gt_corners = jnp.stack(
        [gt_size + center_label, center_label - gt_size], axis=2)  # (B,G,2,3)
    pred_size = cfg.class2size_jnp(
        jax.lax.stop_gradient(pred_size_class), pred_size_residual) / 2
    pred_corners = jnp.stack(
        [pred_size + pred_center, pred_center - pred_size], axis=2)  # (B,K,2,3)

    iou = box3d_iou_axis_aligned(
        jax.lax.stop_gradient(gt_corners)[:, None, :],  # (B,1,G,2,3)
        pred_corners[:, :, None])                       # (B,K,1,2,3)
    iou_labels = jnp.max(iou, axis=2)
    object_assignment = jnp.argmax(iou, axis=2)

    iou_zero_mask = (iou_labels < 1e-4).astype(jnp.int32)
    final_object_assignment = (origin_object_assignment * iou_zero_mask
                               + object_assignment * (1 - iou_zero_mask))
    stats = {
        "acc_pred_iou": jnp.mean(iou_labels),
        "acc_pred_iou_obj": jnp.sum(iou_labels * objectness_label)
        / (jnp.sum(objectness_label) + 1e-6),
    }
    return iou_labels, iou_zero_mask, final_object_assignment, stats
