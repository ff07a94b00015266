"""Training loss on labeled scenes (with box-jitter IoU loss).

Mirrors `models/loss_helper_labeled.py:28-370`. The mixed SSL batch layout is
[labeled rows | unlabeled rows], so the reference's dynamic
``supervised_inds`` gather becomes a static ``[:num_labeled]`` slice — XLA
needs static shapes and the layout is fixed by construction
(train.py:312-328 concatenates labeled before unlabeled).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import huber_loss, nn_distance, boxes_iou3d_paired_rows
from .common import (
    FAR_THRESHOLD,
    GT_VOTE_FACTOR,
    NEAR_THRESHOLD,
    OBJECTNESS_CLS_WEIGHTS,
    cross_entropy,
    masked_mean,
)
from .iou_labels import compute_iou_labels, _gt_boxes


def compute_vote_loss(ep, batch, nl):
    """loss_helper_labeled.py:28-74."""
    seed_xyz = ep["seed_xyz"][:nl]
    vote_xyz = ep["vote_xyz"][:nl]
    seed_inds = ep["seed_inds"][:nl]
    bl, num_seed = seed_inds.shape

    gather = jax.vmap(lambda a, i: a[i])
    seed_gt_votes_mask = gather(batch["vote_label_mask"], seed_inds)  # (Bl, S)
    seed_gt_votes = gather(batch["vote_label"], seed_inds)  # (Bl, S, 9)
    seed_gt_votes = seed_gt_votes + jnp.tile(seed_xyz, (1, 1, 3))

    vote_xyz_r = vote_xyz.reshape(bl * num_seed, -1, 3)
    gt_votes_r = seed_gt_votes.reshape(bl * num_seed, GT_VOTE_FACTOR, 3)
    _, _, dist2, _ = nn_distance(vote_xyz_r, gt_votes_r, l1=True)
    votes_dist = jnp.min(dist2, axis=1).reshape(bl, num_seed)
    return masked_mean(votes_dist, seed_gt_votes_mask)


def compute_objectness_loss(ep, batch, nl):
    """loss_helper_labeled.py:77-123 (placeholder GT centers pushed to -1000)."""
    aggregated_vote_xyz = ep["aggregated_vote_xyz"][:nl]
    gt_center = batch["center_label"][..., 0:3]
    gt_center = jnp.where(batch["box_label_mask"][..., None] > 0, gt_center, -1000.0)

    dist1, ind1, _, _ = nn_distance(aggregated_vote_xyz, gt_center)
    euclid = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)
    objectness_mask = (
        (euclid < NEAR_THRESHOLD) | (euclid > FAR_THRESHOLD)
    ).astype(jnp.float32)

    loss = cross_entropy(
        ep["objectness_scores"][:nl], objectness_label, OBJECTNESS_CLS_WEIGHTS
    )
    loss = masked_mean(loss, objectness_mask)
    return loss, objectness_label, objectness_mask, ind1


def _box_and_sem_cls_losses(ep, batch, nl, cfg, object_assignment, objectness_label):
    """Shared center/heading/size/sem-cls losses
    (loss_helper_labeled.py:126-217; same math as loss_helper.py:115-193)."""
    nh, ns = cfg.num_heading_bin, cfg.num_size_cluster
    mean_size = jnp.asarray(cfg.mean_size_arr, dtype=jnp.float32)
    obj = objectness_label.astype(jnp.float32)
    take = jnp.take_along_axis
    m = {}

    dist1, _, dist2, _ = nn_distance(ep["center"][:nl], batch["center_label"][..., 0:3])
    center_loss = masked_mean(dist1, obj) + masked_mean(dist2, batch["box_label_mask"])

    heading_class_label = take(batch["heading_class_label"], object_assignment, axis=1)
    heading_cls_loss = masked_mean(
        cross_entropy(ep["heading_scores"][:nl], heading_class_label), obj
    )
    heading_residual_label = take(
        batch["heading_residual_label"], object_assignment, axis=1
    )
    hr_norm_label = heading_residual_label / (np.pi / nh)
    h_onehot = jax.nn.one_hot(heading_class_label, nh, dtype=jnp.float32)
    hr_pred = jnp.sum(ep["heading_residuals_normalized"][:nl] * h_onehot, axis=-1)
    heading_reg_loss = masked_mean(huber_loss(hr_pred - hr_norm_label, 1.0), obj)

    size_class_label = take(batch["size_class_label"], object_assignment, axis=1)
    size_cls_loss = masked_mean(
        cross_entropy(ep["size_scores"][:nl], size_class_label), obj
    )
    size_residual_label = take(
        batch["size_residual_label"], object_assignment[..., None], axis=1
    )
    s_onehot = jax.nn.one_hot(size_class_label, ns, dtype=jnp.float32)  # (B, K, NS)
    sr_pred = jnp.sum(
        ep["size_residuals_normalized"][:nl] * s_onehot[..., None], axis=2
    )  # (B, K, 3)
    mean_size_label = jnp.sum(s_onehot[..., None] * mean_size[None, None], axis=2)
    sr_label = size_residual_label / mean_size_label
    size_reg_loss = masked_mean(
        jnp.mean(huber_loss(sr_pred - sr_label, 1.0), axis=-1), obj
    )

    sem_cls_label = take(batch["sem_cls_label"], object_assignment, axis=1)
    sem_cls_loss = masked_mean(
        cross_entropy(ep["sem_cls_scores"][:nl], sem_cls_label), obj
    )
    m["cls_acc"] = masked_mean(
        (sem_cls_label == jnp.argmax(ep["sem_cls_scores"][:nl], -1)).astype(jnp.float32),
        obj,
    )
    return (
        center_loss, heading_cls_loss, heading_reg_loss,
        size_cls_loss, size_reg_loss, sem_cls_loss, sem_cls_label, m,
    )


def _jitter_iou_loss(ep, batch, nl, cfg, m):
    """Jittered-box IoU regression (loss_helper_labeled.py:232-279)."""
    jitter_center = ep["jitter_center"][:nl]
    jitter_size = ep["jitter_size"][:nl]
    jitter_heading = ep["jitter_heading"][:nl]
    bl, kj = jitter_heading.shape

    gt_bbox = _gt_boxes(batch, cfg)
    pred_bbox = jnp.concatenate(
        [jitter_center, jitter_size, -jitter_heading[..., None]], axis=-1
    )
    iou = boxes_iou3d_paired_rows(pred_bbox, gt_bbox)  # (Bl, Kj, G)
    jitter_iou_labels = jax.lax.stop_gradient(jnp.max(iou, axis=2))
    jitter_assignment = jnp.argmax(iou, axis=2)

    jitter_sem_cls = jnp.take_along_axis(
        batch["sem_cls_label"], jitter_assignment, axis=1
    )
    jitter_iou_pred = jax.nn.sigmoid(ep["iou_scores_jitter"][:nl])
    if jitter_iou_pred.shape[2] > 1:
        jitter_iou_pred = jnp.take_along_axis(
            jitter_iou_pred, jitter_sem_cls[..., None], axis=2
        )[..., 0]
    else:
        jitter_iou_pred = jitter_iou_pred[..., 0]

    err = jnp.abs(jitter_iou_pred - jitter_iou_labels)
    m["jitter_iou_acc"] = jnp.mean(err)
    m["jitter_iou_acc_obj"] = jnp.sum(err) / (bl * kj + 1e-6)
    loss = huber_loss(jitter_iou_pred - jitter_iou_labels, 1.0)
    return jnp.sum(loss) / (bl * kj + 1e-6)


def get_labeled_loss(ep, batch, cfg, num_labeled):
    """Returns (loss, metrics). Mirrors get_labeled_loss
    (loss_helper_labeled.py:300-370): total =
    (vote + 0.5*objectness + box + 0.1*sem_cls + iou + jitter_iou) * 10."""
    nl = num_labeled
    m = {}

    # Label arrays normally have exactly nl rows; under --view_stats the
    # unlabeled datasets also emit (raw-frame) labels and the SSL batcher
    # concatenates them — keep only the labeled rows here.
    label_keys = ("center_label", "box_label_mask", "heading_class_label",
                  "heading_residual_label", "size_class_label",
                  "size_residual_label", "sem_cls_label", "vote_label",
                  "vote_label_mask")
    batch = {
        k: (v[:nl] if k in label_keys else v) for k, v in batch.items()
    }

    vote_loss = compute_vote_loss(ep, batch, nl)
    m["vote_loss"] = vote_loss

    objectness_loss, objectness_label, objectness_mask, object_assignment = (
        compute_objectness_loss(ep, batch, nl)
    )
    m["objectness_loss"] = objectness_loss
    total_props = objectness_label.size
    m["pos_ratio"] = jnp.sum(objectness_label.astype(jnp.float32)) / total_props
    m["neg_ratio"] = jnp.sum(objectness_mask) / total_props - m["pos_ratio"]

    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss, _, m2) = _box_and_sem_cls_losses(
        ep, batch, nl, cfg, object_assignment, objectness_label
    )
    m.update(m2)
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

    # IoU-branch loss with rotated-IoU labels (loss_helper_labeled.py:219-295)
    iou_labels, _, iou_assignment = compute_iou_labels(
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
    m["obj_count"] = jnp.sum(obj_f)

    iou_pred = jax.nn.sigmoid(ep["iou_scores"][:nl])
    if iou_pred.shape[2] > 1:
        iou_sem_cls_label = jnp.take_along_axis(
            batch["sem_cls_label"], iou_assignment, axis=1
        )
        iou_pred = jnp.take_along_axis(iou_pred, iou_sem_cls_label[..., None], axis=2)[..., 0]
    else:
        iou_pred = iou_pred[..., 0]
    iou_err = jnp.abs(iou_pred - iou_labels)
    m["iou_acc"] = jnp.mean(iou_err)
    m["iou_acc_obj"] = masked_mean(iou_err, obj_f)
    iou_loss = jnp.mean(huber_loss(iou_pred - iou_labels, 1.0))  # unmasked mean
    m["iou_loss"] = iou_loss

    total = vote_loss + 0.5 * objectness_loss + box_loss + 0.1 * sem_cls_loss + iou_loss
    if "iou_scores_jitter" in ep:
        jitter_loss = _jitter_iou_loss(ep, batch, nl, cfg, m)
        m["jitter_iou_loss"] = jitter_loss
        total = total + jitter_loss
    total = total * 10.0
    m["detection_loss"] = total

    obj_pred = jnp.argmax(ep["objectness_scores"][:nl], axis=2)
    m["obj_acc"] = masked_mean(
        (obj_pred == objectness_label).astype(jnp.float32), objectness_mask
    )
    return total, m
