"""Loss-function tests on hand-constructed end_points."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iou3dmatch_tpu.data.config import ScannetConfig, SunrgbdConfig
from iou3dmatch_tpu.losses import (
    get_loss, get_labeled_loss, get_unlabeled_loss, compute_iou_labels,
)
from iou3dmatch_tpu.losses.unlabeled import (
    get_pseudo_labels, trans_center, trans_size, trans_angle,
)
from iou3dmatch_tpu.geometry import boxes_iou3d

B, K, G, S, N = 2, 8, 4, 16, 64
NC = 18


def _mk_batch(rng, cfg, b=B):
    center = rng.uniform(-2, 2, (b, G, 3)).astype(np.float32)
    mask = np.ones((b, G), np.float32)
    mask[:, -1] = 0  # one padded slot
    return {
        "center_label": jnp.asarray(center),
        "box_label_mask": jnp.asarray(mask),
        "heading_class_label": jnp.zeros((b, G), jnp.int32),
        "heading_residual_label": jnp.zeros((b, G), jnp.float32),
        "size_class_label": jnp.asarray(rng.randint(0, cfg.num_size_cluster, (b, G))),
        "size_residual_label": jnp.asarray(
            rng.uniform(-0.05, 0.05, (b, G, 3)).astype(np.float32)
        ),
        "sem_cls_label": jnp.asarray(rng.randint(0, cfg.num_class, (b, G))),
        "vote_label": jnp.asarray(rng.randn(b, N, 9).astype(np.float32) * 0.1),
        "vote_label_mask": jnp.asarray(rng.randint(0, 2, (b, N)).astype(np.int32)),
    }


def _mk_ep(rng, cfg, batch, b=B, with_jitter=True, perfect=False):
    """Synthetic model outputs; if perfect, proposals sit exactly on GT."""
    ep = {
        "seed_xyz": jnp.asarray(rng.randn(b, S, 3).astype(np.float32)),
        "vote_xyz": jnp.asarray(rng.randn(b, S, 3).astype(np.float32)),
        "seed_inds": jnp.asarray(rng.randint(0, N, (b, S)).astype(np.int32)),
        "objectness_scores": jnp.asarray(rng.randn(b, K, 2).astype(np.float32)),
        "heading_scores": jnp.asarray(rng.randn(b, K, cfg.num_heading_bin).astype(np.float32)),
        "heading_residuals_normalized": jnp.asarray(
            rng.randn(b, K, cfg.num_heading_bin).astype(np.float32) * 0.1
        ),
        "size_scores": jnp.asarray(rng.randn(b, K, cfg.num_size_cluster).astype(np.float32)),
        "sem_cls_scores": jnp.asarray(rng.randn(b, K, cfg.num_class).astype(np.float32)),
        "iou_scores": jnp.asarray(rng.randn(b, K, cfg.num_class).astype(np.float32)),
    }
    ep["heading_residuals"] = ep["heading_residuals_normalized"] * (
        np.pi / cfg.num_heading_bin
    )
    srn = jnp.asarray(rng.randn(b, K, cfg.num_size_cluster, 3).astype(np.float32) * 0.05)
    ep["size_residuals_normalized"] = srn
    ep["size_residuals"] = srn * jnp.asarray(cfg.mean_size_arr, jnp.float32)[None, None]

    if perfect:
        reps = -(-K // G)
        centers = jnp.tile(batch["center_label"], (1, reps, 1))[:, :K]
        ep["center"] = centers
        ep["aggregated_vote_xyz"] = centers
        size_cls = jnp.tile(batch["size_class_label"], (1, reps))[:, :K]
        ep["size_scores"] = jax.nn.one_hot(size_cls, cfg.num_size_cluster) * 20.0
        size_res = jnp.tile(batch["size_residual_label"], (1, reps, 1))[:, :K]
        sr = jnp.zeros((b, K, cfg.num_size_cluster, 3)) + size_res[:, :, None, :]
        ep["size_residuals"] = sr
        ep["size_residuals_normalized"] = sr / jnp.asarray(
            cfg.mean_size_arr, jnp.float32
        )[None, None]
    else:
        ep["center"] = jnp.asarray(rng.uniform(-2, 2, (b, K, 3)).astype(np.float32))
        ep["aggregated_vote_xyz"] = ep["center"]

    if with_jitter:
        ep["iou_scores_jitter"] = jnp.asarray(rng.randn(b, K, cfg.num_class).astype(np.float32))
        ep["jitter_center"] = ep["center"] + 0.05
        sizes = jnp.asarray(cfg.mean_size_arr, jnp.float32)[
            jnp.argmax(ep["size_scores"], -1)
        ]
        ep["jitter_size"] = sizes
        ep["jitter_heading"] = jnp.zeros((b, K), jnp.float32)
    return ep


@pytest.fixture(scope="module")
def cfg():
    return ScannetConfig()


def test_compute_iou_labels_matches_direct_cross(cfg):
    rng = np.random.RandomState(0)
    batch = _mk_batch(rng, cfg)
    ep = _mk_ep(rng, cfg, batch, perfect=True)
    iou_labels, obj_label, assignment = compute_iou_labels(
        batch, ep["aggregated_vote_xyz"], ep["center"],
        ep["heading_scores"], ep["heading_residuals"],
        ep["size_scores"], ep["size_residuals"], cfg,
    )
    # perfect predictions: every proposal overlaps its GT exactly
    iou_np = np.asarray(iou_labels)
    assert (iou_np[:, : (K // G) * G].reshape(B, -1, G).max(-1) > 0.99).all()
    # objectness: proposals at GT centers are within NEAR_THRESHOLD
    assert np.asarray(obj_label).max() == 1

    # direct cross-check of the max against boxes_iou3d on row 0
    from iou3dmatch_tpu.losses.iou_labels import _gt_boxes, pred_boxes_from_scores
    gt = np.asarray(_gt_boxes(batch, cfg))
    pred = np.asarray(pred_boxes_from_scores(
        ep["center"], ep["heading_scores"], ep["heading_residuals"],
        ep["size_scores"], ep["size_residuals"], cfg,
    ))
    full = np.asarray(boxes_iou3d(jnp.asarray(pred[0]), jnp.asarray(gt[0])))
    np.testing.assert_allclose(iou_np[0], full.max(1), rtol=1e-4, atol=1e-5)


def test_labeled_loss_finite_and_perfect_center_small(cfg):
    rng = np.random.RandomState(1)
    batch = _mk_batch(rng, cfg)
    ep = _mk_ep(rng, cfg, batch, perfect=True)
    loss, m = get_labeled_loss(ep, batch, cfg, num_labeled=B)
    assert np.isfinite(float(loss))
    assert float(m["center_loss"]) < 1e-5  # perfect centers
    assert float(m["pos_ratio"]) > 0
    # total composition
    want = (
        m["vote_loss"] + 0.5 * m["objectness_loss"] + m["box_loss"]
        + 0.1 * m["sem_cls_loss"] + m["iou_loss"] + m["jitter_iou_loss"]
    ) * 10.0
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)


def test_eval_loss_runs(cfg):
    rng = np.random.RandomState(2)
    batch = _mk_batch(rng, cfg)
    ep = _mk_ep(rng, cfg, batch, with_jitter=False)
    loss, m = get_loss(ep, batch, cfg)
    assert np.isfinite(float(loss))
    assert "iou_acc" in m and "obj_acc" in m


def test_pseudo_label_filtering(cfg):
    rng = np.random.RandomState(3)
    batch = _mk_batch(rng, cfg, b=1)
    teacher = _mk_ep(rng, cfg, batch, b=1, with_jitter=False)
    # make proposal 0 super-confident, others not
    obj = np.full((1, K, 2), [5.0, -5.0], np.float32)
    obj[0, 0] = [-5.0, 5.0]
    teacher["objectness_scores"] = jnp.asarray(obj)
    sem = np.zeros((1, K, NC), np.float32)
    sem[0, :, 3] = 10.0
    teacher["sem_cls_scores"] = jnp.asarray(sem)
    iou = np.full((1, K, NC), -5.0, np.float32)
    iou[0, 0, 3] = 5.0  # sigmoid ~ 1 > 0.25
    teacher["iou_scores"] = jnp.asarray(iou)

    pseudo, m = get_pseudo_labels(teacher, cfg, 0.9, 0.9, 0.25, 0.25, use_lhs=True)
    mask = np.asarray(pseudo["unlabeled_box_label_mask"])
    assert mask.sum() == 1  # only the confident proposal survives
    # selected center corresponds to proposal 0
    sel = np.asarray(pseudo["unlabeled_center_label"])[0, mask[0] == 1]
    np.testing.assert_allclose(sel[0], np.asarray(teacher["center"])[0, 0], rtol=1e-5)
    # padded slots are at -1000
    padded = np.asarray(pseudo["unlabeled_center_label"])[0, mask[0] == 0]
    np.testing.assert_array_equal(padded, -1000.0)


def test_transforms():
    cfg = SunrgbdConfig()
    rng = np.random.RandomState(4)
    center = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    flip_x = jnp.asarray([1, 0])
    flip_y = jnp.asarray([0, 1])
    ang = rng.uniform(-0.5, 0.5, 2).astype(np.float32)
    rot_mat = jnp.asarray(
        np.stack([
            np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
            for a in ang
        ]).astype(np.float32)
    )
    scale = jnp.asarray(rng.uniform(0.9, 1.1, (2, 1, 3)).astype(np.float32))
    out = np.asarray(trans_center(center, flip_x, flip_y, rot_mat, scale))
    c = np.asarray(center).copy()
    c[0, :, 0] *= -1
    c[1, :, 1] *= -1
    want = np.einsum("bkc,bdc->bkd", c, np.asarray(rot_mat)) * np.asarray(scale)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    # size round trip: scale=1 -> identity
    size_cls = jnp.asarray(rng.randint(0, 10, (2, 5)))
    size_res = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32) * 0.1)
    one = jnp.ones((2, 1, 3))
    np.testing.assert_allclose(
        np.asarray(trans_size(size_cls, size_res, one, cfg)),
        np.asarray(size_res), rtol=1e-5, atol=1e-6,
    )

    # angle: no flips, no rotation -> same bin/residual
    acls = jnp.asarray(rng.randint(0, 12, (2, 5)))
    ares = jnp.asarray(rng.uniform(-0.2, 0.2, (2, 5)).astype(np.float32))
    zero = jnp.zeros((2,))
    ncls, nres = trans_angle(acls, ares, zero, zero, zero, cfg)
    np.testing.assert_array_equal(np.asarray(ncls), np.asarray(acls))
    np.testing.assert_allclose(np.asarray(nres), np.asarray(ares), rtol=1e-4, atol=1e-5)


def test_unlabeled_loss_end_to_end(cfg):
    rng = np.random.RandomState(5)
    nl = 1
    batch = _mk_batch(rng, cfg, b=nl)  # labels only for labeled rows
    batch["flip_x_axis"] = jnp.asarray([0, 1])
    batch["flip_y_axis"] = jnp.asarray([1, 0])
    batch["rot_mat"] = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    batch["rot_angle"] = jnp.zeros((B,), jnp.float32)
    batch["scale"] = jnp.ones((B, 1, 3), jnp.float32)

    full_batch_labels = _mk_batch(rng, cfg, b=B)
    ep = _mk_ep(rng, cfg, full_batch_labels, b=B, with_jitter=True)
    ema_ep = _mk_ep(rng, cfg, full_batch_labels, b=B, with_jitter=False)
    # confident teacher so some pseudo labels exist
    obj = np.full((B, K, 2), [-5.0, 5.0], np.float32)
    ema_ep["objectness_scores"] = jnp.asarray(obj)
    sem = np.zeros((B, K, NC), np.float32)
    sem[:, :, 2] = 10.0
    ema_ep["sem_cls_scores"] = jnp.asarray(sem)
    ema_ep["iou_scores"] = jnp.asarray(np.full((B, K, NC), 5.0, np.float32))

    loss, m = get_unlabeled_loss(ep, ema_ep, batch, cfg, num_labeled=nl)
    assert np.isfinite(float(loss))
    assert float(m["pseudo_gt_ratio"]) > 0
    want = (m["unlabeled_box_loss"] + 0.1 * m["unlabeled_sem_cls_loss"]) * 10.0
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)


def test_compute_iou_from_given_size(cfg):
    """Explicit-parameter IoU labels match compute_iou_labels on the same
    argmax-decoded boxes (loss_helper_iou.py:22-49)."""
    from iou3dmatch_tpu.losses.iou_labels import (
        compute_iou_from_given_size, pred_boxes_from_scores)

    rng = np.random.RandomState(1)
    batch = _mk_batch(rng, cfg)
    ep = _mk_ep(rng, cfg, batch, perfect=True)
    ref_iou, _, ref_assign = compute_iou_labels(
        batch, ep["aggregated_vote_xyz"], ep["center"],
        ep["heading_scores"], ep["heading_residuals"],
        ep["size_scores"], ep["size_residuals"], cfg,
    )
    pred = pred_boxes_from_scores(
        ep["center"], ep["heading_scores"], ep["heading_residuals"],
        ep["size_scores"], ep["size_residuals"], cfg,
    )
    iou, pred_bbox, assign = compute_iou_from_given_size(
        batch, pred[..., 0:3], pred[..., 3:6], -pred[..., 6], cfg)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(ref_iou),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(assign), np.asarray(ref_assign))
    np.testing.assert_allclose(np.asarray(pred_bbox), np.asarray(pred),
                               rtol=1e-6)
    # degenerate sizes are clamped to 1e-6, never <= 0
    iou0, bb0, _ = compute_iou_from_given_size(
        batch, pred[..., 0:3], jnp.zeros_like(pred[..., 3:6]),
        -pred[..., 6], cfg)
    assert np.asarray(bb0)[..., 3:6].min() > 0
    assert np.isfinite(np.asarray(iou0)).all()


def test_compute_iou_labels_axis_aligned(cfg):
    """Axis-aligned IoU labels: perfect zero-heading predictions give
    IoU ~1 at matched proposals; zero-IoU rows keep the original
    assignment (loss_helper_iou.py:115-152)."""
    from iou3dmatch_tpu.losses.iou_labels import compute_iou_labels_axis_aligned

    rng = np.random.RandomState(2)
    batch = _mk_batch(rng, cfg)
    ep = _mk_ep(rng, cfg, batch, perfect=True)
    origin = jnp.asarray(rng.randint(0, G, (B, K)))
    iou, zero_mask, assign, stats = compute_iou_labels_axis_aligned(
        batch, ep["aggregated_vote_xyz"], ep["center"],
        ep["size_scores"], ep["size_residuals"], origin, cfg)
    iou = np.asarray(iou)
    assert iou.shape == (B, K) and 0 <= iou.min() and iou.max() <= 1 + 1e-6
    if np.asarray(cfg.num_heading_bin) == 1:  # scannet: heading exactly 0
        assert (iou[:, : (K // G) * G].reshape(B, -1, G).max(-1) > 0.99).all()
    # zero-IoU proposals fall back to the origin assignment
    zm = np.asarray(zero_mask)
    np.testing.assert_array_equal(
        np.asarray(assign)[zm == 1], np.asarray(origin)[zm == 1])
    assert 0 <= float(stats["acc_pred_iou"]) <= 1


def test_reverse_trans_center_roundtrip():
    """reverse_trans_center inverts trans_center
    (loss_helper_unlabeled.py:24-36,67-79)."""
    from iou3dmatch_tpu.losses.unlabeled import (
        reverse_trans_center, trans_center)

    rng = np.random.RandomState(5)
    center = jnp.asarray(rng.randn(2, 6, 3).astype(np.float32))
    flip_x = jnp.asarray([1, 0])
    flip_y = jnp.asarray([0, 1])
    ang = rng.uniform(-0.5, 0.5, 2)
    rot_mat = jnp.asarray(np.stack([
        np.array([[np.cos(a), -np.sin(a), 0],
                  [np.sin(a), np.cos(a), 0], [0, 0, 1]]) for a in ang
    ]).astype(np.float32))
    # isotropic per-scene scale, like the datasets' global scale augment
    # (anisotropic scale would not commute with the rotation)
    scale = jnp.asarray(
        np.tile(rng.uniform(0.9, 1.1, (2, 1, 1)), (1, 1, 3)).astype(np.float32))
    # no flips: exact inverse (c @ R^T * s) @ R / s == c
    zero = jnp.zeros((2,))
    fwd = trans_center(center, zero, zero, rot_mat, scale)
    back = reverse_trans_center(fwd, zero, zero, rot_mat, scale)
    np.testing.assert_allclose(np.asarray(back), np.asarray(center),
                               rtol=1e-4, atol=1e-5)
    # flips with identity rotation: also an exact inverse (reference applies
    # flips BEFORE the rotation in both directions, so flips only commute
    # out with R == I)
    eye = jnp.tile(jnp.eye(3, dtype=jnp.float32), (2, 1, 1))
    fwd2 = trans_center(center, flip_x, flip_y, eye, scale)
    back2 = reverse_trans_center(fwd2, flip_x, flip_y, eye, scale)
    np.testing.assert_allclose(np.asarray(back2), np.asarray(center),
                               rtol=1e-4, atol=1e-5)


def test_compute_objectness_gt(cfg):
    """Cheating objectness diagnostics (loss_helper_unlabeled.py:82-135):
    aggregated votes at GT centers -> label 1 and near-perfect accuracy
    when scores agree."""
    from iou3dmatch_tpu.losses.unlabeled import compute_objectness_gt

    rng = np.random.RandomState(6)
    batch = _mk_batch(rng, cfg)
    gt_labels = {k: v for k, v in batch.items()}
    centers = np.asarray(batch["center_label"])  # (B, G, 3)
    # proposals: first G sit on GT centers, rest far away
    agg = np.full((B, K, 3), 40.0, np.float32)
    agg[:, :G] = centers
    scores = np.zeros((B, K, 2), np.float32)
    scores[:, :G - 1, 1] = 5.0  # objects -> positive
    scores[:, G - 1:, 0] = 5.0  # masked-GT slot + far -> negative
    ep = {
        "aggregated_vote_xyz": jnp.asarray(np.concatenate([agg, agg])),
        "objectness_scores": jnp.asarray(np.concatenate([scores, scores])),
    }
    loss, label, mask, assign, stats = compute_objectness_gt(ep, gt_labels, B)
    label = np.asarray(label)
    # masked GT slot G-1 centers go to -1000 -> its proposal is NOT near
    assert label.shape == (B, K)
    assert (label[:, : G - 1] == 1).all() and (label[:, G:] == 0).all()
    assert float(stats["true_unlabeled_obj_acc"]) > 0.99
    assert np.isfinite(float(loss))
