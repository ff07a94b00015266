"""Axis-aligned NMS family + lower-half suppression (LHS).

Host-side NumPy versions mirror `utils/nms.py:52-214` (used on the eval
path, exactly like the reference). `lhs_3d_samecls_jax` is the TPU-native
fixed-shape rewrite used inside the jitted SSL step, so pseudo-labeling never
leaves the device (the reference round-trips teacher boxes to the host,
`models/loss_helper_unlabeled.py:441-492`).
"""
import jax
import jax.numpy as jnp
import numpy as np


def _nms_loop(boxes, overlap_threshold, old_type, same_cls, lhs, area_eps):
    x1, y1, z1 = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    x2, y2, z2 = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    score = boxes[:, 6]
    cls = boxes[:, 7] if same_cls else None
    area = (x2 - x1) * (y2 - y1) * (z2 - z1) + area_eps

    order = np.argsort(score)
    pick = []
    while order.size != 0:
        i = order[-1]
        pick.append(i)
        rest = order[:-1]
        l = np.maximum(0, np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest]))
        w = np.maximum(0, np.minimum(y2[i], y2[rest]) - np.maximum(y1[i], y1[rest]))
        h = np.maximum(0, np.minimum(z2[i], z2[rest]) - np.maximum(z1[i], z1[rest]))
        inter = l * w * h
        if old_type:
            o = inter / area[rest]
        else:
            o = inter / (area[i] + area[rest] - inter)
        if same_cls:
            o = o * (cls[i] == cls[rest])
        inds = np.where(o > overlap_threshold)[0]
        if lhs:
            # keep the upper (higher-score) half of the suppressed cluster
            # (utils/nms.py:206-211)
            for count in range(len(inds) // 2):
                pick.append(rest[inds[len(inds) - count - 1]])
        order = np.delete(order, np.concatenate(([order.size - 1], inds)))
    return pick


def nms_crnr_dist(boxes, conf, overlap_threshold):
    """NMS by corner-distance similarity instead of IoU
    (utils/nms.py:215-230): boxes (n, 8, 3) camera-frame corners, conf (n,).
    Suppresses boxes whose `bbox_corner_dist_measure` to the current top
    box exceeds overlap_threshold."""
    from ..data.pc_util import bbox_corner_dist_measure

    boxes = np.asarray(boxes)
    order = np.argsort(np.asarray(conf))
    pick = []
    while order.size != 0:
        last = order.size
        i = order[-1]
        pick.append(int(i))
        scores = [bbox_corner_dist_measure(boxes[i], boxes[ind])
                  for ind in order[:-1]]
        order = np.delete(
            order,
            np.concatenate(([last - 1],
                            np.where(np.array(scores) > overlap_threshold)[0])))
    return pick


def nms_2d(boxes, overlap_threshold):
    """Plain (pairwise-loop) 2D NMS with intersection/area overlap; boxes
    (n, 5) [x1,y1,x2,y2,score] (utils/nms.py:20-49, sans its debug print).
    Equivalent to nms_2d_faster(old_type=True); kept for surface parity."""
    return nms_2d_faster(boxes, overlap_threshold, old_type=True)


def nms_2d_faster(boxes, overlap_threshold, old_type=False):
    """boxes: (n, 5) [x1,y1,x2,y2,score] (utils/nms.py:52-83)."""
    x1, y1, x2, y2, score = (boxes[:, k] for k in range(5))
    area = (x2 - x1) * (y2 - y1)
    order = np.argsort(score)
    pick = []
    while order.size != 0:
        i = order[-1]
        pick.append(i)
        rest = order[:-1]
        w = np.maximum(0, np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest]))
        h = np.maximum(0, np.minimum(y2[i], y2[rest]) - np.maximum(y1[i], y1[rest]))
        inter = w * h
        if old_type:
            o = inter / area[rest]
        else:
            o = inter / (area[i] + area[rest] - inter)
        order = np.delete(
            order, np.concatenate(([order.size - 1], np.where(o > overlap_threshold)[0]))
        )
    return pick


def nms_3d_faster(boxes, overlap_threshold, old_type=False):
    """boxes: (n, 7) [x1,y1,z1,x2,y2,z2,score] (utils/nms.py:86-122)."""
    return _nms_loop(boxes, overlap_threshold, old_type, False, False, 0.0)


def nms_3d_faster_samecls(boxes, overlap_threshold, old_type=False):
    """boxes: (n, 8) [...,score,cls] (utils/nms.py:125-165)."""
    return _nms_loop(boxes, overlap_threshold, old_type, True, False, 0.0)


def lhs_3d_faster_samecls(boxes, overlap_threshold, old_type=False):
    """Lower-half suppression (utils/nms.py:168-214). Note the +1e-8 area."""
    return _nms_loop(boxes, overlap_threshold, old_type, True, True, 1e-8)


def lhs_3d_samecls_jax(
    mins: jax.Array,
    maxs: jax.Array,
    scores: jax.Array,
    cls: jax.Array,
    thresh: float,
) -> jax.Array:
    """On-device LHS over K axis-aligned boxes; returns a bool keep mask (K,).

    Fixed-shape rewrite of `lhs_3d_faster_samecls`: at most K rounds of
    (pick max-score survivor, suppress same-class IoU>thresh, re-keep the
    higher-score half of the suppressed cluster). Score ties break toward
    the higher index, matching NumPy's stable ascending argsort read from
    the back.
    """
    k = scores.shape[0]
    dims = jnp.clip(maxs - mins, 0.0, None)
    area = jnp.prod(dims, axis=-1) + 1e-8
    idx = jnp.arange(k)

    # pairwise IoU (K, K), class-gated
    inter_min = jnp.maximum(mins[:, None, :], mins[None, :, :])
    inter_max = jnp.minimum(maxs[:, None, :], maxs[None, :, :])
    inter = jnp.prod(jnp.clip(inter_max - inter_min, 0.0, None), axis=-1)
    iou = inter / (area[:, None] + area[None, :] - inter)
    iou = iou * (cls[:, None] == cls[None, :])

    # descending-rank comparator with NumPy-argsort tie-breaking
    gt = (scores[:, None] < scores[None, :]) | (
        (scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :])
    )  # gt[a, b]: b ranks above a

    def body(_, carry):
        remaining, keep = carry
        any_left = jnp.any(remaining)
        sc = jnp.where(remaining, scores, -jnp.inf)
        # argmax with high-index tie-break (back of the ascending sort):
        # argmax over the reversed array picks the last maximum.
        i = k - 1 - jnp.argmax(sc[::-1])
        i_hot = idx == i
        supp = remaining & (iou[i] > thresh) & ~i_hot
        n_supp = jnp.sum(supp)
        # rank within the suppressed cluster, descending
        rank = jnp.sum(gt & supp[None, :], axis=1)  # per-box #cluster-boxes above
        keep_half = supp & (rank < n_supp // 2)
        new_keep = keep | (i_hot & any_left) | jnp.where(any_left, keep_half, False)
        new_remaining = remaining & ~supp & ~i_hot
        return jnp.where(any_left, new_remaining, remaining), new_keep

    remaining0 = jnp.ones((k,), dtype=bool)
    keep0 = jnp.zeros((k,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, k, body, (remaining0, keep0))
    return keep


def _nms_jax(iou: jax.Array, scores: jax.Array, thresh: float) -> jax.Array:
    """Greedy NMS over a precomputed (K, K) IoU matrix; bool keep mask.

    Fixed-shape masked loop (at most K rounds), first-max tie-break like the
    CUDA bitmask kernels' score-sorted scan order."""
    k = scores.shape[0]

    def body(_, carry):
        remaining, keep = carry
        any_left = jnp.any(remaining)
        sc = jnp.where(remaining, scores, -jnp.inf)
        i = jnp.argmax(sc)
        i_hot = jnp.arange(k) == i
        supp = remaining & (iou[i] > thresh) & ~i_hot
        new_keep = keep | (i_hot & any_left)
        new_remaining = remaining & ~supp & ~i_hot
        return jnp.where(any_left, new_remaining, remaining), new_keep

    remaining0 = jnp.ones((k,), dtype=bool)
    keep0 = jnp.zeros((k,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, k, body, (remaining0, keep0))
    return keep


def nms_rotated_jax(boxes: jax.Array, scores: jax.Array, thresh: float) -> jax.Array:
    """On-device rotated NMS on (K, 7) boxes; returns bool keep mask (K,).

    Equivalent of `nms_gpu` (iou3d_nms_utils.py:84-101 /
    iou3d_nms_kernel.cu:280-325), which suppresses by rotated BEV IoU.
    """
    from .iou3d import boxes_iou_bev

    return _nms_jax(boxes_iou_bev(boxes, boxes), scores, thresh)


def nms_normal_jax(boxes: jax.Array, scores: jax.Array, thresh: float) -> jax.Array:
    """On-device axis-aligned-BEV NMS on (K, 7) boxes (heading ignored);
    equivalent of `nms_normal_gpu` (iou3d_nms_utils.py:104-118 /
    iou3d_nms_kernel.cu:327-352, `iou_normal`)."""
    import jax.numpy as jnp

    xmin = boxes[:, 0] - boxes[:, 3] / 2
    xmax = boxes[:, 0] + boxes[:, 3] / 2
    ymin = boxes[:, 1] - boxes[:, 4] / 2
    ymax = boxes[:, 1] + boxes[:, 4] / 2
    ix = jnp.clip(
        jnp.minimum(xmax[:, None], xmax[None, :])
        - jnp.maximum(xmin[:, None], xmin[None, :]), 0.0, None)
    iy = jnp.clip(
        jnp.minimum(ymax[:, None], ymax[None, :])
        - jnp.maximum(ymin[:, None], ymin[None, :]), 0.0, None)
    inter = ix * iy
    area = boxes[:, 3] * boxes[:, 4]
    iou = inter / jnp.clip(area[:, None] + area[None, :] - inter, 1e-6, None)
    return _nms_jax(iou, scores, thresh)
