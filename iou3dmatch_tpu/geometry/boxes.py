"""Box corner math and frame conversions.

Mirrors `utils/box_util.py` (rotz/roty/rot_gpu/get_3d_box[_batch]) and
`models/ap_helper.py:28-41` (flip_axis_to_camera/depth). NumPy variants are
used on the host-side eval path; jnp variants inside jitted graphs.
"""
import jax
import jax.numpy as jnp
import numpy as np


def rotz(t):
    """NumPy z-rotation matrix (utils/box_util.py:256-263)."""
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def rot_gpu(t: jax.Array) -> jax.Array:
    """Batched upright-axis rotation matrices, (...,) -> (..., 3, 3).

    Matches `rot_gpu` (utils/box_util.py:292-306): R = [[c, s, 0],
    [-s, c, 0], [0, 0, 1]]; callers multiply by R^T to rotate points CCW.
    """
    c, s = jnp.cos(t), jnp.sin(t)
    z = jnp.zeros_like(t)
    o = jnp.ones_like(t)
    return jnp.stack(
        [
            jnp.stack([c, s, z], -1),
            jnp.stack([-s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )


def roty_batch_np(t):
    """utils/box_util.py:275-289."""
    out = np.zeros(tuple(list(t.shape) + [3, 3]))
    c, s = np.cos(t), np.sin(t)
    out[..., 0, 0] = c
    out[..., 0, 2] = s
    out[..., 1, 1] = 1
    out[..., 2, 0] = -s
    out[..., 2, 2] = c
    return out


def get_3d_box_np(box_size, heading_angle, center):
    """Single-box upright-camera corners, (8, 3) (utils/box_util.py:335-358)."""
    R = roty_batch_np(np.asarray(heading_angle))
    l, w, h = box_size[0], box_size[1], box_size[2]
    x = np.array([l, l, -l, -l, l, l, -l, -l]) / 2.0
    y = np.array([h, h, h, h, -h, -h, -h, -h]) / 2.0
    z = np.array([w, -w, -w, w, w, -w, -w, w]) / 2.0
    corners = np.stack([x, y, z], axis=-1) @ R.T
    return corners + np.asarray(center)


def get_3d_box_batch_np(box_size, heading_angle, center):
    """Batched corner generation in upright-camera frame.

    box_size: (..., 3), heading_angle: (...,), center: (..., 3)
    -> (..., 8, 3). Mirrors `get_3d_box_batch` (utils/box_util.py:361-381).
    """
    R = roty_batch_np(heading_angle)
    l = np.expand_dims(box_size[..., 0], -1)
    w = np.expand_dims(box_size[..., 1], -1)
    h = np.expand_dims(box_size[..., 2], -1)
    shape = list(heading_angle.shape) + [8, 3]
    corners = np.zeros(shape)
    corners[..., :, 0] = np.concatenate(
        (l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2), -1
    )
    corners[..., :, 1] = np.concatenate(
        (h / 2, h / 2, h / 2, h / 2, -h / 2, -h / 2, -h / 2, -h / 2), -1
    )
    corners[..., :, 2] = np.concatenate(
        (w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2), -1
    )
    tlist = list(range(len(heading_angle.shape))) + [
        len(heading_angle.shape) + 1,
        len(heading_angle.shape),
    ]
    corners = np.matmul(corners, np.transpose(R, tuple(tlist)))
    corners += np.expand_dims(center, -2)
    return corners


def flip_axis_to_camera(pc):
    """Depth (X-right, Y-fwd, Z-up) -> camera (X-right, Y-down, Z-fwd).

    Works on NumPy or jnp arrays (models/ap_helper.py:28-35).
    """
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    mod = jnp if isinstance(pc, jax.Array) else np
    return mod.stack([x, -z, y], axis=-1)


def flip_axis_to_depth(pc):
    """Inverse of flip_axis_to_camera (models/ap_helper.py:37-41)."""
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    mod = jnp if isinstance(pc, jax.Array) else np
    return mod.stack([x, z, -y], axis=-1)


def roty_np(t):
    """Scalar y-rotation matrix (utils/box_util.py:266-272)."""
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def get_3d_box_depth_np(box_size, heading_angle, center):
    """Single-box corners in the DEPTH frame (z up, heading about z),
    (8, 3) (utils/box_util.py:309-332)."""
    R = rotz(heading_angle)
    l, w, h = box_size[0], box_size[1], box_size[2]
    x = np.array([l, l, -l, -l, l, l, -l, -l]) / 2.0
    y = np.array([w, -w, -w, w, w, -w, -w, w]) / 2.0
    z = np.array([h, h, h, h, -h, -h, -h, -h]) / 2.0
    return (R @ np.vstack([x, y, z])).T + np.asarray(center)


def box3d_vol_batch_np(corners):
    """(n,8,3) corners -> (n,) edge-length products.

    NOTE: mirrors `box3d_vol_batch` (utils/box_util.py:98-104) which takes
    sqrt(norm(edge)) per side — i.e. it returns (l*w*h)**0.5 for a real
    cuboid, not the volume. Kept bit-compatible because `boxes3d_iou_batch`
    divides by these values; the correct volume is `box3d_vol` applied
    per row (eval/box3d_iou_np.py).
    """
    l = np.sqrt(np.linalg.norm(corners[:, 1, :] - corners[:, 2, :], axis=1))
    w = np.sqrt(np.linalg.norm(corners[:, 0, :] - corners[:, 1, :], axis=1))
    h = np.sqrt(np.linalg.norm(corners[:, 0, :] - corners[:, 4, :], axis=1))
    return l * w * h


def get_iou(bb1, bb2):
    """Axis-aligned 2D IoU of dict boxes {'x1','y1','x2','y2'}
    (utils/box_util.py:189-237)."""
    assert bb1["x1"] < bb1["x2"] and bb1["y1"] < bb1["y2"]
    assert bb2["x1"] < bb2["x2"] and bb2["y1"] < bb2["y2"]
    x_left = max(bb1["x1"], bb2["x1"])
    y_top = max(bb1["y1"], bb2["y1"])
    x_right = min(bb1["x2"], bb2["x2"])
    y_bottom = min(bb1["y2"], bb2["y2"])
    if x_right < x_left or y_bottom < y_top:
        return 0.0
    inter = (x_right - x_left) * (y_bottom - y_top)
    area1 = (bb1["x2"] - bb1["x1"]) * (bb1["y2"] - bb1["y1"])
    area2 = (bb2["x2"] - bb2["x1"]) * (bb2["y2"] - bb2["y1"])
    return inter / float(area1 + area2 - inter)


def box2d_iou(box1, box2):
    """(xmin,ymin,xmax,ymax) tuples -> IoU (utils/box_util.py:240-250)."""
    return get_iou(
        {"x1": box1[0], "y1": box1[1], "x2": box1[2], "y2": box1[3]},
        {"x1": box2[0], "y1": box2[1], "x2": box2[2], "y2": box2[3]},
    )


def box3d_iou_batch_np(corners1, corners2):
    """Paired AXIS-ALIGNED IoU over (..., 8, 3) corner arrays -> (...,)
    (utils/box_util.py:384-411; the torch twin `box3d_iou_gpu_axis_aligned`
    :413-439 is `geometry.iou3d.box3d_iou_axis_aligned`)."""
    max_a = np.max(corners1, axis=-2)
    max_b = np.max(corners2, axis=-2)
    min_a = np.min(corners1, axis=-2)
    min_b = np.min(corners2, axis=-2)
    vol_a = (max_a - min_a).prod(axis=-1)
    vol_b = (max_b - min_b).prod(axis=-1)
    inter = np.clip(np.minimum(max_a, max_b) - np.maximum(min_a, min_b),
                    0, None).prod(axis=-1)
    return inter / (vol_a + vol_b - inter + 1e-8)


def corners3d_to_parameter(corners_3d):
    """(8,3) upright-camera corners -> (7,) depth-frame box params
    [cx,cy,cz,l,w,h,heading] (utils/box_util.py:442-469)."""
    center = 0.5 * (corners_3d.max(0) + corners_3d.min(0))
    x_side = corners_3d[0] - corners_3d[3]
    y_side = corners_3d[0] - corners_3d[4]
    z_side = corners_3d[0] - corners_3d[1]
    l = np.linalg.norm(x_side)
    w = np.linalg.norm(z_side)
    h = np.linalg.norm(y_side)
    heading_angle = np.arccos(x_side[0] / l)
    return np.concatenate([
        [center[0], center[2], -center[1]], [l, w, h], [heading_angle]])


def check_valid_corners3d(corners_3d):
    """True iff the (8,3) corners form a (non-degenerate) rectangular cuboid
    within the reference's tolerances (utils/box_util.py:472-521: parallel
    edge groups equal to 2 decimals, corner edges perpendicular to 1
    decimal, and not an all-zero box)."""
    c = np.asarray(corners_3d, dtype=float)
    x_lines = np.stack([c[0] - c[3], c[1] - c[2], c[4] - c[7], c[5] - c[6]])
    y_lines = np.stack([c[0] - c[4], c[1] - c[5], c[3] - c[7], c[2] - c[6]])
    z_lines = np.stack([c[0] - c[1], c[4] - c[5], c[3] - c[2], c[7] - c[6]])
    lengths = np.stack([
        np.linalg.norm(x_lines, axis=1),
        np.linalg.norm(y_lines, axis=1),
        np.linalg.norm(z_lines, axis=1),
    ], axis=1)  # (4, 3)
    # npt.assert_almost_equal(decimal=d) tolerance is 1.5 * 10**-d
    if np.all(np.abs(lengths[0]) < 1.5e-1):
        return False  # degenerate near-zero box
    for i in range(4):
        for j in range(i + 1, 4):
            if not np.all(np.abs(lengths[i] - lengths[j]) < 1.5e-2):
                return False
    e_y, e_z, e_x = c[0] - c[4], c[0] - c[1], c[0] - c[3]
    for a, b in ((e_y, e_z), (e_y, e_x), (e_z, e_x)):
        if not abs(a @ b) < 1.5e-1:
            return False
    return True


def corners_aabb(center, size, heading):
    """Axis-aligned bounds of rotated boxes in the depth frame.

    center/size: (..., 3), heading: (...,) -> (mins (..., 3), maxs (..., 3)).
    Because the rotation is about z, the AABB is center +/- the rotated
    half-extent envelope. Used by the on-device pseudo-label LHS path, where
    the reference computes camera-frame corner AABBs host-side
    (`models/loss_helper_unlabeled.py:441-490`) — an axis permutation that
    leaves AABB IoU invariant.
    """
    hx = size[..., 0] * 0.5
    hy = size[..., 1] * 0.5
    hz = size[..., 2] * 0.5
    c = jnp.abs(jnp.cos(heading))
    s = jnp.abs(jnp.sin(heading))
    ex = hx * c + hy * s
    ey = hx * s + hy * c
    half = jnp.stack([ex, ey, hz], axis=-1)
    return center - half, center + half
