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
