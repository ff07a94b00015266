"""Chamfer / nearest-neighbor distances and the Huber loss.

Mirrors `utils/nn_distance.py:16-216`. All dense, fixed-shape, fused by XLA.
"""
import jax
import jax.numpy as jnp


def huber_loss(error: jax.Array, delta: float = 1.0) -> jax.Array:
    """0.5|x|^2 if |x|<=d else 0.5 d^2 + d(|x|-d) (nn_distance.py:16-33)."""
    abs_error = jnp.abs(error)
    quadratic = jnp.clip(abs_error, None, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic**2 + delta * linear


def _pair_dist(pc1, pc2, l1smooth=False, delta=1.0, l1=False):
    diff = pc1[..., :, None, :] - pc2[..., None, :, :]  # (..., N, M, C)
    if l1smooth:
        return jnp.sum(huber_loss(diff, delta), axis=-1)
    if l1:
        return jnp.sum(jnp.abs(diff), axis=-1)
    return jnp.sum(diff * diff, axis=-1)


def nn_distance(pc1, pc2, l1smooth=False, delta=1.0, l1=False):
    """pc1: (B, N, C), pc2: (B, M, C) ->
    (dist1 (B,N), idx1 (B,N), dist2 (B,M), idx2 (B,M)).
    Mirrors `nn_distance` (utils/nn_distance.py:35-62)."""
    d = _pair_dist(pc1, pc2, l1smooth, delta, l1)
    dist1 = jnp.min(d, axis=-1)
    idx1 = jnp.argmin(d, axis=-1)
    dist2 = jnp.min(d, axis=-2)
    idx2 = jnp.argmin(d, axis=-2)
    return dist1, idx1, dist2, idx2


def nn_distance_withcls(pc1, pc2, cls1, cls2, l1smooth=False, delta=1.0, l1=False):
    """Distance with +1000 penalty across classes (nn_distance.py:144-178)."""
    d = _pair_dist(pc1, pc2, l1smooth, delta, l1)
    cls_mask = (cls1[..., :, None] != cls2[..., None, :]).astype(d.dtype) * 1000.0
    d = d + cls_mask
    dist1 = jnp.min(d, axis=-1)
    idx1 = jnp.argmin(d, axis=-1)
    dist2 = jnp.min(d, axis=-2)
    idx2 = jnp.argmin(d, axis=-2)
    return dist1, idx1, dist2, idx2


def _min_both(d):
    return (jnp.min(d, axis=-1), jnp.argmin(d, axis=-1),
            jnp.min(d, axis=-2), jnp.argmin(d, axis=-2))


def nn_distance_exclude_self(pc1, pc2, l1smooth=False, delta=1.0, l1=False):
    """Self-chamfer with the diagonal excluded (nn_distance.py:65-99): the
    reference overwrites diagonal pc2 entries with -1000 before differencing,
    so the diagonal distance becomes |p + 1000|-ish — reproduced exactly."""
    n = pc1.shape[-2]
    assert pc2.shape[-2] == n
    eye = jnp.eye(n, dtype=bool)
    pc2_mod = jnp.where(eye[None, :, :, None], -1000.0,
                        jnp.broadcast_to(pc2[..., None, :, :],
                                         pc2.shape[:-2] + (n, n, pc2.shape[-1])))
    diff = pc1[..., :, None, :] - pc2_mod
    if l1smooth:
        d = jnp.sum(huber_loss(diff, delta), axis=-1)
    elif l1:
        d = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        d = jnp.sum(diff * diff, axis=-1)
    return _min_both(d)


def nn_distance_exclude_self_with_cls(pc1, pc2, cls1, cls2, l1smooth=False,
                                      delta=1.0, l1=False):
    """Exclude-self chamfer + cross-class +1000 penalty
    (nn_distance.py:102-141)."""
    n = pc1.shape[-2]
    assert pc2.shape[-2] == n
    eye = jnp.eye(n, dtype=bool)
    pc2_mod = jnp.where(eye[None, :, :, None], -1000.0,
                        jnp.broadcast_to(pc2[..., None, :, :],
                                         pc2.shape[:-2] + (n, n, pc2.shape[-1])))
    diff = pc1[..., :, None, :] - pc2_mod
    if l1smooth:
        d = jnp.sum(huber_loss(diff, delta), axis=-1)
    elif l1:
        d = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        d = jnp.sum(diff * diff, axis=-1)
    cls_mask = (cls1[..., :, None] != cls2[..., None, :]).astype(d.dtype) * 1000.0
    return _min_both(d + cls_mask)


def nn_distance_inbox(pc1, seed, pc2, half_size, l1smooth=False, delta=1.0,
                      l1=False):
    """Chamfer with +1000 penalty when the SEED point lies outside the
    axis-aligned box around each pc2 target (nn_distance.py:181-216; used by
    the unsupervised vote-loss variant)."""
    d = _pair_dist(pc1, pc2, l1smooth, delta, l1)
    lower = pc2[..., None, :, :] - half_size[..., None, :, :]
    higher = pc2[..., None, :, :] + half_size[..., None, :, :]
    seed_t = seed[..., :, None, :]
    outside = (
        jnp.any(lower > seed_t, axis=-1) | jnp.any(higher < seed_t, axis=-1)
    ).astype(d.dtype) * 1000.0
    return _min_both(d + outside)
