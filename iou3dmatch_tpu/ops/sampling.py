"""Gather points by index.

Reference: `pointnet2/_ext_src/src/sampling_gpu.cu:13-62` (gather_points and
its scatter-add backward), wrapped by `pointnet2_utils.GatherOperation`
(pointnet2/pointnet2_utils.py:84-118).

The forward is a plain vmapped gather. The backward is NOT left to autodiff:
XLA lowers a gather transpose to scatter-add, which serializes on TPU —
instead a custom VJP computes it as chunked one-hot matmuls on the MXU
(ops/scatter.py). Numerically identical (sum over duplicate indices).
"""
from functools import partial

import jax
import jax.numpy as jnp

from .scatter import batched_onehot_segment_sum


@partial(jax.custom_vjp, nondiff_argnums=())
def gather_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """features: (B, N, C) channels-last, idx: (B, m) int -> (B, m, C).

    Out-of-range indices are CLAMPED to [0, N-1] — one contract on every
    path (XLA would wrap negatives, the Pallas kernel clamps; the clamp
    also keeps the one-hot VJP consistent with the forward's data flow)."""
    idx = jnp.clip(idx.astype(jnp.int32), 0, features.shape[1] - 1)
    return jax.vmap(lambda f, i: f[i])(features, idx)


def _gather_fwd(features, idx):
    return gather_points(features, idx), (idx, features.shape[1])


def _gather_bwd(res, g):
    idx, n = res
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)  # match the forward
    grad_features = batched_onehot_segment_sum(idx, g, n)
    return grad_features, None


gather_points.defvjp(_gather_fwd, _gather_bwd)
