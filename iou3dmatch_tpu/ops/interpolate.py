"""Three-nearest-neighbor search and inverse-distance feature interpolation.

Reference: `pointnet2/_ext_src/src/interpolate_gpu.cu:14-160`, wrapped by
`pointnet2_utils.ThreeNN` / `ThreeInterpolate`
(pointnet2/pointnet2_utils.py:121-207).

- ``three_nn`` returns sqrt distances and int32 indices of the 3 nearest
  "known" points for each "unknown" point (brute force O(n*m); ties resolved
  to the lowest index, matching the CUDA in-order scan). Non-differentiable.
- ``three_interpolate`` is a gather + weighted sum, differentiable w.r.t.
  features only (idx/weight are treated as constants, as in the reference
  backward, interpolate_gpu.cu:121-148).
"""
from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def three_nn(unknown: jax.Array, known: jax.Array):
    """unknown: (B, n, 3), known: (B, m, 3) ->
    (dist (B, n, 3) float32 sqrt distances, idx (B, n, 3) int32)."""
    unknown = unknown.astype(jnp.float32)
    known = known.astype(jnp.float32)

    def per_scene(u, k):
        d2 = jnp.sum((u[:, None, :] - k[None, :, :]) ** 2, axis=-1)  # (n, m)
        neg, idx = jax.lax.top_k(-d2, 3)
        return jnp.sqrt(-neg), idx.astype(jnp.int32)

    return jax.vmap(per_scene)(unknown, known)


def three_interpolate(
    features: jax.Array, idx: jax.Array, weight: jax.Array
) -> jax.Array:
    """features: (B, m, C) channels-last, idx: (B, n, 3) int,
    weight: (B, n, 3) -> (B, n, C)."""
    idx = jax.lax.stop_gradient(idx)
    weight = jax.lax.stop_gradient(weight)

    def per_scene(f, i, w):
        g = f[i]  # (n, 3, C)
        return jnp.sum(g * w[:, :, None], axis=1)

    return jax.vmap(per_scene)(features, idx, weight)
