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
import jax
import jax.numpy as jnp


@jax.jit
def three_nn(unknown: jax.Array, known: jax.Array):
    """unknown: (B, n, 3), known: (B, m, 3) ->
    (dist (B, n, 3) float32 sqrt distances, idx (B, n, 3) int32).

    TPU note: lax.top_k lowers to a per-row sort — for GridConv-scale inputs
    (16k x 1k) that is the dominant cost. Exact top-3 by three argmin
    passes (argmin keeps the first occurrence, matching the CUDA in-order
    scan) is a handful of VPU passes instead.
    """
    unknown = unknown.astype(jnp.float32)
    known = known.astype(jnp.float32)

    def per_scene(u, k):
        # |u - k|^2 = |u|^2 + |k|^2 - 2 u.k; cross term on the MXU.
        cross = jax.lax.dot_general(
            u, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (n, m)
        d2 = (
            jnp.sum(u * u, axis=-1)[:, None]
            + jnp.sum(k * k, axis=-1)[None, :]
            - 2.0 * cross
        )
        d2 = jnp.maximum(d2, 0.0)  # guard tiny negatives from fp cancellation
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        idxs = []
        for _ in range(3):
            i = jnp.argmin(d2, axis=1).astype(jnp.int32)  # first occurrence
            idxs.append(i)
            d2 = jnp.where(col == i[:, None], jnp.inf, d2)
        idx = jnp.stack(idxs, axis=1)  # (n, 3)
        # Exact distances for the 3 selected neighbors (the matmul form has
        # fp cancellation; the CUDA kernel computes (u-k)^2 directly).
        sel = k[idx]  # (n, 3, 3)
        d_exact = jnp.sum((u[:, None, :] - sel) ** 2, axis=-1)
        return jnp.sqrt(d_exact), idx

    return jax.vmap(per_scene)(unknown, known)


@jax.custom_vjp
def three_interpolate(
    features: jax.Array, idx: jax.Array, weight: jax.Array
) -> jax.Array:
    """features: (B, m, C) channels-last, idx: (B, n, 3) int,
    weight: (B, n, 3) -> (B, n, C).

    Differentiable w.r.t. ``features`` only, like the reference backward
    (interpolate_gpu.cu:121-148); the custom VJP uses the one-hot matmul
    segment-sum (ops/scatter.py) instead of TPU scatter-add.
    """

    def per_scene(f, i, w):
        g = f[i]  # (n, 3, C)
        return jnp.sum(g * w[:, :, None], axis=1)

    return jax.vmap(per_scene)(features, idx, weight)


def _interp_fwd(features, idx, weight):
    return three_interpolate(features, idx, weight), (
        idx, weight, features.shape[1]
    )


def _interp_bwd(res, g):
    from .scatter import batched_onehot_segment_sum

    idx, weight, m = res
    b, n, c = g.shape
    # updates for slot (n, k): g[n] * weight[n, k]
    upd = (g[:, :, None, :] * weight[..., None]).reshape(b, n * 3, c)
    flat_idx = idx.reshape(b, n * 3).astype(jnp.int32)
    grad_features = batched_onehot_segment_sum(flat_idx, upd, m)
    return grad_features, None, None


three_interpolate.defvjp(_interp_fwd, _interp_bwd)
