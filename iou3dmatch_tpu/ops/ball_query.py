"""Ball query and grouping.

Semantics mirror the reference CUDA kernels:

- ``ball_query`` (`pointnet2/_ext_src/src/ball_query_gpu.cu:14-58`): for each
  query center, the indices of the FIRST ``nsample`` points (in input scan
  order, not by distance) whose squared distance is strictly < radius^2.
  When the first in-radius point is found, all ``nsample`` slots are
  pre-filled with its index, so centers with fewer than ``nsample`` neighbors
  repeat the first neighbor. Centers with zero neighbors keep index 0
  (the output buffer is zero-initialized). Non-differentiable, int32 output.

- ``group_points`` (`group_points_gpu.cu:13-79`): a plain gather
  (B,N,C) x (B,m,ns) -> (B,m,ns,C) (channels-last here), differentiable
  w.r.t. features (the scatter-add backward falls out of autodiff).

TPU-first design: the (m, N) distance matrix for SA1 (2048 x 40960) would be
~320 MB/scene, so we stream over N in chunks with ``lax.scan``. The
first-found ordering is realized with a running per-center neighbor count and
an in-chunk cumulative sum: the k-th in-radius point lands in slot k via a
fixed-shape scatter. All shapes static.
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0, 1, 4))
def ball_query(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    chunk: int = 4096,
) -> jax.Array:
    """xyz: (B, N, 3) candidates; new_xyz: (B, m, 3) centers.

    Returns int32 (B, m, nsample) with reference first-found semantics.
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    r2 = jnp.float32(radius * radius)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    chunk = min(chunk, n)
    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    # Pad with +inf-distance sentinels so padded points never match.
    if pad:
        xyz_p = jnp.concatenate(
            [xyz, jnp.full((b, pad, 3), 1e18, dtype=jnp.float32)], axis=1
        )
    else:
        xyz_p = xyz
    xyz_chunks = xyz_p.reshape(b, nchunks, chunk, 3).transpose(1, 0, 2, 3)

    row_idx = jnp.broadcast_to(jnp.arange(m)[:, None], (m, chunk))

    def scan_body(carry, inp):
        cnt, out = carry  # cnt: (B, m) int32, out: (B, m, nsample) int32
        pts, base = inp  # pts: (B, chunk, 3), base: scalar global offset

        def per_scene(cnt_s, out_s, pts_s, centers_s):
            d2 = jnp.sum(
                (centers_s[:, None, :] - pts_s[None, :, :]) ** 2, axis=-1
            )  # (m, chunk)
            mask = d2 < r2
            lrank = cnt_s[:, None] + jnp.cumsum(
                mask.astype(jnp.int32), axis=1
            )  # 1-based rank of each hit
            kglob = (base + jnp.arange(chunk, dtype=jnp.int32))[None, :]
            slot = jnp.where(mask & (lrank <= nsample), lrank - 1, nsample)
            out_s = out_s.at[row_idx, slot].set(
                jnp.broadcast_to(kglob, (m, chunk)), mode="drop"
            )
            cnt_s = cnt_s + jnp.sum(mask, axis=1, dtype=jnp.int32)
            return cnt_s, out_s

        cnt, out = jax.vmap(per_scene)(cnt, out, pts, new_xyz)
        return (cnt, out), None

    cnt0 = jnp.zeros((b, m), dtype=jnp.int32)
    out0 = jnp.zeros((b, m, nsample), dtype=jnp.int32)
    bases = (jnp.arange(nchunks) * chunk).astype(jnp.int32)
    (cnt, out), _ = jax.lax.scan(scan_body, (cnt0, out0), (xyz_chunks, bases))

    # Slots past the found count repeat the first found index
    # (ball_query_gpu.cu:39-45); empty centers keep 0.
    first = out[:, :, :1]
    si = jnp.arange(nsample)[None, None, :]
    return jnp.where(si < jnp.maximum(cnt, 1)[:, :, None], out, first)


def group_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather feature groups. features: (B, N, C), idx: (B, m, ns) int ->
    (B, m, ns, C). Differentiable w.r.t. ``features`` only
    (`pointnet2_utils.GroupingOperation`, pointnet2/pointnet2_utils.py:210-258).
    """
    return jax.vmap(lambda f, i: f[i])(features, idx)
