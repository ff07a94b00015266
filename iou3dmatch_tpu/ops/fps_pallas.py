"""Pallas TPU kernel for furthest point sampling.

Same semantics as ops/fps.furthest_point_sample (reference CUDA kernel
pointnet2/_ext_src/src/sampling_gpu.cu:75-178: seed index 0, skip points
with |p|^2 <= 1e-3, first-occurrence argmax tie-break), but keeps the whole
working set — x/y/z rows and the running min-distance array — pinned in VMEM
across all ``npoint`` iterations instead of streaming from HBM each step.

Layout: coordinates are pre-transposed and padded to (3, 8, N/8) so every
per-iteration op is a full-width (8, N/8) VPU op; padding is zeros, which the
|p|^2 <= 1e-3 rule already excludes from candidacy. One grid step per scene.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAG_EPS = 1e-3
_SUBLANES = 8
_LANES = 128


def _fps_kernel(npoint, n8, xyz_ref, idx_ref, mind_ref):
    """xyz_ref: (1, 3, 8, n8) f32 block; idx_ref: (1, 1, npoint) i32 out in
    SMEM (TPU forbids scalar stores to VMEM); mind_ref: (8, n8) scratch.

    Mosaic cannot do dynamic-lane scalar loads from VMEM, so the selected
    point's coordinates are extracted with a masked reduction over a
    position iota, and "first-occurrence argmax" is max + min-position —
    both full-width VPU ops, no relayouts.
    """
    x = xyz_ref[0, 0]
    y = xyz_ref[0, 1]
    z = xyz_ref[0, 2]
    valid = (x * x + y * y + z * z) > _MAG_EPS
    # Flat scan-order position of each element (row-major over (8, n8)).
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n8), 0) * n8
        + jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n8), 1)
    )
    mind_ref[:, :] = jnp.full((_SUBLANES, n8), 1e10, dtype=jnp.float32)
    idx_ref[0, 0, 0] = 0

    def body(j, old):
        sel = pos == old
        px = jnp.sum(jnp.where(sel, x, 0.0))
        py = jnp.sum(jnp.where(sel, y, 0.0))
        pz = jnp.sum(jnp.where(sel, z, 0.0))
        dx = x - px
        dy = y - py
        dz = z - pz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.where(valid, jnp.minimum(mind_ref[:, :], d), 1e10)
        mind_ref[:, :] = mind
        cand = jnp.where(valid, mind, -1.0)
        best_val = jnp.max(cand)
        best = jnp.min(jnp.where(cand == best_val, pos, jnp.int32(2**31 - 1)))
        best = best.astype(jnp.int32)
        idx_ref[0, 0, j] = best
        return best

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


@partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample_pallas(xyz: jax.Array, npoint: int,
                                 interpret: bool = False) -> jax.Array:
    """Batched FPS via a Pallas kernel. xyz: (B, N, 3) -> (B, npoint) int32.

    Drop-in replacement for ops.fps.furthest_point_sample; pass
    ``interpret=True`` to run on CPU for testing.
    """
    b, n, _ = xyz.shape
    block = _SUBLANES * _LANES
    n_pad = -(-n // block) * block
    n8 = n_pad // _SUBLANES
    xyz = xyz.astype(jnp.float32)
    if n_pad != n:
        xyz = jnp.concatenate(
            [xyz, jnp.zeros((b, n_pad - n, 3), jnp.float32)], axis=1
        )
    # (B, N, 3) -> (B, 3, 8, N/8): row-major flatten preserves scan order.
    xyz_t = xyz.transpose(0, 2, 1).reshape(b, 3, _SUBLANES, n8)

    out = pl.pallas_call(
        partial(_fps_kernel, npoint, n8),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, _SUBLANES, n8), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_SUBLANES, n8), jnp.float32)],
        interpret=interpret,
    )(xyz_t)
    return out[:, 0, :]
