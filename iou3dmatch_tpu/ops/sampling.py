"""Gather points by index.

Reference: `pointnet2/_ext_src/src/sampling_gpu.cu:13-62` (gather_points and
its scatter-add backward), wrapped by `pointnet2_utils.GatherOperation`
(pointnet2/pointnet2_utils.py:84-118).

In JAX this is a plain vmapped gather; autodiff provides the scatter-add
backward deterministically (no atomics on TPU).
"""
import jax


def gather_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """features: (B, N, C) channels-last, idx: (B, m) int -> (B, m, C)."""
    return jax.vmap(lambda f, i: f[i])(features, idx)
