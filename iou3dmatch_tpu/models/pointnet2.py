"""PointNet++ set-abstraction and feature-propagation modules.

TPU-native rebuild of `pointnet2/pointnet2_modules.py`
(PointnetSAModuleVotes `:169-277`, PointnetFPModule `:362-422`).

Channels-last throughout: grouped neighborhoods are (B, npoint, nsample, C)
so the shared MLP is a plain Dense on the last axis (MXU) and the pool is a
max over nsample (VPU) — XLA fuses the gather + MLP + max chain.
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    furthest_point_sample,
    ball_query,
    group_points,
    gather_points,
    three_nn,
    three_interpolate,
)
from .mlp import SharedMLP


class PointnetSAModuleVotes(nn.Module):
    """Set abstraction with vote support.

    Matches `PointnetSAModuleVotes.forward` (pointnet2_modules.py:215-277):
    FPS (or caller-provided inds) -> gather centers -> ball-query group with
    relative xyz (optionally normalized by radius) -> shared MLP -> max pool.
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = True
    # approx_min_k grouping: any in-radius subset is equivalent when a center
    # overflows nsample (the reference's pick is scan-order-arbitrary there);
    # ~6x faster on TPU at SA1 scale. Set True for CUDA-exact parity.
    exact_ball_query: bool = False

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: Optional[jax.Array],
        inds: Optional[jax.Array] = None,
        *,
        train: bool,
        momentum=0.1,
    ):
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds)  # (B, npoint, 3)

        idx = ball_query(self.radius, self.nsample, xyz, new_xyz,
                         exact=self.exact_ball_query)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius

        if features is not None:
            grouped_features = group_points(features, idx)
            if self.use_xyz:
                # xyz channels FIRST (QueryAndGroup, pointnet2_utils.py:364-369)
                grouped = jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
            else:
                grouped = grouped_features
        else:
            grouped = grouped_xyz

        mlp_spec = list(self.mlp)
        if self.use_xyz and len(mlp_spec) > 0:
            mlp_spec[0] += 3
        h = SharedMLP(mlp_spec[1:], name="mlp")(grouped, train=train, momentum=momentum)
        pooled = jnp.max(h, axis=2)  # (B, npoint, C)
        return new_xyz, pooled, inds


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP.

    Matches `PointnetFPModule.forward` (pointnet2_modules.py:377-422);
    channel concat order is [interpolated, skip].
    """

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        unknown: jax.Array,
        known: jax.Array,
        unknown_feats: Optional[jax.Array],
        known_feats: jax.Array,
        *,
        train: bool,
        momentum=0.1,
    ):
        dist, idx = three_nn(unknown, known)
        dist_recip = 1.0 / (dist + 1e-8)
        norm = jnp.sum(dist_recip, axis=2, keepdims=True)
        weight = dist_recip / norm
        interpolated = three_interpolate(known_feats, idx, weight)

        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated
        return SharedMLP(self.mlp[1:], name="mlp")(
            new_features, train=train, momentum=momentum
        )
