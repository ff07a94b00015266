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


def uniform_resample_idx(idx: jax.Array, rng: jax.Array):
    """Deduplicate ball-query indices and refill with uniform draws.

    Fixed-shape rebuild of QueryAndGroup's ``sample_uniformly`` path
    (pointnet2/pointnet2_utils.py:337-347): per region, the unique indices
    (in first-occurrence order, like torch.unique on the already-sorted
    repeat-fill pattern the ball query emits) occupy the leading slots and
    the remaining ``nsample - unique`` slots are sampled uniformly from the
    unique set.

    Returns ``(new_idx, unique_cnt)`` with ``unique_cnt`` float32 ``(B, m)``
    (the reference keeps it as a float tensor).
    """
    ns = idx.shape[-1]
    # first-occurrence mask: slot j is unique iff no earlier slot holds the
    # same index (ns <= 64, so the (ns, ns) comparison is cheap)
    eq = idx[..., :, None] == idx[..., None, :]  # (B, m, ns, ns)
    earlier = jnp.tril(jnp.ones((ns, ns), bool), k=-1)
    is_dup = jnp.any(eq & earlier, axis=-1)  # (B, m, ns)
    unique_cnt = jnp.sum(~is_dup, axis=-1)  # (B, m) int
    # stable-compact the first occurrences to the front, preserving order
    order = jnp.argsort(is_dup.astype(jnp.int32), axis=-1, stable=True)
    compacted = jnp.take_along_axis(idx, order, axis=-1)
    # slots past the unique count draw uniformly from [0, unique_cnt)
    u = jax.random.uniform(rng, idx.shape)
    draw = jnp.floor(u * unique_cnt[..., None]).astype(jnp.int32)
    draw = jnp.minimum(draw, unique_cnt[..., None] - 1)
    slot = jnp.arange(ns, dtype=jnp.int32)
    pos = jnp.where(slot < unique_cnt[..., None], slot, draw)
    new_idx = jnp.take_along_axis(compacted, pos, axis=-1)
    return new_idx, unique_cnt.astype(jnp.float32)


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
    # 'max' | 'avg' | 'rbf' (pointnet2_modules.py:261-271); sigma defaults to
    # radius/2 like the reference __init__ (:197-198)
    pooling: str = "max"
    sigma: Optional[float] = None
    # QueryAndGroup(sample_uniformly=True[, ret_unique_cnt=True]) parity:
    # dedup the ball-query fill pattern and resample uniformly from the
    # unique in-ball points; needs an rng stream named 'grouping'.
    sample_uniformly: bool = False
    ret_unique_cnt: bool = False
    dtype: Optional[object] = None  # compute dtype for the shared MLP
    # approx_min_k grouping: any in-radius subset is equivalent when a center
    # overflows nsample (the reference's pick is scan-order-arbitrary there);
    # ~6x faster on TPU at SA1 scale. Set True for CUDA-exact parity.
    exact_ball_query: bool = False
    # bf16 packed gather with bitcast f32 xyz payload (see below). Only for
    # layers whose xyz is parameter-free (backbone); off by default.
    bitcast_gather: bool = False

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
        if isinstance(inds, str):
            if inds != "prefix":
                raise ValueError(f"unknown inds sentinel {inds!r}")
            # FPS re-run on an FPS-selection-ordered point set provably
            # re-selects the prefix in order (each p_i maximized min-distance
            # over a superset of the re-run's remaining set, and first-
            # occurrence tie-breaks stay consistent) — so when the caller
            # knows ``xyz`` is FPS-ordered, the kernel reduces to arange and
            # the center gather to a slice. Verified bit-identical to the
            # exact kernel on CPU and the TPU Pallas path for realistic
            # clouds (tests/test_ops.py::test_fps_prefix_property); the only
            # divergence regime is < npoint distinct valid points, which the
            # 40k-point scenes never hit.
            b = xyz.shape[0]
            inds = jnp.broadcast_to(
                jnp.arange(self.npoint, dtype=jnp.int32), (b, self.npoint)
            )
            new_xyz = xyz[:, : self.npoint]
        else:
            if inds is None:
                inds = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, inds)  # (B, npoint, 3)

        if self.ret_unique_cnt:
            assert self.sample_uniformly  # mirrors pointnet2_utils.py:315-316
        idx = ball_query(self.radius, self.nsample, xyz, new_xyz,
                         exact=self.exact_ball_query)
        unique_cnt = None
        if self.sample_uniformly:
            idx, unique_cnt = uniform_resample_idx(
                idx, self.make_rng("grouping"))
        # ONE packed gather for xyz+features: TPU gathers are row-rate bound
        # (~10 ns/row), so two separate 1.5M-row gathers at SA1 cost ~27 ms
        # per forward — packing halves the row count.
        fast = (
            self.bitcast_gather
            and self.dtype is not None
            and jnp.dtype(self.dtype) != jnp.float32
        )
        if features is not None and fast:
            # Row cost also grows ~11 ns/KB past the ~128 B floor, so halve
            # the row bytes: features travel as bf16 (bit-identical to the
            # cast SharedMLP would do anyway) and the f32 xyz rides along
            # BITCAST into 2 bf16 payload lanes per component — exact bits,
            # pure data movement (gather + slice only, no arithmetic).
            # Bitcast has no VJP, hence stop_gradient: only valid where the
            # coordinates are parameter-free (backbone SA layers — their
            # xyz derives from the input cloud via FPS gathers, so the
            # coordinate cotangent is identically zero at the parameters).
            # Vote aggregation (param-dependent vote_xyz) must NOT set
            # ``bitcast_gather``.
            b, n, _ = xyz.shape
            xyz16 = jax.lax.bitcast_convert_type(
                jax.lax.stop_gradient(xyz.astype(jnp.float32)), jnp.bfloat16
            ).reshape(b, n, 6)
            packed = jnp.concatenate(
                [xyz16, features.astype(jnp.bfloat16)], axis=-1
            )
            grouped_all = group_points(packed, idx)
            m, ns = grouped_all.shape[1:3]
            gxyz = jax.lax.bitcast_convert_type(
                grouped_all[..., :6].reshape(b, m, ns, 3, 2), jnp.float32
            )
            grouped_xyz = gxyz - new_xyz[:, :, None, :]
            grouped_features = grouped_all[..., 6:]
        elif features is not None:
            packed = jnp.concatenate([xyz, features], axis=-1)
            grouped_all = group_points(packed, idx)
            grouped_xyz = grouped_all[..., :3] - new_xyz[:, :, None, :]
            grouped_features = grouped_all[..., 3:]
        else:
            grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
            grouped_features = None
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius

        if grouped_features is not None:
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
        h = SharedMLP(mlp_spec[1:], name="mlp", dtype=self.dtype)(
            grouped, train=train, momentum=momentum)
        if self.pooling == "max":
            pooled = jnp.max(h, axis=2)  # (B, npoint, C)
        elif self.pooling == "avg":
            pooled = jnp.mean(h, axis=2)
        elif self.pooling == "rbf":
            # exp(-|gxyz|^2 / sigma^2 / 2) weighted sum / nsample, on the
            # grouper's (possibly radius-normalized) relative coordinates
            # (pointnet2_modules.py:267-271)
            sigma = self.radius / 2 if self.sigma is None else self.sigma
            rbf = jnp.exp(
                -jnp.sum(jnp.square(grouped_xyz.astype(h.dtype)), axis=-1)
                / (sigma ** 2) / 2
            )  # (B, npoint, nsample)
            pooled = jnp.sum(h * rbf[..., None], axis=2) / float(self.nsample)
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")
        if self.ret_unique_cnt:
            return new_xyz, pooled, inds, unique_cnt
        return new_xyz, pooled, inds


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP.

    Matches `PointnetFPModule.forward` (pointnet2_modules.py:377-422);
    channel concat order is [interpolated, skip].
    """

    mlp: Sequence[int]
    dtype: Optional[object] = None

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
        return SharedMLP(self.mlp[1:], name="mlp", dtype=self.dtype)(
            new_features, train=train, momentum=momentum
        )


class QueryAndGroup(nn.Module):
    """Standalone ball-query grouper (pointnet2_utils.QueryAndGroup,
    pointnet2/pointnet2_utils.py:295-377). Channels-last: returns
    (B, npoint, nsample, 3+C) instead of the reference's channels-first
    layout. ``sample_uniformly`` needs the 'grouping' rng stream."""

    radius: float
    nsample: int
    use_xyz: bool = True
    ret_grouped_xyz: bool = False
    normalize_xyz: bool = False
    sample_uniformly: bool = False
    ret_unique_cnt: bool = False
    exact_ball_query: bool = False

    @nn.compact
    def __call__(self, xyz, new_xyz, features=None):
        if self.ret_unique_cnt:
            assert self.sample_uniformly  # pointnet2_utils.py:315-316
        idx = ball_query(self.radius, self.nsample, xyz, new_xyz,
                         exact=self.exact_ball_query)
        unique_cnt = None
        if self.sample_uniformly:
            idx, unique_cnt = uniform_resample_idx(
                idx, self.make_rng("grouping"))

        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius

        if features is not None:
            grouped_features = group_points(features, idx)
            if self.use_xyz:
                new_features = jnp.concatenate(
                    [grouped_xyz, grouped_features], axis=-1)
            else:
                new_features = grouped_features
        else:
            assert self.use_xyz, \
                "Cannot have not features and not use xyz as a feature!"
            new_features = grouped_xyz

        ret = [new_features]
        if self.ret_grouped_xyz:
            ret.append(grouped_xyz)
        if self.ret_unique_cnt:
            ret.append(unique_cnt)
        return ret[0] if len(ret) == 1 else tuple(ret)


class GroupAll(nn.Module):
    """Group ALL points into one neighborhood (pointnet2_utils.GroupAll,
    pointnet2/pointnet2_utils.py:380-426): used by SA modules with
    npoint=None for a global feature."""

    use_xyz: bool = True

    def __call__(self, xyz, new_xyz, features=None):
        grouped_xyz = xyz[:, None, :, :]  # (B, 1, N, 3)
        if features is not None:
            if self.use_xyz:
                return jnp.concatenate([grouped_xyz, features[:, None]], axis=-1)
            return features[:, None]
        return grouped_xyz


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction
    (pointnet2_modules.py:83-130): one FPS, several (radius, nsample, mlp)
    scales, features concatenated across scales. npoint=None groups all
    points (global SA)."""

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    exact_ball_query: bool = False

    @nn.compact
    def __call__(self, xyz, features=None, *, train: bool, momentum=0.1):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        if self.npoint is not None:
            inds = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, inds)
        else:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)

        outs = []
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            if self.npoint is not None:
                idx = ball_query(radius, nsample, xyz, new_xyz,
                                 exact=self.exact_ball_query)
                grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
                if features is not None:
                    grouped_features = group_points(features, idx)
                    grouped = (
                        jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
                        if self.use_xyz else grouped_features
                    )
                else:
                    grouped = grouped_xyz
            else:
                grouped = GroupAll(self.use_xyz)(xyz, new_xyz, features)

            mlp_spec = list(mlp)
            if self.use_xyz and len(mlp_spec) > 0:
                mlp_spec[0] += 3
            h = SharedMLP(mlp_spec[1:], name=f"mlp{i}")(
                grouped, train=train, momentum=momentum)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetSAModuleMSGVotes(nn.Module):
    """Multi-scale-grouping SA that also returns (and accepts) the FPS
    indices, for vote lookup (pointnet2_modules.py:280-359): one FPS shared
    across scales, per-scale QueryAndGroup (optionally with uniform in-ball
    resampling) + MLP + max-pool, features concatenated across scales."""

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    sample_uniformly: bool = False
    exact_ball_query: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, *, train: bool,
                 momentum=0.1):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        if self.npoint is not None:
            if inds is None:
                inds = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, inds)
        else:
            new_xyz = None

        outs = []
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            if self.npoint is not None:
                idx = ball_query(radius, nsample, xyz, new_xyz,
                                 exact=self.exact_ball_query)
                if self.sample_uniformly:
                    idx, _ = uniform_resample_idx(
                        idx, self.make_rng("grouping"))
                grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
                if features is not None:
                    grouped_features = group_points(features, idx)
                    grouped = (
                        jnp.concatenate([grouped_xyz, grouped_features],
                                        axis=-1)
                        if self.use_xyz else grouped_features
                    )
                else:
                    grouped = grouped_xyz
            else:
                grouped = GroupAll(self.use_xyz)(xyz, new_xyz, features)

            mlp_spec = list(mlp)
            if self.use_xyz and len(mlp_spec) > 0:
                mlp_spec[0] += 3
            h = SharedMLP(mlp_spec[1:], name=f"mlp{i}", dtype=self.dtype)(
                grouped, train=train, momentum=momentum)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


def PointnetSAModule(*, mlp, npoint=None, radius=None, nsample=None,
                     use_xyz=True, **kwargs):
    """Single-scale SA (pointnet2_modules.py:133-166) — a one-scale MSG.
    Factory function (flax modules are frozen dataclasses)."""
    return PointnetSAModuleMSG(
        npoint=npoint, radii=(radius,), nsamples=(nsample,),
        mlps=(tuple(mlp),), use_xyz=use_xyz, **kwargs)


class PointnetLFPModuleMSG(nn.Module):
    """Learnable multi-scale feature propagation from xyz2 to xyz1
    (pointnet2_modules.py:425-503): group xyz2's features around xyz1
    points, per-scale MLP + max-pool, concat xyz1's own features, post-MLP.
    """

    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    post_mlp: Sequence[int]
    use_xyz: bool = True
    exact_ball_query: bool = False

    @nn.compact
    def __call__(self, xyz2, xyz1, features2, features1, *, train: bool,
                 momentum=0.1):
        outs = []
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            idx = ball_query(radius, nsample, xyz1, xyz2,
                             exact=self.exact_ball_query)
            grouped_xyz = group_points(xyz1, idx) - xyz2[:, :, None, :]
            if features1 is not None:
                grouped_features = group_points(features1, idx)
                grouped = (
                    jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
                    if self.use_xyz else grouped_features
                )
            else:
                grouped = grouped_xyz
            mlp_spec = list(mlp)
            if self.use_xyz and len(mlp_spec) > 0:
                mlp_spec[0] += 3
            h = SharedMLP(mlp_spec[1:], name=f"mlp{i}")(
                grouped, train=train, momentum=momentum)
            h = jnp.max(h, axis=2)  # (B, N2, C)
            if features2 is not None:
                h = jnp.concatenate([h, features2], axis=-1)
            h = SharedMLP(tuple(self.post_mlp[1:]), name=f"post_mlp{i}")(
                h, train=train, momentum=momentum)
            outs.append(h)
        return jnp.concatenate(outs, axis=-1)
