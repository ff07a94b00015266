"""PointNet++ backbone.

Mirrors `models/backbone_module.py:21-133`: 4 single-scale-grouping SA layers
(2048/1024/512/256 points, radii 0.2/0.4/0.8/1.2, nsample 64/32/16/16, all
normalize_xyz) + 2 FP layers, seeds = fp2 (1024 points, 256-d features).

The SA point counts are configurable so tiny configs (CI / multi-chip
dry-runs) can shrink the model without touching the architecture.
"""
from typing import Optional, Sequence

import jax
from flax import linen as nn

from .pointnet2 import PointnetSAModuleVotes, PointnetFPModule


class Pointnet2Backbone(nn.Module):
    input_feature_dim: int = 0
    dtype: Optional[object] = None  # bf16 compute for the SA/FP MLPs
    sa_npoints: Sequence[int] = (2048, 1024, 512, 256)
    sa_radii: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    sa_nsamples: Sequence[int] = (64, 32, 16, 16)
    # SA2-4 inputs are FPS-selection-ordered, so their FPS provably reduces
    # to the arange prefix (see PointnetSAModuleVotes inds="prefix") — skip
    # the latency-bound kernel. Set False to force the exact kernels (only
    # diverges when a scene has fewer distinct valid points than npoint).
    fps_prefix: bool = True

    def setup(self):
        c_in = self.input_feature_dim
        self.sa1 = PointnetSAModuleVotes(
            npoint=self.sa_npoints[0], radius=self.sa_radii[0],
            nsample=self.sa_nsamples[0], dtype=self.dtype, mlp=(c_in, 64, 64, 128),
        )
        # sa2 keeps the f32 packed table (131 lanes): it dispatches to the
        # VMEM-resident Pallas gather, which beats the bf16 XLA gather even
        # at 2x the row bytes (126.1 vs 122.9 scenes/s, v5e). sa3/sa4 rows
        # are >=1 KB f32 (width-bound) and stay on the bitcast-bf16 gather.
        self.sa2 = PointnetSAModuleVotes(
            npoint=self.sa_npoints[1], radius=self.sa_radii[1],
            nsample=self.sa_nsamples[1], dtype=self.dtype, mlp=(128, 128, 128, 256),
        )
        self.sa3 = PointnetSAModuleVotes(
            npoint=self.sa_npoints[2], radius=self.sa_radii[2],
            nsample=self.sa_nsamples[2], dtype=self.dtype, bitcast_gather=True, mlp=(256, 128, 128, 256),
        )
        self.sa4 = PointnetSAModuleVotes(
            npoint=self.sa_npoints[3], radius=self.sa_radii[3],
            nsample=self.sa_nsamples[3], dtype=self.dtype, bitcast_gather=True, mlp=(256, 128, 128, 256),
        )
        self.fp1 = PointnetFPModule(mlp=(256 + 256, 256, 256), dtype=self.dtype)
        self.fp2 = PointnetFPModule(mlp=(256 + 256, 256, 256), dtype=self.dtype)

    def __call__(self, pointcloud: jax.Array, *, train: bool, momentum=0.1,
                 sa1_inds=None) -> dict:
        """pointcloud: (B, N, 3 + input_feature_dim) -> end_points dict.

        ``sa1_inds`` optionally provides SA1's FPS indices (B, npoint[0]) —
        the SSL step hoists ONE interleaved FPS call over the teacher+student
        clouds out of both forwards (the FPS kernel is latency-bound, so 2B
        scenes in one grid step cost about the same as B; see PERF.md)."""
        xyz = pointcloud[..., 0:3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        # Input features are data, never differentiated — without this, the
        # SA1 gather's custom VJP (ops/scatter.py) would compute an O(N*m*ns)
        # one-hot product into the 40k raw points that XLA can no longer
        # dead-code-eliminate through custom_vjp.
        if features is not None:
            features = jax.lax.stop_gradient(features)

        ep = {}
        xyz, features, fps_inds = self.sa1(xyz, features, inds=sa1_inds,
                                           train=train, momentum=momentum)
        ep["sa1_inds"], ep["sa1_xyz"], ep["sa1_features"] = fps_inds, xyz, features
        prefix = "prefix" if self.fps_prefix else None
        xyz, features, fps_inds = self.sa2(xyz, features, inds=prefix,
                                           train=train, momentum=momentum)
        ep["sa2_inds"], ep["sa2_xyz"], ep["sa2_features"] = fps_inds, xyz, features
        xyz, features, _ = self.sa3(xyz, features, inds=prefix,
                                    train=train, momentum=momentum)
        ep["sa3_xyz"], ep["sa3_features"] = xyz, features
        xyz, features, _ = self.sa4(xyz, features, inds=prefix,
                                    train=train, momentum=momentum)
        ep["sa4_xyz"], ep["sa4_features"] = xyz, features

        features = self.fp1(
            ep["sa3_xyz"], ep["sa4_xyz"], ep["sa3_features"], ep["sa4_features"],
            train=train, momentum=momentum,
        )
        features = self.fp2(
            ep["sa2_xyz"], ep["sa3_xyz"], ep["sa2_features"], features,
            train=train, momentum=momentum,
        )
        ep["fp2_features"] = features
        ep["fp2_xyz"] = ep["sa2_xyz"]
        num_seed = ep["fp2_xyz"].shape[1]
        # seed indices into the raw cloud = first num_seed of sa1's FPS order
        # (backbone_module.py:132; valid because FPS of an FPS-ordered set
        # re-selects the prefix in order)
        ep["fp2_inds"] = ep["sa1_inds"][:, 0:num_seed]
        return ep
