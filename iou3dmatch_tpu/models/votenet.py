"""VoteNet with IoU-prediction branch.

Mirrors `models/votenet_iou_branch.py:23-185`: backbone -> voting (with
L2-normalized vote features) -> proposal decode -> box computation
(argmax class, HALF sizes) -> GridConv IoU branch, plus the
``forward_with_pred_jitter`` training variant that appends jittered box
copies (center += size*N(0, 0.3), size += size*N(0, 0.3), clamp >= 1e-8) and
splits ``iou_scores`` / ``iou_scores_jitter``.
"""
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .backbone import Pointnet2Backbone
from .voting import VotingModule
from .proposal import ProposalModule
from .grid_conv import GridConv


class VoteNet(nn.Module):
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple  # nested tuple (NS, 3)
    input_feature_dim: int = 0
    num_proposal: int = 128
    vote_factor: int = 1
    sampling: str = "seed_fps"
    query_feats: str = "seed"
    sa_npoints: Sequence[int] = (2048, 1024, 512, 256)
    compute_dtype: Optional[str] = None  # 'bfloat16' for mixed precision
    # keep the GridConv IoU branch in f32 even under bf16 mixed precision
    # (targeted promotion candidate from the round-5 dtype-vs-step 2x2)
    f32_gridconv: bool = False
    sa_radii: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    sa_nsamples: Sequence[int] = (64, 32, 16, 16)
    # skip provably-arange FPS calls (SA2-4 + seed_fps); see backbone.py
    fps_prefix: bool = True

    def setup(self):
        mp_dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        self.backbone_net = Pointnet2Backbone(
            input_feature_dim=self.input_feature_dim,
            dtype=mp_dtype,
            sa_npoints=self.sa_npoints,
            sa_radii=self.sa_radii,
            sa_nsamples=self.sa_nsamples,
            fps_prefix=self.fps_prefix,
        )
        self.vgen = VotingModule(self.vote_factor, 256)
        self.pnet = ProposalModule(
            num_class=self.num_class,
            num_heading_bin=self.num_heading_bin,
            num_size_cluster=self.num_size_cluster,
            mean_size_arr=self.mean_size_arr,
            num_proposal=self.num_proposal,
            sampling=self.sampling,
            fps_prefix=self.fps_prefix,
        )
        self.grid_conv = GridConv(
            dtype=None if self.f32_gridconv else mp_dtype,
            num_class=self.num_class,
            num_heading_bin=self.num_heading_bin,
            num_size_cluster=self.num_size_cluster,
            query_feats=self.query_feats,
        )

    # ---------------------------------------------------------------- utils
    def class2angle(self, cls: jax.Array, residual: jax.Array) -> jax.Array:
        """Heading decode; ScanNet (1 bin) is always 0
        (model_util_scannet.py:50-54 / model_util_sunrgbd.py:50-60)."""
        if self.num_heading_bin == 1:
            return jnp.zeros(cls.shape, dtype=jnp.float32)
        angle_per_class = 2 * np.pi / float(self.num_heading_bin)
        angle = cls.astype(jnp.float32) * angle_per_class + residual
        return angle - 2 * np.pi * (angle > np.pi)

    # ------------------------------------------------------------- forwards
    def forward_backbone(self, point_clouds: jax.Array, *, train: bool, momentum=0.1,
                         rng: Optional[jax.Array] = None, sa1_inds=None) -> dict:
        """(B, N, 3+C) -> end_points (votenet_iou_branch.py:75-109).
        ``sa1_inds`` optionally injects precomputed SA1 FPS indices (see
        Pointnet2Backbone.__call__)."""
        ep = self.backbone_net(point_clouds, train=train, momentum=momentum,
                               sa1_inds=sa1_inds)
        ep["seed_inds"] = ep["fp2_inds"]
        ep["seed_xyz"] = ep["fp2_xyz"]
        ep["seed_features"] = ep["fp2_features"]

        xyz, features = self.vgen(ep["seed_xyz"], ep["seed_features"],
                                  train=train, momentum=momentum)
        norm = jnp.linalg.norm(features, axis=-1, keepdims=True)
        features = features / norm
        ep["vote_xyz"] = xyz
        ep["vote_features"] = features

        return self.pnet(xyz, features, ep, train=train, momentum=momentum, rng=rng)

    def calculate_bbox(self, ep: dict) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Argmax-class box decode; size returned as HALF extents with
        negative components clamped to 1e-6 (votenet_iou_branch.py:111-137)."""
        mean_size = jnp.asarray(np.asarray(self.mean_size_arr), dtype=jnp.float32)
        size_class = jnp.argmax(ep["size_scores"], axis=-1)  # (B, K)
        size_residual = jnp.take_along_axis(
            ep["size_residuals"], size_class[:, :, None, None], axis=2
        )[:, :, 0, :]
        size_base = mean_size[size_class]
        size = (size_base + size_residual) / 2.0
        size = jnp.where(size < 0, 1e-6, size)

        heading_class = jnp.argmax(ep["heading_scores"], axis=-1)
        heading_residual = jnp.take_along_axis(
            ep["heading_residuals"], heading_class[:, :, None], axis=2
        )[:, :, 0]
        heading = self.class2angle(heading_class, heading_residual)
        ep["size"] = size
        ep["heading"] = heading
        return ep["center"], size, heading

    def __call__(self, point_clouds: jax.Array, *, train: bool, momentum=0.1,
                 iou_opt: bool = False, rng: Optional[jax.Array] = None,
                 sa1_inds=None) -> dict:
        """Standard forward (votenet_iou_branch.py:139-151). With
        iou_opt=False the boxes are detached before the IoU branch."""
        ep = self.forward_backbone(point_clouds, train=train, momentum=momentum,
                                   rng=rng, sa1_inds=sa1_inds)
        center, size, heading = self.calculate_bbox(ep)
        if not iou_opt:
            center = jax.lax.stop_gradient(center)
            size = jax.lax.stop_gradient(size)
            heading = jax.lax.stop_gradient(heading)
        return self.grid_conv(center, size, heading, ep, train=train, momentum=momentum)

    def forward_with_pred_jitter(self, point_clouds: jax.Array, jitter_rng: jax.Array,
                                 *, train: bool, momentum=0.1,
                                 rng: Optional[jax.Array] = None,
                                 sa1_inds=None, jitter_rows=None) -> dict:
        """Training forward with jittered box copies
        (votenet_iou_branch.py:157-181).

        ``jitter_rows``: with None (reference-exact), every scene gets a
        jittered copy of each proposal and GridConv runs on (B, 2K) boxes.
        With an int nl, only the first nl scenes keep their jittered copies
        — the jitter IoU loss only ever reads jitter rows [:num_labeled]
        (loss_helper_labeled.py:232-279) — and GridConv runs once on
        (B + nl, K) boxes, the jitter rows re-using the first nl scenes'
        seeds. Per-box numerics are identical (same jitter RNG draws, same
        grid/3-NN math); only train-mode BatchNorm batch statistics see a
        different box population."""
        ep = self.forward_backbone(point_clouds, train=train, momentum=momentum,
                                   rng=rng, sa1_inds=sa1_inds)
        center, size, heading = self.calculate_bbox(ep)
        b, k = heading.shape[:2]

        k1, k2 = jax.random.split(jitter_rng)
        center_jitter = center + size * jax.random.normal(k1, size.shape) * 0.3
        size_jitter = size + size * jax.random.normal(k2, size.shape) * 0.3
        size_jitter = jnp.clip(size_jitter, 1e-8, None)

        if jitter_rows is None:
            center_all = jnp.concatenate([center, center_jitter], axis=1)
            size_all = jnp.concatenate([size, size_jitter], axis=1)
            heading_all = jnp.concatenate([heading, heading], axis=1)

            ep = self.grid_conv(
                jax.lax.stop_gradient(center_all),
                jax.lax.stop_gradient(size_all),
                jax.lax.stop_gradient(heading_all),
                ep, train=train, momentum=momentum,
            )
            ep["iou_scores_jitter"] = ep["iou_scores"][:, k:]
            ep["iou_scores"] = ep["iou_scores"][:, :k]
            ep["jitter_center"] = center_jitter
            ep["jitter_size"] = size_jitter * 2  # full extents, like the reference
            ep["jitter_heading"] = heading
            return ep

        nl = jitter_rows
        center_jitter = center_jitter[:nl]
        size_jitter = size_jitter[:nl]
        # jitter rows ride along as nl extra scenes that share the first nl
        # scenes' seed tables
        center_all = jnp.concatenate([center, center_jitter], axis=0)
        size_all = jnp.concatenate([size, size_jitter], axis=0)
        heading_all = jnp.concatenate([heading, heading[:nl]], axis=0)
        ep2 = dict(ep)
        for key in ("seed_xyz", "seed_features", "vote_xyz", "vote_features"):
            ep2[key] = jnp.concatenate([ep2[key], ep2[key][:nl]], axis=0)
        ep2 = self.grid_conv(
            jax.lax.stop_gradient(center_all),
            jax.lax.stop_gradient(size_all),
            jax.lax.stop_gradient(heading_all),
            ep2, train=train, momentum=momentum,
        )
        ep["iou_scores"] = ep2["iou_scores"][:b]
        ep["iou_scores_jitter"] = ep2["iou_scores"][b:]
        ep["jitter_center"] = center_jitter
        ep["jitter_size"] = size_jitter * 2  # full extents, like the reference
        ep["jitter_heading"] = heading[:nl]
        return ep

    def forward_onlyiou(self, ep: dict, center: jax.Array, size: jax.Array,
                        heading: jax.Array, *, train: bool = False, momentum=0.1) -> dict:
        """Re-run only the IoU branch on refined boxes
        (votenet_iou_branch.py:183-185); used by test-time IoU optimization."""
        return self.grid_conv(center, size, heading, dict(ep), train=train, momentum=momentum)
