"""GridConv IoU-prediction branch.

Mirrors `models/grid_conv_module.py:22-116`: a 4x4x4 grid spanning +/- the
half-extent of each predicted box (rotated by heading, offset by center),
3-NN inverse-distance interpolation of (detached) seed features onto the
grid points, concat of the 3-d box-relative grid coordinates (first) with
the interpolated features, a SharedMLP, a max-pool over the 64 grid points,
and a small conv head whose LAST ``num_class`` channels are the per-class
IoU logits.

TPU note: the grid build + rotation is one batched matmul; the 3-NN runs
against 1024 seeds with (B, K*64) queries — dense, fixed-shape, MXU/VPU
friendly. Gradients flow to (center, size, heading) when not detached by
the caller, enabling test-time IoU optimization.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..geometry.boxes import rot_gpu
from ..ops import group_points, three_nn
from .mlp import BatchNorm, SharedMLP, torch_default_dense

GRID_SIZE = 4


def _grid_offsets():
    """(64, 3) lattice in [-1, 1]^3; x slowest, z fastest
    (grid_conv_module.py:65-76)."""
    step = np.linspace(-1.0, 1.0, GRID_SIZE)
    gx, gy, gz = np.meshgrid(step, step, step, indexing="ij")
    return np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)


class GridConv(nn.Module):
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    seed_feat_dim: int = 256
    query_feats: str = "seed"
    iou_class_depend: bool = True
    dtype: Optional[object] = None

    def setup(self):
        self.iou_size = self.num_class if self.iou_class_depend else 1
        self.mlp_before_iou = SharedMLP((128, 128, 128), dtype=self.dtype)
        out_dim = (
            3 + self.num_heading_bin * 2 + self.num_size_cluster * 3 + self.iou_size
        )
        # bare-torch-layer init parity (grid_conv_module.py:42-44)
        self.conv1_iou = torch_default_dense(128, 128)
        self.conv2_iou = torch_default_dense(128, 128)
        self.conv3_iou = torch_default_dense(out_dim, 128)
        self.bn1_iou = BatchNorm(128)
        self.bn2_iou = BatchNorm(128)

    def _interp_onehot(self, flat_grid, origin_xyz, origin_features, idx):
        """Inverse-distance 3-NN interpolation as one-hot matmuls.

        Neighbor coordinates come from per-neighbor one-hot dots against the
        seed xyz table; distances are recomputed differentiably from the grid
        (reference semantics, grid_conv_module.py:89-104); the weighted
        3-neighbor feature sum collapses into ONE (q, m) x (m, C) matmul with
        the sparse weight matrix built inline.

        f32 mode (``self.dtype`` is None): the dots run at
        ``Precision.HIGHEST`` (6-pass bf16 decomposition). A one-hot row is
        exactly representable in bf16 and the 6-pass sum covers every
        (mask-split x table-split) cross term, so the xyz "gather" dot
        reproduces the f32 table rows EXACTLY; the weighted feature dot is
        f32-accurate (summation order differs from a sequential 3-term
        gather-sum by last-ulp only). ~6 ms/step cheaper than the 590k-row
        packed f32 gather it replaces (VERDICT r2 #4).
        """
        dt = self.dtype or jnp.float32
        prec = None if self.dtype is not None else jax.lax.Precision.HIGHEST
        m = origin_xyz.shape[1]
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
        xyz_t = origin_xyz.astype(dt)
        masks = [
            (idx[:, :, k, None] == iota_m).astype(dt) for k in range(3)
        ]  # 3 x (B, q, m)
        dots = (((2,), (1,)), ((0,), (0,)))  # batched (B,q,m)x(B,m,C)
        weights = []
        for k in range(3):
            pts_k = jax.lax.dot_general(
                masks[k], xyz_t, dimension_numbers=dots,
                preferred_element_type=jnp.float32, precision=prec,
            )  # (B, q, 3)
            diff = pts_k - flat_grid
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
            weights.append(1.0 / (dist + 1e-8))
        wsum = weights[0] + weights[1] + weights[2]
        w3 = sum(
            (w / wsum)[:, :, None].astype(dt) * mk
            for w, mk in zip(weights, masks)
        )  # (B, q, m) sparse interpolation matrix
        return jax.lax.dot_general(
            w3, origin_features.astype(dt), dimension_numbers=dots,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)

    def __call__(
        self,
        center: jax.Array,   # (B, K, 3)
        size: jax.Array,     # (B, K, 3) HALF extents
        heading: jax.Array,  # (B, K)
        ep: dict,
        *,
        train: bool,
        momentum=0.1,
    ) -> dict:
        if self.query_feats == "vote":
            origin_xyz, origin_features = ep["vote_xyz"], ep["vote_features"]
        elif self.query_feats == "seed":
            origin_xyz, origin_features = ep["seed_xyz"], ep["seed_features"]
        elif self.query_feats == "seed+vote":
            origin_xyz, origin_features = ep["seed_xyz"], ep["vote_features"]
        else:
            raise NotImplementedError(self.query_feats)
        origin_xyz = jax.lax.stop_gradient(origin_xyz)
        origin_features = jax.lax.stop_gradient(origin_features)

        b, k = size.shape[:2]
        g = GRID_SIZE**3
        offsets = jnp.asarray(_grid_offsets(), dtype=center.dtype)  # (64, 3)
        # relative grid (pre-rotation, box frame): offsets * half-extents
        rel = offsets[None, None, :, :] * size[:, :, None, :]  # (B, K, 64, 3)
        rot = rot_gpu(heading)  # (B, K, 3, 3); grid @ rot^T rotates CCW
        # grid @ R^T == contract rel's last axis against rot's LAST axis
        # (grid_conv_module.py:77-78 `bmm(grid, rot_mat.transpose(1, 2))`).
        # A transposed-operand einsum here once rotated by -heading instead
        # (invisible at scannet's heading==0; caught by the sunrgbd
        # 12-heading-bin differential test).
        grid = jnp.einsum(
            "bkgc,bkdc->bkgd", rel, rot,
            precision=jax.lax.Precision.HIGHEST,
        )
        grid = grid + center[:, :, None, :]  # (B, K, 64, 3) world frame
        flat_grid = grid.reshape(b, k * g, 3)

        # fast mode (dtype set): approx 3-NN — the (B, K*64, 1024) distance
        # matrix stays fused inside the partial reduction instead of being
        # written + re-read 3x (~10 ms/step at train shapes); only the
        # indices are consumed (distances recomputed differentiably below).
        fast = self.dtype is not None and jnp.dtype(self.dtype) != jnp.float32
        _, idx = three_nn(flat_grid, origin_xyz, exact=not fast)  # (B, K*64, 3)
        idx = jax.lax.stop_gradient(idx)
        # The reference discards three_nn's distances and RECOMPUTES them in
        # autograd (grid_conv_module.py:89-92) — that differentiable
        # grid->dist->weight path is what lets test-time IoU optimization
        # move the box center.
        import os

        if os.environ.get("IOU3DMATCH_GRIDCONV_GATHER"):
            # escape-hatch reference form: one packed gather for seed xyz +
            # features (row-rate-bound), sequential 3-term weighted sum
            packed = jnp.concatenate([origin_xyz, origin_features], axis=-1)
            grouped_all = group_points(packed, idx)  # (B, K*64, 3, 3+C)
            interp_pts = grouped_all[..., :3]
            diff = interp_pts - flat_grid[:, :, None, :]
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
            weight = 1.0 / (dist + 1e-8)
            weight = weight / jnp.sum(weight, axis=2, keepdims=True)
            gathered = grouped_all[..., 3:]  # (B, K*64, 3, C)
            interp = jnp.sum(gathered * weight[..., None], axis=2)  # (B, K*64, C)
        else:
            # The seed table is tiny (m=1024 rows), so the 3x(B*K*64)-row
            # gather — a row-rate-bound op, ~6 ms/step at train shapes —
            # becomes two one-hot matmuls on the MXU. The one-hot masks are
            # cheap elementwise producers XLA fuses into the dot operands
            # (never materialized in HBM). bf16 path: MXU DEFAULT precision;
            # f32 path: HIGHEST (exact row reconstruction — see
            # _interp_onehot).
            interp = self._interp_onehot(flat_grid, origin_xyz, origin_features, idx)

        # relative grid coords in world orientation (grid - center),
        # matching grid_conv_module.py:94
        rel_world = (grid - center[:, :, None, :]).reshape(b, k * g, 3)
        feats = jnp.concatenate([rel_world, interp], axis=-1)
        feats = feats.reshape(b, k, g, -1)
        feats = self.mlp_before_iou(feats, train=train, momentum=momentum)
        pooled = jnp.max(feats, axis=2)  # (B, K, 128)

        net = nn.relu(self.bn1_iou(self.conv1_iou(pooled), train=train, momentum=momentum))
        net = nn.relu(self.bn2_iou(self.conv2_iou(net), train=train, momentum=momentum))
        net = self.conv3_iou(net)
        ep["iou_scores"] = net[..., -self.iou_size :]
        return ep
