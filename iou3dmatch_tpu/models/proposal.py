"""Proposal module: vote aggregation + box/class decoding.

Mirrors `models/proposal_module.py:24-125`. Sampling strategies:
``seed_fps`` (default; FPS on seeds, aggregate votes at those indices),
``vote_fps`` (FPS on votes), ``random``.

Decoding (`decode_scores`, proposal_module.py:24-54): channel splits
[objectness(2) | center offset(3) | heading scores(NH) | heading residuals
(NH, x pi/NH) | size scores(NS) | size residuals (NS*3, softplus(x)-1 then
x mean sizes) | sem-cls scores(NC)].
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import furthest_point_sample
from .mlp import BatchNorm, torch_default_dense
from .pointnet2 import PointnetSAModuleVotes


class ProposalModule(nn.Module):
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple  # (NS, 3) nested tuple for hashability
    num_proposal: int = 128
    sampling: str = "seed_fps"
    seed_feat_dim: int = 256
    agg_radius: float = 0.3
    agg_nsample: int = 16
    # seed_xyz (= sa2_xyz) is FPS-selection-ordered, so seed_fps's FPS over
    # it provably yields arange(num_proposal) (see PointnetSAModuleVotes
    # inds="prefix"); skip the kernel. False forces the exact kernel.
    fps_prefix: bool = True

    def setup(self):
        self.vote_aggregation = PointnetSAModuleVotes(
            npoint=self.num_proposal,
            radius=self.agg_radius,
            nsample=self.agg_nsample,
            mlp=(self.seed_feat_dim, 128, 128, 128),
        )
        out_dim = (
            2 + 3 + self.num_heading_bin * 2 + self.num_size_cluster * 4 + self.num_class
        )
        # bare-torch-layer init parity (proposal_module.py:84-86)
        self.conv1 = torch_default_dense(128, 128)
        self.conv2 = torch_default_dense(128, 128)
        self.conv3 = torch_default_dense(out_dim, 128)
        self.bn1 = BatchNorm(128)
        self.bn2 = BatchNorm(128)

    def __call__(
        self,
        xyz: jax.Array,
        features: jax.Array,
        ep: dict,
        *,
        train: bool,
        momentum=0.1,
        rng: Optional[jax.Array] = None,
    ) -> dict:
        """xyz: votes (B, K, 3); features: vote features (B, K, C)."""
        if self.sampling == "vote_fps":
            new_xyz, agg_features, sample_inds = self.vote_aggregation(
                xyz, features, train=train, momentum=momentum
            )
        elif self.sampling == "seed_fps":
            if self.fps_prefix:
                # FPS over the FPS-ordered seeds == arange; the SA module's
                # prefix path returns that arange as sample_inds.
                new_xyz, agg_features, sample_inds = self.vote_aggregation(
                    xyz, features, "prefix", train=train, momentum=momentum
                )
            else:
                sample_inds = furthest_point_sample(
                    ep["seed_xyz"], self.num_proposal)
                new_xyz, agg_features, _ = self.vote_aggregation(
                    xyz, features, sample_inds, train=train, momentum=momentum
                )
        elif self.sampling == "random":
            num_seed = ep["seed_xyz"].shape[1]
            sample_inds = jax.random.randint(
                rng, (xyz.shape[0], self.num_proposal), 0, num_seed, dtype=jnp.int32
            )
            new_xyz, agg_features, _ = self.vote_aggregation(
                xyz, features, sample_inds, train=train, momentum=momentum
            )
        else:
            raise ValueError(f"Unknown sampling strategy: {self.sampling}")

        ep["aggregated_vote_xyz"] = new_xyz
        ep["aggregated_vote_inds"] = sample_inds

        net = nn.relu(self.bn1(self.conv1(agg_features), train=train, momentum=momentum))
        net = nn.relu(self.bn2(self.conv2(net), train=train, momentum=momentum))
        net = self.conv3(net)  # (B, num_proposal, out_dim)
        return self.decode_scores(net, ep)

    def decode_scores(self, net: jax.Array, ep: dict) -> dict:
        nh, ns = self.num_heading_bin, self.num_size_cluster
        b, k, _ = net.shape
        mean_size = jnp.asarray(np.asarray(self.mean_size_arr), dtype=jnp.float32)

        ep["objectness_scores"] = net[..., 0:2]
        ep["center"] = ep["aggregated_vote_xyz"] + net[..., 2:5]
        ep["heading_scores"] = net[..., 5 : 5 + nh]
        hrn = net[..., 5 + nh : 5 + nh * 2]
        ep["heading_residuals_normalized"] = hrn
        ep["heading_residuals"] = hrn * (np.pi / nh)
        ep["size_scores"] = net[..., 5 + nh * 2 : 5 + nh * 2 + ns]
        srn = net[..., 5 + nh * 2 + ns : 5 + nh * 2 + ns * 4].reshape(b, k, ns, 3)
        srn = jax.nn.softplus(srn) - 1.0
        ep["size_residuals_normalized"] = srn
        ep["size_residuals"] = srn * mean_size[None, None, :, :]
        ep["sem_cls_scores"] = net[..., 5 + nh * 2 + ns * 4 :]
        return ep
