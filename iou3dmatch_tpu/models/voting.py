"""Hough voting module.

Mirrors `models/voting_module.py:16-65`: 2x (Dense+BN+ReLU) + Dense head
producing per-seed xyz offsets and residual features. Channels-last.
"""
import jax
from flax import linen as nn

from .mlp import BatchNorm, torch_default_dense


class VotingModule(nn.Module):
    vote_factor: int = 1
    seed_feature_dim: int = 256

    @nn.compact
    def __call__(self, seed_xyz: jax.Array, seed_features: jax.Array, *, train: bool, momentum=0.1):
        """seed_xyz: (B, num_seed, 3); seed_features: (B, num_seed, C) ->
        (vote_xyz (B, num_seed*vf, 3), vote_features (B, num_seed*vf, C))."""
        b, num_seed, _ = seed_xyz.shape
        c = self.seed_feature_dim
        # bare-torch-layer init parity: voting_module.py:32-34 uses torch
        # Conv1d DEFAULT init (see mlp.torch_default_dense)
        net = torch_default_dense(c, c, name="conv1")(seed_features)
        net = nn.relu(BatchNorm(c, name="bn1")(net, train=train, momentum=momentum))
        net = torch_default_dense(c, c, name="conv2")(net)
        net = nn.relu(BatchNorm(c, name="bn2")(net, train=train, momentum=momentum))
        net = torch_default_dense((3 + c) * self.vote_factor, c, name="conv3")(net)

        net = net.reshape(b, num_seed, self.vote_factor, 3 + c)
        offset = net[:, :, :, 0:3]
        vote_xyz = (seed_xyz[:, :, None, :] + offset).reshape(b, num_seed * self.vote_factor, 3)
        residual = net[:, :, :, 3:]
        vote_features = (seed_features[:, :, None, :] + residual).reshape(
            b, num_seed * self.vote_factor, c
        )
        return vote_xyz, vote_features
