"""Shared-MLP building blocks with torch-semantics BatchNorm.

Replaces `pointnet2/pytorch_utils.py` (SharedMLP / Conv1d+BN wrappers,
`:14-263`) with channels-last Dense layers — a 1x1 conv over points IS a
matmul, so every layer lands on the MXU directly.

BatchNorm matches torch BatchNorm1d/2d semantics (pytorch default eps=1e-5):
normalization uses biased batch variance, the running-variance update uses
the unbiased estimate, and ``running = (1-m)*running + m*batch``. The
momentum ``m`` is a *traced* scalar so the epoch-indexed BN-momentum schedule
(`pytorch_utils.BNMomentumScheduler`, `:265-299`; driven from
pretrain.py:200-207 / train.py:231-239) never retriggers compilation.
"""
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """Channels-last batch norm over all leading axes.

    Statistics and normalization math always run in float32; the output is
    cast back to the input dtype (bf16-safe under mixed precision)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )

        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        if train:
            axes = tuple(range(x.ndim - 1))
            # one-pass statistics: E[x] and E[x^2] are sibling reductions
            # over the same operand, so XLA multi-output-fuses them into a
            # single traversal of the (large) activation tensor — the
            # centered two-pass form reads it twice. f32 accumulation keeps
            # the cancellation harmless at activation magnitudes.
            mean = jnp.mean(x, axis=axes)
            mean2 = jnp.mean(jnp.square(x), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            n = x.size // self.features
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = jnp.asarray(momentum, dtype=ra_mean.value.dtype)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        return ((x - mean) * inv * scale + bias).astype(in_dtype)


class RandomDropout(nn.Module):
    """Whole-feature (channel) dropout with a freshly sampled rate.

    Mirrors `pointnet2/pointnet2_utils.py:41-49`: each forward draws
    theta ~ U(0, p) and zeroes entire channels with probability theta,
    WITHOUT the usual 1/(1-theta) rescale (torch feature_dropout_no_scaling
    semantics). Channels-last input (..., C); needs the 'dropout' rng
    stream when train=True.
    """

    p: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.p == 0.0:
            return x
        rng = self.make_rng("dropout")
        theta_rng, mask_rng = jax.random.split(rng)
        theta = jax.random.uniform(theta_rng, (), minval=0.0, maxval=self.p)
        c = x.shape[-1]
        keep = jax.random.uniform(mask_rng, (c,)) >= theta
        return x * keep.astype(x.dtype)


class SharedMLP(nn.Module):
    """Dense -> BN -> ReLU stack applied pointwise over the channel axis.

    Equivalent to the reference `SharedMLP` of 1x1 Conv2d+BN+ReLU layers
    (pytorch_utils.py:14-39); channels-last Dense maps onto the MXU.

    ``dtype`` (e.g. jnp.bfloat16) sets the compute/activation dtype; params
    and BN statistics stay float32. The output is returned in float32.

    The Dense layers are BIAS-FREE when followed by BN, exactly like the
    reference's 1x1 convs (pytorch_utils.py:17: ``bias=not bn``). This is
    not just parity pedantry: a pre-BN bias has an output-invariant
    direction (shifting all activations shifts the batch mean identically),
    so its analytic gradient is zero — but autodiff evaluates it as a
    cancellation residual (~1e-10), and Adam's second-moment normalization
    turns ANY consistent residual into lr-sized steps. Measured on a real
    TPU training run, such biases random-walked to ~6e-2 in 460 steps,
    injecting train/eval BN inconsistency (running means lag the walk) and
    breaking torch export totality. Bias-free is the reference semantics
    and removes the walk entirely.
    """

    features: Sequence[int]
    bn: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, f in enumerate(self.features):
            x = nn.Dense(
                f, kernel_init=nn.initializers.he_normal(), name=f"dense{i}",
                dtype=self.dtype, use_bias=not self.bn,
            )(x)
            if self.bn:
                x = BatchNorm(f, name=f"bn{i}")(x, train=train, momentum=momentum)
            x = nn.relu(x)
        return x.astype(jnp.float32)


def torch_default_dense(features, in_features, name=None, dtype=None):
    """``nn.Dense`` with PyTorch's DEFAULT Conv1d/Linear initialization:
    ``reset_parameters`` runs ``kaiming_uniform_(weight, a=sqrt(5))`` which
    reduces to W ~ U(+-1/sqrt(fan_in)), and bias ~ U(+-1/sqrt(fan_in)).

    The reference's bare torch head layers — voting conv1-3
    (models/voting_module.py:32-34), proposal head conv1-3
    (models/proposal_module.py:84-86) and the GridConv IoU head conv1-3
    (models/grid_conv_module.py:42-44) — use exactly this, unlike the
    pytorch_utils wrappers (kaiming_normal_ + zero bias) mirrored by
    SharedMLP above. Init scale is part of the reference's training recipe;
    flax's defaults (lecun_normal + zero bias) put ~1.7x more variance on
    the head weights and none on the biases.
    """
    bound = 1.0 / (in_features ** 0.5)

    def _uniform(key, shape, dtype_=jnp.float32):
        return jax.random.uniform(key, shape, dtype_, -bound, bound)

    return nn.Dense(features, kernel_init=_uniform, bias_init=_uniform,
                    name=name, dtype=dtype)
