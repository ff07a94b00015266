"""Shared loss helpers (cross-entropy with torch semantics, masking)."""
import jax
import jax.numpy as jnp

FAR_THRESHOLD = 0.6
NEAR_THRESHOLD = 0.3
GT_VOTE_FACTOR = 3
OBJECTNESS_CLS_WEIGHTS = (0.2, 0.8)


def cross_entropy(logits: jax.Array, labels: jax.Array, weights=None) -> jax.Array:
    """Per-element CE like torch nn.CrossEntropyLoss(reduction='none').

    With class ``weights`` the per-element loss is w[y] * nll (no weight
    normalization — callers divide by their own mask sums, matching the
    reference usage, e.g. loss_helper.py:106-108).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weights is not None:
        w = jnp.asarray(weights, dtype=nll.dtype)[labels]
        nll = nll * w
    return nll


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """sum(x * mask) / (sum(mask) + 1e-6) — the reference normalization."""
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / (jnp.sum(mask) + 1e-6)
