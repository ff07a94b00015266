"""MXU scatter-add: the backward of a gather, as one-hot matmuls.

XLA lowers the transpose of a gather to `scatter-add`, which serializes on
TPU (~us per row update): the backbone's gather backwards alone measured
1.19 s/step at reference shapes. The same contraction written as

    grad_features[n, c] = sum_u 1[idx_u == n] * grad_out[u, c]
                        = (one_hot(idx).T @ grad_out)[n, c]

is a dense matmul the MXU eats. The one-hot matrix is built on the fly in
chunks of updates so it never exceeds ~16 MB.
"""
from functools import partial

import jax
import jax.numpy as jnp


def onehot_segment_sum(idx: jax.Array, updates: jax.Array, n: int) -> jax.Array:
    """idx: (U,) int in [0, n); updates: (U, C) -> (n, C) summed by index.

    Exact scatter-add semantics (including duplicate indices), computed as
    chunked one-hot matmuls.
    """
    u, c = updates.shape
    # chunk so the (chunk, n) one-hot stays <= ~4M f32 (16 MB)
    chunk = max(128, min(u, (1 << 22) // max(n, 1)))
    nchunks = -(-u // chunk)
    pad = nchunks * chunk - u
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), n, idx.dtype)])
        updates = jnp.concatenate([updates, jnp.zeros((pad, c), updates.dtype)])
    idx_chunks = idx.reshape(nchunks, chunk)
    upd_chunks = updates.reshape(nchunks, chunk, c)
    rows = jnp.arange(n, dtype=jnp.int32)

    def body(acc, inp):
        ic, uc = inp
        onehot = (ic[:, None] == rows[None, :]).astype(updates.dtype)  # (chunk, n)
        acc = acc + jax.lax.dot_general(
            onehot, uc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    acc0 = jnp.zeros((n, c), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (idx_chunks, upd_chunks))
    return acc.astype(updates.dtype)


def batched_onehot_segment_sum(idx: jax.Array, updates: jax.Array, n: int) -> jax.Array:
    """idx: (B, U), updates: (B, U, C) -> (B, n, C)."""
    return jax.vmap(partial(onehot_segment_sum, n=n))(idx, updates)
