"""Mesh construction and sharding helpers."""
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every array in the batch dict along axis 0.

    Every leading dimension must be divisible by the mesh size. Batch sizes
    are PER-DEVICE in the CLI drivers (global = per_device x n_devices), so
    loader-built batches always satisfy this; a hand-built batch that does
    not gets a clear error here instead of a GSPMD one.
    """
    n = mesh.devices.size
    bad = {
        k: v.shape
        for k, v in batch.items()
        if hasattr(v, "shape") and v.ndim > 0 and v.shape[0] % n != 0
    }
    if bad:
        raise ValueError(
            f"shard_batch: leading dims not divisible by the {n}-device mesh: "
            f"{bad}. Batch sizes are per-device (global = per_device * "
            f"n_devices); the paper config --batch_size 4,8 on {n} devices "
            f"means a global batch of {4 * n}+{8 * n} scenes."
        )
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / EMA / optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_train_step(step_fn, mesh: Mesh, axis_name: str = "data"):
    """Wrap a (state, batch, rng, lr, momentum) step with explicit
    in/out shardings: state replicated, batch data-sharded. GSPMD inserts
    the gradient psum over ICI."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    def wrapped(state, batch, rng, lr, bn_momentum):
        state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        batch = jax.tree.map(lambda x: jax.device_put(x, data), batch)
        return step_fn(state, batch, rng, lr, bn_momentum)

    return wrapped
