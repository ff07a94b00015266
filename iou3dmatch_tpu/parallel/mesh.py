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
    """Shard every array in the batch dict along axis 0."""
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
