"""Checkpoint save/load with reference-equivalent resume semantics.

The reference writes torch state dicts every epoch to ``checkpoint.tar``,
every ``save_interval`` epochs to ``checkpoint_<epoch>.tar`` and on metric
improvement to ``best_checkpoint_sum.tar`` (pretrain.py:371-406,
train.py:569-608); stage-2 loads the pretrain checkpoint into BOTH the
student and the EMA teacher (train.py:204-228). Here the payload is a flax
msgpack of {epoch, loss, params, batch_stats, opt_state[, ema_*]}.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from .state import TrainState


def save(path: str, state: TrainState, epoch: int, loss: float = 0.0) -> None:
    payload = {
        "epoch": epoch,
        "loss": float(loss),
        "state": serialization.to_state_dict(
            jax.tree.map(np.asarray, state)
        ),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load(path: str, template: TrainState):
    """Returns (state, epoch, loss). ``template`` supplies the pytree
    structure (like torch load_state_dict into a constructed model)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(template, payload["state"])
    return state, int(payload["epoch"]), float(payload["loss"])


def load_pretrain_into_ssl(path: str, ssl_template: TrainState) -> TrainState:
    """Load a stage-1 checkpoint into a stage-2 state: params/batch_stats are
    copied into both the student and the EMA teacher (train.py:204-228).
    The optimizer state is NOT restored (fresh Adam, as in the reference's
    non-``--resume`` path)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    src = payload["state"]
    params = serialization.from_state_dict(ssl_template.params, src["params"])
    batch_stats = serialization.from_state_dict(
        ssl_template.batch_stats, src["batch_stats"]
    )
    return ssl_template.replace(
        params=params,
        batch_stats=batch_stats,
        # distinct buffers: the SSL step donates the whole state (see
        # train/state.py note on double donation)
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
    )
