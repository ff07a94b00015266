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
from .torch_import import (import_state_dict, is_torch_checkpoint,
                           read_torch_checkpoint)


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


def load(path: str, template: TrainState, torch_payload=None):
    """Returns (state, epoch, loss). ``template`` supplies the pytree
    structure (like torch load_state_dict into a constructed model).

    Torch checkpoints written by the reference drivers (detected by file
    magic) are imported transparently: model (and EMA, when both sides have
    one) weights are mapped in; the optimizer restarts fresh — torch Adam
    moments are leaf-tensor dicts keyed by parameter id and have no faithful
    image in our flat raveled opt_state.

    ``torch_payload``: an already-``read_torch_checkpoint`` payload for
    ``path``, to avoid deserializing a large checkpoint twice when the
    caller has inspected it (e.g. for an ``ema_model_state_dict`` key)."""
    if is_torch_checkpoint(path):
        return _load_torch(path, template, torch_payload)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(
        template, _compat_state(payload["state"], template))
    return state, int(payload["epoch"]), float(payload["loss"])


def _compat_state(src, template):
    """Pre-2026-08-20 checkpoints carry SharedMLP Dense ``bias`` leaves the
    current (reference-parity, bias-free) model no longer has — see
    models/mlp.py::SharedMLP for why they were removed (Adam random-walks
    analytically-zero-gradient params). Strip ONLY payload entries matching
    that legacy pattern (a ``bias`` under a ``dense*`` module whose template
    twin is bias-free but has the ``kernel``) so those files keep loading;
    if any were stripped, the flat raveled opt_state no longer matches
    either, so keep the template's fresh optimizer (eval/fine-tune use is
    unaffected — exactly the torch-import contract). Any OTHER payload leaf
    with no counterpart in the template is an architecture mismatch and
    raises, like ``flax.serialization.from_state_dict`` would, instead of
    silently dropping weights."""
    tmpl_sd = serialization.to_state_dict(template)

    dropped, unknown = [], []

    def walk(s, t, path):
        if not isinstance(s, dict) or not isinstance(t, dict):
            return s
        out = {}
        for k, v in s.items():
            if k in t:
                out[k] = walk(v, t[k], path + (k,))
            elif (k == "bias" and path and path[-1].startswith("dense")
                  and "kernel" in t):
                dropped.append("/".join(path + (k,)))
            else:
                unknown.append("/".join(path + (k,)))
        return out

    out = walk(src, tmpl_sd, ())
    if unknown:
        raise ValueError(
            "checkpoint does not match the model architecture: payload "
            f"leaves {unknown[:5]}{'...' if len(unknown) > 5 else ''} have "
            "no counterpart in the template (and are not legacy SharedMLP "
            "dense biases)")
    if dropped:
        import warnings

        warnings.warn(
            f"checkpoint predates the bias-free SharedMLP: dropped "
            f"{len(dropped)} stale dense-bias leaves "
            f"({dropped[:3]}{'...' if len(dropped) > 3 else ''}); "
            "restarting the optimizer state fresh", stacklevel=2)
        if "opt_state" in out and "opt_state" in tmpl_sd:
            out["opt_state"] = tmpl_sd["opt_state"]
    return out


def _load_torch(path: str, template: TrainState, payload=None):
    if payload is None:
        payload = read_torch_checkpoint(path)
    tv = {"params": template.params, "batch_stats": template.batch_stats}
    imported = import_state_dict(tv, payload["model_state_dict"])
    state = template.replace(params=imported["params"],
                             batch_stats=imported["batch_stats"])
    if template.ema_params is not None:
        # SSL template: take the checkpoint's EMA weights if it has them
        # (train.py:569-585), else mirror the student (pretrain handoff).
        ema_sd = payload.get("ema_model_state_dict",
                             payload["model_state_dict"])
        ema = import_state_dict(
            {"params": template.ema_params,
             "batch_stats": template.ema_batch_stats}, ema_sd)
        state = state.replace(
            ema_params=jax.tree.map(jnp.copy, ema["params"]),
            ema_batch_stats=jax.tree.map(jnp.copy, ema["batch_stats"]))
    return state, int(payload.get("epoch", 0)), float(payload.get("loss", 0.0))


def load_pretrain_into_ssl(path: str, ssl_template: TrainState,
                           torch_payload=None) -> TrainState:
    """Load a stage-1 checkpoint into a stage-2 state: params/batch_stats are
    copied into both the student and the EMA teacher (train.py:204-228).
    The optimizer state is NOT restored (fresh Adam, as in the reference's
    non-``--resume`` path)."""
    if is_torch_checkpoint(path):
        payload = (torch_payload if torch_payload is not None
                   else read_torch_checkpoint(path))
        imported = import_state_dict(
            {"params": ssl_template.params,
             "batch_stats": ssl_template.batch_stats},
            payload["model_state_dict"])
        params, batch_stats = imported["params"], imported["batch_stats"]
    else:
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        src = _compat_state(payload["state"], ssl_template)
        params = serialization.from_state_dict(
            ssl_template.params, src["params"])
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
