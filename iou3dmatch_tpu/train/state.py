"""Train state container + optimizer.

Checkpoint contents mirror the reference torch.save dicts
{epoch, optimizer_state_dict, model_state_dict[, ema_model_state_dict]}
(pretrain.py:371-406, train.py:569-608): here
{step, params, batch_stats, opt_state} (+ ema_params / ema_batch_stats for
the SSL stage). Adam matches torch defaults (betas 0.9/0.999, eps 1e-8,
optional additive L2 weight decay applied before the moment updates).

The optimizer runs on the RAVELED parameter vector (one flat f32 buffer)
rather than leaf-by-leaf: Adam is elementwise, so the flat form is
numerically identical (to f32-ULP fusion rounding — see
tests/test_train.py::test_flat_adam_matches_leafwise), but it compiles to
a handful of wide VPU kernels instead of
~3 small fusions per parameter leaf (~120 leaves), which profiling showed
costing ~3 ms/step in kernel-launch overhead on the v5e. ``opt_state``
therefore holds flat moment vectors.
"""
from typing import Any, Optional

import jax
import optax
from flax import struct
from jax.flatten_util import ravel_pytree


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None


def make_optimizer(weight_decay: float = 0.0, eps: float = 1e-8):
    """Adam with lr supplied per-step by the caller (traced scalar).

    ``eps`` matches torch.optim.Adam's (pretrain.py:186); the trajectory
    differential tests raise it to condition the first updates (at t=1 the
    Adam update is ~lr*sign(g), which amplifies f32 grad noise on
    near-zero-gradient coordinates into full-size update differences)."""
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(eps=eps),
        )
    return optax.scale_by_adam(eps=eps)


def create_train_state(model, rng, example_batch, with_ema=False, weight_decay=0.0):
    """Initialize params/batch_stats from an example batch."""
    import jax.numpy as jnp

    init_rng, jitter_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng},
        example_batch["point_clouds"],
        jitter_rng,
        train=False,
        method=model.forward_with_pred_jitter,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(weight_decay)
    opt_state = tx.init(ravel_pytree(params)[0])
    # jnp.copy (not identity): the EMA tree must hold DISTINCT buffers —
    # the train steps donate the whole TrainState, and donating the same
    # buffer twice (params + aliased ema_params) is a runtime error.
    ema_params = jax.tree.map(jnp.copy, params) if with_ema else None
    ema_bs = jax.tree.map(jnp.copy, batch_stats) if with_ema else None
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        ema_params=ema_params,
        ema_batch_stats=ema_bs,
    )
