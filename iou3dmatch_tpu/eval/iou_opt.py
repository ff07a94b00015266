"""Test-time IoU optimization: gradient ascent of predicted IoU w.r.t. boxes.

Mirrors `evaluate_with_opt` (train.py:431-535): gather the per-proposal IoU
at the argmax semantic class, ascend (center, size) along d IoU / d box for
``opt_step + 1`` steps at ``opt_rate``, re-running ONLY the GridConv branch
each step, then re-encode the refined sizes into ``size_residuals``.

TPU-native: the whole optimization is one ``lax.scan`` of jax.grad steps over
the jitted IoU branch — no optimizer state, no host sync per step (the
reference re-enters autograd from Python each iteration).
"""
import jax
import jax.numpy as jnp
import numpy as np


def iou_optimize(model, variables, ep, opt_rate: float, opt_step: int):
    """Returns ep with refined center / size_residuals / iou_scores."""
    sem_cls = jnp.argmax(ep["sem_cls_scores"], axis=-1)
    heading = ep["heading"]

    def gathered_iou_sum(center, size):
        out = model.apply(variables, ep, center, size, heading,
                          method=model.forward_onlyiou)
        iou = out["iou_scores"]
        if iou.shape[2] > 1:
            iou = jnp.take_along_axis(iou, sem_cls[..., None], axis=2)
        return jnp.sum(iou)

    grad_fn = jax.grad(gathered_iou_sum, argnums=(0, 1))

    def step(carry, _):
        center, size = carry
        gc, gs = grad_fn(center, size)
        return (center + opt_rate * gc, size + opt_rate * gs), None

    (center, size), _ = jax.lax.scan(
        step, (ep["center"], ep["size"]), None, length=opt_step + 1
    )

    out = model.apply(variables, ep, center, size, heading,
                      method=model.forward_onlyiou)

    mean_size = jnp.asarray(np.asarray(model.mean_size_arr), dtype=jnp.float32)
    size_class = jnp.argmax(ep["size_scores"], axis=-1)
    size_base = mean_size[size_class]  # (B, K, 3)
    ns = model.num_size_cluster
    new_residuals = jnp.broadcast_to(
        (size * 2.0 - size_base)[:, :, None, :],
        size_base.shape[:2] + (ns, 3),
    )

    new_ep = dict(ep)
    new_ep["center"] = center
    new_ep["size"] = size
    new_ep["size_residuals"] = new_residuals
    new_ep["iou_scores"] = out["iou_scores"]
    return new_ep
