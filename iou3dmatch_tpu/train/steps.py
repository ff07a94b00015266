"""Jitted training / evaluation steps.

Each step is a pure function (params, batch, scalars) -> (params, metrics):
the entire forward + loss + backward + Adam + EMA chain compiles into ONE
XLA program per stage. Scalars (lr, BN momentum) are traced, so the epoch
schedules never recompile. Under a data mesh (parallel/), the same step
functions run SPMD — gradient all-reduce and cross-replica BN statistics
fall out of GSPMD sharding propagation (no NCCL-style code, cf. the
reference's nn.DataParallel at train.py:187-191).

Reference call stacks mirrored: pretrain train_one_epoch
(pretrain.py:310-347), SSL train_one_epoch (train.py:305-371), EMA update
(train.py:285-289).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..losses import get_labeled_loss, get_loss, get_unlabeled_loss
from .state import TrainState, make_optimizer


def ema_update(ema_params, params, alpha):
    """ema = alpha * ema + (1 - alpha) * param (train.py:285-289)."""
    return jax.tree.map(lambda e, p: alpha * e + (1.0 - alpha) * p, ema_params, params)


def _flat_apply_updates(tx, state, grads, lr):
    """Adam + parameter update on the raveled parameter vector.

    Elementwise, so numerically identical to the leaf-by-leaf form (to
    f32-ULP fusion rounding), but ~120 leaves × ~3 fusions collapse into a
    few wide kernels (see train/state.py).
    Returns (new_params_tree, flat_new_params, unravel, new_opt_state)."""
    flat_p, unravel = ravel_pytree(state.params)
    flat_g, _ = ravel_pytree(grads)
    updates, new_opt = tx.update(flat_g, state.opt_state, flat_p)
    flat_new_p = flat_p - lr * updates
    return unravel(flat_new_p), flat_new_p, unravel, new_opt


def make_pretrain_step(model, cfg, weight_decay=0.0, adam_eps=1e-8):
    """Supervised pretrain step: forward_with_pred_jitter + labeled loss."""
    tx = make_optimizer(weight_decay, eps=adam_eps)

    # donate the TrainState: params/opt/EMA update in place (the
    # EMA tree holds distinct buffers — see train/state.py — so no leaf is
    # donated twice)
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng, lr, bn_momentum):
        num_labeled = batch["point_clouds"].shape[0]

        def loss_fn(params):
            ep, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["point_clouds"], rng, train=True, momentum=bn_momentum,
                mutable=["batch_stats"],
                method=model.forward_with_pred_jitter,
            )
            loss, metrics = get_labeled_loss(ep, batch, cfg, num_labeled)
            return loss, (metrics, mut["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_params, _, _, new_opt = _flat_apply_updates(tx, state, grads, lr)
        metrics["loss"] = loss
        new_state = state.replace(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    return step


def make_ssl_step(model, cfg, num_labeled, *, unlabeled_weight=2.0, ema_decay=0.999,
                  obj_threshold=0.9, cls_threshold=0.9, iou_threshold=0.25,
                  nms_iou=0.25, use_lhs=True, samecls_match=False,
                  dataset="scannet", weight_decay=0.0, view_stats=False,
                  reference_exact=False, full_teacher=False,
                  exact_jitter=False, adam_eps=1e-8):
    """Mean-teacher SSL step (train.py:305-371): teacher forward on the
    unaugmented EMA view, student forward on the augmented view, labeled +
    weighted unlabeled loss, Adam, then the EMA parameter update with warmup
    alpha = min(1 - 1/(step+1), ema_decay).

    ``reference_exact`` (default False): the fast default skips three pieces
    of compute whose outputs the reference itself provably discards — each
    deviates from the reference ONLY in which scenes/boxes feed train-mode
    BatchNorm batch statistics (same distribution, sampling noise only):

    1. The teacher runs on just the unlabeled scenes. The reference runs it
       on the full mixed batch and slices the labeled rows away in every
       consumer (loss_helper_unlabeled.py:544-551, 386).
    2. The teacher runs the plain forward (no jittered-box GridConv pass).
       Nothing consumes the teacher's ``iou_scores_jitter``; the reference
       computes it only because train.py:334 reuses forward_with_pred_jitter.
    3. The student jitters only the labeled scenes (jitter_rows=num_labeled):
       the jitter IoU loss reads jitter rows [:num_labeled] only
       (loss_helper_labeled.py:232-279), so the unlabeled scenes' jittered
       GridConv forward+backward is dead compute.

    Set True for reference-exact numerics (full-batch jittered teacher,
    full-batch student jitter).

    The two prunings are independently revertible (round-5 repair knobs —
    the fast config's accuracy deficit traced to step semantics, see
    reports/flagship.md §3):

    - ``full_teacher``: run the teacher on the full mixed batch (reverts
      pruning 1 only). Its BN batch is then the reference's 12 i.i.d.
      scenes instead of the 8 unlabeled ones.
    - ``exact_jitter``: restore the jittered-box GridConv passes (reverts
      prunings 2+3): the teacher runs forward_with_pred_jitter and the
      student jitters every scene, so train-mode GridConv BatchNorm sees
      the reference's box population (50% jittered copies) instead of
      25%/0% — a composition shift, not just sampling noise.

    ``reference_exact`` implies both."""
    teacher_full = reference_exact or full_teacher
    jitter_full = reference_exact or exact_jitter
    tx = make_optimizer(weight_decay, eps=adam_eps)

    # donate the TrainState: params/opt/EMA update in place (the
    # EMA tree holds distinct buffers — see train/state.py — so no leaf is
    # donated twice)
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng, lr, bn_momentum):
        t_rng, s_rng = jax.random.split(rng)

        # ONE SA1 FPS over teacher+student clouds: the Pallas FPS kernel is
        # LATENCY-bound (a serial 2048-iteration chain per scene), so 2B
        # scenes interleaved in one grid step cost about the same wall time
        # as B — hoisting halves the per-step FPS cost vs running it inside
        # each forward. Identical indices to the in-forward FPS (same op).
        from ..ops import furthest_point_sample

        ema_clouds = batch["ema_point_clouds"]
        if not teacher_full:
            ema_clouds = ema_clouds[num_labeled:]
        xyz_both = jnp.concatenate(
            [ema_clouds[..., 0:3],
             batch["point_clouds"][..., 0:3]], axis=0)
        inds_both = furthest_point_sample(xyz_both, model.sa_npoints[0])
        n_teacher = ema_clouds.shape[0]
        t_inds, s_inds = inds_both[:n_teacher], inds_both[n_teacher:]

        # Teacher forward (no gradient). The reference keeps the teacher in
        # train mode — its BN normalizes by (and updates) its own batch
        # statistics; only parameters are EMA'd (train.py:334-335, 285-289).
        # Fast default: plain forward — the teacher's jittered-box GridConv
        # outputs are never consumed (see the reference_exact docstring).
        if jitter_full:
            ema_ep, ema_mut = model.apply(
                {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
                ema_clouds, t_rng, train=True, momentum=bn_momentum,
                mutable=["batch_stats"],
                method=model.forward_with_pred_jitter, sa1_inds=t_inds,
            )
        else:
            ema_ep, ema_mut = model.apply(
                {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
                ema_clouds, train=True, momentum=bn_momentum, rng=t_rng,
                mutable=["batch_stats"], sa1_inds=t_inds,
            )
        ema_ep = jax.lax.stop_gradient(ema_ep)

        def loss_fn(params):
            ep, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["point_clouds"], s_rng, train=True, momentum=bn_momentum,
                mutable=["batch_stats"],
                method=model.forward_with_pred_jitter, sa1_inds=s_inds,
                jitter_rows=None if jitter_full else num_labeled,
            )
            sup_loss, m1 = get_labeled_loss(ep, batch, cfg, num_labeled)
            unsup_loss, m2 = get_unlabeled_loss(
                ep, ema_ep, batch, cfg, num_labeled,
                obj_threshold=obj_threshold, cls_threshold=cls_threshold,
                iou_threshold=iou_threshold, nms_iou=nms_iou, use_lhs=use_lhs,
                samecls_match=samecls_match, dataset=dataset,
                view_stats=view_stats,
                ema_rows_are_unlabeled=not teacher_full,
            )
            loss = sup_loss + unlabeled_weight * unsup_loss
            m1.update(m2)
            m1["supervised_loss"] = sup_loss
            m1["unsupervised_loss"] = unsup_loss
            return loss, (m1, mut["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_params, flat_new_p, unravel, new_opt = _flat_apply_updates(
            tx, state, grads, lr)

        # The reference increments global_step BEFORE the EMA update
        # (train.py:353-354, starting from 0), so its batch t (0-based) uses
        # alpha = min(1 - 1/(t+2), decay) — first step 0.5, never 0.
        global_step = state.step
        alpha = jnp.minimum(
            1.0 - 1.0 / (global_step.astype(jnp.float32) + 2.0), ema_decay
        )
        # EMA lerp on the flat vector too (same kernel-count argument).
        flat_ema, _ = ravel_pytree(state.ema_params)
        new_ema = unravel(alpha * flat_ema + (1.0 - alpha) * flat_new_p)

        metrics["loss"] = loss
        new_state = state.replace(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            ema_params=new_ema, ema_batch_stats=ema_mut["batch_stats"],
            step=state.step + 1,
        )
        return new_state, metrics

    return step


def make_eval_forward(model, cfg, use_ema=False):
    """Jitted eval forward: end_points + eval-path loss metrics
    (evaluate_one_epoch, train.py:378-428). Returns the arrays the host-side
    AP pipeline consumes."""

    @jax.jit
    def forward(state: TrainState, batch):
        params = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        ep = model.apply(
            {"params": params, "batch_stats": bs},
            batch["point_clouds"], train=False,
        )
        loss, metrics = get_loss(ep, batch, cfg)
        keep = (
            "center", "heading_scores", "heading_residuals", "size_scores",
            "size_residuals", "sem_cls_scores", "objectness_scores",
            "iou_scores", "size", "heading", "seed_xyz", "seed_features",
            "vote_xyz", "vote_features", "aggregated_vote_xyz",
        )
        out = {k: ep[k] for k in keep if k in ep}
        return out, metrics

    return forward
