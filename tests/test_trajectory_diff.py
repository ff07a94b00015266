"""Training-TRAJECTORY differential tests against the reference.

The full-model forward diff (test_full_model_diff.py) checks one forward on
transplanted weights; these tests check actual OPTIMIZATION:

- 5 supervised pretrain steps (reference pretrain.py:310-347: torch Adam,
  forward_with_pred_jitter + get_labeled_loss + backward + step) vs 5 of our
  jitted pretrain steps from the same initial weights on identical batches —
  per-step losses and final parameters must track within f32-accumulation
  tolerance.
- One SSL step incl. the mean-teacher EMA update (train.py:305-371,285-289)
  with ``reference_exact=True``.

The reference runs on CPU torch with its CUDA extension backed by OUR
kernels (reference_bridge.install_pointnet2_shim — forward AND backward), so
any trajectory mismatch isolates model/loss/optimizer math. The box-jitter
noise (votenet_iou_branch.py:166-167) is the one stochastic input: the test
precomputes OUR model's jax.random draws for each step and feeds the exact
same arrays to the reference by patching torch.randn.
"""
import numpy as np
import pytest

from tests.reference_bridge import (
    install_pointnet2_shim, load, reference_available)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

N_POINTS = 2048
N_PROPOSAL = 64
G = 4  # GT boxes per scene


class _RandnQueue:
    """Patch torch.randn to pop precomputed arrays (shape-checked), so the
    reference's jitter draws equal our model's jax.random draws."""

    def __init__(self, torch):
        self.torch = torch
        self.queue = []
        self._orig = torch.randn

    def push(self, *arrays):
        self.queue.extend(arrays)

    def __enter__(self):
        def fake_randn(*shape, **kw):
            if len(shape) == 1 and not isinstance(shape[0], int):
                shape = tuple(shape[0])
            assert self.queue, f"torch.randn called with empty queue {shape}"
            arr = self.queue.pop(0)
            assert tuple(arr.shape) == tuple(shape), (arr.shape, shape)
            return self.torch.from_numpy(arr)

        self.torch.randn = fake_randn
        return self

    def __exit__(self, *exc):
        self.torch.randn = self._orig
        assert not self.queue or exc[0] is not None, \
            f"{len(self.queue)} queued noise arrays never consumed"


def _jitter_noise(jitter_rng, b, k):
    """Replicate forward_with_pred_jitter's draws (models/votenet.py):
    k1, k2 = split(jitter_rng); noise = normal(ki, (B, K, 3))."""
    import jax

    k1, k2 = jax.random.split(jitter_rng)
    nc = np.asarray(jax.random.normal(k1, (b, k, 3)), np.float32)
    ns = np.asarray(jax.random.normal(k2, (b, k, 3)), np.float32)
    return nc, ns


def _labels_np(rng, cfg, b):
    mask = np.ones((b, G), np.float32)
    return {
        "center_label": rng.uniform(-1.5, 1.5, (b, G, 3)).astype(np.float32),
        "box_label_mask": mask,
        "heading_class_label": np.zeros((b, G), np.int64),
        "heading_residual_label": np.zeros((b, G), np.float32),
        "size_class_label": rng.randint(0, cfg.num_size_cluster, (b, G)),
        "size_residual_label": rng.uniform(-0.05, 0.05, (b, G, 3)).astype(np.float32),
        "sem_cls_label": rng.randint(0, cfg.num_class, (b, G)),
        "vote_label": (rng.randn(b, N_POINTS, 9) * 0.1).astype(np.float32),
        "vote_label_mask": rng.randint(0, 2, (b, N_POINTS)).astype(np.int64),
    }


def _cloud(rng, b):
    pc = np.zeros((b, N_POINTS, 4), np.float32)
    pc[..., 0:3] = rng.uniform(-3.0, 3.0, (b, N_POINTS, 3))
    pc[..., 3] = pc[..., 2] - pc[..., 2].min()
    return pc


# Adam eps for BOTH sides. At t=1 the Adam update is ~lr*sign(g): with the
# torch-default 1e-8, any f32 grad difference flips the sign of near-zero-
# gradient coordinates and turns into a FULL-SIZE (2*lr) parameter split —
# trajectory comparison is ill-conditioned regardless of implementation
# correctness. eps=1e-3 bounds the amplification while still exercising the
# exact same moment/bias-correction/update math.
ADAM_EPS = 1e-3


def _ref_net_and_adam(dc, lr):
    import torch
    import torch.optim as optim

    ref_v = load("models.votenet_iou_branch")
    net = ref_v.VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        input_feature_dim=1, num_proposal=N_PROPOSAL, sampling="seed_fps",
        dataset_config=dc)
    net.train()
    for mod in net.modules():
        if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
            mod.momentum = 0.5  # BNMomentumScheduler at epoch 0
    return net, optim.Adam(net.parameters(), lr=lr, weight_decay=0,
                           eps=ADAM_EPS)


def _torch_batch(batch):
    import torch

    return {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}


def _param_drift(our_params, ref_net):
    """Max |ours - ref| over every transplantable parameter, normalized by
    the parameter's own scale."""
    import jax
    from tests.test_full_model_diff import _ref_key

    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    worst = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            {"params": our_params})[0]:
        names = [p.key for p in path]
        key = _ref_key(names)
        if key not in sd:
            continue  # zero-bias Dense slots with no reference counterpart
        val = np.asarray(leaf, np.float32)
        ref = sd[key]
        if names[-1] == "kernel":
            val = val.T.reshape(ref.shape)
        scale = max(float(np.abs(ref).max()), 1e-3)
        worst = max(worst, float(np.abs(val - ref).max()) / scale)
    return worst


def _param_absdiff(our_params, ref_net):
    """Max elementwise |ours - ref| over every transplantable parameter."""
    import jax
    from tests.test_full_model_diff import _ref_key

    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    worst = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            {"params": our_params})[0]:
        names = [p.key for p in path]
        key = _ref_key(names)
        if key not in sd:
            continue
        val = np.asarray(leaf, np.float32)
        ref = sd[key]
        if names[-1] == "kernel":
            val = val.T.reshape(ref.shape)
        worst = max(worst, float(np.abs(val - ref).max()))
    return worst


def _tree_drift(tree_a, tree_b):
    """Max over leaves of max|a-b| normalized by the leaf's own scale."""
    import jax

    worst = 0.0
    for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(float(np.abs(a).max()), 1e-3)
        worst = max(worst, float(np.abs(a - b).max()) / scale)
    return worst


@pytest.mark.slow
def test_pretrain_trajectory_matches_reference():
    """5 reference pretrain steps (torch Adam) vs 5 of ours from identical
    weights, batches, and jitter noise (pretrain.py:310-347).

    What can honestly be asserted: the loss surface here is CHAOTIC w.r.t.
    implementation noise — a 1e-6 input perturbation moves the step-0 loss
    by ~7e-4 relative (700x amplification) and later losses by tens of
    percent, because tiny activation drift flips discrete routing decisions
    (FPS selections, ball-query membership, max-pool argmaxes, IoU label
    assignment). NO two f32 implementations can track per-step losses
    tightly past the first update. So the test measures our own CHAOS
    ENVELOPE (a second run of our trajectory from an input perturbed by
    1e-6) and asserts the reference's divergence from us is within a small
    multiple of that envelope — plus tight step-0 checks (loss to 2e-3;
    full-gradient cosine/L2) that validate forward+backward+loss math
    directly before chaos compounds."""
    import jax
    import jax.numpy as jnp
    import torch

    install_pointnet2_shim()
    ref_lab = load("models.loss_helper_labeled")
    ref_sc = load("scannet.model_util_scannet")
    from tests.test_full_model_diff import _ref_key, _transplant
    from iou3dmatch_tpu.losses import get_labeled_loss
    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.train import create_train_state, make_pretrain_step

    lr = 1e-3  # pretrain.py:45 BASE_LEARNING_RATE
    b = 2
    model, cfg = build_votenet("scannet", num_proposal=N_PROPOSAL)
    dc = ref_sc.ScannetDatasetConfig()
    ref_net, ref_opt = _ref_net_and_adam(dc, lr)

    rng0 = np.random.RandomState(0)
    example = _labels_np(rng0, cfg, b)
    example["point_clouds"] = _cloud(rng0, b)
    state0 = create_train_state(
        model, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in example.items()})
    _transplant({"params": state0.params, "batch_stats": state0.batch_stats},
                ref_net)

    step = make_pretrain_step(model, cfg, adam_eps=ADAM_EPS)
    base_key = jax.random.PRNGKey(42)

    batches = []
    for i in range(5):
        rng = np.random.RandomState(100 + i)
        batch = _labels_np(rng, cfg, b)
        batch["point_clouds"] = _cloud(rng, b)
        batches.append(batch)

    def run_ours(perturb):
        state = jax.tree.map(jnp.copy, state0)
        losses = []
        for i, batch in enumerate(batches):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            if perturb:
                noise = np.random.RandomState(1234 + i).randn(
                    *batch["point_clouds"].shape).astype(np.float32)
                jb["point_clouds"] = jb["point_clouds"] + 1e-6 * noise
            state, metrics = step(
                state, jb, jax.random.fold_in(base_key, i), lr, 0.5)
            losses.append(float(metrics["loss"]))
        return losses, state

    losses, state = run_ours(perturb=False)
    chaos_losses, chaos_state = run_ours(perturb=True)

    ref_losses = []
    ref_grads0 = None
    with _RandnQueue(torch) as q:
        for i, batch in enumerate(batches):
            q.push(*_jitter_noise(jax.random.fold_in(base_key, i),
                                  b, N_PROPOSAL))
            # reference step (pretrain.py:317-332)
            tb = _torch_batch(batch)
            ref_opt.zero_grad()
            end_points = ref_net.forward_with_pred_jitter(
                {"point_clouds": tb["point_clouds"]})
            for key in tb:
                end_points[key] = tb[key]
            end_points["supervised_mask"] = torch.ones(b).long()
            ref_loss, _ = ref_lab.get_labeled_loss(
                end_points, dc, {"dataset_config": dc})
            ref_loss.backward()
            if i == 0:
                ref_grads0 = {k: p.grad.detach().numpy().copy()
                              for k, p in ref_net.named_parameters()
                              if p.grad is not None}
            ref_opt.step()
            ref_losses.append(float(ref_loss.detach()))

    # 1) step 0 loss: pure forward+loss parity, before any chaos
    np.testing.assert_allclose(losses[0], ref_losses[0], rtol=2e-3)

    # 2) step-0 FULL GRADIENT agreement in aggregate: cosine similarity and
    # relative L2 of the concatenated gradient vector. Elementwise equality
    # is impossible (max-pool/ReLU routing flips on f32 near-ties — measured
    # both cross-implementation and under our own 1e-6 self-perturbation),
    # but the aggregate direction/magnitude must match tightly.
    def grads0_ours():
        jb = {k: jnp.asarray(v) for k, v in batches[0].items()}

        def loss_fn(params):
            ep, _ = model.apply(
                {"params": params, "batch_stats": state0.batch_stats},
                jb["point_clouds"], jax.random.fold_in(base_key, 0),
                train=True, momentum=0.5, mutable=["batch_stats"],
                method=model.forward_with_pred_jitter)
            loss, _ = get_labeled_loss(ep, jb, cfg, b)
            return loss

        return jax.grad(loss_fn)(state0.params)

    ours_vec, ref_vec = [], []
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            {"params": grads0_ours()})[0]:
        names = [p.key for p in path]
        key = _ref_key(names)
        if key not in ref_grads0:
            continue
        val = np.asarray(leaf, np.float32)
        ref = ref_grads0[key]
        if names[-1] == "kernel":
            val = val.T.reshape(ref.shape)
        ours_vec.append(val.ravel())
        ref_vec.append(ref.ravel())
    g_ours = np.concatenate(ours_vec).astype(np.float64)
    g_ref = np.concatenate(ref_vec).astype(np.float64)
    cos = g_ours @ g_ref / (np.linalg.norm(g_ours) * np.linalg.norm(g_ref))
    rel_l2 = np.linalg.norm(g_ours - g_ref) / np.linalg.norm(g_ref)
    assert cos > 0.999, f"step-0 gradient cosine {cos}"
    assert rel_l2 < 0.05, f"step-0 gradient rel L2 {rel_l2}"

    # 3) steps 1..4: cross-implementation divergence must be explained by
    # the measured chaos envelope (ours vs ours-with-1e-6-perturbation)
    chaos = max(abs(a - c) / r for a, c, r in
                zip(losses[1:], chaos_losses[1:], ref_losses[1:]))
    for i in range(1, 5):
        cross = abs(losses[i] - ref_losses[i]) / ref_losses[i]
        assert cross <= max(4.0 * chaos, 0.02), (
            f"step {i}: cross-impl divergence {cross:.4f} exceeds 4x the "
            f"self-chaos envelope {chaos:.4f}; ours={losses} "
            f"chaos={chaos_losses} ref={ref_losses}")

    # 4) final parameters: cross drift bounded by the self-chaos drift
    self_drift = _tree_drift(state.params, chaos_state.params)
    cross_drift = _param_drift(state.params, ref_net)
    assert cross_drift <= max(4.0 * self_drift, 5e-3), (
        f"param drift {cross_drift} vs self-chaos {self_drift}")


@pytest.mark.slow
def test_ssl_step_with_ema_matches_reference():
    """ONE full SSL step — mixed labeled+unlabeled batch, train-mode teacher
    forward, labeled + 2.0x unlabeled loss, Adam, EMA update with warmup
    alpha=min(1-1/(gs+1), 0.999) at gs=1 (train.py:305-371, 285-289) — with
    reference_exact=True numerics."""
    import jax
    import jax.numpy as jnp
    import torch

    install_pointnet2_shim()
    ref_lab = load("models.loss_helper_labeled")
    ref_unl = load("models.loss_helper_unlabeled")
    ref_sc = load("scannet.model_util_scannet")
    from tests.test_full_model_diff import _transplant
    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.train import create_train_state, make_ssl_step

    lr = 2e-3  # train.py:49
    bl, bu = 1, 2
    b = bl + bu
    model, cfg = build_votenet("scannet", num_proposal=N_PROPOSAL)
    dc = ref_sc.ScannetDatasetConfig()
    ref_net, ref_opt = _ref_net_and_adam(dc, lr)
    ref_ema, _ = _ref_net_and_adam(dc, lr)

    rng = np.random.RandomState(7)
    batch = _labels_np(rng, cfg, bl)
    batch["point_clouds"] = _cloud(rng, b)
    batch["ema_point_clouds"] = _cloud(rng, b)
    batch["flip_x_axis"] = rng.randint(0, 2, (b,)).astype(np.int64)
    batch["flip_y_axis"] = rng.randint(0, 2, (b,)).astype(np.int64)
    from iou3dmatch_tpu.data.pc_util import rotz

    angles = rng.uniform(-0.1, 0.1, b).astype(np.float32)
    batch["rot_mat"] = np.stack([rotz(a) for a in angles]).astype(np.float32)
    batch["rot_angle"] = angles
    batch["scale"] = np.tile(
        rng.uniform(0.9, 1.1, (b, 1, 1)), (1, 1, 3)).astype(np.float32)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(model, jax.random.PRNGKey(1), jb, with_ema=True)
    _transplant({"params": state.params, "batch_stats": state.batch_stats},
                ref_net)
    # teacher starts from the same pretrain weights (train.py:204-228) but is
    # a DISTINCT module; perturb ours+theirs identically to make the EMA
    # update's alpha-mix observable (ema != params)
    pr = np.random.RandomState(11)
    ema_params = jax.tree.map(
        lambda x: np.asarray(x) * (1.0 + 0.01 * pr.randn(*x.shape)).astype(np.float32)
        if x.dtype == np.float32 else np.asarray(x), state.ema_params)
    state = state.replace(ema_params=jax.tree.map(jnp.asarray, ema_params))
    _transplant({"params": state.ema_params,
                 "batch_stats": state.ema_batch_stats}, ref_ema)

    # thresholds from teacher-output quantiles so a NON-TRIVIAL pseudo-label
    # subset passes (fixed 0.9/0.9/0.25 would select nothing untrained);
    # probe with a train-mode teacher forward identical to the in-step one
    import scipy.special as sp

    step_rng = jax.random.PRNGKey(5)
    t_rng, s_rng = jax.random.split(step_rng)
    probe, _ = model.apply(
        {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
        jb["ema_point_clouds"], t_rng, train=True, momentum=0.5,
        mutable=["batch_stats"], method=model.forward_with_pred_jitter)
    pos_obj = sp.softmax(np.asarray(probe["objectness_scores"][bl:]), -1)[..., 1]
    cls_probs = sp.softmax(np.asarray(probe["sem_cls_scores"][bl:]), -1)
    iou_at = 1.0 / (1.0 + np.exp(-np.take_along_axis(
        np.asarray(probe["iou_scores"][bl:]),
        cls_probs.argmax(-1)[..., None], axis=2)[..., 0]))
    thr = dict(obj_threshold=float(np.quantile(pos_obj, 0.3)),
               cls_threshold=float(np.quantile(cls_probs.max(-1), 0.3)),
               iou_threshold=float(np.quantile(iou_at, 0.2)))

    # ---- reference step (train.py:328-354)
    tb = _torch_batch(batch)
    tb["supervised_mask"] = torch.cat([torch.ones(bl), torch.zeros(bu)]).long()
    with _RandnQueue(torch) as q:
        q.push(*_jitter_noise(t_rng, b, N_PROPOSAL))
        q.push(*_jitter_noise(s_rng, b, N_PROPOSAL))
        ref_opt.zero_grad()
        with torch.no_grad():
            ema_end_points = ref_ema.forward_with_pred_jitter(
                {"point_clouds": tb["ema_point_clouds"]})
        end_points = ref_net.forward_with_pred_jitter(
            {"point_clouds": tb["point_clouds"]})
        for key in tb:
            end_points[key] = tb[key]
        det_loss, end_points = ref_lab.get_labeled_loss(
            end_points, dc, {"dataset_config": dc})
        cd = {"dataset_config": dc, "unlabeled_batch_size": bu,
              "nms_iou": 0.25, "use_old_type_nms": False, "use_lhs": True,
              "samecls_match": False, "view_stats": False,
              "dataset": "scannet", **thr}
        unl_loss, end_points = ref_unl.get_unlabeled_loss(
            end_points, ema_end_points, dc, cd)
        ref_loss = det_loss + unl_loss * 2.0
        ref_loss.backward()
        ref_opt.step()
        # global_step 0 -> 1, alpha = min(1 - 1/2, 0.999) = 0.5
        for ema_p, p in zip(ref_ema.parameters(), ref_net.parameters()):
            ema_p.data.mul_(0.5).add_(p.data, alpha=0.5)

    # ---- our step
    step = make_ssl_step(model, cfg, num_labeled=bl, reference_exact=True,
                         adam_eps=ADAM_EPS, **thr)
    new_state, metrics = step(state, jb, step_rng, lr, 0.5)

    np.testing.assert_allclose(
        float(metrics["supervised_loss"]), float(det_loss), rtol=3e-3)
    # the unlabeled loss rides on DISCRETE pseudo-label selection (obj/cls/
    # IoU threshold comparisons, LHS pick sets) applied to teacher outputs
    # that carry ~1e-3 cross-implementation activation drift — borderline
    # boxes flip in/out of the pseudo-label set, moving the loss by ~1%
    # while the math itself is diff-tested exactly on identical inputs
    # (test_reference_diff.py::test_get_unlabeled_loss_matches_reference)
    np.testing.assert_allclose(
        float(metrics["unsupervised_loss"]), float(unl_loss), rtol=2.5e-2,
        atol=1e-4)
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_loss),
                               rtol=2e-2)
    # After ONE Adam step every |update| <= lr * |g|/(|g|+eps) < lr, so the
    # parameter split is elementwise-bounded by ~2*lr even where gradient
    # SIGNS flip under implementation noise (zero-init biases with |g|~0 —
    # a scale-relative drift metric is meaningless there).
    assert _param_absdiff(new_state.params, ref_net) < 2.5 * lr
    # ema = 0.5*ema0 + 0.5*params1 on both sides and ema0 is transplanted
    # identically, so the EMA split is half the student split
    assert _param_absdiff(new_state.ema_params, ref_ema) < 1.3 * lr
