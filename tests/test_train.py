"""Train-step tests: pretrain step, SSL step (teacher+student+EMA),
checkpoint round-trip, multi-chip data-parallel execution on a CPU mesh."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iou3dmatch_tpu.models.factory import build_votenet
from iou3dmatch_tpu.train import (
    create_train_state, make_pretrain_step, make_ssl_step, make_eval_forward,
    checkpoint, get_lr, get_bn_momentum,
)
from iou3dmatch_tpu.parallel import make_mesh, shard_batch, replicate

N_POINTS = 256
G = 4


def _labels(rng, cfg, b):
    mask = np.ones((b, G), np.float32)
    mask[:, -1] = 0
    return {
        "center_label": jnp.asarray(rng.uniform(-2, 2, (b, G, 3)).astype(np.float32)),
        "box_label_mask": jnp.asarray(mask),
        "heading_class_label": jnp.zeros((b, G), jnp.int32),
        "heading_residual_label": jnp.zeros((b, G), jnp.float32),
        "size_class_label": jnp.asarray(rng.randint(0, cfg.num_size_cluster, (b, G))),
        "size_residual_label": jnp.asarray(rng.uniform(-0.05, 0.05, (b, G, 3)).astype(np.float32)),
        "sem_cls_label": jnp.asarray(rng.randint(0, cfg.num_class, (b, G))),
        "vote_label": jnp.asarray(rng.randn(b, N_POINTS, 9).astype(np.float32) * 0.1),
        "vote_label_mask": jnp.asarray(rng.randint(0, 2, (b, N_POINTS)).astype(np.int32)),
    }


def _pretrain_batch(rng, cfg, b=2):
    batch = _labels(rng, cfg, b)
    batch["point_clouds"] = jnp.asarray(rng.randn(b, N_POINTS, 4).astype(np.float32))
    return batch


def _ssl_batch(rng, cfg, bl=1, bu=1):
    b = bl + bu
    batch = _labels(rng, cfg, bl)
    batch["point_clouds"] = jnp.asarray(rng.randn(b, N_POINTS, 4).astype(np.float32))
    batch["ema_point_clouds"] = jnp.asarray(rng.randn(b, N_POINTS, 4).astype(np.float32))
    batch["flip_x_axis"] = jnp.asarray(rng.randint(0, 2, (b,)))
    batch["flip_y_axis"] = jnp.asarray(rng.randint(0, 2, (b,)))
    batch["rot_mat"] = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (b, 1, 1)))
    batch["rot_angle"] = jnp.zeros((b,), jnp.float32)
    batch["scale"] = jnp.ones((b, 1, 3), jnp.float32)
    return batch


def _donable(state):
    """Deep-copy a TrainState: the train steps donate their state arg, so a
    module-scoped fixture's state must not be passed in directly."""
    return jax.tree.map(jnp.copy, state)


@pytest.fixture(scope="module")
def setup():
    model, cfg = build_votenet("scannet", tiny=True)
    rng = np.random.RandomState(0)
    batch = _pretrain_batch(rng, cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, with_ema=True)
    return model, cfg, state, batch


def test_schedules():
    assert get_lr(0, 1e-3, [400, 600, 800], [0.1, 0.1, 0.1]) == 1e-3
    assert abs(get_lr(650, 1e-3, [400, 600, 800], [0.1, 0.1, 0.1]) - 1e-5) < 1e-12
    assert get_bn_momentum(0) == 0.5
    assert get_bn_momentum(20) == 0.25
    assert get_bn_momentum(10000) == 0.001


def test_pretrain_step_updates(setup):
    model, cfg, state, batch = setup
    step = make_pretrain_step(model, cfg)
    new_state, metrics = step(_donable(state), batch, jax.random.PRNGKey(1), 1e-3, 0.5)
    assert np.isfinite(float(metrics["loss"]))
    # params moved
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree.leaves(d)) > 0
    assert int(new_state.step) == 1


def test_ssl_step(setup):
    model, cfg, state, _ = setup
    rng = np.random.RandomState(1)
    batch = _ssl_batch(rng, cfg)
    step = make_ssl_step(model, cfg, num_labeled=1)
    new_state, metrics = step(_donable(state), batch, jax.random.PRNGKey(2), 2e-3, 0.5)
    assert np.isfinite(float(metrics["loss"]))
    assert "unlabeled_detection_loss" in metrics
    # EMA warmup: the reference's first update uses global_step=1 ->
    # alpha = min(1-1/2, .999) = 0.5 (train.py:353-354,285-287), so
    # ema1 = 0.5*ema0 + 0.5*params1
    expect = jax.tree.map(
        lambda e0, p1: 0.5 * e0 + 0.5 * p1, state.ema_params, new_state.params
    )
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), expect, new_state.ema_params
    )
    assert max(jax.tree.leaves(diff)) < 1e-6


def test_eval_forward(setup):
    model, cfg, state, batch = setup
    fwd = make_eval_forward(model, cfg)
    out, metrics = fwd(state, batch)
    assert np.isfinite(float(metrics["detection_loss"]))
    assert out["center"].shape[0] == batch["point_clouds"].shape[0]


def test_checkpoint_roundtrip(setup, tmp_path):
    model, cfg, state, batch = setup
    path = str(tmp_path / "ckpt.msgpack")
    checkpoint.save(path, state, epoch=7, loss=1.25)
    restored, epoch, loss = checkpoint.load(path, state)
    assert epoch == 7 and abs(loss - 1.25) < 1e-9
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # pretrain -> SSL load: both student and teacher get the weights
    ssl = checkpoint.load_pretrain_into_ssl(path, state)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(ssl.ema_params)[0]), np.asarray(a)
    )


def test_export_torch_cli(setup, tmp_path):
    """cli/export_torch writes a reference-layout torch checkpoint whose
    tensors are bit-equal to export_state_dict of the saved state."""
    torch = pytest.importorskip("torch")

    from iou3dmatch_tpu.cli.export_torch import main
    from iou3dmatch_tpu.train.torch_import import export_state_dict

    model, cfg, state, batch = setup
    path = str(tmp_path / "ckpt.msgpack")
    checkpoint.save(path, state, epoch=3, loss=0.5)
    out = str(tmp_path / "checkpoint.tar")
    # num_target 16 = build_votenet's tiny default, matching the fixture
    main([path, out, "--tiny", "--num_target", "16"])

    payload = torch.load(out)
    assert payload["epoch"] == 3
    assert "ema_model_state_dict" in payload  # fixture state has a teacher
    sd = payload["model_state_dict"]
    # reference module layouts: SharedMLP = 1x1 Conv2d, heads = Conv1d
    assert tuple(sd["backbone_net.sa1.mlp_module.layer0.conv.weight"]
                 .shape[2:]) == (1, 1)
    assert sd["pnet.conv1.weight"].ndim == 3
    expect = export_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats})
    assert set(sd) == set(expect)
    for k, v in expect.items():
        np.testing.assert_array_equal(sd[k].numpy(), v, err_msg=k)


@pytest.mark.slow
def test_multichip_ssl_step(setup):
    """Full SSL train step sharded over the 8-device CPU mesh."""
    model, cfg, state, _ = setup
    n = jax.device_count()
    assert n == 8, f"expected 8 virtual devices, got {n}"
    rng = np.random.RandomState(2)
    batch = _ssl_batch(rng, cfg, bl=8, bu=16)

    mesh = make_mesh()
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    step = make_ssl_step(model, cfg, num_labeled=8)
    new_state, metrics = step(_donable(state_r), batch_s, jax.random.PRNGKey(3), 2e-3, 0.5)
    assert np.isfinite(float(metrics["loss"]))

    # single-device reference: same batch unsharded must agree closely
    new_state1, metrics1 = step(_donable(state), batch, jax.random.PRNGKey(3), 2e-3, 0.5)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics1["loss"]), rtol=2e-3
    )


@pytest.mark.slow
def test_multichip_paper_batch_config(setup):
    """The paper config --batch_size 4,8 (reference train.py:47-48) is
    PER-DEVICE in the CLI: on the 8-device mesh the global batch is 32
    labeled + 64 unlabeled. The step must run sharded and every metric be
    finite at exactly this configuration."""
    model, cfg, state, _ = setup
    n = jax.device_count()
    bl_dev, bu_dev = 4, 8  # reference train.py:47-48
    bl, bu = bl_dev * n, bu_dev * n
    rng = np.random.RandomState(4)
    batch = _ssl_batch(rng, cfg, bl=bl, bu=bu)

    mesh = make_mesh()
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    step = make_ssl_step(model, cfg, num_labeled=bl)
    new_state, metrics = step(
        _donable(state_r), batch_s, jax.random.PRNGKey(5), 2e-3, 0.5)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["unlabeled_detection_loss"]))
    assert int(new_state.step) == 1


def test_shard_batch_rejects_indivisible(setup):
    """A hand-built batch whose leading dim is not divisible by the mesh
    size must fail fast in shard_batch with an actionable message, not deep
    inside GSPMD."""
    model, cfg, state, _ = setup
    rng = np.random.RandomState(5)
    batch = _ssl_batch(rng, cfg, bl=4, bu=8)  # 12 rows on 8 devices
    mesh = make_mesh()
    with pytest.raises(ValueError, match="per-device"):
        shard_batch(batch, mesh)


def test_host_local_batch_to_global():
    """Multi-host batch assembly helper on the single-process 8-device mesh
    (process-local data == global data here, sharded over the mesh)."""
    from iou3dmatch_tpu.parallel import make_global_mesh, host_local_batch_to_global

    mesh = make_global_mesh()
    batch = {"a": np.arange(16, dtype=np.float32).reshape(8, 2),
             "b": np.ones((8, 3, 4), np.float32)}
    g = host_local_batch_to_global(batch, mesh)
    assert g["a"].shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(g["a"]), batch["a"])
    assert len(g["a"].sharding.device_set) == 8


@pytest.mark.slow
def test_jitter_rows_matches_full_jitter_in_eval_mode(setup):
    """The jitter_rows restructure (GridConv on (B+nl, K) boxes, jitter rows
    riding along as extra scenes) must be per-box identical to the reference
    (B, 2K) layout. In eval mode BatchNorm uses running statistics — the only
    thing the restructure changes, the train-mode batch-stat population, is
    out of the picture — so iou_scores and the labeled rows' jitter scores
    must agree exactly."""
    model, cfg, state, _ = setup
    rng = np.random.RandomState(3)
    batch = _ssl_batch(rng, cfg, bl=1, bu=2)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    jrng = jax.random.PRNGKey(7)

    ep_full = model.apply(variables, batch["point_clouds"], jrng, train=False,
                          method=model.forward_with_pred_jitter)
    ep_fast = model.apply(variables, batch["point_clouds"], jrng, train=False,
                          method=model.forward_with_pred_jitter, jitter_rows=1)

    np.testing.assert_allclose(np.asarray(ep_fast["iou_scores"]),
                               np.asarray(ep_full["iou_scores"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ep_fast["iou_scores_jitter"]),
                               np.asarray(ep_full["iou_scores_jitter"][:1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ep_fast["jitter_center"]),
                               np.asarray(ep_full["jitter_center"][:1]),
                               rtol=1e-6, atol=1e-6)
    assert ep_fast["jitter_size"].shape == (1,) + ep_full["jitter_size"].shape[1:]


def test_flat_adam_matches_leafwise(setup):
    """The flat-raveled Adam/EMA update (train/steps.py::_flat_apply_updates)
    must match the per-leaf optax form — Adam is elementwise, so raveling only
    changes kernel granularity. Equality is to f32-ULP tolerance: XLA fuses
    the flat path differently (FMA contraction), so exact bitwise equality
    with the op-by-op leaf path is not guaranteed."""
    import optax
    from iou3dmatch_tpu.train.state import make_optimizer
    from iou3dmatch_tpu.train.steps import _flat_apply_updates
    from jax.flatten_util import ravel_pytree

    model, cfg, state, _ = setup
    rng = np.random.RandomState(11)
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)),
        state.params,
    )
    lr = 1e-3

    for weight_decay in (0.0, 1e-4):
        tx = make_optimizer(weight_decay)
        flat_state = state.replace(opt_state=tx.init(ravel_pytree(state.params)[0]))
        new_flat = jax.jit(
            lambda s, g: _flat_apply_updates(tx, s, g, lr)[0]
        )(flat_state, grads)

        leaf_opt = tx.init(state.params)
        updates, _ = tx.update(grads, leaf_opt, state.params)
        new_leaf = optax.apply_updates(
            state.params, jax.tree.map(lambda u: -lr * u, updates)
        )

        for a, b in zip(jax.tree.leaves(new_flat), jax.tree.leaves(new_leaf)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-7, atol=1e-9
            )


def test_reference_exact_step_runs(setup):
    """Both the fast default and the reference-exact SSL step run and
    produce finite, param-moving updates."""
    model, cfg, state, _ = setup
    rng = np.random.RandomState(5)
    batch = _ssl_batch(rng, cfg, bl=1, bu=2)
    for exact in (False, True):
        step = make_ssl_step(model, cfg, num_labeled=1, reference_exact=exact)
        new_state, m = step(_donable(state), batch, jax.random.PRNGKey(4), 2e-3, 0.5)
        assert np.isfinite(float(m["loss"])), exact
        assert np.isfinite(float(m["unsupervised_loss"])), exact
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params, new_state.params)
        assert max(jax.tree.leaves(d)) > 0


def test_fast_step_repair_knobs(setup):
    """The round-5 repair knobs (train/steps.py): each pruning of the fast
    SSL step is independently revertible, and reverting BOTH is bit-identical
    to reference_exact=True (the refactor changes no numerics)."""
    model, cfg, state, _ = setup
    rng = np.random.RandomState(6)
    batch = _ssl_batch(rng, cfg, bl=1, bu=2)
    key, lr, mom = jax.random.PRNGKey(9), 2e-3, 0.5

    # each knob alone runs and moves params
    for kw in ({"exact_jitter": True}, {"full_teacher": True}):
        step = make_ssl_step(model, cfg, num_labeled=1, **kw)
        ns, m = step(_donable(state), batch, key, lr, mom)
        assert np.isfinite(float(m["loss"])), kw
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params, ns.params)
        assert max(jax.tree.leaves(d)) > 0, kw

    # both knobs == reference_exact, bit for bit
    s_exact = make_ssl_step(model, cfg, num_labeled=1, reference_exact=True)
    s_knobs = make_ssl_step(model, cfg, num_labeled=1,
                            full_teacher=True, exact_jitter=True)
    n1, m1 = s_exact(_donable(state), batch, key, lr, mom)
    n2, m2 = s_knobs(_donable(state), batch, key, lr, mom)
    assert float(m1["loss"]) == float(m2["loss"])
    for a, b in zip(jax.tree.leaves(n1.params), jax.tree.leaves(n2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multichip_eval_forward(setup):
    """make_eval_forward on a batch sharded over the 8-device CPU mesh
    (VERDICT r3 #6: eval was only ever exercised single-device). The
    sharded run must agree with the unsharded one — eval has no
    cross-scene coupling (BN uses running stats in eval mode), so this is
    an equality check up to reduction order."""
    model, cfg, state, _ = setup
    rng = np.random.RandomState(7)
    batch = _pretrain_batch(rng, cfg, b=8)

    fwd = make_eval_forward(model, cfg)
    out1, metrics1 = fwd(state, batch)

    mesh = make_mesh()
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    out8, metrics8 = fwd(state_r, batch_s)

    np.testing.assert_allclose(
        float(metrics8["detection_loss"]), float(metrics1["detection_loss"]),
        rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out8["center"]), np.asarray(out1["center"]),
        rtol=1e-4, atol=1e-5)


def test_checkpoint_save_restore_under_mesh(setup, tmp_path):
    """Save from a mesh-replicated TrainState, restore, re-replicate and
    resume with a sharded step (VERDICT r3 #6: a save-under-mesh
    regression was previously invisible)."""
    model, cfg, state, _ = setup
    mesh = make_mesh()
    state_r = replicate(state, mesh)

    path = str(tmp_path / "ckpt_mesh.msgpack")
    checkpoint.save(path, state_r, epoch=11, loss=0.5)
    restored, epoch, loss = checkpoint.load(path, state)
    assert epoch == 11
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume: replicate the restored state and take one sharded SSL step
    rng = np.random.RandomState(8)
    batch_s = shard_batch(_ssl_batch(rng, cfg, bl=8, bu=8), mesh)
    step = make_ssl_step(model, cfg, num_labeled=8)
    new_state, metrics = step(replicate(restored, mesh), batch_s,
                              jax.random.PRNGKey(9), 2e-3, 0.5)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == int(state.step) + 1


def test_checkpoint_compat_strips_legacy_shared_mlp_bias(setup, tmp_path):
    """Pre-bias-free-SharedMLP checkpoints (rounds 1-3) carry
    mlp*/dense*/bias leaves the current model no longer has; they must
    still load (leaves stripped, optimizer restarted fresh, warning)."""
    import warnings

    from flax import serialization

    model, cfg, state, _ = setup
    path = str(tmp_path / "legacy.msgpack")
    checkpoint.save(path, state, epoch=3, loss=0.75)

    # forge the legacy layout: add a stale bias under the first SharedMLP
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    p = payload["state"]["params"]
    node = p["backbone_net"]["sa1"]["mlp"]["dense0"]
    assert "bias" not in node
    node["bias"] = np.full((node["kernel"].shape[1],), 0.05, np.float32)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        restored, epoch, _ = checkpoint.load(path, state)
    assert epoch == 3
    assert any("bias-free SharedMLP" in str(x.message) for x in w)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(restored.params)[0]))

    ssl = checkpoint.load_pretrain_into_ssl(path, state)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(ssl.ema_params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))


def test_checkpoint_compat_rejects_non_legacy_extra_leaves(setup, tmp_path):
    """An unmatched payload leaf that is NOT a legacy SharedMLP dense bias
    (e.g. from a different/newer architecture) must raise, not silently
    drop weights (ADVICE r4)."""
    import pytest
    from flax import serialization

    model, cfg, state, _ = setup
    path = str(tmp_path / "mismatched.msgpack")
    checkpoint.save(path, state, epoch=1, loss=0.5)

    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    p = payload["state"]["params"]
    p["backbone_net"]["sa1"]["extra_head"] = {
        "kernel": np.zeros((4, 4), np.float32)}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))

    with pytest.raises(ValueError, match="extra_head"):
        checkpoint.load(path, state)
