"""Model shape/behavior tests (tiny config; architecture identical)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iou3dmatch_tpu.models.factory import build_votenet


B, N = 2, 512


@pytest.fixture(scope="module")
def model_and_vars():
    model, cfg = build_votenet("scannet", tiny=True)
    rng = jax.random.PRNGKey(0)
    pc = jax.random.normal(rng, (B, N, 4))
    variables = model.init(
        {"params": rng},
        pc,
        jax.random.PRNGKey(1),
        train=False,
        method=model.forward_with_pred_jitter,
    )
    return model, cfg, variables, pc


def test_forward_shapes(model_and_vars):
    model, cfg, variables, pc = model_and_vars
    k = model.num_proposal
    ep = model.apply(variables, pc, train=False)
    assert ep["seed_xyz"].shape == (B, 64, 3)
    assert ep["seed_features"].shape == (B, 64, 256)
    assert ep["vote_xyz"].shape == (B, 64, 3)
    assert ep["objectness_scores"].shape == (B, k, 2)
    assert ep["center"].shape == (B, k, 3)
    assert ep["heading_scores"].shape == (B, k, cfg.num_heading_bin)
    assert ep["heading_residuals"].shape == (B, k, cfg.num_heading_bin)
    assert ep["size_scores"].shape == (B, k, cfg.num_size_cluster)
    assert ep["size_residuals"].shape == (B, k, cfg.num_size_cluster, 3)
    assert ep["sem_cls_scores"].shape == (B, k, cfg.num_class)
    assert ep["iou_scores"].shape == (B, k, cfg.num_class)
    assert ep["size"].shape == (B, k, 3)
    assert bool(jnp.all(ep["size"] > 0))
    # ScanNet: heading always zero (1 bin)
    np.testing.assert_array_equal(np.asarray(ep["heading"]), 0.0)


def test_vote_features_l2_normalized(model_and_vars):
    model, cfg, variables, pc = model_and_vars
    ep = model.apply(variables, pc, train=False)
    norms = np.asarray(jnp.linalg.norm(ep["vote_features"], axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_jitter_forward(model_and_vars):
    model, cfg, variables, pc = model_and_vars
    k = model.num_proposal
    ep = model.apply(
        variables, pc, jax.random.PRNGKey(2), train=False,
        method=model.forward_with_pred_jitter,
    )
    assert ep["iou_scores"].shape == (B, k, cfg.num_class)
    assert ep["iou_scores_jitter"].shape == (B, k, cfg.num_class)
    assert ep["jitter_center"].shape == (B, k, 3)
    assert bool(jnp.all(ep["jitter_size"] > 0))


def test_batch_stats_update_in_train_mode(model_and_vars):
    model, cfg, variables, pc = model_and_vars
    ep, updates = model.apply(
        variables, pc, train=True, momentum=0.5, mutable=["batch_stats"]
    )
    # running stats must have moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )
    assert moved


def test_iou_opt_gradients_flow_to_boxes(model_and_vars):
    """forward_onlyiou must be differentiable w.r.t. center/size
    (test-time IoU optimization, train.py:431-535)."""
    model, cfg, variables, pc = model_and_vars
    ep = model.apply(variables, pc, train=False)
    center, size, heading = ep["center"], ep["size"], ep["heading"]
    sem_cls = jnp.argmax(ep["sem_cls_scores"], -1)

    def f(c, s):
        out = model.apply(
            variables, ep, c, s, heading, method=model.forward_onlyiou
        )
        iou = jax.nn.sigmoid(out["iou_scores"])
        iou = jnp.take_along_axis(iou, sem_cls[..., None], axis=2)
        return jnp.sum(iou)

    gc, gs = jax.grad(f, argnums=(0, 1))(center, size)
    assert np.isfinite(np.asarray(gc)).all()
    assert np.isfinite(np.asarray(gs)).all()
    assert float(jnp.abs(gc).sum()) > 0


def test_sa_msg_and_lfp_modules():
    """MSG / single-scale / GroupAll / LFP variants (library-surface parity
    with pointnet2_modules.py:83-166,425-503)."""
    from iou3dmatch_tpu.models.pointnet2 import (
        PointnetSAModuleMSG, PointnetSAModule, PointnetLFPModuleMSG)

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 128, 8).astype(np.float32))

    msg = PointnetSAModuleMSG(npoint=32, radii=(0.5, 1.0), nsamples=(8, 16),
                              mlps=((8, 16, 16), (8, 16, 32)))
    vars_ = msg.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    new_xyz, out = msg.apply(vars_, xyz, feats, train=False)
    assert new_xyz.shape == (2, 32, 3) and out.shape == (2, 32, 48)

    glob = PointnetSAModule(mlp=(8, 16), npoint=None)
    vars_g = glob.init(jax.random.PRNGKey(1), xyz, feats, train=False)
    gx, gout = glob.apply(vars_g, xyz, feats, train=False)
    assert gx.shape == (2, 1, 3) and gout.shape == (2, 1, 16)

    lfp = PointnetLFPModuleMSG(radii=(0.8,), nsamples=(8,), mlps=((8, 16),),
                               post_mlp=(16 + 4, 8))
    xyz2 = xyz[:, :16]
    feats2 = jnp.asarray(rng.randn(2, 16, 4).astype(np.float32))
    vars_l = lfp.init(jax.random.PRNGKey(2), xyz2, xyz, feats2, feats, train=False)
    out_l = lfp.apply(vars_l, xyz2, xyz, feats2, feats, train=False)
    assert out_l.shape == (2, 16, 8)


def test_bf16_compute_close_to_f32():
    """compute_dtype='bfloat16' must produce outputs close to f32 (params
    and BN stats stay f32)."""
    from iou3dmatch_tpu.models.factory import build_votenet

    model32, cfg = build_votenet("scannet", tiny=True)
    model16, _ = build_votenet("scannet", tiny=True, compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    pc = jnp.asarray(rng.randn(1, 256, 4).astype(np.float32))
    v32 = model32.init({"params": jax.random.PRNGKey(0)}, pc, train=False)
    out32 = model32.apply(v32, pc, train=False)
    out16 = model16.apply(v32, pc, train=False)  # same params
    a = np.asarray(out32["objectness_scores"])
    b = np.asarray(out16["objectness_scores"])
    assert b.dtype == np.float32  # outputs cast back
    # bf16 has ~3 decimal digits; logits should broadly agree
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.98
