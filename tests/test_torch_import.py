"""Torch-checkpoint importer tests.

Roundtrip contract: transplant OUR randomly-initialized variables into the
reference VoteNet (tests/test_full_model_diff._transplant, the mapping the
full-model diff test already proves numerically), torch.save the reference's
own checkpoint dict (pretrain.py:371-406 layout), import it back through
iou3dmatch_tpu.train.torch_import — every leaf must come back bit-identical.
"""
import os

import numpy as np
import pytest

from tests.reference_bridge import (
    install_pointnet2_shim, load, reference_available)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


def _make_pair(dataset="scannet"):
    import jax
    import jax.numpy as jnp

    install_pointnet2_shim()
    ref_v = load("models.votenet_iou_branch")
    from iou3dmatch_tpu.models.factory import build_votenet

    if dataset == "scannet":
        dc = load("scannet.model_util_scannet").ScannetDatasetConfig()
    else:
        dc = load("sunrgbd.model_util_sunrgbd").SunrgbdDatasetConfig()
    ref_net = ref_v.VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        input_feature_dim=1, num_proposal=128, sampling="seed_fps",
        dataset_config=dc)
    ref_net.eval()

    model, _ = build_votenet(dataset)
    rng = np.random.RandomState(11)
    pc = np.zeros((1, 4096, 4), np.float32)
    pc[..., 0:3] = rng.uniform(-3.0, 3.0, (1, 4096, 3))
    pc[..., 3] = pc[..., 2] - pc[..., 2].min()
    variables = model.init({"params": jax.random.PRNGKey(4)},
                           jnp.asarray(pc), train=False)
    variables = jax.tree.map(np.asarray, variables)

    # non-default running stats so batch_stats import is actually exercised
    import jax.tree_util as jtu
    bs_rng = np.random.RandomState(5)

    def perturb(path, x):
        names = [p.key for p in path]
        if names[0] != "batch_stats":
            return x
        if names[-1] == "mean":
            return (bs_rng.randn(*x.shape) * 0.05).astype(x.dtype)
        return (1.0 + bs_rng.uniform(-0.2, 0.2, x.shape)).astype(x.dtype)

    variables = jtu.tree_map_with_path(perturb, variables)
    return model, variables, ref_net


def _assert_tree_equal(a, b):
    import jax

    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_flatten_with_path(b)[0]):
        assert pa == pb
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lb),
            err_msg="/".join(p.key for p in pa))


def test_roundtrip_through_reference_checkpoint(tmp_path):
    import torch

    from iou3dmatch_tpu.train.torch_import import (
        import_state_dict, is_torch_checkpoint, read_torch_checkpoint)
    from tests.test_full_model_diff import _transplant

    model, variables, ref_net = _make_pair()
    _transplant(variables, ref_net)

    path = os.path.join(tmp_path, "checkpoint.tar")
    torch.save({"epoch": 7, "loss": 1.5,
                # DataParallel-style prefix must be stripped on read
                "model_state_dict": {
                    "module." + k: v for k, v in ref_net.state_dict().items()
                }}, path)

    assert is_torch_checkpoint(path)
    payload = read_torch_checkpoint(path)
    assert payload["epoch"] == 7
    assert not any(k.startswith("module.")
                   for k in payload["model_state_dict"])

    imported = import_state_dict(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        payload["model_state_dict"])
    _assert_tree_equal(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, imported)


def test_import_rejects_shape_and_leftover_mismatches(tmp_path):
    import torch

    from iou3dmatch_tpu.train.torch_import import import_state_dict
    from tests.test_full_model_diff import _transplant

    model, variables, ref_net = _make_pair()
    _transplant(variables, ref_net)
    sd = ref_net.state_dict()
    tv = {"params": variables["params"],
          "batch_stats": variables["batch_stats"]}

    bad = dict(sd)
    bad["backbone_net.sa1.mlp_module.layer0.conv.weight"] = torch.zeros(7, 7, 1, 1)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict(tv, bad)

    extra = dict(sd)
    extra["not.a.real.layer.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="no destination"):
        import_state_dict(tv, extra)
    import_state_dict(tv, extra, strict=False)  # tolerated when asked

    missing = dict(sd)
    del missing["pnet.conv1.weight"]
    with pytest.raises(KeyError, match="pnet"):
        import_state_dict(tv, missing)


def test_checkpoint_load_sniffs_torch_format(tmp_path):
    """checkpoint.load / load_pretrain_into_ssl accept a reference torch
    file transparently; EMA weights flow into the teacher."""
    import jax
    import jax.numpy as jnp
    import torch

    from iou3dmatch_tpu.train import checkpoint
    from iou3dmatch_tpu.train.state import TrainState, make_optimizer
    from jax.flatten_util import ravel_pytree
    from tests.test_full_model_diff import _transplant

    model, variables, ref_net = _make_pair()
    _transplant(variables, ref_net)

    path = os.path.join(tmp_path, "best_checkpoint_sum.tar")
    ema_sd = {k: v * 0 + 0.25 if v.dtype.is_floating_point else v
              for k, v in ref_net.state_dict().items()}
    torch.save({"epoch": 3, "loss": 0.5,
                "model_state_dict": ref_net.state_dict(),
                "ema_model_state_dict": ema_sd}, path)

    tx = make_optimizer()
    zeros = jax.tree.map(jnp.zeros_like, variables["params"])
    template = TrainState(
        params=zeros, batch_stats=jax.tree.map(
            jnp.zeros_like, variables["batch_stats"]),
        opt_state=tx.init(ravel_pytree(zeros)[0]),
        step=jnp.zeros((), jnp.int32),
        ema_params=jax.tree.map(jnp.zeros_like, variables["params"]),
        ema_batch_stats=jax.tree.map(
            jnp.zeros_like, variables["batch_stats"]))

    state, epoch, loss = checkpoint.load(path, template)
    assert (epoch, loss) == (3, 0.5)
    _assert_tree_equal(state.params, variables["params"])
    # teacher took the checkpoint's EMA weights (constant 0.25), with the
    # bias-less conv slots zero-filled
    for path_, leaf in jax.tree_util.tree_flatten_with_path(
            state.ema_params)[0]:
        vals = np.unique(np.asarray(leaf))
        assert set(vals.tolist()) <= {0.0, 0.25}, \
            "/".join(p.key for p in path_)

    # pretrain -> SSL handoff: no EMA in file, student weights mirrored
    path2 = os.path.join(tmp_path, "pretrain.tar")
    torch.save({"epoch": 9, "model_state_dict": ref_net.state_dict()}, path2)
    state2 = checkpoint.load_pretrain_into_ssl(path2, template)
    _assert_tree_equal(state2.params, variables["params"])
    _assert_tree_equal(state2.ema_params, variables["params"])


def test_export_loads_into_reference_model():
    """export_state_dict produces a dict the reference's own
    ``load_state_dict`` accepts; round-tripping it back through
    ``import_state_dict`` is bit-exact. This is the TPU->torch handoff:
    a model trained here can be scored/resumed with the reference tooling."""
    import torch

    from iou3dmatch_tpu.train.torch_import import (export_state_dict,
                                                   import_state_dict)

    model, variables, ref_net = _make_pair()
    tv = {"params": variables["params"],
          "batch_stats": variables["batch_stats"]}

    exported = {k: torch.from_numpy(np.array(v))
                for k, v in export_state_dict(tv).items()}
    missing, unexpected = ref_net.load_state_dict(exported, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing

    back = import_state_dict(tv, ref_net.state_dict())
    _assert_tree_equal(tv, back)


def test_shared_mlp_dense_layers_are_bias_free():
    """SharedMLP Dense layers must carry NO bias, matching the reference's
    ``bias=not bn`` 1x1 convs (pytorch_utils.py:17). This is load-bearing:
    a pre-BN bias is output-invariant, so its analytic gradient is zero,
    but Adam amplifies the autodiff cancellation residual (~1e-10) into
    lr-sized steps — measured random-walk to ~6e-2 over 460 TPU train
    steps, which skews eval-mode BN (running means lag the walk) and made
    torch export refuse. Structural absence kills the whole failure class;
    the export-time refusal for hand-built trees stays as a backstop."""
    import jax.tree_util as jtu

    model, variables, ref_net = _make_pair()
    import re

    bad = [
        "/".join(p.key for p in path)
        for path, _ in jtu.tree_flatten_with_path(variables["params"])[0]
        if path[-1].key == "bias"
        and re.fullmatch(r"dense\d+", path[-2].key)
        and any(p.key.startswith("mlp") for p in path[:-2])
    ]
    assert not bad, f"SharedMLP Dense biases present: {bad[:5]}"


def test_our_msgpack_not_mistaken_for_torch(tmp_path):
    import jax.numpy as jnp

    from iou3dmatch_tpu.train import checkpoint
    from iou3dmatch_tpu.train.state import TrainState, make_optimizer
    from iou3dmatch_tpu.train.torch_import import is_torch_checkpoint
    from jax.flatten_util import ravel_pytree

    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    tx = make_optimizer()
    state = TrainState(params=params, batch_stats={},
                       opt_state=tx.init(ravel_pytree(params)[0]),
                       step=jnp.zeros((), jnp.int32))
    path = os.path.join(tmp_path, "checkpoint.tar")
    checkpoint.save(path, state, epoch=2, loss=0.1)
    assert not is_torch_checkpoint(path)
    _, epoch, _ = checkpoint.load(path, state)
    assert epoch == 2
