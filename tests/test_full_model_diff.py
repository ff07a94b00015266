"""FULL-MODEL differential test: the reference VoteNet-IoU forward, run on
CPU with its CUDA extension backed by OUR kernels (reference_bridge.
install_pointnet2_shim), against our flax model with TRANSPLANTED weights.

This closes the last parity gap the module-level diffs can't reach: the
composition — backbone SA/FP wiring, vote-feature L2 normalization, seed_fps
proposal sampling, decode, GridConv grid construction + interpolation — is
compared end to end on identical parameters and inputs. The point ops
themselves have independent NumPy oracles (tests/oracles.py), so any
mismatch here isolates MODEL math.
"""
import numpy as np
import pytest

from tests.reference_bridge import (
    install_pointnet2_shim, load, reference_available)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


# single source of truth for the flax-path <-> state_dict-key mapping —
# the torch-checkpoint importer uses the same function in reverse
from iou3dmatch_tpu.train.torch_import import flax_path_to_torch_key as _ref_key


def _transplant(variables, ref_net):
    """Copy our (randomly initialized) params + batch_stats into the
    reference model. Returns the set of reference keys written."""
    import jax
    import torch

    sd = ref_net.state_dict()
    written = set()
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        names = [p.key for p in path]
        key = _ref_key(names)
        val = np.asarray(leaf)
        if key not in sd and names[-1] == "bias":
            # our SharedMLP Dense layers carry a (zero-init) bias; the
            # reference's BN-followed 1x1 convs are bias-free
            # (pytorch_utils.py:14-39, bias absorbed by BN either way)
            assert not val.any(), f"nonzero bias with no reference slot: {key}"
            continue
        assert key in sd, f"no reference param for {'/'.join(names)} -> {key}"
        tgt = sd[key]
        if names[-1] == "kernel":
            val = val.T  # (in, out) -> (out, in)
            val = val.reshape(tuple(tgt.shape))  # (out, in, 1[, 1])
        assert tuple(tgt.shape) == val.shape, (key, tgt.shape, val.shape)
        sd[key] = torch.from_numpy(np.array(val))  # copy: jax arrays are read-only
        written.add(key)
    ref_net.load_state_dict(sd)
    return written


@pytest.mark.parametrize("dataset,sampling", [
    ("scannet", "seed_fps"),
    ("scannet", "vote_fps"),
    # 12 heading bins: nonzero decoded headings rotate the GridConv grid
    ("sunrgbd", "seed_fps"),
])
def test_full_votenet_forward_matches_reference(dataset, sampling):
    import jax
    import jax.numpy as jnp
    import torch

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
        input_feature_dim=1, num_proposal=128, sampling=sampling,
        dataset_config=dc)
    ref_net.eval()

    model, _ = build_votenet(dataset, sampling=sampling)
    rng = np.random.RandomState(3)
    pc = np.zeros((1, 4096, 4), np.float32)
    pc[..., 0:3] = rng.uniform(-3.0, 3.0, (1, 4096, 3))
    pc[..., 3] = pc[..., 2] - pc[..., 2].min()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(pc), train=False)
    # non-trivial running stats so BN normalization is actually exercised
    variables = jax.tree.map(np.asarray, variables)
    bs_rng = np.random.RandomState(7)
    import jax.tree_util as jtu

    def perturb(path, x):
        names = [p.key for p in path]
        if names[0] != "batch_stats":
            return x
        if names[-1] == "mean":
            return (bs_rng.randn(*x.shape) * 0.05).astype(x.dtype)
        return (1.0 + bs_rng.uniform(-0.2, 0.2, x.shape)).astype(x.dtype)

    variables = jtu.tree_map_with_path(perturb, variables)

    written = _transplant(variables, ref_net)
    leftovers = {k for k in ref_net.state_dict()
                 if k not in written and "num_batches_tracked" not in k}
    assert not leftovers, f"reference params never written: {sorted(leftovers)[:8]}"

    with torch.no_grad():
        ref_ep = ref_net({"point_clouds": torch.from_numpy(pc)})

    ep = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(pc), train=False)

    checks = [
        # (key, rtol, atol) — later stages accumulate more f32 drift
        ("seed_xyz", 1e-5, 1e-6),
        ("vote_xyz", 5e-4, 5e-5),
        ("aggregated_vote_xyz", 5e-4, 5e-5),
        ("objectness_scores", 2e-3, 2e-4),
        ("center", 2e-3, 2e-4),
        ("heading_scores", 2e-3, 2e-4),
        ("size_scores", 2e-3, 2e-4),
        ("sem_cls_scores", 2e-3, 2e-4),
        ("size_residuals", 2e-3, 2e-4),
        ("size", 2e-3, 2e-4),
        ("iou_scores", 5e-3, 5e-4),
    ]
    for key, rtol, atol in checks:
        assert key in ep, f"ours missing {key}"
        assert key in ref_ep, f"reference missing {key}"
        np.testing.assert_allclose(
            np.asarray(ep[key], np.float32), ref_ep[key].numpy(),
            rtol=rtol, atol=atol, err_msg=key)

    # decode decisions must agree exactly
    np.testing.assert_array_equal(
        np.argmax(np.asarray(ep["sem_cls_scores"]), -1),
        torch.argmax(ref_ep["sem_cls_scores"], -1).numpy())
    np.testing.assert_array_equal(
        np.argmax(np.asarray(ep["size_scores"]), -1),
        torch.argmax(ref_ep["size_scores"], -1).numpy())

    if sampling != "seed_fps":
        return
    # test-time IoU-optimization path: re-run ONLY the GridConv branch on
    # perturbed boxes (forward_onlyiou_faster, votenet_iou_branch.py:183-185).
    # Headings get a strong synthetic offset: decoded headings at random
    # init cluster near 0 / +-pi, where R(h) ~ R(-h) masks grid-rotation
    # sign errors (one shipped until the sunrgbd IoU-opt diff caught it) —
    # mid-quadrant angles make the rotated-grid comparison discriminating.
    rng2 = np.random.RandomState(11)
    center = np.asarray(ep["center"], np.float32) + \
        rng2.randn(1, 128, 3).astype(np.float32) * 0.05
    size = np.abs(np.asarray(ep["size"], np.float32) *
                  (1.0 + rng2.randn(1, 128, 3).astype(np.float32) * 0.1)) + 1e-6
    heading = (np.asarray(ep["heading"], np.float32)
               + rng2.uniform(0.4, 1.2, (1, 128)).astype(np.float32)
               * rng2.choice([-1.0, 1.0], (1, 128)).astype(np.float32))
    with torch.no_grad():
        ref_iou_ep = ref_net.forward_onlyiou_faster(
            dict(ref_ep), torch.from_numpy(center), torch.from_numpy(size),
            torch.from_numpy(heading))
    our_iou_ep = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {k: jnp.asarray(v) for k, v in ep.items() if k in
         ("seed_xyz", "seed_features", "vote_xyz", "vote_features")},
        jnp.asarray(center), jnp.asarray(size), jnp.asarray(heading),
        train=False, method=model.forward_onlyiou)
    np.testing.assert_allclose(
        np.asarray(our_iou_ep["iou_scores"], np.float32),
        ref_iou_ep["iou_scores"].numpy(), rtol=5e-3, atol=5e-4,
        err_msg="forward_onlyiou iou_scores")
