"""Differential test for test-time IoU optimization (eval/iou_opt.py) vs
the reference's ``evaluate_with_opt`` loop (train.py:431-535).

The reference loop is module-level driver code (bound to FLAGS/datasets), so
the test replicates its exact core on the shimmed reference model:

- full forward with ``iou_opt=True`` (boxes NOT detached into GridConv,
  retain_grad on center/size, votenet_iou_branch.py:139-151),
- gather IoU at the argmax semantic class, backward for d IoU/d(center,size)
  (train.py:449-456),
- ``opt_step + 1`` gradient-ascent position updates at ``opt_rate``,
  re-running only GridConv each iteration (train.py:463-484),
- the ``size*2 − mean_size`` residual re-encoding expanded over size
  clusters, and the refined-center write-back (train.py:486-492).

Ours is one jitted lax.scan (eval/iou_opt.py). Weights are transplanted so
both sides optimize the same function from the same start.
"""
import numpy as np
import pytest

from tests.reference_bridge import (
    install_pointnet2_shim, load, reference_available)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


@pytest.mark.parametrize("dataset", ["scannet", "sunrgbd"])
def test_iou_optimize_matches_evaluate_with_opt(dataset):
    # sunrgbd exercises the 12-heading-bin path: nonzero heading rotates the
    # GridConv grid every ascent step (scannet's single bin pins heading ~0)
    import jax
    import jax.numpy as jnp
    import torch

    install_pointnet2_shim()
    ref_v = load("models.votenet_iou_branch")
    from tests.test_full_model_diff import _transplant
    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.eval.iou_opt import iou_optimize

    opt_rate, opt_step = 5e-4, 5  # train.py:69 default rate
    n_proposal = 64
    if dataset == "scannet":
        dc = load("scannet.model_util_scannet").ScannetDatasetConfig()
    else:
        dc = load("sunrgbd.model_util_sunrgbd").SunrgbdDatasetConfig()
    ref_net = ref_v.VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        input_feature_dim=1, num_proposal=n_proposal, sampling="seed_fps",
        dataset_config=dc)
    ref_net.eval()
    model, _ = build_votenet(dataset, num_proposal=n_proposal)

    rng = np.random.RandomState(19)
    pc = np.zeros((1, 2048, 4), np.float32)
    pc[..., 0:3] = rng.uniform(-3.0, 3.0, (1, 2048, 3))
    pc[..., 3] = pc[..., 2] - pc[..., 2].min()

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(pc), train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    _transplant(variables, ref_net)

    # ---- reference: evaluate_with_opt core (train.py:444-492)
    end_points = ref_net({"point_clouds": torch.from_numpy(pc)}, iou_opt=True)
    center = end_points["center"]
    size_class = torch.argmax(end_points["size_scores"], dim=-1)
    sem_cls = end_points["sem_cls_scores"].argmax(-1)
    size = end_points["size"]
    heading = end_points["heading"]
    iou = end_points["iou_scores"]
    iou_gathered = torch.gather(
        iou, dim=2, index=sem_cls.unsqueeze(-1).detach()
    ).squeeze(-1).contiguous().view(-1)
    iou_gathered.backward(torch.ones(iou_gathered.shape))
    center_grad = center.grad
    size_grad = size.grad
    center0 = center.detach().clone()
    mask = torch.ones(center.shape)
    count = 0
    for k in end_points.keys():
        end_points[k] = end_points[k].detach()
    while True:
        center_ = center.detach() + opt_rate * center_grad * mask
        size_ = size.detach() + opt_rate * size_grad * mask
        heading_ = heading.detach()
        center_.requires_grad = True
        size_.requires_grad = True
        end_points_ = ref_net.forward_onlyiou_faster(
            end_points, center_, size_, heading_)
        iou = end_points_["iou_scores"]
        iou_gathered = torch.gather(
            iou, dim=2, index=sem_cls.unsqueeze(-1).detach()
        ).squeeze(-1).contiguous().view(-1)
        iou_gathered.backward(torch.ones(iou_gathered.shape))
        center_grad = center_.grad
        size_grad = size_.grad
        count += 1
        if count > opt_step:
            break
        center = center_
        size = size_
    end_points["center"] = center_
    B, K = size_class.shape[:2]
    mean_size_arr = torch.from_numpy(dc.mean_size_arr.astype(np.float32))
    size_base = torch.index_select(mean_size_arr, 0, size_class.view(-1))
    size_base = size_base.view(B, K, 3)
    end_points["size_residuals"] = (size_ * 2 - size_base).unsqueeze(2).expand(
        -1, -1, dc.num_size_cluster, -1)

    # ---- ours: one jitted scan
    ep = model.apply(variables, jnp.asarray(pc), train=False)
    # starting boxes must agree before optimization (sanity anchor)
    np.testing.assert_allclose(np.asarray(ep["center"], np.float32),
                               center.detach().numpy(), rtol=2e-3, atol=1e-3)
    new_ep = iou_optimize(model, variables, ep, opt_rate, opt_step)

    # the argmax decisions steering both loops must agree exactly
    np.testing.assert_array_equal(
        np.argmax(np.asarray(ep["sem_cls_scores"]), -1), sem_cls.numpy())
    np.testing.assert_array_equal(
        np.argmax(np.asarray(ep["size_scores"]), -1), size_class.numpy())

    # refined boxes: positions moved by ~opt_rate-scale deltas; require the
    # two trajectories to land within a small fraction of the TOTAL movement
    moved = float(np.abs(center_.detach().numpy() - center0.numpy()).max())
    np.testing.assert_allclose(
        np.asarray(new_ep["center"], np.float32), center_.detach().numpy(),
        rtol=0, atol=max(2e-4, 0.05 * moved), err_msg="refined center")
    np.testing.assert_allclose(
        np.asarray(new_ep["size"], np.float32), size_.detach().numpy(),
        rtol=0, atol=max(2e-4, 0.05 * moved), err_msg="refined size")

    # the size*2 − mean_size residual re-encoding (train.py:486-492)
    np.testing.assert_allclose(
        np.asarray(new_ep["size_residuals"], np.float32),
        end_points["size_residuals"].detach().numpy(),
        rtol=0, atol=max(5e-4, 0.1 * moved), err_msg="size_residuals")

    # final IoU scores at the refined boxes
    np.testing.assert_allclose(
        np.asarray(new_ep["iou_scores"], np.float32),
        end_points_["iou_scores"].detach().numpy(),
        rtol=0, atol=5e-3, err_msg="refined iou_scores")
