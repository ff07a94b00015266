"""Differential tests: the reference implementation itself as the oracle.

Unlike the NumPy-oracle tests (tests/oracles.py mirrors the CUDA kernels'
semantics by hand), these import the reference's PURE-PYTHON modules from
/root/reference (torch-CPU runs them fine, see reference_bridge.py) and
compare our rebuild's outputs against the reference code's outputs on the
same random inputs — including the full prediction-parsing/NMS/AP pipeline
and a bit-for-bit dataset __getitem__ comparison under an identical
np.random seed (SURVEY.md §7 "bit-for-bit data parity").
"""
import numpy as np
import pytest

from tests.reference_bridge import load, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


# ---------------------------------------------------------------- nn_distance
def test_nn_distance_matches_reference():
    import torch

    ref = load("utils.nn_distance")
    from iou3dmatch_tpu.geometry.nn_distance import huber_loss, nn_distance

    rng = np.random.RandomState(3)
    pc1 = rng.randn(2, 7, 3).astype(np.float32)
    pc2 = rng.randn(2, 11, 3).astype(np.float32)
    for kwargs in [dict(), dict(l1=True), dict(l1smooth=True, delta=0.7)]:
        r = ref.nn_distance(torch.from_numpy(pc1), torch.from_numpy(pc2), **kwargs)
        o = nn_distance(pc1, pc2, **kwargs)
        for rv, ov, name in zip(r, o, ["dist1", "idx1", "dist2", "idx2"]):
            np.testing.assert_allclose(
                np.asarray(ov), rv.numpy(), rtol=1e-5, atol=1e-6, err_msg=name
            )

    err = rng.randn(4, 5).astype(np.float32)
    r = ref.huber_loss(torch.from_numpy(err), delta=0.9).numpy()
    np.testing.assert_allclose(np.asarray(huber_loss(err, delta=0.9)), r, rtol=1e-6)


# ----------------------------------------------------------------------- NMS
def _rand_boxes3d(rng, n, with_cls=False):
    ctr = rng.uniform(-2, 2, (n, 3))
    sz = rng.uniform(0.2, 1.2, (n, 3))
    cols = [ctr - sz / 2, ctr + sz / 2, rng.uniform(0, 1, (n, 1))]
    if with_cls:
        cols.append(rng.randint(0, 3, (n, 1)).astype(np.float64))
    return np.concatenate(cols, axis=1)


def test_nms_family_matches_reference():
    ref = load("utils.nms")
    from iou3dmatch_tpu.geometry import nms as ours

    rng = np.random.RandomState(11)
    for trial in range(5):
        b2 = np.concatenate(
            [rng.uniform(-2, 0, (20, 2)), rng.uniform(0.1, 2, (20, 2)),
             rng.uniform(0, 1, (20, 1))], axis=1)
        b2[:, 2:4] += b2[:, 0:2]
        for old in (False, True):
            assert list(ours.nms_2d_faster(b2, 0.3, old)) == list(
                ref.nms_2d_faster(b2, 0.3, old))

        b3 = _rand_boxes3d(rng, 24)
        assert list(ours.nms_3d_faster(b3, 0.25)) == list(ref.nms_3d_faster(b3, 0.25))

        b3c = _rand_boxes3d(rng, 24, with_cls=True)
        assert list(ours.nms_3d_faster_samecls(b3c, 0.25)) == list(
            ref.nms_3d_faster_samecls(b3c, 0.25))
        assert sorted(ours.lhs_3d_faster_samecls(b3c, 0.25)) == sorted(
            ref.lhs_3d_faster_samecls(b3c, 0.25))

    # corner-distance NMS (utils/nms.py:13-49)
    crn = rng.randn(10, 8, 3)
    conf = rng.uniform(0, 1, 10)
    assert list(ours.nms_crnr_dist(crn, conf, 0.4)) == list(
        ref.nms_crnr_dist(crn, conf, 0.4))


# ------------------------------------------------------------------ box math
def test_box_geometry_matches_reference():
    ref = load("utils.box_util")
    from iou3dmatch_tpu.eval.box3d_iou_np import box3d_iou, box3d_vol, polygon_clip
    from iou3dmatch_tpu.geometry.boxes import (
        get_3d_box_batch_np, get_3d_box_np, roty_np, rotz)

    rng = np.random.RandomState(5)
    np.testing.assert_allclose(roty_np(0.3), ref.roty(0.3), rtol=1e-12)
    np.testing.assert_allclose(rotz(0.3), ref.rotz(0.3), rtol=1e-12)

    for _ in range(20):
        sz = rng.uniform(0.3, 2.0, 3)
        ang = rng.uniform(-np.pi, np.pi)
        ctr = rng.uniform(-3, 3, 3)
        c_ref = ref.get_3d_box(sz, ang, ctr)
        c_our = get_3d_box_np(sz, ang, ctr)
        np.testing.assert_allclose(c_our, c_ref, rtol=1e-6, atol=1e-8)

    szs = rng.uniform(0.3, 2.0, (4, 6, 3))
    angs = rng.uniform(-np.pi, np.pi, (4, 6))
    ctrs = rng.uniform(-3, 3, (4, 6, 3))
    np.testing.assert_allclose(
        get_3d_box_batch_np(szs, angs, ctrs),
        ref.get_3d_box_batch(szs, angs, ctrs), rtol=1e-6, atol=1e-8)

    # oriented IoU via polygon clipping / ConvexHull (box_util.py:112-137)
    for _ in range(30):
        c1 = ref.get_3d_box(rng.uniform(0.3, 2, 3), rng.uniform(-np.pi, np.pi),
                            rng.uniform(-1, 1, 3))
        c2 = ref.get_3d_box(rng.uniform(0.3, 2, 3), rng.uniform(-np.pi, np.pi),
                            rng.uniform(-1, 1, 3))
        iou_ref, iou2d_ref = ref.box3d_iou(c1, c2)
        iou_our, iou2d_our = box3d_iou(c1, c2)
        np.testing.assert_allclose(iou_our, iou_ref, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(iou2d_our, iou2d_ref, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(box3d_vol(c1), ref.box3d_vol(c1), rtol=1e-9)

    sq = [(0, 0), (1, 0), (1, 1), (0, 1)]
    tri = [(0.5, -0.5), (1.5, 0.5), (0.5, 1.5)]
    np.testing.assert_allclose(np.asarray(polygon_clip(sq, tri), dtype=np.float64),
                               np.asarray(ref.polygon_clip(sq, tri), dtype=np.float64))


# ------------------------------------------------------------------- eval AP
def _synthetic_detections(rng, n_img=4, n_cls=3):
    ref_box = load("utils.box_util")
    pred_all, gt_all = {}, {}
    for img in range(n_img):
        preds, gts = [], []
        for _ in range(rng.randint(3, 8)):
            cls = rng.randint(0, n_cls)
            corners = ref_box.get_3d_box(
                rng.uniform(0.3, 1.5, 3), rng.uniform(-np.pi, np.pi),
                rng.uniform(-2, 2, 3))
            gts.append((cls, corners))
            # a matching detection with jitter + a random one
            jit = corners + rng.randn(*corners.shape) * 0.05
            preds.append((cls, jit, rng.uniform(0.5, 1.0)))
            if rng.random() > 0.5:
                preds.append((rng.randint(0, n_cls),
                              corners + rng.randn(*corners.shape) * 0.8,
                              rng.uniform(0, 0.6)))
        pred_all[img] = preds
        gt_all[img] = gts
    return pred_all, gt_all


def test_eval_det_matches_reference():
    ref = load("utils.eval_det")
    from iou3dmatch_tpu.eval.eval_det import eval_det, get_iou_obb, voc_ap

    rng = np.random.RandomState(7)
    rec = np.sort(rng.uniform(0, 1, 12))
    prec = rng.uniform(0, 1, 12)
    np.testing.assert_allclose(
        voc_ap(rec.copy(), prec.copy()),
        ref.voc_ap(rec.copy(), prec.copy(), "cls", 0.25), rtol=1e-9)

    pred_all, gt_all = _synthetic_detections(rng)
    r_rec, r_prec, r_ap = ref.eval_det(pred_all, gt_all, ovthresh=0.25,
                                       get_iou_func=ref.get_iou_obb)
    o_rec, o_prec, o_ap = eval_det(pred_all, gt_all, ovthresh=0.25,
                                   get_iou_func=get_iou_obb)
    assert set(r_ap) == set(o_ap)
    for c in r_ap:
        np.testing.assert_allclose(o_ap[c], r_ap[c], rtol=1e-9, atol=1e-12,
                                   err_msg=f"AP class {c}")
        np.testing.assert_allclose(np.asarray(o_rec[c]), np.asarray(r_rec[c]),
                                   rtol=1e-9, atol=1e-12)


def test_metric_util_matches_reference():
    ref = load("utils.metric_util")
    from iou3dmatch_tpu.utils.metrics import calc_iou, multi_scene_precision_recall

    rng = np.random.RandomState(9)
    for _ in range(20):
        a = np.concatenate([rng.uniform(-2, 0, 3), rng.uniform(0.1, 2, 3)])
        b = np.concatenate([rng.uniform(-2, 0, 3), rng.uniform(0.1, 2, 3)])
        a[3:] += a[:3]
        b[3:] += b[:3]
        np.testing.assert_allclose(calc_iou(a, b), ref.calc_iou(a, b), rtol=1e-9)

    b, ng, npred = 3, 5, 8
    labels = rng.uniform(-2, 0, (b, ng, 6))
    labels[..., 3:] = np.abs(rng.uniform(0.3, 1.5, (b, ng, 3))) + labels[..., :3]
    pred = np.zeros((b, npred, 7))
    pred[..., :6] = rng.uniform(-2, 0, (b, npred, 6))
    pred[:, :, 3:6] = np.abs(rng.uniform(0.3, 1.5, (b, npred, 3))) + pred[:, :, :3]
    pred[:, :ng, :6] = labels + rng.randn(b, ng, 6) * 0.05  # some matches
    pred[..., 6] = rng.uniform(0, 1, (b, npred))
    label_mask = (rng.random((b, ng)) > 0.2).astype(np.float64)
    tp_o, fp_o, fn_o, pr_o = multi_scene_precision_recall(
        labels, pred, 0.25, 0.5, label_mask)
    tp_r, fp_r, fn_r, pr_r = ref.multi_scene_precision_recall(
        labels, pred, 0.25, 0.5, label_mask)
    assert (tp_o, fp_o, fn_o) == (tp_r, fp_r, fn_r)
    np.testing.assert_allclose(pr_o, pr_r, rtol=1e-12)


# ------------------------------------------------------------ dataset config
def test_dataset_configs_match_reference():
    ref_sc = load("scannet.model_util_scannet")
    ref_su = load("sunrgbd.model_util_sunrgbd")
    from iou3dmatch_tpu.data.config import ScannetConfig, SunrgbdConfig

    rsc, osc = ref_sc.ScannetDatasetConfig(), ScannetConfig()
    np.testing.assert_allclose(osc.mean_size_arr, rsc.mean_size_arr, rtol=1e-7)
    assert osc.num_class == rsc.num_class
    assert osc.num_heading_bin == rsc.num_heading_bin
    assert list(osc.nyu40ids) == list(rsc.nyu40ids)
    assert osc.type2class == rsc.type2class

    rsu, osu = ref_su.SunrgbdDatasetConfig(), SunrgbdConfig()
    np.testing.assert_allclose(osu.mean_size_arr, rsu.mean_size_arr, rtol=1e-7)
    assert osu.num_heading_bin == rsu.num_heading_bin
    rng = np.random.RandomState(2)
    for _ in range(50):
        ang = rng.uniform(-2 * np.pi, 2 * np.pi)
        rc, rr = rsu.angle2class(ang)
        oc, orr = osu.angle2class(ang)
        assert int(oc) == int(rc)
        np.testing.assert_allclose(orr, rr, rtol=1e-9)
        np.testing.assert_allclose(osu.class2angle(int(rc), rr),
                                   rsu.class2angle(int(rc), rr), rtol=1e-9)
    for c in range(osu.num_size_cluster):
        res = rng.uniform(-0.1, 0.1, 3)
        np.testing.assert_allclose(osu.class2size(c, res), rsu.class2size(c, res),
                                   rtol=1e-9)

    # param2obb round trip (model_util_sunrgbd.py / model_util_scannet.py)
    obb_r = rsu.param2obb(np.array([1.0, 2, 3]), 3, 0.1, 4, np.array([0.05, -0.02, 0.01]))
    obb_o = osu.param2obb(np.array([1.0, 2, 3]), 3, 0.1, 4, np.array([0.05, -0.02, 0.01]))
    np.testing.assert_allclose(obb_o, obb_r, rtol=1e-9)

    from iou3dmatch_tpu.data.pc_util import rotz
    from iou3dmatch_tpu.data.scannet import rotate_aligned_boxes as our_rot

    boxes = np.concatenate([rng.uniform(-2, 2, (5, 3)), rng.uniform(0.3, 2, (5, 3))], 1)
    rot = ref_sc.rotate_aligned_boxes(boxes, rotz(0.21))
    np.testing.assert_allclose(our_rot(boxes, rotz(0.21)), rot, rtol=1e-9)


# ------------------------------------------------- prediction parsing + NMS
def _rand_end_points(rng, cfg, b=2, k=16, nh=1, ns=18, nc=18, n=512):
    return {
        "point_clouds": rng.randn(b, n, 4).astype(np.float32),
        "center": rng.uniform(-2, 2, (b, k, 3)).astype(np.float32),
        "heading_scores": rng.randn(b, k, nh).astype(np.float32),
        "heading_residuals": (rng.randn(b, k, nh) * 0.1).astype(np.float32),
        "size_scores": rng.randn(b, k, ns).astype(np.float32),
        "size_residuals": (rng.randn(b, k, ns, 3) * 0.05).astype(np.float32),
        "sem_cls_scores": rng.randn(b, k, nc).astype(np.float32),
        "objectness_scores": rng.randn(b, k, 2).astype(np.float32),
        "iou_scores": rng.randn(b, k, nc).astype(np.float32),
    }


def _as_torch(ep):
    import torch

    return {k: torch.from_numpy(np.asarray(v)) for k, v in ep.items()}


def _compare_map_cls(ours, theirs):
    assert len(ours) == len(theirs)
    for po, pt in zip(ours, theirs):
        assert len(po) == len(pt)
        for (co, bo, so), (ct, bt, st) in zip(po, pt):
            assert int(co) == int(ct)
            np.testing.assert_allclose(bo, bt, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(so, st, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["nms2d", "nms3d", "remove_empty"])
def test_parse_predictions_other_nms_modes_match_reference(mode):
    """The non-default NMS paths: 2D BEV NMS (use_3d_nms=False), class-
    agnostic 3D NMS (cls_nms=False), and empty-box removal
    (ap_helper.py:118-175)."""
    ref_ap = load("models.ap_helper")
    ref_sc = load("scannet.model_util_scannet")
    from iou3dmatch_tpu.data.config import ScannetConfig
    from iou3dmatch_tpu.eval.ap_helper import parse_predictions

    rng = np.random.RandomState(41)
    ep = _rand_end_points(rng, None)
    base = dict(remove_empty_box=(mode == "remove_empty"),
                use_3d_nms=(mode != "nms2d"),
                cls_nms=(mode == "remove_empty"),
                nms_iou=0.25, use_old_type_nms=False, per_class_proposal=True,
                conf_thresh=0.05, use_iou_for_nms=False)
    theirs = ref_ap.parse_predictions(
        _as_torch(ep), dict(base, dataset_config=ref_sc.ScannetDatasetConfig()))
    ours = parse_predictions(ep, dict(base, dataset_config=ScannetConfig()))
    _compare_map_cls(ours, theirs)


def test_ap_calculator_matches_reference():
    """APCalculator accumulate/compute (ap_helper.py:382-435): identical
    per-class AP/recall/precision dicts and metric-name formatting."""
    ref_ap = load("models.ap_helper")
    from iou3dmatch_tpu.eval.ap_helper import APCalculator

    rng = np.random.RandomState(43)
    pred_all, gt_all = _synthetic_detections(rng)
    class2type = {i: f"cls{i}" for i in range(3)}
    ours = APCalculator(0.25, class2type)
    theirs = ref_ap.APCalculator(0.25, class2type)
    for img in pred_all:
        ours.step([pred_all[img]], [gt_all[img]])
        theirs.step([pred_all[img]], [gt_all[img]])
    mo, mt = ours.compute_metrics(), theirs.compute_metrics()
    assert set(mo) == set(mt), (sorted(mo), sorted(mt))
    for k in mt:
        np.testing.assert_allclose(mo[k], mt[k], rtol=1e-9, atol=1e-12,
                                   err_msg=k)


@pytest.mark.parametrize("use_iou", [False, True])
def test_parse_predictions_matches_reference(use_iou):
    ref_ap = load("models.ap_helper")
    ref_sc = load("scannet.model_util_scannet")
    from iou3dmatch_tpu.data.config import ScannetConfig
    from iou3dmatch_tpu.eval.ap_helper import parse_groundtruths, parse_predictions

    rng = np.random.RandomState(21)
    ep = _rand_end_points(rng, None)
    base = dict(remove_empty_box=False, use_3d_nms=True, nms_iou=0.25,
                use_old_type_nms=False, cls_nms=True, per_class_proposal=True,
                conf_thresh=0.05, use_iou_for_nms=use_iou)
    cd_ref = dict(base, dataset_config=ref_sc.ScannetDatasetConfig())
    cd_our = dict(base, dataset_config=ScannetConfig())

    theirs = ref_ap.parse_predictions(_as_torch(ep), cd_ref)
    ours = parse_predictions(ep, cd_our)
    _compare_map_cls(ours, theirs)

    # ground truths (ap_helper.py:262-290)
    b, ng = 2, 5
    batch = {
        "center_label": rng.uniform(-2, 2, (b, ng, 3)).astype(np.float32),
        "heading_class_label": np.zeros((b, ng), np.int64),
        "heading_residual_label": np.zeros((b, ng), np.float32),
        "size_class_label": rng.randint(0, 18, (b, ng)),
        "size_residual_label": (rng.randn(b, ng, 3) * 0.05).astype(np.float32),
        "sem_cls_label": rng.randint(0, 18, (b, ng)),
        "box_label_mask": (rng.random((b, ng)) > 0.3).astype(np.float32),
    }
    theirs = ref_ap.parse_groundtruths(_as_torch(batch), cd_ref)
    ours = parse_groundtruths(batch, cd_our)
    assert len(ours) == len(theirs)
    for go, gt_ in zip(ours, theirs):
        assert len(go) == len(gt_)
        for (co, bo), (ct, bt) in zip(go, gt_):
            assert int(co) == int(ct)
            np.testing.assert_allclose(bo, bt, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------- loss functions
_FWD_CACHE = {}


def _tiny_forward_and_labels(b=2, n=1024, n_gt=6, dataset="scannet"):
    """Run OUR tiny model once (deterministic eval BN) to get a
    self-consistent end_points dict, plus random labels. Cached — the jit
    dominates this file's runtime and the callers only read the arrays."""
    key = (b, n, n_gt, dataset)
    if key in _FWD_CACHE:
        ep, batch, cfg = _FWD_CACHE[key]
        return dict(ep), {k: v.copy() for k, v in batch.items()}, cfg
    import jax
    import jax.numpy as jnp

    from iou3dmatch_tpu.models.factory import build_votenet

    model, cfg = build_votenet(dataset, tiny=True)
    rng = np.random.RandomState(13)
    pc = (rng.randn(b, n, 4) * 1.5).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(pc),
                           train=False)
    ep = model.apply(variables, jnp.asarray(pc), jax.random.PRNGKey(1),
                     train=False, method=model.forward_with_pred_jitter)
    ep = {k: np.asarray(v) for k, v in ep.items() if hasattr(v, "shape")}

    mask = np.ones((b, n_gt), np.float32)
    mask[:, -2:] = 0
    batch = {
        "point_clouds": pc,
        "center_label": rng.uniform(-2, 2, (b, n_gt, 3)).astype(np.float32),
        "box_label_mask": mask,
        # non-trivial heading labels where the config has bins (SUN RGB-D)
        "heading_class_label": rng.randint(
            0, cfg.num_heading_bin, (b, n_gt)).astype(np.int64),
        "heading_residual_label": (
            rng.uniform(-0.5, 0.5, (b, n_gt))
            * np.pi / cfg.num_heading_bin).astype(np.float32),
        "size_class_label": rng.randint(0, cfg.num_size_cluster, (b, n_gt)),
        "size_residual_label": (rng.randn(b, n_gt, 3) * 0.05).astype(np.float32),
        "sem_cls_label": rng.randint(0, cfg.num_class, (b, n_gt)),
        "vote_label": (rng.randn(b, n, 9) * 0.1).astype(np.float32),
        "vote_label_mask": rng.randint(0, 2, (b, n)).astype(np.int64),
    }
    _FWD_CACHE[key] = (ep, batch, cfg)
    return dict(ep), {k: v.copy() for k, v in batch.items()}, cfg


def _torch_end_points(ep, batch):
    import torch

    out = {}
    for k, v in {**ep, **batch}.items():
        t = torch.from_numpy(np.array(v))
        if k.endswith("_inds") or k.endswith("class_label") or k == "vote_label_mask":
            t = t.long()
        out[k] = t
    return out


def _ref_config(dataset):
    if dataset == "scannet":
        return load("scannet.model_util_scannet").ScannetDatasetConfig()
    return load("sunrgbd.model_util_sunrgbd").SunrgbdDatasetConfig()


@pytest.mark.parametrize("dataset", ["scannet", "sunrgbd"])
def test_get_labeled_loss_matches_reference(dataset):
    """The full stage-1 training loss — vote/objectness/center/heading/size/
    sem-cls terms, IoU-branch loss with assignment-gathered class, jitter IoU
    loss, the 10x total — against the reference's own loss code
    (loss_helper_labeled.py:300-370) on identical model outputs. The
    sunrgbd variant exercises the 12-bin heading CE + normalized-residual
    huber machinery that ScanNet's single bin leaves at zero."""
    import torch

    ref_lab = load("models.loss_helper_labeled")
    from iou3dmatch_tpu.losses import get_labeled_loss

    ep, batch, cfg = _tiny_forward_and_labels(dataset=dataset)
    b = batch["center_label"].shape[0]

    end_points = _torch_end_points(ep, batch)
    end_points["supervised_mask"] = torch.ones(b).long()
    ref_dc = _ref_config(dataset)
    ref_loss, ref_ep = ref_lab.get_labeled_loss(
        end_points, ref_dc, {"dataset_config": ref_dc})

    loss, m = get_labeled_loss(ep, batch, cfg, num_labeled=b)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4,
                               err_msg="total labeled loss")
    for key in ["vote_loss", "objectness_loss", "center_loss",
                "heading_cls_loss", "heading_reg_loss", "size_cls_loss",
                "size_reg_loss", "sem_cls_loss", "box_loss", "iou_loss",
                "jitter_iou_loss", "pos_ratio", "neg_ratio", "obj_acc",
                "iou_acc", "iou_acc_obj", "jitter_iou_acc",
                "jitter_iou_acc_obj", "pred_iou_value", "pred_iou_obj_value"]:
        assert key in m, f"ours missing {key}"
        np.testing.assert_allclose(
            float(m[key]), float(ref_ep[key]), rtol=2e-4, atol=1e-6,
            err_msg=key)


@pytest.mark.parametrize("dataset", ["scannet", "sunrgbd"])
def test_get_loss_matches_reference(dataset):
    """Eval-path loss (loss_helper.py:222-291) against the reference."""
    import torch

    ref_sup = load("models.loss_helper")
    from iou3dmatch_tpu.losses import get_loss

    ep, batch, cfg = _tiny_forward_and_labels(dataset=dataset)
    b = batch["center_label"].shape[0]

    end_points = _torch_end_points(ep, batch)
    ref_dc = _ref_config(dataset)
    # the reference eval path computes the IoU loss inside
    # compute_box_and_sem_cls_loss via compute_iou_labels
    ref_loss, ref_ep = ref_sup.get_loss(
        end_points, ref_dc, {"dataset_config": ref_dc})

    loss, m = get_loss(ep, batch, cfg)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4,
                               err_msg="total eval loss")
    for key in ["vote_loss", "objectness_loss", "center_loss",
                "heading_cls_loss", "heading_reg_loss", "size_cls_loss",
                "size_reg_loss", "sem_cls_loss", "box_loss", "pos_ratio",
                "neg_ratio", "obj_acc"]:
        assert key in m, f"ours missing {key}"
        assert key in ref_ep, f"reference missing {key}"
        np.testing.assert_allclose(
            float(m[key]), float(ref_ep[key]), rtol=2e-4, atol=1e-6,
            err_msg=key)


@pytest.mark.slow
@pytest.mark.parametrize("view_stats", [False, True])
def test_get_unlabeled_loss_matches_reference(view_stats):
    """The SSL pseudo-label pipeline end to end — teacher-output filtering
    (obj/cls/IoU thresholds), top-64 sort, host-NumPy LHS dedup vs our
    ON-DEVICE fixed-shape LHS, teacher→student frame transforms
    (trans_center/trans_size), and the pseudo-supervised losses — against
    the reference (loss_helper_unlabeled.py:292-600) on identical
    student/teacher outputs. view_stats=True additionally diffs the
    pseudo-label-quality "cheating" diagnostics (:392-414, :494-523)."""
    import jax
    import jax.numpy as jnp
    import torch

    ref_unl = load("models.loss_helper_unlabeled")
    ref_sc = load("scannet.model_util_scannet")
    from iou3dmatch_tpu.data.pc_util import rotz
    from iou3dmatch_tpu.losses import get_unlabeled_loss
    from iou3dmatch_tpu.models.factory import build_votenet

    # the reference pseudo-label corner loop hardcodes MAX_NUM_OBJ=64
    # boxes per scene (loss_helper_unlabeled.py:473-475), so K >= 64
    model, cfg = build_votenet("scannet", tiny=True, num_proposal=64)
    bl, bu, n = 2, 2, 1024
    b = bl + bu
    rng = np.random.RandomState(31)
    pc = (rng.randn(b, n, 4) * 1.5).astype(np.float32)
    ema_pc = (rng.randn(b, n, 4) * 1.5).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(pc),
                           train=False)
    ep = model.apply(variables, jnp.asarray(pc), jax.random.PRNGKey(1),
                     train=False, method=model.forward_with_pred_jitter)
    ema_ep = model.apply(variables, jnp.asarray(ema_pc), jax.random.PRNGKey(2),
                         train=False, method=model.forward_with_pred_jitter)
    ep = {k: np.asarray(v) for k, v in ep.items() if hasattr(v, "shape")}
    ema_ep = {k: np.asarray(v) for k, v in ema_ep.items() if hasattr(v, "shape")}

    rots = np.stack([rotz(a) for a in rng.uniform(-0.1, 0.1, b)]).astype(np.float32)
    n_gt = 64  # the view-stats coverage gather assumes MAX_NUM_OBJ slots
               # (loss_helper_unlabeled.py:515-517)
    batch = {
        "flip_x_axis": rng.randint(0, 2, (b,)).astype(np.int64),
        "flip_y_axis": rng.randint(0, 2, (b,)).astype(np.int64),
        "rot_mat": rots,
        "rot_angle": rng.uniform(-0.1, 0.1, b).astype(np.float32),
        "scale": np.tile(rng.uniform(0.9, 1.1, (b, 1, 1)), (1, 1, 3)).astype(np.float32),
        # full-batch labels (the view-stats path reads the unlabeled rows,
        # as when the datasets are built with load_labels=True)
        "center_label": rng.uniform(-2, 2, (b, n_gt, 3)).astype(np.float32),
        "box_label_mask": (rng.random((b, n_gt)) > 0.3).astype(np.float32),
        "sem_cls_label": rng.randint(0, cfg.num_class, (b, n_gt)),
        "heading_class_label": np.zeros((b, n_gt), np.int64),
        "heading_residual_label": np.zeros((b, n_gt), np.float32),
        "size_class_label": rng.randint(0, cfg.num_size_cluster, (b, n_gt)),
        "size_residual_label": (rng.randn(b, n_gt, 3) * 0.05).astype(np.float32),
    }

    # derive thresholds from the teacher's own output quantiles so an
    # untrained model passes a NON-TRIVIAL subset (fixed reference values
    # would pass all or nothing here); both sides receive the same numbers.
    # IMPORTANT: a raw np.quantile lands ON (or within interpolation-ulp of)
    # an order statistic, and jax-f32 vs torch-f32 softmax differ by ~1 ulp
    # (~3e-8) — a sample sitting AT the threshold then flips the pick set
    # between the two sides (observed: pos_obj 0.48825145 vs 0.48825142
    # straddling a quantile threshold). Snap each threshold to the midpoint
    # of a wide gap between adjacent order statistics near the quantile so
    # every sample clears it by >> softmax ulp noise (PARITY.md "pseudo-label
    # pick-set contract").
    import scipy.special as sp

    def _safe_threshold(values, q, min_gap=1e-4):
        v = np.sort(np.asarray(values, np.float64).ravel())
        i = int(np.clip(np.searchsorted(v, np.quantile(v, q)), 1, v.size - 1))
        for off in range(v.size):
            for j in (i - off, i + off):
                if 1 <= j < v.size and v[j] - v[j - 1] >= min_gap:
                    return float((v[j] + v[j - 1]) / 2)
        return float(np.quantile(v, q))  # pragma: no cover (degenerate data)

    pos_obj = sp.softmax(ema_ep["objectness_scores"][bl:], axis=2)[..., 1]
    cls_probs = sp.softmax(ema_ep["sem_cls_scores"][bl:], axis=2)
    max_cls = cls_probs.max(-1)
    argmax_cls = cls_probs.argmax(-1)
    iou_at_cls = 1.0 / (1.0 + np.exp(-np.take_along_axis(
        ema_ep["iou_scores"][bl:], argmax_cls[..., None], axis=2)[..., 0]))
    thresholds = dict(obj_threshold=_safe_threshold(pos_obj, 0.3),
                      cls_threshold=_safe_threshold(max_cls, 0.3),
                      iou_threshold=_safe_threshold(iou_at_cls, 0.2))

    end_points = _torch_end_points(ep, batch)
    end_points["supervised_mask"] = torch.cat(
        [torch.ones(bl), torch.zeros(bu)]).long()
    ema_end_points = _torch_end_points(ema_ep, {})
    ref_dc = ref_sc.ScannetDatasetConfig()
    cd = {"dataset_config": ref_dc, "unlabeled_batch_size": bu,
          "nms_iou": 0.25, "use_old_type_nms": False, "use_lhs": True,
          "samecls_match": False, "view_stats": view_stats,
          "dataset": "scannet", **thresholds}
    ref_loss, ref_ep = ref_unl.get_unlabeled_loss(
        end_points, ema_end_points, ref_dc, cd)

    loss, m = get_unlabeled_loss(
        ep, ema_ep, batch, cfg, num_labeled=bl, nms_iou=0.25, use_lhs=True,
        samecls_match=False, dataset="scannet", ema_rows_are_unlabeled=False,
        view_stats=view_stats, **thresholds)

    # the pseudo-label PICK SETS must be identical before any loss math
    # (reference: host-NumPy corner loop + lhs_3d_faster_samecls; ours:
    # on-device fixed-shape LHS)
    from iou3dmatch_tpu.losses.unlabeled import get_pseudo_labels, trans_center

    teacher = {k: v[bl:] for k, v in ema_ep.items()}
    pseudo, _ = get_pseudo_labels(
        teacher, cfg, thresholds["obj_threshold"], thresholds["cls_threshold"],
        thresholds["iou_threshold"], nms_iou=0.25, use_lhs=True)
    our_mask = np.asarray(pseudo["unlabeled_box_label_mask"])
    ref_mask = ref_ep["unlabeled_box_label_mask"].numpy()
    np.testing.assert_array_equal(our_mask.sum(1), ref_mask.sum(1),
                                  err_msg="pseudo-label counts")
    k = ema_ep["center"].shape[1]
    assert 0 < our_mask.sum() < bu * k, \
        "degenerate pick set (all or nothing) — thresholds need retuning"
    # slot ORDER may differ (score-sort tie-breaks); every consumer is
    # order-invariant (chamfer + assignment gathers), so compare as SETS
    our_centers = np.asarray(trans_center(
        pseudo["unlabeled_center_label"],
        batch["flip_x_axis"][bl:], batch["flip_y_axis"][bl:],
        batch["rot_mat"][bl:], batch["scale"][bl:]))
    ref_centers = ref_ep["unlabeled_center_label"].numpy()
    for i in range(bu):
        ours_set = np.sort(our_centers[i][our_mask[i] > 0], axis=0)
        ref_set = np.sort(ref_centers[i][ref_mask[i] > 0], axis=0)
        np.testing.assert_allclose(ours_set, ref_set, rtol=1e-4, atol=1e-5,
                                   err_msg=f"selected center set, scene {i}")

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4,
                               err_msg="total unlabeled loss")
    keys = ["unlabeled_objectness_loss", "unlabeled_center_loss",
                "unlabeled_heading_cls_loss", "unlabeled_heading_reg_loss",
                "unlabeled_size_cls_loss", "unlabeled_size_reg_loss",
            "unlabeled_sem_cls_loss", "unlabeled_box_loss",
            "unlabeled_pos_ratio", "unlabeled_neg_ratio", "pseudo_gt_ratio"]
    if view_stats:
        # cheating diagnostics, emitted only under view_stats on BOTH sides
        # (loss_helper_unlabeled.py:392-414, :494-523)
        keys += ["unlabeled_pred_iou_value", "unlabeled_pred_iou_obj_value",
                 "unlabeled_iou_acc", "unlabeled_iou_obj_acc",
                 "true_unlabeled_obj_acc", "unlabeled_obj_acc",
                 "final_iou_avg_value",
                 "final_iou_avg_obj_value", "final_cls_value",
                 "final_cls_obj_value", "final_coverage_0.25_value",
                 "final_coverage_0.5_value"]
    for key in keys:
        assert key in m, f"ours missing {key}"
        assert key in ref_ep, f"reference missing {key}"
        np.testing.assert_allclose(
            float(m[key]), float(ref_ep[key]), rtol=2e-4, atol=1e-6,
            err_msg=key)


@pytest.mark.parametrize("dataset", ["scannet", "sunrgbd"])
def test_decode_and_bbox_calc_match_reference(dataset):
    """Proposal head decode (softplus−1 size residuals, π/NH heading
    normalization; proposal_module.py:24-54) and the argmax box decode with
    HALF sizes (votenet_iou_branch.py:111-137), against the reference on the
    same raw head output. sunrgbd exercises the 12-bin heading decode."""
    import torch

    ref_prop = load("models.proposal_module")
    ref_vote = load("models.votenet_iou_branch")
    from iou3dmatch_tpu.models.factory import build_votenet

    model, cfg = build_votenet(dataset, tiny=True)
    nh, ns, nc = cfg.num_heading_bin, cfg.num_size_cluster, cfg.num_class
    rng = np.random.RandomState(17)
    b, k = 2, 16
    out_dim = 2 + 3 + nh * 2 + ns * 4 + nc
    net = rng.randn(b, k, out_dim).astype(np.float32)
    agg_xyz = rng.uniform(-2, 2, (b, k, 3)).astype(np.float32)

    ref_dc = _ref_config(dataset)
    ref_ep = {"aggregated_vote_xyz": torch.from_numpy(agg_xyz)}
    ref_ep = ref_prop.decode_scores(
        torch.from_numpy(net).transpose(2, 1), ref_ep, nc, nh, ns,
        ref_dc.mean_size_arr)

    from iou3dmatch_tpu.models.proposal import ProposalModule

    mean_tuple = tuple(tuple(float(v) for v in row) for row in cfg.mean_size_arr)
    pnet = ProposalModule(num_class=nc, num_heading_bin=nh,
                          num_size_cluster=ns, mean_size_arr=mean_tuple,
                          num_proposal=k)
    ep = pnet.decode_scores(net, {"aggregated_vote_xyz": agg_xyz})
    for key in ["objectness_scores", "center", "heading_scores",
                "heading_residuals_normalized", "heading_residuals",
                "size_scores", "size_residuals_normalized", "size_residuals",
                "sem_cls_scores"]:
        np.testing.assert_allclose(
            np.asarray(ep[key]), ref_ep[key].numpy(), rtol=1e-5, atol=1e-6,
            err_msg=key)

    # calculate_bbox needs a reference VoteNet *instance*; bypass __init__
    # (which builds CUDA submodules) and set only the fields it reads
    ref_net = ref_vote.VoteNet.__new__(ref_vote.VoteNet)
    ref_net.mean_size_arr = ref_dc.mean_size_arr
    ref_net.dataset_config = ref_dc
    r_center, r_size, r_heading = ref_vote.VoteNet.calculate_bbox(ref_net, ref_ep)

    center, size, heading = model.calculate_bbox(dict(ep))
    np.testing.assert_allclose(np.asarray(center), r_center.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(size), r_size.numpy(), rtol=1e-5,
                               atol=1e-6, err_msg="half sizes")
    np.testing.assert_allclose(np.asarray(heading), r_heading.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_ssl_frame_transforms_match_reference():
    """trans_center / trans_size / trans_angle — the teacher→student label
    transforms (loss_helper_unlabeled.py:24-64) — on random draws, including
    the SUN RGB-D 12-bin angle re-binning under flips+rotation."""
    import torch

    ref_unl = load("models.loss_helper_unlabeled")
    ref_su = load("sunrgbd.model_util_sunrgbd")
    from iou3dmatch_tpu.data.config import SunrgbdConfig
    from iou3dmatch_tpu.data.pc_util import rotz
    from iou3dmatch_tpu.losses.unlabeled import (
        trans_angle, trans_center, trans_size)

    rng = np.random.RandomState(23)
    b, n = 3, 10
    center = rng.uniform(-3, 3, (b, n, 3)).astype(np.float32)
    flip_x = rng.randint(0, 2, (b,)).astype(np.int64)
    flip_y = rng.randint(0, 2, (b,)).astype(np.int64)
    angles = rng.uniform(-0.5, 0.5, b).astype(np.float32)
    rot = np.stack([rotz(a) for a in angles]).astype(np.float32)
    scale = np.tile(rng.uniform(0.85, 1.15, (b, 1, 1)), (1, 1, 3)).astype(np.float32)

    t = lambda x: torch.from_numpy(np.array(x))
    r_center = ref_unl.trans_center(t(center), t(flip_x), t(flip_y), t(rot), t(scale))
    np.testing.assert_allclose(
        np.asarray(trans_center(center, flip_x, flip_y, rot, scale)),
        r_center.numpy(), rtol=1e-5, atol=1e-6)

    cfg = SunrgbdConfig()
    ref_dc = ref_su.SunrgbdDatasetConfig()
    size_cls = rng.randint(0, cfg.num_size_cluster, (b, n))
    size_res = (rng.randn(b, n, 3) * 0.1).astype(np.float32)
    r_size_res = ref_unl.trans_size(t(size_cls), t(size_res), t(scale), ref_dc)
    np.testing.assert_allclose(
        np.asarray(trans_size(size_cls, size_res, scale, cfg)),
        r_size_res.numpy(), rtol=1e-5, atol=1e-6)

    hcls = rng.randint(0, cfg.num_heading_bin, (b, n))
    hres = rng.uniform(-np.pi / 12, np.pi / 12, (b, n)).astype(np.float32)
    r_cls, r_res = ref_unl.trans_angle(
        t(hcls), t(hres), t(flip_x), t(flip_y), t(angles), ref_dc)
    o_cls, o_res = trans_angle(hcls, hres, flip_x, flip_y, angles, cfg)
    np.testing.assert_array_equal(np.asarray(o_cls), r_cls.numpy())
    np.testing.assert_allclose(np.asarray(o_res), r_res.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_align_and_roi_helpers_match_reference():
    """align_predictions_groundtruths + get_roi_ptcloud
    (ap_helper.py:293-379): best-IoU GT alignment, fitness thresholding,
    enlarged-box ROI cropping with the same RNG-backed resampling."""
    import torch

    ref_ap = load("models.ap_helper")
    ref_box = load("utils.box_util")
    from iou3dmatch_tpu.eval.ap_helper import (
        align_predictions_groundtruths, get_roi_ptcloud)

    rng = np.random.RandomState(29)
    b, k, g = 2, 6, 4
    pred = np.stack([np.stack([ref_box.get_3d_box(
        rng.uniform(0.4, 1.5, 3), rng.uniform(-np.pi, np.pi),
        rng.uniform(-1, 1, 3)) for _ in range(k)]) for _ in range(b)])
    gt = np.stack([np.stack([ref_box.get_3d_box(
        rng.uniform(0.4, 1.5, 3), rng.uniform(-np.pi, np.pi),
        rng.uniform(-1, 1, 3)) for _ in range(g)]) for _ in range(b)])
    mask = (rng.random((b, g)) > 0.3).astype(np.float32)
    mask[:, 0] = 1
    sem = rng.randint(0, 5, (b, g))
    ep_t = {"box_label_mask": torch.from_numpy(mask),
            "sem_cls_label": torch.from_numpy(sem)}
    r_al, r_conf, r_cls = ref_ap.align_predictions_groundtruths(
        pred.astype(np.float32), gt.astype(np.float32), ep_t, iou_threshold=0.25)
    ep_o = {"box_label_mask": mask, "sem_cls_label": sem}
    o_al, o_conf, o_cls = align_predictions_groundtruths(
        pred.astype(np.float32), gt.astype(np.float32), ep_o, iou_threshold=0.25)
    np.testing.assert_allclose(o_al, r_al, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(o_conf, r_conf)
    np.testing.assert_array_equal(o_cls, r_cls)

    pc = rng.uniform(-3, 3, (b, 4096, 4)).astype(np.float32)
    params = np.zeros((b, k, 7), np.float32)
    params[..., 0:3] = rng.uniform(-2, 2, (b, k, 3))
    params[..., 3:6] = rng.uniform(0.5, 2.0, (b, k, 3))
    params[..., 6] = rng.uniform(-np.pi, np.pi, (b, k))
    np.random.seed(7)
    r_roi, r_mask = ref_ap.get_roi_ptcloud(
        {"point_clouds": torch.from_numpy(pc)}, params,
        num_point_roi=128, min_num_point=20)
    np.random.seed(7)
    o_roi, o_mask = get_roi_ptcloud(
        {"point_clouds": pc}, params, num_point_roi=128, min_num_point=20)
    np.testing.assert_array_equal(o_mask, r_mask)
    np.testing.assert_allclose(o_roi, r_roi, rtol=1e-6, atol=1e-7)


# --------------------------------------------- dataset __getitem__ bit parity
def _write_fake_scannet(tmp_path, rng, n=4000):
    verts = np.zeros((n, 6), np.float32)
    verts[:, :3] = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    verts[:, 3:] = rng.uniform(0, 255, (n, 3)).astype(np.float32)
    ins = np.zeros(n, np.int64)
    sem = np.zeros(n, np.int64)
    ins[:800] = 1
    sem[:800] = 5
    verts[:800, :3] = rng.uniform(0, 1, (800, 3))
    ins[800:1400] = 2
    sem[800:1400] = 7
    verts[800:1400, :3] = rng.uniform(2, 3, (600, 3))
    bbox = np.zeros((2, 7))
    for i, (lo, hi) in enumerate([(0, 800), (800, 1400)]):
        mn, mx = verts[lo:hi, :3].min(0), verts[lo:hi, :3].max(0)
        bbox[i, :3], bbox[i, 3:6] = (mn + mx) / 2, mx - mn
    bbox[0, 6], bbox[1, 6] = 5, 7
    scan = "scene0000_00"
    np.save(tmp_path / f"{scan}_vert.npy", verts)
    np.save(tmp_path / f"{scan}_ins_label.npy", ins)
    np.save(tmp_path / f"{scan}_sem_label.npy", sem)
    np.save(tmp_path / f"{scan}_bbox.npy", bbox)


def _write_fake_sunrgbd(tmp_path, rng, n=4000):
    center = np.array([1.0, 3.0, 0.4])
    half = np.array([1.1, 0.9, 0.35])
    heading = 0.5
    pc = np.zeros((n, 6), np.float32)
    pc[:, :3] = rng.uniform(-4, 4, (n, 3))
    pc[:, 3:] = rng.uniform(0, 1, (n, 3))
    c, s = np.cos(-heading), np.sin(-heading)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    local = rng.uniform(-1, 1, (800, 3)) * half * 0.9
    pc[:800, :3] = local @ rot.T + center
    bbox = np.zeros((2, 8))
    bbox[0, :3], bbox[0, 3:6], bbox[0, 6], bbox[0, 7] = center, half, heading, 0
    bbox[1, :3], bbox[1, 3:6], bbox[1, 6], bbox[1, 7] = (
        center + 2.0, half * 0.7, -0.9, 3)
    votes = np.zeros((n, 10), np.float32)
    votes[:800, 0] = 1
    v = center - pc[:800, :3]
    votes[:800, 1:4] = votes[:800, 4:7] = votes[:800, 7:10] = v
    np.savez_compressed(tmp_path / "000001_pc.npz", pc=pc)
    np.save(tmp_path / "000001_bbox.npy", bbox)
    np.savez_compressed(tmp_path / "000001_votes.npz", point_votes=votes)


def test_sunrgbd_getitem_bit_for_bit(tmp_path):
    """Reference SUN RGB-D __getitem__ vs ours under the same np.random
    seed: augmentations (x-flip with heading->pi-theta, +/-30deg rotation
    with vote-endpoint transform, color jitter, scale), half-extent x2 size
    classes, 12-bin heading labels (sunrgbd_detection_dataset.py:100-246)."""
    ref_mod = load("sunrgbd.sunrgbd_detection_dataset")
    from iou3dmatch_tpu.data.sunrgbd import SunrgbdDetectionVotesDataset

    _write_fake_sunrgbd(tmp_path, np.random.RandomState(4))

    ref_ds = ref_mod.SunrgbdDetectionVotesDataset.__new__(
        ref_mod.SunrgbdDetectionVotesDataset)
    ref_ds.data_path = str(tmp_path)
    ref_ds.scan_names = ["000001"]
    ref_ds.num_points = 2048
    ref_ds.use_color = True
    ref_ds.use_height = True
    ref_ds.augment = True

    our_ds = SunrgbdDetectionVotesDataset(
        str(tmp_path), num_points=2048, use_height=True, use_color=True,
        augment=True)

    for seed in (0, 2, 23):
        np.random.seed(seed)
        r = ref_ds[0]
        np.random.seed(seed)
        o = our_ds[0]
        for key in ["point_clouds", "center_label", "heading_class_label",
                    "heading_residual_label", "size_class_label",
                    "size_residual_label", "sem_cls_label", "box_label_mask",
                    "vote_label", "vote_label_mask"]:
            assert key in r and key in o, key
            np.testing.assert_array_equal(
                np.asarray(o[key]), np.asarray(r[key]),
                err_msg=f"{key} differs at seed {seed}")


def test_scannet_ssl_getitem_bit_for_bit(tmp_path):
    """Dual-view SSL datasets: augmented student view + raw EMA view + the
    augmentation parameters the pseudo-label transforms consume must be
    RNG-identical to the reference (scannet_ssl_dataset.py:24-320)."""
    ref_mod = load("scannet.scannet_ssl_dataset")
    from iou3dmatch_tpu.data.scannet import (
        ScannetSSLLabeledDataset, ScannetSSLUnlabeledDataset)

    _write_fake_scannet(tmp_path, np.random.RandomState(0))
    (tmp_path / "meta").mkdir()
    for fn in ("scannetv2_train.txt", "labeled.txt"):
        with open(tmp_path / "meta" / fn, "w") as f:
            f.write("scene0000_00\n")

    ref_lab = ref_mod.ScannetSSLLabeledDataset.__new__(
        ref_mod.ScannetSSLLabeledDataset)
    ref_lab.data_path = str(tmp_path)
    ref_lab.scan_names = ["scene0000_00"]
    ref_lab.num_points = 2048
    ref_lab.use_color = False
    ref_lab.use_height = True
    ref_lab.augment = True
    our_lab = ScannetSSLLabeledDataset(
        str(tmp_path), str(tmp_path / "meta"), "labeled.txt", num_points=2048,
        use_height=True, use_color=False, augment=True)

    ref_unl = ref_mod.ScannetSSLUnlabeledDataset.__new__(
        ref_mod.ScannetSSLUnlabeledDataset)
    ref_unl.data_path = str(tmp_path)
    ref_unl.scan_names = ["scene0000_00"]
    ref_unl.num_points = 2048
    ref_unl.use_color = False
    ref_unl.use_height = True
    ref_unl.augment = True
    ref_unl.load_labels = False
    # unlabeled = train \ labeled; use an empty labeled list via direct fields
    our_unl = ScannetSSLUnlabeledDataset.__new__(ScannetSSLUnlabeledDataset)
    our_unl.data_path = str(tmp_path)
    our_unl.scan_names = ["scene0000_00"]
    our_unl.num_points = 2048
    our_unl.use_color = False
    our_unl.use_height = True
    our_unl.augment = True
    our_unl.load_labels = False

    lab_keys = ["point_clouds", "ema_point_clouds", "center_label",
                "heading_class_label", "heading_residual_label",
                "size_class_label", "size_residual_label", "sem_cls_label",
                "box_label_mask", "vote_label", "vote_label_mask",
                "supervised_mask", "scene_label", "flip_x_axis",
                "flip_y_axis", "rot_mat", "rot_angle", "scale"]
    unl_keys = ["point_clouds", "ema_point_clouds", "supervised_mask",
                "flip_x_axis", "flip_y_axis", "rot_mat", "rot_angle", "scale"]
    for ref_ds, our_ds, keys in ((ref_lab, our_lab, lab_keys),
                                 (ref_unl, our_unl, unl_keys)):
        for seed in (0, 9):
            np.random.seed(seed)
            r = ref_ds[0]
            np.random.seed(seed)
            o = our_ds[0]
            for key in keys:
                assert key in r, key
                assert key in o, key
                np.testing.assert_array_equal(
                    np.asarray(o[key]), np.asarray(r[key]),
                    err_msg=f"{key} differs at seed {seed}")


def test_sunrgbd_ssl_getitem_bit_for_bit(tmp_path):
    """SUN RGB-D SSL dual-view pair: x-flip-only + ±30° rotation + scale
    augmentation set, flip_y_axis pinned to 0
    (sunrgbd_ssl_dataset.py:26-312)."""
    ref_mod = load("sunrgbd.sunrgbd_ssl_dataset")
    from iou3dmatch_tpu.data.sunrgbd import (
        SunrgbdSSLLabeledDataset, SunrgbdSSLUnlabeledDataset)

    _write_fake_sunrgbd(tmp_path, np.random.RandomState(4))

    def mk(cls, load_labels=None):
        ds = cls.__new__(cls)
        ds.data_path = str(tmp_path)
        ds.scan_names = ["000001"]
        ds.num_points = 2048
        ds.use_color = False
        ds.use_height = True
        ds.augment = True
        if load_labels is not None:
            ds.load_labels = load_labels
        return ds

    pairs = [
        (mk(ref_mod.SunrgbdSSLLabeledDataset), mk(SunrgbdSSLLabeledDataset),
         ["point_clouds", "ema_point_clouds", "center_label",
          "heading_class_label", "heading_residual_label", "size_class_label",
          "size_residual_label", "sem_cls_label", "box_label_mask",
          "vote_label", "vote_label_mask", "supervised_mask",
          "flip_x_axis", "flip_y_axis", "rot_mat", "rot_angle", "scale"]),
        (mk(ref_mod.SunrgbdSSLUnlabeledDataset, load_labels=False),
         mk(SunrgbdSSLUnlabeledDataset, load_labels=False),
         ["point_clouds", "ema_point_clouds", "supervised_mask",
          "flip_x_axis", "flip_y_axis", "rot_mat", "rot_angle", "scale"]),
    ]
    for ref_ds, our_ds, keys in pairs:
        for seed in (0, 5):
            np.random.seed(seed)
            r = ref_ds[0]
            np.random.seed(seed)
            o = our_ds[0]
            for key in keys:
                assert key in r, key
                assert key in o, key
                np.testing.assert_array_equal(
                    np.asarray(o[key]), np.asarray(r[key]),
                    err_msg=f"{key} differs at seed {seed}")


def test_scannet_getitem_bit_for_bit(tmp_path):
    """Same fake dump + same np.random seed => identical tensors from the
    reference dataset and ours (augmentations, sampling, votes, labels)."""
    ref_ds_mod = load("scannet.scannet_detection_dataset")
    from iou3dmatch_tpu.data.scannet import ScannetDetectionDataset

    _write_fake_scannet(tmp_path, np.random.RandomState(0))

    ref_ds = ref_ds_mod.ScannetDetectionDataset.__new__(
        ref_ds_mod.ScannetDetectionDataset)
    # reference __init__ requires its own data root; set fields directly
    ref_ds.data_path = str(tmp_path)
    ref_ds.scan_names = ["scene0000_00"]
    ref_ds.num_points = 2048
    ref_ds.use_color = False
    ref_ds.use_height = True
    ref_ds.augment = True
    ref_ds.remove_obj = False

    our_ds = ScannetDetectionDataset(
        str(tmp_path), split_set="all", num_points=2048,
        use_height=True, use_color=False, augment=True)

    for seed in (0, 1, 17):
        np.random.seed(seed)
        r = ref_ds[0]
        np.random.seed(seed)
        o = our_ds[0]
        for key in ["point_clouds", "center_label", "heading_class_label",
                    "heading_residual_label", "size_class_label",
                    "size_residual_label", "sem_cls_label", "box_label_mask",
                    "vote_label", "vote_label_mask"]:
            assert key in r and key in o, key
            np.testing.assert_array_equal(
                np.asarray(o[key]), np.asarray(r[key]),
                err_msg=f"{key} differs at seed {seed}")
