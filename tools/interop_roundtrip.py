"""Full-file checkpoint interop: reference driver files <-> our framework.

VERDICT r3 #3: the torch import/export was round-trip tested on in-memory
state dicts, but never through *files* in the reference drivers' own save
format ({epoch, optimizer_state_dict, loss, model_state_dict[,
ema_model_state_dict]}, /root/reference/pretrain.py:371-406,
/root/reference/train.py:569-585) evaluated head-to-head. This harness
closes that loop on the dense mini-set (_parity_demo_dense):

  makefiles  - wrap the reference-trained weights (ssl.pt / pretrain.pt,
               trained by tools/parity_demo.py's reference phase) into
               driver-format .tar files with a real torch Adam
               optimizer_state_dict, exactly the payload a reference user
               has on disk.
  batches    - materialize the 12 val scenes ONCE into fixed numpy batches
               (our loader, fixed per-scene seeds) so both stacks see
               byte-identical inputs and eval differences cannot hide in
               point-subsampling RNG.
  ours_eval  - our stack: checkpoint.load(driver .tar) -> make_eval_forward
               -> our AP pipeline on the fixed batches.
  ref_eval   - reference stack: torch VoteNet (CUDA ext backed by our
               kernels via tests/reference_bridge) + reference ap_helper /
               eval_det on the same fixed batches.
  roundtrip  - import the driver file, export_state_dict back to a torch
               file, load it into a fresh reference model with the
               reference's own filter-and-update pattern
               (/root/reference/train.py:209-215), and assert every shared
               tensor is BIT-EXACT through the full file cycle; then
               ref_eval the re-exported file (must equal ref_eval of the
               original to the last digit).
  report     - reports/interop_roundtrip.md.

Run after the dense parity demo (reference + ours phases) completed:
  python tools/interop_roundtrip.py --phase all
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROOT = os.path.join(REPO, "_parity_demo_dense")
WORK = os.path.join(ROOT, "interop")
NUM_POINT = 4096
BATCH = 2


# --------------------------------------------------------------------------
def makefiles():
    import torch

    os.makedirs(WORK, exist_ok=True)
    from tests.reference_bridge import install_pointnet2_shim, load
    import jax

    jax.config.update("jax_platforms", "cpu")
    install_pointnet2_shim()
    ref_v = load("models.votenet_iou_branch")
    dc = load("scannet.model_util_scannet").ScannetDatasetConfig()

    net = ref_v.VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        input_feature_dim=1, num_proposal=128, sampling="seed_fps",
        dataset_config=dc)
    opt = torch.optim.Adam(net.parameters(), lr=2e-3)

    for src, dst, with_ema in (("pretrain.pt", "pretrain_driver.tar", False),
                               ("ssl.pt", "ssl_driver.tar", True)):
        sd = torch.load(os.path.join(ROOT, "reference", src),
                        map_location="cpu", weights_only=True)
        net.load_state_dict(sd)
        # the exact payload pretrain.py:371-379 / train.py:569-585 build
        save_dict = {"epoch": 29, "optimizer_state_dict": opt.state_dict(),
                     "loss": 0.0, "model_state_dict": net.state_dict()}
        if with_ema:
            # the demo's reference phase keeps no separate EMA snapshot;
            # use the student weights (what train.py:216-218 would load
            # into the teacher anyway) and note it in the report
            save_dict["ema_model_state_dict"] = net.state_dict()
        torch.save(save_dict, os.path.join(WORK, dst))
        print(f"[makefiles] wrote {dst} from {src}")


# --------------------------------------------------------------------------
def batches():
    """Fixed eval batches: our val dataset, np.random reseeded per scene so
    the materialization is reproducible; saved as one npz per batch."""
    from iou3dmatch_tpu.data.scannet import ScannetDetectionDataset

    ds = ScannetDetectionDataset(
        os.path.join(ROOT, "data", "scannet_train_detection_data"),
        split_dir=os.path.join(ROOT, "data", "meta_data"), split_set="val",
        num_points=NUM_POINT, use_height=True, augment=False)
    os.makedirs(WORK, exist_ok=True)
    items = []
    for i in range(len(ds)):
        np.random.seed(7000 + i)
        items.append(ds[i])
    for bi in range(0, len(items), BATCH):
        chunk = items[bi:bi + BATCH]
        batch = {k: np.stack([it[k] for it in chunk]) for k in chunk[0]}
        np.savez_compressed(os.path.join(WORK, f"valbatch_{bi // BATCH:02d}.npz"),
                            **batch)
    print(f"[batches] wrote {(len(items) + BATCH - 1) // BATCH} fixed "
          f"val batches ({len(items)} scenes)")


def _load_batches():
    files = sorted(f for f in os.listdir(WORK) if f.startswith("valbatch_"))
    out = []
    for f in files:
        with np.load(os.path.join(WORK, f)) as z:
            out.append({k: z[k] for k in z.files})
    return out


# --------------------------------------------------------------------------
def ours_eval(ckpt, tag):
    import jax

    if os.environ.get("INTEROP_OURS_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from types import SimpleNamespace

    from iou3dmatch_tpu.cli.common import evaluate, make_config_dict
    from iou3dmatch_tpu.data.config import get_config
    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.train import (checkpoint, create_train_state,
                                      make_eval_forward)

    cfg = get_config("scannet")
    model, _ = build_votenet("scannet")
    batches_list = _load_batches()
    state = create_train_state(model, jax.random.PRNGKey(0), batches_list[0],
                               with_ema=True)
    state, _, _ = checkpoint.load(ckpt, state)
    fwd = make_eval_forward(model, cfg)
    cd = make_config_dict(cfg, SimpleNamespace(use_iou_for_nms=False))
    _, ap_results, _ = evaluate(model, cfg, state, batches_list, cd, print,
                                fwd, ap_iou_thresholds=(0.25, 0.5))
    res = {str(t): {"mAP": float(m["mAP"]), "AR": float(m["AR"]),
                    "per_class_ap": {k[:-18]: float(v) for k, v in m.items()
                                     if k.endswith("Average Precision")}}
           for t, m in ap_results.items()}
    out = os.path.join(WORK, f"ours_eval_{tag}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"[ours_eval {tag}] " + "  ".join(
        f"mAP@{t}={res[t]['mAP']:.4f}" for t in ("0.25", "0.5")))


# --------------------------------------------------------------------------
def ref_eval(sd_file, tag):
    """Reference stack eval of a torch file on the fixed batches. Accepts a
    bare state dict or a driver-format payload (model_state_dict used)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from tests.reference_bridge import install_pointnet2_shim, load

    install_pointnet2_shim()
    ref_v = load("models.votenet_iou_branch")
    ref_ap = load("models.ap_helper")
    ref_ed = load("utils.eval_det")
    ref_ap.eval_det_multiprocessing = (
        lambda pred, gt, ovthresh=0.25, get_iou_func=None:
        ref_ed.eval_det(pred, gt, ovthresh, False, get_iou_func))
    dc = load("scannet.model_util_scannet").ScannetDatasetConfig()

    payload = torch.load(sd_file, map_location="cpu", weights_only=True)
    sd = payload.get("model_state_dict", payload)
    net = ref_v.VoteNet(
        num_class=dc.num_class, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        input_feature_dim=1, num_proposal=128, sampling="seed_fps",
        dataset_config=dc)
    # the reference's own checkpoint-consumption pattern (train.py:209-215)
    model_dict = net.state_dict()
    model_dict.update({k: v for k, v in sd.items() if k in model_dict})
    net.load_state_dict(model_dict)
    net.eval()

    cd = {"remove_empty_box": False, "use_3d_nms": True, "nms_iou": 0.25,
          "use_old_type_nms": False, "cls_nms": True, "use_iou_for_nms": False,
          "per_class_proposal": True, "conf_thresh": 0.05,
          "dataset_config": dc}
    calcs = {t: ref_ap.APCalculator(t, dc.class2type) for t in (0.25, 0.5)}
    for batch in _load_batches():
        tb = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in batch.items()}
        with torch.no_grad():
            end_points = net({"point_clouds": tb["point_clouds"].float()})
        for k in tb:
            if k not in end_points:
                end_points[k] = tb[k]
        pred = ref_ap.parse_predictions(end_points, cd)
        gt = ref_ap.parse_groundtruths(end_points, cd)
        for c in calcs.values():
            c.step(pred, gt)
    res = {}
    for t, c in calcs.items():
        m = c.compute_metrics()
        res[str(t)] = {"mAP": float(m["mAP"]), "AR": float(m["AR"]),
                       "per_class_ap": {k[:-18]: float(v) for k, v in m.items()
                                        if k.endswith("Average Precision")}}
    out = os.path.join(WORK, f"ref_eval_{tag}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"[ref_eval {tag}] " + "  ".join(
        f"mAP@{t}={res[t]['mAP']:.4f}" for t in ("0.25", "0.5")))


# --------------------------------------------------------------------------
def roundtrip():
    """driver .tar -> our import -> export -> torch file -> reference load
    -> bit-exactness assertions + re-exported file for ref_eval."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.train import checkpoint, create_train_state
    from iou3dmatch_tpu.train.torch_import import export_state_dict

    model, _ = build_votenet("scannet")
    batch0 = _load_batches()[0]
    state = create_train_state(model, jax.random.PRNGKey(0), batch0,
                               with_ema=True)
    src = os.path.join(WORK, "ssl_driver.tar")
    state, _, _ = checkpoint.load(src, state)

    exported = export_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats})
    orig = torch.load(src, map_location="cpu",
                      weights_only=True)["model_state_dict"]
    n_checked = 0
    for k, v in exported.items():
        ref_t = orig[k].numpy()
        assert ref_t.shape == v.shape, (k, ref_t.shape, v.shape)
        if not np.array_equal(ref_t, v):
            raise AssertionError(f"roundtrip mismatch at {k}: "
                                 f"max|d|={np.abs(ref_t - v).max()}")
        n_checked += 1
    missing = {k for k in orig if k not in exported
               and "num_batches_tracked" not in k}
    assert not missing, f"keys lost in roundtrip: {sorted(missing)[:8]}"
    out = os.path.join(WORK, "ssl_reexported.pt")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in exported.items()}, out)
    print(f"[roundtrip] {n_checked} tensors BIT-EXACT through "
          f"driver.tar -> our import -> export -> {os.path.basename(out)}")


# --------------------------------------------------------------------------
def report():
    def rd(name):
        p = os.path.join(WORK, name)
        return json.load(open(p)) if os.path.exists(p) else None

    ours_ref = rd("ours_eval_refssl.json")
    ref_ref = rd("ref_eval_refssl.json")
    ref_re = rd("ref_eval_reexport.json")
    ours_ours = rd("ours_eval_oursssl.json")
    ref_ours = rd("ref_eval_oursssl.json")

    L = ["# Checkpoint-file interop round trip (dense mini-set, 12 val scenes)",
         "",
         "Weights travel as FILES in the reference drivers' own save format",
         "({epoch, optimizer_state_dict, loss, model_state_dict[,",
         "ema_model_state_dict]}, reference pretrain.py:371-406 /",
         "train.py:569-585). Both stacks evaluate byte-identical fixed input",
         "batches (tools/interop_roundtrip.py `batches`), so any metric gap",
         "is the stacks themselves, not data-loading RNG. Reference stack =",
         "torch VoteNet + reference ap_helper/eval_det on CPU (CUDA ext",
         "backed by our kernels); ours = TPU-native eval path. The SSL",
         "driver file's ema_model_state_dict duplicates the student weights",
         "(the demo's reference phase keeps no separate EMA snapshot; the",
         "reference's own SSL loader would mirror student->teacher anyway,",
         "train.py:216-218).",
         "",
         "| weights file | eval stack | mAP@0.25 | AR@0.25 | mAP@0.5 | AR@0.5 |",
         "|---|---|---|---|---|---|"]

    def row(label, stack, m):
        if m is None:
            return f"| {label} | {stack} | - | - | - | - |"
        return (f"| {label} | {stack} | {m['0.25']['mAP']:.4f} | "
                f"{m['0.25']['AR']:.4f} | {m['0.5']['mAP']:.4f} | "
                f"{m['0.5']['AR']:.4f} |")

    L.append(row("reference ssl_driver.tar", "reference", ref_ref))
    L.append(row("reference ssl_driver.tar", "**ours (imported)**", ours_ref))
    L.append(row("ssl_reexported.pt (ours export)", "reference", ref_re))
    if ours_ours:
        L.append(row("our SSL checkpoint.tar", "ours", ours_ours))
        L.append(row("our SSL checkpoint.tar -> export_torch", "reference",
                     ref_ours))
    L += ["",
          "- `roundtrip`: every tensor of the driver file is **bit-exact**",
          "  through our import -> export -> torch file cycle (asserted, see",
          "  tools/interop_roundtrip.py::roundtrip).",
          "- ref_eval(original) vs ref_eval(re-export) must be identical to",
          "  the last digit - same bytes, same stack."]
    if ref_ref and ref_re:
        same = json.dumps(ref_ref, sort_keys=True) == json.dumps(
            ref_re, sort_keys=True)
        L.append(f"  Observed: {'IDENTICAL' if same else 'MISMATCH (bug!)'}.")
    os.makedirs(os.path.join(REPO, "reports"), exist_ok=True)
    out = os.path.join(REPO, "reports", "interop_roundtrip.md")
    with open(out, "w") as f:
        f.write("\n".join(L) + "\n")
    print("\n".join(L))


# --------------------------------------------------------------------------
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["makefiles", "batches", "ours_eval", "ref_eval",
                             "roundtrip", "report", "all"])
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint file for ours_eval/ref_eval")
    ap.add_argument("--tag", default="refssl")
    args = ap.parse_args()
    if args.phase == "all":
        makefiles()
        batches()
        ours_eval(os.path.join(WORK, "ssl_driver.tar"), "refssl")
        ref_eval(os.path.join(WORK, "ssl_driver.tar"), "refssl")
        roundtrip()
        ref_eval(os.path.join(WORK, "ssl_reexported.pt"), "reexport")
        report()
    elif args.phase == "ours_eval":
        ours_eval(args.ckpt or os.path.join(WORK, "ssl_driver.tar"), args.tag)
    elif args.phase == "ref_eval":
        ref_eval(args.ckpt or os.path.join(WORK, "ssl_driver.tar"), args.tag)
    else:
        {"makefiles": makefiles, "batches": batches, "roundtrip": roundtrip,
         "report": report}[args.phase]()


if __name__ == "__main__":
    main()
