"""Shared driver plumbing: dataset construction (with synthetic fallback),
eval loop (AP@0.25/0.5), metric averaging, config dict.

Mirrors the reference drivers' shared structure (pretrain.py:107-232,
train.py:91-275): argparse flags -> CONFIG_DICT -> loss/eval functions.
"""
import os

import numpy as np

from ..data import get_config
from ..data.synthetic import SyntheticDataset
from ..eval import APCalculator, parse_groundtruths, parse_predictions
from ..eval.iou_opt import iou_optimize


def make_config_dict(cfg, args):
    """CONFIG_DICT with the reference eval defaults (train.py:263-275)."""
    return {
        "dataset_config": cfg,
        "remove_empty_box": False,
        "use_3d_nms": True,
        "nms_iou": 0.25,
        "use_old_type_nms": False,
        "cls_nms": True,
        "use_iou_for_nms": bool(getattr(args, "use_iou_for_nms", False)),
        "per_class_proposal": True,
        "conf_thresh": getattr(args, "conf_thresh", 0.05),
        # carried for CONFIG_DICT parity with pretrain.py:231; the reference
        # never reads it anywhere (vestigial knob)
        "iou_weight": getattr(args, "iou_weight", 1.0),
        "obj_threshold": getattr(args, "obj_threshold", 0.9),
        "cls_threshold": getattr(args, "cls_threshold", 0.9),
        "use_lhs": True,
        "iou_threshold": getattr(args, "iou_threshold", 0.25),
    }


def _data_root(args, sub):
    root = getattr(args, "data_path", None)
    return os.path.join(root, sub) if root else sub


def _sunrgbd_dir(args, split):
    """v1 (default) or v2 box-label dumps (--use_sunrgbd_v2, mirroring
    use_v1=(not FLAGS.use_sunrgbd_v2) at pretrain.py:137/train.py:119)."""
    ver = "v2" if getattr(args, "use_sunrgbd_v2", False) else "v1"
    return f"sunrgbd_pc_bbox_votes_50k_{ver}_{split}"


def build_supervised_datasets(args):
    """(train_ds, eval_ds, cfg). Falls back to synthetic scenes when the
    offline dumps are absent (they require manual download, README.md:83-117
    of the reference)."""
    cfg = get_config(args.dataset)
    if getattr(args, "synthetic", False):
        train_ds = SyntheticDataset(args.dataset, num_scenes=args.synthetic_scenes,
                                    num_points=args.num_point, seed=1)
        eval_ds = SyntheticDataset(args.dataset, num_scenes=max(args.synthetic_scenes // 4, 2),
                                   num_points=args.num_point, seed=2)
        return train_ds, eval_ds, cfg

    if args.dataset == "scannet":
        from ..data.scannet import ScannetDetectionDataset

        data_path = _data_root(args, "scannet_train_detection_data")
        split_dir = _data_root(args, "meta_data")
        train_ds = ScannetDetectionDataset(
            data_path, split_dir, "train",
            labeled_sample_list=args.labeled_sample_list,
            num_points=args.num_point, augment=True, use_height=not args.no_height,
            use_color=args.use_color)
        eval_ds = ScannetDetectionDataset(
            data_path, split_dir, "val", num_points=args.num_point,
            augment=False, use_height=not args.no_height, use_color=args.use_color)
    else:
        from ..data.sunrgbd import SunrgbdDetectionVotesDataset

        data_path = _data_root(args, _sunrgbd_dir(args, "train"))
        split_dir = _data_root(args, "sunrgbd_trainval")
        train_ds = SunrgbdDetectionVotesDataset(
            data_path, split_dir, labeled_sample_list=args.labeled_sample_list,
            num_points=args.num_point, augment=True, use_height=not args.no_height,
            use_color=args.use_color)
        eval_data_path = _data_root(args, _sunrgbd_dir(args, "val"))
        eval_ds = SunrgbdDetectionVotesDataset(
            eval_data_path, num_points=args.num_point, augment=False,
            use_height=not args.no_height, use_color=args.use_color)
    return train_ds, eval_ds, cfg


def build_ssl_datasets(args):
    """(labeled_ds, unlabeled_ds, eval_ds, cfg) for stage 2."""
    cfg = get_config(args.dataset)
    load_labels = bool(getattr(args, "view_stats", False))
    if getattr(args, "synthetic", False):
        labeled = SyntheticDataset(args.dataset, num_scenes=args.synthetic_scenes,
                                   num_points=args.num_point, ssl=True, labeled=True, seed=1)
        unlabeled = SyntheticDataset(args.dataset, num_scenes=args.synthetic_scenes * 2,
                                     num_points=args.num_point, ssl=True, labeled=False,
                                     seed=3, load_labels=load_labels)
        eval_ds = SyntheticDataset(args.dataset, num_scenes=max(args.synthetic_scenes // 4, 2),
                                   num_points=args.num_point, seed=2)
        return labeled, unlabeled, eval_ds, cfg

    if args.dataset == "scannet":
        from ..data.scannet import (
            ScannetDetectionDataset, ScannetSSLLabeledDataset, ScannetSSLUnlabeledDataset)

        data_path = _data_root(args, "scannet_train_detection_data")
        split_dir = _data_root(args, "meta_data")
        labeled = ScannetSSLLabeledDataset(
            data_path, split_dir, args.labeled_sample_list,
            num_points=args.num_point, augment=True,
            use_height=not args.no_height, use_color=args.use_color)
        unlabeled = ScannetSSLUnlabeledDataset(
            data_path, split_dir, args.labeled_sample_list,
            num_points=args.num_point, augment=True,
            use_height=not args.no_height,
            use_color=args.use_color, load_labels=load_labels)
        eval_ds = ScannetDetectionDataset(
            data_path, split_dir, "val", num_points=args.num_point,
            augment=False, use_height=not args.no_height, use_color=args.use_color)
    else:
        from ..data.sunrgbd import (
            SunrgbdDetectionVotesDataset, SunrgbdSSLLabeledDataset,
            SunrgbdSSLUnlabeledDataset)

        data_path = _data_root(args, _sunrgbd_dir(args, "train"))
        split_dir = _data_root(args, "sunrgbd_trainval")
        labeled = SunrgbdSSLLabeledDataset(
            data_path, split_dir, args.labeled_sample_list,
            num_points=args.num_point, augment=True,
            use_height=not args.no_height, use_color=args.use_color)
        unlabeled = SunrgbdSSLUnlabeledDataset(
            data_path, split_dir, args.labeled_sample_list,
            num_points=args.num_point, augment=True,
            use_height=not args.no_height,
            use_color=args.use_color, load_labels=load_labels)
        eval_data_path = _data_root(args, _sunrgbd_dir(args, "val"))
        eval_ds = SunrgbdDetectionVotesDataset(
            eval_data_path, num_points=args.num_point, augment=False,
            use_height=not args.no_height, use_color=args.use_color)
    return labeled, unlabeled, eval_ds, cfg


def fetch_metrics(metrics):
    """Device metrics dict -> host float dict in ONE transfer.

    Fetching each scalar separately costs one tunnel round-trip per metric
    (~27 ms each on the tunneled TPU — it dominated step time); stacking on
    device first makes it a single small fetch, which also serves as the
    per-step completion sync."""
    import jax.numpy as jnp

    keys = sorted(metrics)
    vals = np.asarray(jnp.stack([metrics[k] for k in keys]))
    return dict(zip(keys, vals.tolist()))


class MetricAverager:
    """Running means of every scalar metric, like the reference's
    stat_dict accumulation (train.py:356-369)."""

    def __init__(self):
        self.sums = {}
        self.count = 0

    def update(self, metrics):
        for k, v in metrics.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v)
        self.count += 1

    def means(self):
        return {k: v / max(self.count, 1) for k, v in self.sums.items()}

    def reset(self):
        self.sums, self.count = {}, 0


def evaluate(model, cfg, state, eval_loader, config_dict, logger,
             eval_forward, ap_iou_thresholds=(0.25, 0.5),
             opt_rate=0.0, opt_step=0, dump_dir=None):
    """Eval epoch: forward, parse predictions/GT, VOC AP
    (evaluate_one_epoch, train.py:378-428; evaluate_with_opt :431-535).

    Returns (metric_means, {thresh: metrics_dict}, map_sum).
    """
    import jax

    calculators = {t: APCalculator(t, cfg.class2type) for t in ap_iou_thresholds}
    averager = MetricAverager()
    for bi, batch in enumerate(eval_loader):
        out, metrics = eval_forward(state, batch)
        metrics = fetch_metrics(metrics)
        if opt_step > 0:
            variables = {
                "params": state.ema_params if getattr(eval_forward, "use_ema", False)
                else state.params,
                "batch_stats": state.ema_batch_stats if getattr(eval_forward, "use_ema", False)
                else state.batch_stats,
            }
            out = iou_optimize(model, variables, out, opt_rate, opt_step)
        averager.update(metrics)
        out_np = jax.tree.map(np.asarray, out)
        # host-side batch inputs the parse path may need (remove_empty_box)
        out_np.setdefault("point_clouds", np.asarray(batch["point_clouds"]))
        pred_map_cls = parse_predictions(out_np, config_dict)
        gt_map_cls = parse_groundtruths(batch, config_dict)
        for calc in calculators.values():
            calc.step(pred_map_cls, gt_map_cls)
        if dump_dir is not None and bi == 0:
            from ..utils import dump_helper

            dump_helper.dump_results(out_np, batch, dump_dir, cfg)

    means = averager.means()
    for k in sorted(means):
        logger(f"eval mean {k}: {means[k]:.6f}")
    ap_results, map_sum = {}, 0.0
    for t, calc in calculators.items():
        m = calc.compute_metrics()
        ap_results[t] = m
        map_sum += m["mAP"]
        logger(f"eval mAP@{t}: {m['mAP']:.4f}  AR@{t}: {m['AR']:.4f}")
    return means, ap_results, map_sum
