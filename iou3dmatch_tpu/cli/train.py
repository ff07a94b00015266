"""Stage-2 SSL (3DIoUMatch) training / evaluation driver.

TPU-native counterpart of the reference `train.py` (flags :31-71, SSL loop
:305-371, eval :378-535): mean-teacher training with IoU-filtered
pseudo-labels. Teacher forward, student forward, labeled + unlabeled losses,
Adam, and the EMA update compile into ONE jitted XLA program; the
pseudo-label filter/LHS runs on-device with fixed shapes instead of the
reference's host round-trip (loss_helper_unlabeled.py:441-490).

Run:  python -m iou3dmatch_tpu.cli.train --dataset scannet \
          --labeled_sample_list scannetv2_train_0.1.txt \
          --detector_checkpoint log_pretrain/best_checkpoint_sum.tar
Eval: add --eval --use_iou_for_nms  (and --opt_step 10 --opt_rate R for
      test-time IoU optimization, run_eval_opt.sh).
"""
import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="scannet", choices=["scannet", "sunrgbd"])
    p.add_argument("--log_dir", default="log_ssl")
    p.add_argument("--data_path", default=None)
    p.add_argument("--detector_checkpoint", default=None,
                   help="stage-1 checkpoint loaded into student AND teacher")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--labeled_sample_list", default=None)
    p.add_argument("--num_point", type=int, default=40000)
    p.add_argument("--num_target", type=int, default=None,
                   help="proposals [default: 128, or 16 with --tiny; explicit wins]")
    p.add_argument("--cluster_sampling", default="seed_fps")
    p.add_argument("--max_epoch", type=int, default=1001)
    p.add_argument("--batch_size", default="4,8",
                   help="labeled,unlabeled scenes PER DEVICE per step "
                        "(train.py:47-48). Global batch = per-device x "
                        "n_devices, so the paper config 4,8 runs unchanged "
                        "on any device count; each count must only be "
                        "divisible by itself, never by the mesh size")
    p.add_argument("--learning_rate", type=float, default=2e-3)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--lr_decay_steps", default="400,600,800,900")
    p.add_argument("--lr_decay_rates", default="0.3,0.3,0.1,0.1")
    p.add_argument("--bn_decay_step", type=int, default=20)
    p.add_argument("--bn_decay_rate", type=float, default=0.5)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--unlabeled_loss_weight", type=float, default=2.0)
    p.add_argument("--obj_threshold", type=float, default=0.9)
    p.add_argument("--cls_threshold", type=float, default=0.9)
    p.add_argument("--iou_threshold", type=float, default=0.25)
    p.add_argument("--no_height", action="store_true")
    p.add_argument("--use_color", action="store_true")
    p.add_argument("--use_sunrgbd_v2", action="store_true",
                   help="V2 box labels for SUN RGB-D (train.py:41)")
    p.add_argument("--vote_factor", type=int, default=1,
                   help="votes generated per seed (train.py:43)")
    p.add_argument("--model", default="votenet",
                   help="kept for flag parity (train.py:32); the reference "
                        "imports VoteNet directly and never reads this")
    p.add_argument("--conf_thresh", type=float, default=0.05,
                   help="eval proposal confidence threshold (train.py:67,268)")
    p.add_argument("--ap_iou_thresh", type=float, default=0.25,
                   help="kept for flag parity (train.py:46); the reference "
                        "evaluates at the hardcoded [0.25, 0.5] (train.py:374)")
    p.add_argument("--eval_interval", type=int, default=25)
    p.add_argument("--save_interval", type=int, default=200)
    p.add_argument("--print_interval", type=int, default=10)
    p.add_argument("--ckpt_interval", type=int, default=1,
                   help="write the resume checkpoint every N epochs (always "
                        "at the final epoch). On the tunneled dev TPU the "
                        "per-epoch state fetch dominates small-scene epochs; "
                        "raising this trades resume granularity for wall "
                        "clock. Training numerics are unaffected")
    p.add_argument("--use_iou_for_nms", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--eval_use_ema", action="store_true",
                   help="evaluate the EMA teacher instead of the student")
    p.add_argument("--opt_step", type=int, default=0)
    p.add_argument("--opt_rate", type=float, default=5e-4)  # train.py:69
    p.add_argument("--dump_results", action="store_true")
    p.add_argument("--reference_exact_step", action="store_true",
                   help="reference-exact SSL step semantics. THE DEFAULT "
                        "since round 5 (flag kept for script compatibility): "
                        "teacher on the full mixed batch with the jittered-"
                        "box GridConv pass, student jitter on every scene")
    p.add_argument("--fast_step", action="store_true",
                   help="pruned SSL step (run_train_fast.sh): skip compute "
                        "whose outputs the reference provably discards "
                        "(teacher labeled rows, teacher jitter IoU, "
                        "unlabeled student jitter). Per-box numerics are "
                        "identical; only train-mode BN batch composition "
                        "deviates, and the config measures sign-balanced "
                        "against the reference in f32 (reports/flagship.md "
                        "§3). Avoid stacking with --bf16 for final training "
                        "— bf16 SSL measured ~1 sigma low in every step "
                        "variant on the dense-demo instrument")
    p.add_argument("--full_teacher", action="store_true",
                   help="run the teacher on the full mixed batch (reverts "
                        "fast-step pruning 1 only; implied by "
                        "--reference_exact_step)")
    p.add_argument("--exact_jitter", action="store_true",
                   help="restore the jittered-box GridConv passes — teacher "
                        "jitter pass + student jitter on every scene — so "
                        "train-mode GridConv BN sees the reference's box "
                        "population (reverts fast-step prunings 2+3; implied "
                        "by --reference_exact_step). The round-5 fast-config "
                        "accuracy repair (reports/flagship.md §3)")
    p.add_argument("--view_stats", action="store_true",
                   help="load real labels of unlabeled scans and report "
                        "pseudo-label quality metrics (diagnostics only)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_scenes", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu); needed because this "
                        "image pins JAX_PLATFORMS at interpreter start")
    p.add_argument("--f32_gridconv", action="store_true",
                   help="keep the GridConv IoU branch in float32 under "
                        "--bf16 (targeted mixed-precision promotion)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute in the SA/FP/GridConv MLPs "
                        "(params and BN statistics stay float32)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of this many steps "
                        "(epoch 0) into <log_dir>/profile")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.fast_step and args.reference_exact_step:
        raise SystemExit("--fast_step and --reference_exact_step conflict")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from ..data.loader import DataLoader, SSLBatcher, prefetch
    from ..models.factory import build_votenet
    from ..train import (checkpoint, create_train_state, get_bn_momentum,
                         get_lr, make_eval_forward, make_ssl_step)
    from ..utils import Logger, Visualizer
    from .common import (MetricAverager, fetch_metrics, build_ssl_datasets, evaluate,
                         make_config_dict)

    logger = Logger(args.log_dir)
    logger(str(args))
    # --batch_size is per-device: the paper config "4,8" (train.py:47-48)
    # scales to a global batch of 4n+8n on an n-device mesh, keeping the
    # labeled:unlabeled ratio and per-device shapes identical at any scale.
    bl_dev, bu_dev = [int(x) for x in args.batch_size.split(",")]
    n_dev = jax.device_count()
    bl, bu = bl_dev * n_dev, bu_dev * n_dev
    if n_dev > 1:
        logger(f"data-parallel over {n_dev} devices: per-device batch "
               f"{bl_dev}+{bu_dev}, global {bl}+{bu}")
    lr_steps = [int(x) for x in args.lr_decay_steps.split(",")]
    lr_rates = [float(x) for x in args.lr_decay_rates.split(",")]

    labeled_ds, unlabeled_ds, eval_ds, cfg = build_ssl_datasets(args)
    logger(f"labeled {len(labeled_ds)} unlabeled {len(unlabeled_ds)} eval {len(eval_ds)}")
    labeled_loader = DataLoader(labeled_ds, bl, shuffle=True,
                                num_workers=args.num_workers, seed=args.seed)
    unlabeled_loader = DataLoader(unlabeled_ds, bu, shuffle=True,
                                  num_workers=args.num_workers, seed=args.seed + 1)
    if len(labeled_loader) == 0 or len(unlabeled_loader) == 0:
        raise SystemExit(
            f"batch sizes {bl}+{bu} exceed the dataset "
            f"({len(labeled_ds)} labeled / {len(unlabeled_ds)} unlabeled "
            "scenes): zero batches per epoch (drop_last) — shrink "
            "--batch_size")
    ssl_loader = SSLBatcher(labeled_loader, unlabeled_loader)
    eval_loader = DataLoader(eval_ds, bl + bu, shuffle=False, drop_last=False,
                             num_workers=args.num_workers)

    model, _ = build_votenet(
        args.dataset, num_proposal=args.num_target,
        input_feature_dim=(0 if args.no_height else 1) + (3 if args.use_color else 0),
        sampling=args.cluster_sampling, tiny=args.tiny,
        compute_dtype="bfloat16" if args.bf16 else None,
        f32_gridconv=args.f32_gridconv,
        vote_factor=args.vote_factor)
    # one-sample shape probe: a thread "pool" — no point forking a
    # throwaway process pool for a single item
    example = next(iter(DataLoader(labeled_ds, 1, shuffle=False,
                                   num_workers=1, worker_type="thread")))
    state = create_train_state(model, jax.random.PRNGKey(args.seed), example,
                               with_ema=True, weight_decay=args.weight_decay)

    start_epoch = 0
    ckpt_path = os.path.join(args.log_dir, "checkpoint.tar")
    if args.resume and os.path.exists(ckpt_path):
        state, start_epoch, _ = checkpoint.load(ckpt_path, state)
        logger(f"resumed from {ckpt_path} at epoch {start_epoch}")
    elif args.detector_checkpoint:
        from ..train.torch_import import (is_torch_checkpoint,
                                          read_torch_checkpoint)

        torch_payload = (read_torch_checkpoint(args.detector_checkpoint)
                         if args.eval
                         and is_torch_checkpoint(args.detector_checkpoint)
                         else None)
        if torch_payload is not None and "ema_model_state_dict" in torch_payload:
            # Evaluating a reference SSL checkpoint: keep its true teacher
            # weights so --eval_use_ema scores the EMA model. (The
            # reference's own loader always mirrors the student into the
            # teacher, train.py:216-218, discarding the saved EMA.)
            state, _, _ = checkpoint.load(args.detector_checkpoint, state,
                                          torch_payload=torch_payload)
        else:
            # Pretrain weights go into BOTH student and EMA teacher
            # (train.py:204-228 of the reference).
            state = checkpoint.load_pretrain_into_ssl(
                args.detector_checkpoint, state,
                torch_payload=torch_payload)
        logger(f"loaded weights from {args.detector_checkpoint}")

    mesh = None
    if n_dev > 1:
        from ..parallel import make_mesh, replicate, shard_batch

        mesh = make_mesh()
        state = replicate(state, mesh)  # params/EMA/opt replicated; batch
        # is sharded per step below; GSPMD inserts the gradient psum.

    step_fn = make_ssl_step(
        model, cfg, num_labeled=bl, unlabeled_weight=args.unlabeled_loss_weight,
        ema_decay=args.ema_decay, obj_threshold=args.obj_threshold,
        cls_threshold=args.cls_threshold, iou_threshold=args.iou_threshold,
        dataset=args.dataset, weight_decay=args.weight_decay,
        view_stats=args.view_stats,
        reference_exact=not args.fast_step,
        full_teacher=args.full_teacher, exact_jitter=args.exact_jitter)
    eval_forward = make_eval_forward(model, cfg, use_ema=args.eval_use_ema)
    eval_forward.use_ema = args.eval_use_ema
    config_dict = make_config_dict(cfg, args)
    viz_train = Visualizer(args.log_dir, "train")
    viz_eval = Visualizer(args.log_dir, "eval")

    if args.eval:
        evaluate(model, cfg, state, eval_loader, config_dict, logger,
                 eval_forward, (0.25, 0.5),
                 opt_rate=args.opt_rate, opt_step=args.opt_step,
                 dump_dir=os.path.join(args.log_dir, "dump") if args.dump_results else None)
        return

    rng = jax.random.PRNGKey(args.seed + 1)
    best_map_sum = -1.0
    global_step = int(state.step)
    for epoch in range(start_epoch, args.max_epoch):
        lr = get_lr(epoch, args.learning_rate, lr_steps, lr_rates)
        bn_mom = get_bn_momentum(epoch, args.bn_decay_step, args.bn_decay_rate)
        logger(f"**** EPOCH {epoch:03d} ****  lr {lr:.6f}  bn_momentum {bn_mom:.4f}")
        averager = MetricAverager()
        t0 = time.time()
        if mesh is None:
            # Two-stage pipeline: thread A loads+packs the batch into one
            # int32 word buffer, thread B ships it as a SINGLE device_put
            # (vs one per leaf — the reference does one .to(device) per
            # tensor, pretrain.py:317-318) while the device runs step i.
            from ..data.staging import pack_batch, stage

            batch_iter = prefetch(map(stage, prefetch(
                map(pack_batch, iter(ssl_loader)))))
        else:
            batch_iter = prefetch(iter(ssl_loader))
        for bi, batch in enumerate(batch_iter):
            if args.profile_steps and epoch == start_epoch and bi == 1:
                jax.profiler.start_trace(os.path.join(args.log_dir, "profile"))
            rng, step_rng = jax.random.split(rng)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = step_fn(state, batch, step_rng, lr, bn_mom)
            metrics = fetch_metrics(metrics)  # one transfer for all scalars
            loss_val = metrics["loss"]
            if not np.isfinite(loss_val):
                checkpoint.save(os.path.join(args.log_dir, "nan_checkpoint.tar"),
                                state, epoch)
                logger(f"FATAL: non-finite loss {loss_val} at epoch {epoch} "
                       f"batch {bi}; state saved to nan_checkpoint.tar")
                raise FloatingPointError("non-finite training loss")
            averager.update(metrics)
            if (args.profile_steps and epoch == start_epoch
                    and bi == args.profile_steps):
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                logger(f"profiler trace written to {args.log_dir}/profile")
            global_step += 1
            if (bi + 1) % args.print_interval == 0:
                means = averager.means()
                logger(f" batch {bi + 1:04d} " + " ".join(
                    f"{k}: {v:.4f}" for k, v in sorted(means.items())
                    if "loss" in k or "acc" in k or "ratio" in k or "value" in k))
                viz_train.log_scalars(means, global_step)
                averager.reset()
        logger(f"epoch time: {time.time() - t0:.1f}s")

        if ((epoch + 1) % args.ckpt_interval == 0
                or epoch + 1 == args.max_epoch):
            checkpoint.save(ckpt_path, state, epoch + 1)
        if (epoch + 1) % args.save_interval == 0:
            checkpoint.save(os.path.join(args.log_dir, f"checkpoint_{epoch + 1}.tar"),
                            state, epoch + 1)
        if args.eval_interval > 0 and (epoch + 1) % args.eval_interval == 0:
            _, ap_results, map_sum = evaluate(
                model, cfg, state, eval_loader, config_dict, logger,
                eval_forward, (0.25, 0.5))
            viz_eval.log_scalars(
                {f"mAP_{t}": m["mAP"] for t, m in ap_results.items()}, global_step)
            if map_sum > best_map_sum:
                best_map_sum = map_sum
                checkpoint.save(os.path.join(args.log_dir, "best_checkpoint_sum.tar"),
                                state, epoch + 1, loss=map_sum)
                logger.log_best(f"epoch {epoch + 1}: mAP sum {map_sum:.4f}")


if __name__ == "__main__":
    main()
