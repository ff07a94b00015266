"""Stage-1 supervised pretraining driver.

TPU-native counterpart of the reference `pretrain.py` (flags :41-70, train
loop :310-406): same flag surface, schedules, log/checkpoint layout; the
per-batch work is ONE jitted XLA program (forward + jittered IoU branch +
labeled loss + Adam) instead of eager torch ops.

Run: python -m iou3dmatch_tpu.cli.pretrain --dataset scannet \
         --labeled_sample_list scannetv2_train_0.1.txt --log_dir log_scannet
Smoke (no data on disk): add --synthetic.
"""
import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="scannet", choices=["scannet", "sunrgbd"])
    p.add_argument("--log_dir", default="log_pretrain")
    p.add_argument("--data_path", default=None, help="root holding the dataset dumps")
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--labeled_sample_list", default=None)
    p.add_argument("--num_point", type=int, default=40000)
    p.add_argument("--num_target", type=int, default=None,
                   help="proposals [default: 128, or 16 with --tiny; explicit wins]")
    p.add_argument("--cluster_sampling", default="seed_fps",
                   choices=["vote_fps", "seed_fps", "random"])
    p.add_argument("--max_epoch", type=int, default=901)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--lr_decay_steps", default="400,600,800")
    p.add_argument("--lr_decay_rates", default="0.1,0.1,0.1")
    p.add_argument("--bn_decay_step", type=int, default=20)
    p.add_argument("--bn_decay_rate", type=float, default=0.5)
    p.add_argument("--no_height", action="store_true")
    p.add_argument("--use_color", action="store_true")
    p.add_argument("--use_sunrgbd_v2", action="store_true",
                   help="V2 box labels for SUN RGB-D (pretrain.py:62)")
    p.add_argument("--vote_factor", type=int, default=1,
                   help="votes generated per seed (pretrain.py:47)")
    p.add_argument("--iou_weight", type=float, default=1.0,
                   help="kept for CONFIG_DICT parity (pretrain.py:65,231); "
                        "the reference never consumes it")
    p.add_argument("--ap_iou_thresh", type=float, default=0.25)
    p.add_argument("--eval_interval", type=int, default=50)
    p.add_argument("--save_interval", type=int, default=200)
    p.add_argument("--print_interval", type=int, default=10)
    p.add_argument("--ckpt_interval", type=int, default=1,
                   help="write the resume checkpoint every N epochs (always "
                        "at the final epoch). On the tunneled dev TPU the "
                        "per-epoch state fetch dominates small-scene epochs; "
                        "raising this trades resume granularity for wall "
                        "clock. Training numerics are unaffected")
    p.add_argument("--use_iou_for_nms", action="store_true")
    p.add_argument("--dump_results", action="store_true")
    p.add_argument("--dump_dir", default=None,
                   help="where --dump_results PLYs go [default: <log_dir>/dump]")
    p.add_argument("--overwrite", action="store_true",
                   help="confirm-and-wipe an existing log dir (pretrain.py:97-105)")
    p.add_argument("--eval", action="store_true", help="evaluate only, no training")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated scenes (no dataset dumps needed)")
    p.add_argument("--synthetic_scenes", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true", help="tiny backbone (CI smoke)")
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
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from ..data.loader import DataLoader, prefetch
    from ..models.factory import build_votenet
    from ..train import (checkpoint, create_train_state, get_bn_momentum,
                         get_lr, make_eval_forward, make_pretrain_step)
    from ..utils import Logger, Visualizer
    from .common import (MetricAverager, fetch_metrics, build_supervised_datasets, evaluate,
                         make_config_dict)

    dump_dir = args.dump_dir or os.path.join(args.log_dir, "dump")
    if os.path.exists(args.log_dir) and args.overwrite:
        # same interactive confirm as the reference (pretrain.py:97-105)
        print(f"Log folder {args.log_dir} already exists. "
              "Are you sure to overwrite? (Y/N)")
        c = input()
        if c in ("n", "N"):
            print("Exiting..")
            return
        elif c in ("y", "Y"):
            print("Overwrite the files in the log and dump folders...")
            import shutil

            shutil.rmtree(args.log_dir, ignore_errors=True)
            shutil.rmtree(dump_dir, ignore_errors=True)
        # any other answer: continue into the existing dir, like the
        # reference (pretrain.py:97-105 only acts on y/Y and n/N)

    logger = Logger(args.log_dir)
    logger(str(args))
    lr_steps = [int(x) for x in args.lr_decay_steps.split(",")]
    lr_rates = [float(x) for x in args.lr_decay_rates.split(",")]

    train_ds, eval_ds, cfg = build_supervised_datasets(args)
    logger(f"train scenes: {len(train_ds)}  eval scenes: {len(eval_ds)}")
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              num_workers=args.num_workers, seed=args.seed)
    if len(train_loader) == 0:
        raise SystemExit(
            f"batch_size {args.batch_size} > {len(train_ds)} train scenes: "
            "zero batches per epoch (drop_last) — shrink --batch_size")
    eval_loader = DataLoader(eval_ds, args.batch_size, shuffle=False,
                             drop_last=False, num_workers=args.num_workers)

    model, _ = build_votenet(
        args.dataset, num_proposal=args.num_target,
        input_feature_dim=(0 if args.no_height else 1) + (3 if args.use_color else 0),
        sampling=args.cluster_sampling, tiny=args.tiny,
        compute_dtype="bfloat16" if args.bf16 else None,
        f32_gridconv=args.f32_gridconv,
        vote_factor=args.vote_factor)
    # one-sample shape probe: a thread "pool" — no point forking a
    # throwaway process pool for a single item
    example = next(iter(DataLoader(train_ds, 1, shuffle=False,
                                   num_workers=1, worker_type="thread")))
    state = create_train_state(model, jax.random.PRNGKey(args.seed), example,
                               weight_decay=args.weight_decay)

    start_epoch = 0
    ckpt_path = args.checkpoint_path or os.path.join(args.log_dir, "checkpoint.tar")
    if args.resume and os.path.exists(ckpt_path):
        state, start_epoch, _ = checkpoint.load(ckpt_path, state)
        logger(f"resumed from {ckpt_path} at epoch {start_epoch}")
    elif args.checkpoint_path and os.path.exists(args.checkpoint_path):
        state, _, _ = checkpoint.load(args.checkpoint_path, state)
        logger(f"loaded weights from {args.checkpoint_path}")

    step_fn = make_pretrain_step(model, cfg, weight_decay=args.weight_decay)
    eval_forward = make_eval_forward(model, cfg)
    config_dict = make_config_dict(cfg, args)
    viz_train = Visualizer(args.log_dir, "train")
    viz_eval = Visualizer(args.log_dir, "eval")

    if args.eval:
        evaluate(model, cfg, state, eval_loader, config_dict, logger,
                 eval_forward, (0.25, 0.5),
                 dump_dir=dump_dir if args.dump_results else None)
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
        # load+pack in one thread, single-put stage in a second (see
        # data/staging.py; the reference does one .to(device) per tensor,
        # pretrain.py:317-318)
        from ..data.staging import pack_batch, stage

        batch_iter = prefetch(map(stage, prefetch(
            map(pack_batch, iter(train_loader)))))
        for bi, batch in enumerate(batch_iter):
            if args.profile_steps and epoch == start_epoch and bi == 1:
                jax.profiler.start_trace(os.path.join(args.log_dir, "profile"))
            rng, step_rng = jax.random.split(rng)
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
