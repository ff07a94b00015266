"""Loader+device overlap benchmark (VERDICT r2 #8).

Runs the REAL prefetching input pipeline (ScannetSSL datasets on real-size
fake scans -> DataLoader -> SSLBatcher -> prefetch thread) feeding the REAL
jitted SSL train step on the actual TPU, and measures

  * t_load : host-only s/step (loader alone, prefetched)
  * t_dev  : device-only s/step (one staged batch, like bench.py)
  * t_link : host→device transfer-only s/step of the real packed batch
             (one device_put per step; see data/staging.py)
  * t_both : the combined pipeline's s/step (the production driver
             pipeline: load+pack thread → single-put staging thread →
             step dispatch)

Perfect overlap means t_both ~= max(t_load, t_link, t_dev) (the pipeline
hides the cheaper legs entirely); no overlap means their sum. Reported:

  overlap_fraction     = (sum - t_both) / (sum - max leg)
                         (1.0 = all hideable time hidden)
  device_idle_fraction = 1 - t_dev / t_both
                         (0.0 = the chip never waits on the host)

Dev-container caveats, both orthogonal to the framework: the container has
ONE host core (a real TPU host VM has dozens — scale t_load accordingly),
and the tunneled device link moves ~25 MB/s with ~27 ms RTT (a real host
feeds TPUs over PCIe at GB/s — t_link there is < 2 ms for the full 40k
batch). t_link quantifies the tunnel leg explicitly so the 40k-point
result can be read honestly; at reduced scene size the tunnel can keep up
and true three-way overlap is demonstrable in this container.

Run: python tools/overlap_bench.py [--steps 12] [--dtype bfloat16|float32]
     [--verts 50000] [--points 40000]
Prints one JSON line; append results to PERF.md "Host data pipeline".
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.loader_bench import make_fake_scans  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--verts", type=int, default=50000)
    ap.add_argument("--points", type=int, default=40000)
    ap.add_argument("--n_scans", type=int, default=18)
    ap.add_argument("--bl", type=int, default=4)
    ap.add_argument("--bu", type=int, default=8)
    ap.add_argument("--platform", default=None,
                    help="override jax platform (e.g. cpu for a smoke run)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from iou3dmatch_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    from iou3dmatch_tpu.data.loader import DataLoader, SSLBatcher, prefetch
    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.train import create_train_state, make_ssl_step

    compute_dtype = None if args.dtype in ("float32", "f32") else args.dtype
    reference_exact = compute_dtype is None
    model, cfg = build_votenet("scannet", compute_dtype=compute_dtype)

    with tempfile.TemporaryDirectory() as root:
        meta = make_fake_scans(root, args.n_scans, verts_per_scan=args.verts)
        from iou3dmatch_tpu.data.scannet import (
            ScannetSSLLabeledDataset, ScannetSSLUnlabeledDataset)

        labeled_ds = ScannetSSLLabeledDataset(
            root, meta, "labeled.txt", num_points=args.points, augment=True,
            use_height=True)
        unlabeled_ds = ScannetSSLUnlabeledDataset(
            root, meta, "labeled.txt", num_points=args.points, augment=True,
            use_height=True)

        from iou3dmatch_tpu.data.staging import pack_batch, stage

        def make_iter(packed=False):
            lab = DataLoader(labeled_ds, args.bl, shuffle=True,
                             drop_last=True, num_workers=0,
                             worker_type="thread", seed=0)
            unl = DataLoader(unlabeled_ds, args.bu, shuffle=True,
                             drop_last=True, num_workers=0,
                             worker_type="thread", seed=0)
            batcher = SSLBatcher(lab, unl)

            def cycle():
                while True:
                    yield from batcher

            src = map(pack_batch, cycle()) if packed else cycle()
            return prefetch(src, size=2)

        scenes = args.bl + args.bu

        # ---- host-only rate (prefetched loader alone)
        it = make_iter()
        next(it)  # warmup (page cache, first-touch allocs)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            next(it)
        t_load = (time.perf_counter() - t0) / args.steps

        # ---- device-only rate (one staged batch, no host loading)
        batch_np = next(it)
        batch_dev = {k: jnp.asarray(v) for k, v in batch_np.items()
                     if hasattr(v, "shape")}
        state = create_train_state(model, jax.random.PRNGKey(0), batch_dev,
                                   with_ema=True)
        step = make_ssl_step(model, cfg, num_labeled=args.bl,
                             reference_exact=reference_exact)

        @jax.jit
        def _checksum(tree):
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), tree,
                jnp.float32(0))

        def sync(state):
            float(_checksum(state.params))

        key = jax.random.PRNGKey(1)
        for i in range(2):  # compile + steady-state warmup
            state, _ = step(state, batch_dev, jax.random.fold_in(key, i),
                            2e-3, 0.5)
            sync(state)
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, _ = step(state, batch_dev,
                            jax.random.fold_in(key, 100 + i), 2e-3, 0.5)
        sync(state)
        t_dev = (time.perf_counter() - t0) / args.steps

        # ---- link-only rate: steady-state host→device transfer of the real
        # packed batch (ONE device_put per step, blocking only at the end).
        # On the tunneled dev platform this is the binding constraint at
        # full scene size; on a real TPU host VM the same bytes ride PCIe.
        packed = pack_batch(batch_np)
        batch_bytes = packed[0].nbytes + sum(
            np.asarray(v).nbytes for v in packed[2].values()
            if hasattr(v, "shape"))
        xs = []
        stage(packed)  # warm the unpack program
        t0 = time.perf_counter()
        for _ in range(args.steps):
            xs.append(stage(packed))
        jax.block_until_ready(xs)
        t_link = (time.perf_counter() - t0) / args.steps
        del xs

        # ---- combined pipeline: thread A loads+packs batch i+1, thread B
        # single-put stages it, while the device runs step i (the production
        # driver pipeline, cli/train.py); sync only at the end
        it = prefetch(map(stage, make_iter(packed=True)), size=2)
        state, _ = step(state, next(it), jax.random.fold_in(key, 999),
                        2e-3, 0.5)
        sync(state)
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, _ = step(state, next(it), jax.random.fold_in(key, 200 + i),
                            2e-3, 0.5)
        sync(state)
        t_both = (time.perf_counter() - t0) / args.steps

    # how much of the serial sum the pipeline hid, relative to the most it
    # could hide (the cheaper legs)
    serial = t_load + t_link + t_dev
    hideable = serial - max(t_load, t_link, t_dev)
    overlap = (serial - t_both) / max(hideable, 1e-9)
    idle = max(0.0, 1.0 - t_dev / t_both)
    print(json.dumps({
        "metric": "ssl_loader_device_overlap",
        "dtype": args.dtype,
        "platform": jax.devices()[0].platform,
        "points": args.points,
        "verts": args.verts,
        "batch": [args.bl, args.bu],
        "batch_mb": round(batch_bytes / 1e6, 2),
        "host_scenes_per_sec": round(scenes / t_load, 1),
        "device_scenes_per_sec": round(scenes / t_dev, 1),
        "link_scenes_per_sec": round(scenes / t_link, 1),
        "combined_scenes_per_sec": round(scenes / t_both, 1),
        "t_load_ms": round(t_load * 1e3, 1),
        "t_dev_ms": round(t_dev * 1e3, 1),
        "t_link_ms": round(t_link * 1e3, 1),
        "t_both_ms": round(t_both * 1e3, 1),
        "link_mb_per_s": round(batch_bytes / t_link / 1e6, 1),
        "overlap_fraction": round(overlap, 3),
        "device_idle_fraction": round(idle, 3),
        "cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
