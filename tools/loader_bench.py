"""Host input-pipeline scaling benchmark (VERDICT r1 task #7).

Measures data/loader.py throughput (scenes/s) on REAL-size fake ScanNet
scans (50k verts -> 40k sampled points, height channel, full augmentation +
post-augment vote recompute — the reference ScanNet __getitem__ work,
scannet_detection_dataset.py:103-193) at 1..N process workers, so the
"can the host feed the chip?" question (PERF.md) carries a measured table
instead of a projection.

Run:  python tools/loader_bench.py [--max_workers 8] [--scenes 64]
Prints one row per worker count and a final JSON summary line.

Note: on a 1-core container the process pool cannot scale — the point of
recording the table anyway is (a) the honest single-core ceiling and (b) a
reusable tool for the real multi-core TPU host VM.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fake_scans(root, n_scans, verts_per_scan=50000, seed=0):
    """Real-size ScanNet detection dumps: {scan}_vert/_ins_label/_sem_label/
    _bbox.npy (batch_load_scannet_data.py output format)."""
    rng = np.random.RandomState(seed)
    names = []
    for s in range(n_scans):
        n = verts_per_scan
        verts = np.zeros((n, 6), np.float32)
        verts[:, :3] = rng.uniform(-4, 4, (n, 3))
        verts[:, 3:] = rng.uniform(0, 255, (n, 3))
        ins = np.zeros(n, np.int64)
        sem = np.zeros(n, np.int64)
        n_inst = 12
        bbox = np.zeros((n_inst, 7))
        stride = max(2, n // n_inst)  # scale layout to small --verts too
        for i in range(n_inst):
            lo, hi = stride * i, stride * i + max(1, int(stride * 0.8))
            c = rng.uniform(-3, 3, 3)
            ext = rng.uniform(0.3, 1.2, 3)
            verts[lo:hi, :3] = c + rng.uniform(-0.5, 0.5, (hi - lo, 3)) * ext
            ins[lo:hi] = i + 1
            sem[lo:hi] = [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16][i]
            mn, mx = verts[lo:hi, :3].min(0), verts[lo:hi, :3].max(0)
            bbox[i, :3] = (mn + mx) / 2
            bbox[i, 3:6] = mx - mn
            bbox[i, 6] = sem[lo]
        name = f"scene{s:04d}_00"
        np.save(os.path.join(root, f"{name}_vert.npy"), verts)
        np.save(os.path.join(root, f"{name}_ins_label.npy"), ins)
        np.save(os.path.join(root, f"{name}_sem_label.npy"), sem)
        np.save(os.path.join(root, f"{name}_bbox.npy"), bbox)
        names.append(name)
    meta = os.path.join(root, "meta")
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, "scannetv2_train.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(meta, "labeled.txt"), "w") as f:
        f.write("\n".join(names[: max(1, len(names) // 3)]) + "\n")
    return meta


def bench_workers(root, meta, num_workers, scenes, batch_size=12,
                  num_points=40000):
    from iou3dmatch_tpu.data.loader import DataLoader, prefetch
    from iou3dmatch_tpu.data.scannet import ScannetDetectionDataset

    ds = ScannetDetectionDataset(
        root, split_set="all", num_points=num_points, use_height=True,
        augment=True)
    loader = DataLoader(ds, batch_size, shuffle=True, drop_last=False,
                        num_workers=num_workers, seed=0,
                        worker_type="process" if num_workers else "thread")
    # warmup one batch (pool spin-up, page cache)
    it = prefetch(iter(loader))
    next(it)
    done, t0 = 0, time.perf_counter()
    while done < scenes:
        try:
            b = next(it)
        except StopIteration:
            it = prefetch(iter(loader))
            b = next(it)
        done += b["point_clouds"].shape[0]
    dt = time.perf_counter() - t0
    loader.close()
    return done / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_workers", type=int, default=8)
    ap.add_argument("--scenes", type=int, default=64)
    ap.add_argument("--n_scans", type=int, default=16)
    args = ap.parse_args()

    rows = {}
    with tempfile.TemporaryDirectory() as root:
        meta = make_fake_scans(root, args.n_scans)
        counts = sorted({1, 2, 4, args.max_workers} | {0})
        for w in counts:
            if w > args.max_workers:
                continue
            sps = bench_workers(root, meta, w, args.scenes)
            rows[w] = round(sps, 1)
            label = "in-thread" if w == 0 else f"{w} process worker(s)"
            print(f"{label:>22}: {sps:7.1f} scenes/s", flush=True)

    print(json.dumps({
        "metric": "scannet_getitem_scenes_per_sec_by_workers",
        "cores": os.cpu_count(),
        "rows": rows,
        "device_target_scenes_per_sec": 168.0,
    }))


if __name__ == "__main__":
    main()
