"""Profile the SSL train step on the current JAX platform.

Times the full mean-teacher step at the reference config (40k points,
batch 4 labeled + 8 unlabeled), captures a jax.profiler trace, and prints
the top device ops aggregated by kernel name — the measurement loop behind
every PERF.md row.

Usage (from the repo root; see PERF.md "measurement traps" for why timing
uses a jitted checksum fetch instead of block_until_ready):

    python tools/profile_step.py [--bf16] [--points 40000] [--bl 4 --bu 8]
                                 [--steps 5] [--trace-steps 3] [--top 35]
                                 [--reference-exact] [--trace-dir DIR]

On the tunneled axon platform NEVER SIGKILL this mid-compute — a killed
in-flight computation wedges the tunnel for ~10-30 min (run under
`timeout` or nohup and let it finish).
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir: str, steps: int, top: int) -> None:
    """Aggregate device-lane trace events by kernel name (chrome trace
    format; the device pid is the one whose process_name mentions TPU or
    /device)."""
    files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not files:
        print("no trace files under", trace_dir)
        return
    ev = json.load(gzip.open(files[-1]))["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = [
        p for p, n in names.items() if "TPU" in n or "/device" in n.lower()
    ]
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    total = sum(agg.values())
    print(f"device pids: { {p: names[p] for p in device_pids} }")
    print(f"device total: {total / steps / 1e3:.1f} ms/step over {steps} steps")
    for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d / steps / 1e3:8.3f} ms/step x{cnt[n] // steps:<4d} {n[:110]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true", help="bfloat16 MLP compute")
    ap.add_argument("--points", type=int, default=40000)
    ap.add_argument("--bl", type=int, default=4, help="labeled scenes/step")
    ap.add_argument("--bu", type=int, default=8, help="unlabeled scenes/step")
    ap.add_argument("--steps", type=int, default=5, help="timed steps")
    ap.add_argument("--trace-steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=35, help="ops to print")
    ap.add_argument("--reference-exact", action="store_true")
    ap.add_argument("--exact-jitter", action="store_true",
                    help="the repaired fast config (--exact_jitter)")
    ap.add_argument("--full-teacher", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/ssl_profile_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="just re-parse an existing --trace-dir")
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.trace_dir, args.trace_steps, args.top)
        return

    import numpy as np
    import jax
    import jax.numpy as jnp

    from iou3dmatch_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import bench

    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.train import create_train_state, make_ssl_step

    print("platform:", jax.devices()[0].platform)
    model, cfg = build_votenet(
        "scannet", compute_dtype="bfloat16" if args.bf16 else None
    )
    rng = np.random.RandomState(0)
    batch = bench.make_batch(rng, cfg, args.bl, args.bu, args.points)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, with_ema=True)
    step = make_ssl_step(
        model, cfg, num_labeled=args.bl, reference_exact=args.reference_exact,
        exact_jitter=args.exact_jitter, full_teacher=args.full_teacher,
    )

    @jax.jit
    def _checksum(tree):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), tree, jnp.float32(0)
        )

    def sync(s):
        # An honest device sync: fetch ONE jitted scalar over the result tree
        # (block_until_ready under-waits on axon; per-leaf fetches cost ~27 ms
        # tunnel RTT each).
        float(_checksum(s.params))

    key = jax.random.PRNGKey(1)
    for i in range(2):  # compile + warm
        state, _ = step(state, batch, jax.random.fold_in(key, i), 2e-3, 0.5)
    sync(state)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, _ = step(state, batch, jax.random.fold_in(key, 100 + i), 2e-3, 0.5)
    sync(state)
    dt = (time.perf_counter() - t0) / args.steps
    scenes = args.bl + args.bu
    print(f"wall: {dt * 1e3:.1f} ms/step = {scenes / dt:.1f} scenes/s")

    jax.profiler.start_trace(args.trace_dir)
    for i in range(args.trace_steps):
        state, _ = step(state, batch, jax.random.fold_in(key, 200 + i), 2e-3, 0.5)
    sync(state)
    jax.profiler.stop_trace()
    parse_trace(args.trace_dir, args.trace_steps, args.top)


if __name__ == "__main__":
    main()
