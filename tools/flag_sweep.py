"""Sweep XLA/libtpu tuning flags over the headline bench.

Runs `python bench.py` in a fresh subprocess per configuration (compiler
flags only apply at backend init) and tabulates scenes/s. Single-chip
candidates only — there are no collectives to tune at this model size.

Usage:  timeout 3000 python tools/flag_sweep.py [--steps 10]
Never SIGKILL mid-run on the tunneled platform (see tools/profile_step.py).
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Each entry: (label, env overrides). XLA_FLAGS are additive to whatever the
# image sets; LIBTPU_INIT_ARGS reaches the TPU compiler.
CONFIGS = [
    ("baseline", {}),
    ("scoped_vmem_64m",
     {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=65536"}),
    ("scoped_vmem_96m",
     {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=98304"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--points", type=int, default=40000)
    args = ap.parse_args()

    results = []
    for label, overrides in CONFIGS:
        env = dict(os.environ, BENCH_STEPS=str(args.steps),
                   BENCH_POINTS=str(args.points))
        env.update(overrides)
        # fresh compile per flag set — don't reuse a cache keyed without them
        env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/xla_cache_sweep_{label}"
        print(f"== {label}: {overrides}", flush=True)
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=1500)
        line = next((l for l in proc.stdout.splitlines()
                     if l.startswith("{")), None)
        if line is None:
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            results.append((label, None))
            continue
        val = json.loads(line)["value"]
        print(f"   {val} scenes/s", flush=True)
        results.append((label, val))

    print("\n== sweep results ==")
    for label, val in results:
        print(f"{label:20s} {val}")


if __name__ == "__main__":
    main()
