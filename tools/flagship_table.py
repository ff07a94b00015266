"""Build the flagship multi-seed table from _parity_demo_dense results.

Aggregates every reference*/metrics.json and ours*/metrics.json (excluding
*_oldbias ablations) into a mode x threshold table with per-side
mean +/- run-to-run std, and prints |mean_ours - mean_ref| against the
pooled std so the parity claim carries error bars (VERDICT r3 #2).
"""
import json
import os
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    sys.argv[1] if len(sys.argv) > 1 else "_parity_demo_dense")


def collect(prefix, exclude=("oldbias",)):
    out = {}
    for d in sorted(os.listdir(ROOT)):
        if not d.startswith(prefix) or any(x in d for x in exclude):
            continue
        p = os.path.join(ROOT, d, "metrics.json")
        if os.path.exists(p):
            out[d] = json.load(open(p))
    return out


def main():
    refs = collect("reference")
    exact = {d: m for d, m in collect("ours").items()
             if "fast" not in d}
    fast = collect("ours_fast")
    groups = [("reference (torch)", refs), ("ours f32-exact", exact),
              ("ours bf16-fast", fast)]
    for label, g in groups:
        print(f"# {label}: {len(g)} runs ({', '.join(g)})", file=sys.stderr)

    hdr = "| eval mode | metric | " + " | ".join(
        f"{lbl} (n={len(g)})" for lbl, g in groups) + " |"
    print(hdr)
    print("|---|---|" + "---|" * len(groups))
    for mode in ("plain", "iou_nms", "iou_nms_opt"):
        for t in ("0.25", "0.5"):
            for metric in ("mAP", "AR"):
                cells = []
                for _, g in groups:
                    vals = [m[mode][t][metric] for m in g.values()]
                    if not vals:
                        cells.append("-")
                    elif len(vals) == 1:
                        cells.append(f"{vals[0]:.3f}")
                    else:
                        cells.append(
                            f"{np.mean(vals):.3f} ± {np.std(vals, ddof=1):.3f}")
                print(f"| {mode} | {metric}@{t} | " + " | ".join(cells) + " |")

    # parity verdict per cell: |d mean| vs pooled std
    print()
    print("| eval mode | metric | mean ref | mean ours(all) | |Δ| | pooled σ | within noise? |")
    print("|---|---|---|---|---|---|---|")
    for mode in ("plain", "iou_nms", "iou_nms_opt"):
        for t in ("0.25", "0.5"):
            for metric in ("mAP", "AR"):
                rv = [m[mode][t][metric] for m in refs.values()]
                ov = ([m[mode][t][metric] for m in exact.values()]
                      + [m[mode][t][metric] for m in fast.values()])
                if not rv or not ov:
                    continue
                d = abs(np.mean(ov) - np.mean(rv))
                pooled = np.sqrt((np.var(rv, ddof=1) if len(rv) > 1 else 0.0)
                                 + (np.var(ov, ddof=1) if len(ov) > 1 else 0.0))
                ok = "yes" if (pooled > 0 and d <= 2 * pooled) else (
                    "n/a" if pooled == 0 else "NO")
                print(f"| {mode} | {metric}@{t} | {np.mean(rv):.3f} | "
                      f"{np.mean(ov):.3f} | {d:.3f} | {pooled:.3f} | {ok} |")


if __name__ == "__main__":
    main()
