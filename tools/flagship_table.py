"""Build the flagship multi-seed tables from per-run demo metrics.

Aggregates every run's ``metrics.json`` under one or more experiment roots
(a ``_parity_demo*`` state dir or its committed copy under
``reports/runs/<exp>/``) into:

1. a mode x threshold table with per-GROUP mean +/- run-to-run std
   (groups: reference, ours exact, ours fast, and any 2x2 ablation
   corners present — never pooled across ours configs);
2. a per-cell verdict table PER GROUP against the reference, using the
   standard error of the mean difference sqrt(var_ref/n_ref + var_g/n_g)
   and a |z| <= 2 criterion (printed in the header);
3. one cross-cell ensemble line per group: how many of the cells land
   below the reference mean, the two-sided binomial sign-test p for that
   count, and the mean z — because with n=3-4 per cell no single cell has
   power, only the ensemble does (VERDICT r4 "what's weak" #1).

Usage:
  python tools/flagship_table.py [--baseline GROUP] [root ...]
  (default root: _parity_demo_dense; with several roots a combined
   ensemble over all their cells is printed at the end. --baseline
   selects the comparison group — default "reference"; the 16k
   scale experiment has no feasible torch side on this 1-core host,
   so its verdicts use --baseline exact.)
"""
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sync_run_evidence import run_info  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GROUP_LABELS = {
    "reference": "reference (torch)",
    "exact": "ours f32-exact",
    "fast": "ours bf16-fast",
    "f32fast": "ours f32+fast-step",
    "bf16exact": "ours bf16+exact-step",
    "fastg32": "ours fast+f32GridConv",
    "fastbn": "ours fast+exactJitter",
    "fastteacher": "ours fast+fullTeacher",
}
GROUP_ORDER = ["reference", "exact", "fast", "f32fast", "bf16exact",
               "fastg32", "fastbn", "fastteacher"]
MODES = ("plain", "iou_nms", "iou_nms_opt")
THRESHOLDS = ("0.25", "0.5")
METRICS = ("mAP", "AR")


def load_groups(root):
    """{group: {run_dir: metrics}} for every recognized run under root.

    Ablation one-offs (*_oldbias) are excluded from the seed tables."""
    groups = {}
    for d in sorted(os.listdir(root)):
        p = os.path.join(root, d, "metrics.json")
        info = run_info(d)
        if info is None or not os.path.exists(p):
            continue
        _, variant, _ = info
        if variant not in GROUP_LABELS:
            continue
        groups.setdefault(variant, {})[d] = json.load(open(p))
    return groups


def cell_values(runs, mode, t, metric):
    return np.array([m[mode][t][metric] for m in runs.values()])


def sign_test_p(k, n):
    """Two-sided binomial sign-test p for k successes in n fair trials."""
    if n == 0:
        return float("nan")
    cdf_k = sum(math.comb(n, i) for i in range(k + 1)) / 2.0 ** n
    sf_k = sum(math.comb(n, i) for i in range(k, n + 1)) / 2.0 ** n
    return min(1.0, 2.0 * min(cdf_k, sf_k))


def group_stats(rv, gv):
    """(delta, sem, z) of mean_g - mean_ref; sem uses SEM-of-difference."""
    d = float(np.mean(gv) - np.mean(rv))
    var_r = float(np.var(rv, ddof=1)) / len(rv) if len(rv) > 1 else None
    var_g = float(np.var(gv, ddof=1)) / len(gv) if len(gv) > 1 else None
    if var_r is None and var_g is None:
        return d, None, None
    sem = math.sqrt((var_r or 0.0) + (var_g or 0.0))
    z = d / sem if sem > 0 else None
    return d, sem, z


def report_root(root, ensemble, baseline="reference"):
    groups = load_groups(root)
    present = [g for g in GROUP_ORDER if g in groups]
    print(f"## {os.path.relpath(root, REPO)}")
    for g in present:
        runs = groups[g]
        print(f"# {GROUP_LABELS[g]}: {len(runs)} runs ({', '.join(runs)})",
              file=sys.stderr)

    # 1. per-group mean +/- std
    print("| eval mode | metric | " + " | ".join(
        f"{GROUP_LABELS[g]} (n={len(groups[g])})" for g in present) + " |")
    print("|---|---|" + "---|" * len(present))
    for mode in MODES:
        for t in THRESHOLDS:
            for metric in METRICS:
                cells = []
                for g in present:
                    vals = cell_values(groups[g], mode, t, metric)
                    if len(vals) == 1:
                        cells.append(f"{vals[0]:.3f} (n=1)")
                    else:
                        cells.append(f"{np.mean(vals):.3f} "
                                     f"± {np.std(vals, ddof=1):.3f}")
                print(f"| {mode} | {metric}@{t} | " + " | ".join(cells) + " |")

    if baseline not in groups:
        print(f"\n(no {baseline} runs — verdict tables skipped)")
        return
    refs = groups[baseline]

    # 2. per-cell verdicts per group (criterion: |z| <= 2, z = Δ/SEM,
    #    SEM = sqrt(var_ref/n_ref + var_group/n_group))
    base_word = ("reference" if baseline == "reference"
                 else GROUP_LABELS[baseline])
    for g in present:
        if g == baseline:
            continue
        print(f"\n### {GROUP_LABELS[g]} vs {base_word} "
              f"(criterion: |z| <= 2, SEM of the mean difference)")
        print("| eval mode | metric | mean ref | mean group | Δ | SEM | z "
              "| |z|<=2? |")
        print("|---|---|---|---|---|---|---|---|")
        zs, below, n_cells = [], 0, 0
        for mode in MODES:
            for t in THRESHOLDS:
                for metric in METRICS:
                    rv = cell_values(refs, mode, t, metric)
                    gv = cell_values(groups[g], mode, t, metric)
                    d, sem, z = group_stats(rv, gv)
                    n_cells += 1
                    below += d < 0
                    if z is not None:
                        zs.append(z)
                    sem_s = f"{sem:.3f}" if sem is not None else "n=1 both"
                    z_s = f"{z:+.2f}" if z is not None else "-"
                    ok = ("yes" if z is not None and abs(z) <= 2 else
                          "NO" if z is not None else "-")
                    print(f"| {mode} | {metric}@{t} | {np.mean(rv):.3f} | "
                          f"{np.mean(gv):.3f} | {d:+.3f} | {sem_s} | {z_s} "
                          f"| {ok} |")
        p = sign_test_p(below, n_cells)
        mean_z = np.mean(zs) if zs else float("nan")
        print(f"\n**ensemble ({GROUP_LABELS[g]}):** {below}/{n_cells} cells "
              f"below the {base_word} mean (two-sided sign-test p = {p:.3g}); "
              f"mean z = {mean_z:+.2f}")
        ensemble.setdefault(g, []).append((below, n_cells, zs))
    print()


def main():
    argv = sys.argv[1:]
    baseline = "reference"
    if "--baseline" in argv:
        i = argv.index("--baseline")
        baseline = argv[i + 1]
        del argv[i:i + 2]
    roots = argv or ["_parity_demo_dense"]
    roots = [r if os.path.isabs(r) else os.path.join(REPO, r) for r in roots]
    ensemble = {}
    for root in roots:
        report_root(root, ensemble, baseline)
    if len(roots) > 1:
        print("## combined ensemble across all roots")
        for g, recs in ensemble.items():
            below = sum(b for b, _, _ in recs)
            n = sum(nc for _, nc, _ in recs)
            zs = [z for _, _, zl in recs for z in zl]
            p = sign_test_p(below, n)
            print(f"- {GROUP_LABELS[g]}: {below}/{n} cells below the "
                  f"reference mean (sign-test p = {p:.3g}); mean z = "
                  f"{np.mean(zs):+.2f}" if zs else f"- {GROUP_LABELS[g]}: "
                  f"{below}/{n} below (p = {p:.3g})")


if __name__ == "__main__":
    main()
