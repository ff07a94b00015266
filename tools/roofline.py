"""Roofline / MFU analysis for the SSL train step (VERDICT r1 task #6).

Compiles the production-config SSL step (40k pts, batch 4+8) and reads
XLA's own cost analysis (FLOPs + bytes accessed) off the compiled
executable, then derives:

- MFU on the v5e at the measured step time,
- a CHARITABLE V100 throughput ceiling for the reference: the fastest a
  V100 could possibly run this much work = max(flops/peak_flops,
  bytes/peak_bw) per step, assuming 100% of peak with zero kernel overhead
  — an upper bound no real PyTorch+CUDA implementation reaches. Our
  speedup quoted against this ceiling is a LOWER bound.

Run:  python tools/roofline.py [--platform cpu] [--points 40000]
      [--step_ms 71.4]
The compile is expensive the first time; on the TPU it reuses the
persistent compilation cache. On CPU the FLOP count is the same program
math (cost analysis, not execution).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chip peaks
V5E_PEAK_BF16 = 197e12   # FLOP/s
V5E_PEAK_F32 = 49e12     # ~1/4 of bf16 on the MXU
V5E_HBM_BW = 819e9       # B/s
V100_PEAK_F32 = 15.7e12  # SXM2
V100_PEAK_F16 = 125e12   # tensor cores (charitable: reference is f32)
V100_HBM_BW = 900e9      # B/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="cpu to force the CPU backend (cost analysis only)")
    ap.add_argument("--points", type=int, default=40000)
    ap.add_argument("--bl", type=int, default=4)
    ap.add_argument("--bu", type=int, default=8)
    ap.add_argument("--step_ms", type=float, default=71.4,
                    help="measured device step time (PERF.md headline)")
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from iou3dmatch_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np  # noqa: E402
    from bench import make_batch
    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.train import create_train_state, make_ssl_step

    dtype = None if args.f32 else "bfloat16"
    model, cfg = build_votenet("scannet", compute_dtype=dtype)
    rng = np.random.RandomState(0)
    batch = make_batch(rng, cfg, args.bl, args.bu, args.points)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               with_ema=True)
    step = make_ssl_step(model, cfg, num_labeled=args.bl,
                         reference_exact=args.f32)

    lowered = step.lower(state, batch, jax.random.PRNGKey(1), 2e-3, 0.5)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    b = args.bl + args.bu
    t = args.step_ms / 1e3
    scenes_per_sec = b / t
    peak = V5E_PEAK_BF16 if dtype else V5E_PEAK_F32
    mfu = flops / t / peak
    hbm_util = bytes_accessed / t / V5E_HBM_BW

    # charitable V100 ceiling (f32 math — what the reference runs)
    t_v100_floor = max(flops / V100_PEAK_F32, bytes_accessed / V100_HBM_BW)
    v100_ceiling_sps = b / t_v100_floor
    # even more charitable: f16 tensor-core peak
    t_v100_f16 = max(flops / V100_PEAK_F16, bytes_accessed / V100_HBM_BW)
    v100_f16_ceiling_sps = b / t_v100_f16

    print(json.dumps({
        "config": f"{args.points}pts,b{args.bl}+{args.bu},"
                  f"{'f32exact' if args.f32 else 'bf16'}",
        "flops_per_step": flops,
        "tflops_per_step": round(flops / 1e12, 3),
        "bytes_accessed_per_step": bytes_accessed,
        "gbytes_per_step": round(bytes_accessed / 1e9, 2),
        "arithmetic_intensity_flops_per_byte": round(
            flops / max(bytes_accessed, 1), 2),
        "step_ms": args.step_ms,
        "scenes_per_sec": round(scenes_per_sec, 1),
        "v5e_mfu_pct": round(100 * mfu, 2),
        "v5e_hbm_util_pct": round(100 * hbm_util, 1),
        "v100_f32_ceiling_scenes_per_sec": round(v100_ceiling_sps, 1),
        "v100_f16_ceiling_scenes_per_sec": round(v100_f16_ceiling_sps, 1),
        "speedup_vs_v100_f32_ceiling": round(
            scenes_per_sec / v100_ceiling_sps, 2),
    }, indent=1))


if __name__ == "__main__":
    main()
