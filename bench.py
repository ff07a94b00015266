"""Headline benchmark: SSL (mean-teacher) training-step throughput.

Measures scenes/sec/chip for the full teacher+student 3DIoUMatch step — the
metric named in BASELINE.json — at the reference training configuration
(train.py:47-48 of the reference): batch 4 labeled + 8 unlabeled scenes,
full-size VoteNet-IoU, 40k points/scene on ScanNet geometry.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/s", "vs_baseline": N}

``vs_baseline`` divides by an ESTIMATED reference throughput of 20
scenes/sec: the reference publishes no timing numbers anywhere
(SURVEY.md §6); 20/s corresponds to ~0.6 s per 12-scene SSL step on a
V100, a mid-range estimate for VoteNet teacher+student at 40k points.
Treat it as a fixed yardstick for round-over-round comparison, not ground
truth.

The ONE emitted line's main value is the production config — since round
5 that is FLOAT32 with REFERENCE-EXACT step semantics (the driver
default and run_train.sh): the round-5 seed experiments
(reports/flagship.md §3) measured BOTH approximations (bf16 compute;
the pruned fast step) to occasionally destabilize the few-shot SSL loop
on the dense-demo instrument (one collapse each in 5 seeds), while the
all-exact config is 5/5 healthy and matches-or-beats the reference. The
faster opt-in configs remain measured in the same run and carried as
extra ``f32_fast_step`` / ``bf16_fast_step`` keys so their speed can
never be traded silently against semantics (VERDICT r1, weak #2).

Each config reports the MEDIAN of BENCH_REPS (default 3) timed windows of
BENCH_STEPS steps, plus the raw reps, so the headline is robust to the
tunneled TPU's ~10% run-to-run spread. A third leg measures the stage-1
supervised pretrain step (batch 8, f32 — the run_pretrain.sh recipe) under
the ``pretrain`` key.

Env overrides: BENCH_POINTS, BENCH_LABELED, BENCH_UNLABELED, BENCH_STEPS,
BENCH_REPS, BENCH_PRETRAIN_BATCH, BENCH_DTYPE (default bfloat16 — the
production mixed-precision config; set float32 for the parity
configuration), BENCH_BOTH=0 to skip the second (f32 reference-exact)
measurement, BENCH_PRETRAIN=0 to skip the pretrain leg.
"""
import json
import os
import time

import numpy as np

BASELINE_SCENES_PER_SEC = 20.0


def make_batch(rng, cfg, bl, bu, n_points, n_gt=16):
    import jax.numpy as jnp

    b = bl + bu
    mask = np.ones((bl, n_gt), np.float32)
    batch = {
        "point_clouds": jnp.asarray(rng.randn(b, n_points, 4).astype(np.float32)),
        "ema_point_clouds": jnp.asarray(rng.randn(b, n_points, 4).astype(np.float32)),
        "center_label": jnp.asarray(rng.uniform(-2, 2, (bl, n_gt, 3)).astype(np.float32)),
        "box_label_mask": jnp.asarray(mask),
        "heading_class_label": jnp.zeros((bl, n_gt), jnp.int32),
        "heading_residual_label": jnp.zeros((bl, n_gt), jnp.float32),
        "size_class_label": jnp.asarray(rng.randint(0, cfg.num_size_cluster, (bl, n_gt))),
        "size_residual_label": jnp.asarray(
            rng.uniform(-0.05, 0.05, (bl, n_gt, 3)).astype(np.float32)
        ),
        "sem_cls_label": jnp.asarray(rng.randint(0, cfg.num_class, (bl, n_gt))),
        "vote_label": jnp.asarray(rng.randn(bl, n_points, 9).astype(np.float32) * 0.1),
        "vote_label_mask": jnp.asarray(rng.randint(0, 2, (bl, n_points)).astype(np.int32)),
        "flip_x_axis": jnp.asarray(rng.randint(0, 2, (b,))),
        "flip_y_axis": jnp.asarray(rng.randint(0, 2, (b,))),
        "rot_mat": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))),
        "rot_angle": jnp.zeros((b,), jnp.float32),
        "scale": jnp.ones((b, 1, 3), jnp.float32),
    }
    return batch


_partial_line = None  # primary result, if measured before a watchdog fire


def _watchdog(minutes):
    """If the tunneled TPU is unreachable (jax device ops hang instead of
    erroring), still emit ONE honest JSON line and exit instead of hanging
    the harness forever. Normal runs finish well inside the window. If the
    PRIMARY config already finished (the hang hit the secondary f32 leg),
    the primary line is emitted instead of a zero."""
    import threading

    def fire():
        if _partial_line is not None:
            line = dict(_partial_line)
            line["f32_exact"] = {"error": "watchdog: second config hung"}
            print(json.dumps(line), flush=True)
        else:
            print(json.dumps({
                "metric": "ssl_step_scenes_per_sec[tpu-unreachable]",
                "value": 0.0,
                "unit": "scenes/s",
                "vs_baseline": 0.0,
            }), flush=True)
        os._exit(3)

    t = threading.Timer(minutes * 60.0, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import jax

    # two configs now compile+run back to back; the primary is safe after
    # ~half the window (see _watchdog)
    watchdog = _watchdog(float(os.environ.get("BENCH_WATCHDOG_MIN", 40)))

    # sitecustomize in this image bakes JAX_PLATFORMS=axon in at interpreter
    # start, so a JAX_PLATFORMS=cpu env var alone is ignored; honor an
    # explicit BENCH_PLATFORM override via jax.config before backend init.
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    from iou3dmatch_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    platform = jax.devices()[0].platform
    on_accel = platform in ("tpu", "gpu")
    n_points = int(os.environ.get("BENCH_POINTS", 40000 if on_accel else 2048))
    bl = int(os.environ.get("BENCH_LABELED", 4 if on_accel else 1))
    bu = int(os.environ.get("BENCH_UNLABELED", 8 if on_accel else 2))
    n_steps = int(os.environ.get("BENCH_STEPS", 10 if on_accel else 2))

    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.train import create_train_state, make_ssl_step

    tiny = not on_accel

    import jax.numpy as jnp

    @jax.jit
    def _checksum(tree):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), tree,
            jnp.float32(0))

    def sync(state):
        # Force completion of the whole step by fetching ONE scalar that
        # depends on every updated parameter. On the tunneled TPU platform
        # block_until_ready does not reliably wait, fetching a by-product
        # scalar under-syncs, and fetching the full param tree costs ~27 ms
        # of tunnel latency PER LEAF (118 leaves) — profiling showed that
        # dwarfing the actual device time.
        float(_checksum(state.params))

    # median of >= 3 timed windows per config so the headline is not
    # decided by single-run noise (the tunneled TPU shows ~10% run-to-run
    # spread); compile happens once per config, reps are cheap
    n_reps = int(os.environ.get("BENCH_REPS", 3 if on_accel else 1))

    def _timed_reps(step_once, scenes, state):
        key = jax.random.PRNGKey(1)
        # Warmup: compile + one steady-state step.
        for i in range(2):
            state = step_once(state, jax.random.fold_in(key, i))
            sync(state)
        rates = []
        for r in range(n_reps):
            t0 = time.perf_counter()
            for i in range(n_steps):
                state = step_once(state,
                                  jax.random.fold_in(key, 100 + r * n_steps + i))
            sync(state)
            rates.append(scenes * n_steps / (time.perf_counter() - t0))
        return float(np.median(rates)), rates

    def measure(compute_dtype, reference_exact):
        model, cfg = build_votenet("scannet", tiny=tiny,
                                   compute_dtype=compute_dtype)
        rng = np.random.RandomState(0)
        batch = make_batch(rng, cfg, bl, bu, n_points)
        state = create_train_state(model, jax.random.PRNGKey(0), batch,
                                   with_ema=True)
        step = make_ssl_step(model, cfg, num_labeled=bl,
                             reference_exact=reference_exact)

        def step_once(state, rng_key):
            state, _ = step(state, batch, rng_key, 2e-3, 0.5)
            return state

        return _timed_reps(step_once, bl + bu, state)

    def measure_pretrain(compute_dtype):
        """Stage-1 supervised step (reference pretrain.py:45-59: batch 8,
        40k points, forward_with_pred_jitter + labeled loss + Adam).

        Runs 5 reps by default (vs 3 for the SSL legs): the round-3
        artifact showed a bimodal pretrain spread ([155.1, 141.9, 141.8])
        that 3 reps cannot resolve — this leg runs last, after two SSL
        compile+measure cycles, so it sees the most accumulated tunnel /
        clock state. More reps make the median robust to one outlier
        window (VERDICT r3 #4)."""
        from iou3dmatch_tpu.train import make_pretrain_step

        nonlocal n_reps
        n_reps_saved = n_reps
        n_reps = int(os.environ.get("BENCH_PRETRAIN_REPS",
                                    max(5, n_reps) if on_accel else n_reps))
        b_pre = int(os.environ.get("BENCH_PRETRAIN_BATCH",
                                   8 if on_accel else 2))
        model, cfg = build_votenet("scannet", tiny=tiny,
                                   compute_dtype=compute_dtype)
        rng = np.random.RandomState(0)
        batch = make_batch(rng, cfg, b_pre, 0, n_points)
        batch = {k: v for k, v in batch.items()
                 if k not in ("ema_point_clouds", "flip_x_axis", "flip_y_axis",
                              "rot_mat", "rot_angle", "scale")}
        state = create_train_state(model, jax.random.PRNGKey(0), batch,
                                   with_ema=False)
        step = make_pretrain_step(model, cfg)

        def step_once(state, rng_key):
            state, _ = step(state, batch, rng_key, 1e-3, 0.5)
            return state

        try:
            return _timed_reps(step_once, b_pre, state)
        finally:
            n_reps = n_reps_saved

    # bf16 mixed precision is the production training config on TPU (the
    # drivers' --bf16 flag); BENCH_DTYPE=float32 opts out for parity runs.
    # Primary = the parity training contract: f32, reference-exact step
    # (the driver default / run_train.sh — the only configuration measured
    # to reliably match the reference, reports/flagship.md §3).
    # BENCH_DTYPE=bfloat16 / BENCH_FAST_STEP=1 re-point the primary leg
    # for experiments.
    dtype_env = os.environ.get("BENCH_DTYPE", "float32")
    compute_dtype = None if dtype_env in ("float32", "f32") else dtype_env
    fast_step = os.environ.get("BENCH_FAST_STEP", "0") == "1"
    scenes_per_sec, reps = measure(compute_dtype,
                                   reference_exact=not fast_step)

    dtype_tag = ("," + ("bf16" if compute_dtype else "f32")) + (
        ",fast-step" if fast_step else ",exact-step")
    global _partial_line
    _partial_line = {
        "metric": f"ssl_step_scenes_per_sec[{platform},{n_points}pts,b{bl}+{bu}{dtype_tag}]",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
        "reps": [round(r, 1) for r in reps],
    }

    # Secondary legs, each failure-tolerant: a broken compile must not
    # discard the primary number.
    extra = {}
    if os.environ.get("BENCH_BOTH", "1") != "0":
        # secondary legs: the f32 reference-exact paper config and the
        # bf16 fast step (the documented speed/accuracy trade — the
        # round-2..4 headline, kept measured for round-over-round
        # comparability)
        for key, (dt, ref_exact) in {
            "f32_exact": (None, True),
            "f32_fast_step": (None, False),
            "bf16_fast_step": ("bfloat16", False),
        }.items():
            if (dt, ref_exact) == (compute_dtype, not fast_step):
                continue  # identical to the primary leg
            try:
                v, v_reps = measure(dt, reference_exact=ref_exact)
                extra[key] = {
                    "value": round(v, 3),
                    "vs_baseline": round(v / BASELINE_SCENES_PER_SEC, 3),
                    "reps": [round(r, 1) for r in v_reps],
                }
            except Exception as e:  # noqa: BLE001 — report, don't die
                extra[key] = {"error": repr(e)[:200]}
    if os.environ.get("BENCH_PRETRAIN", "1") != "0":
        # stage-1 supervised pretrain throughput (f32, the run_pretrain.sh
        # recipe); same 20 scenes/s yardstick held fixed across stages for
        # round-over-round comparability
        try:
            pre, pre_reps = measure_pretrain(None)
            extra["pretrain"] = {
                "value": round(pre, 3),
                "vs_baseline": round(pre / BASELINE_SCENES_PER_SEC, 3),
                "unit": "scenes/s",
                "reps": [round(r, 1) for r in pre_reps],
            }
        except Exception as e:  # noqa: BLE001
            extra["pretrain"] = {"error": repr(e)[:200]}

    watchdog.cancel()
    print(json.dumps({**_partial_line, **extra}))


if __name__ == "__main__":
    main()
