"""Two-process multi-host dryrun of the SSL training step (VERDICT r2 #5).

The reference's only distributed story is single-process nn.DataParallel
(train.py:187-191); our multi-host path (`parallel/distributed.py`:
jax.distributed + a global 1-D data mesh + per-host batch assembly via
jax.make_array_from_process_local_data) had until now only been exercised
in a single process. This tool launches TWO actual OS processes, each with
4 virtual CPU devices, initializes the JAX distributed runtime between them
(coordinator on localhost), assembles a global 16-scene SSL batch from
per-process halves, jits ONE full mean-teacher SSL step over the global
8-device mesh, and checks the resulting loss

  * agrees bit-for-bit (or to float32 roundoff) BETWEEN the two processes,
  * matches a single-process 8-virtual-device run of the IDENTICAL batch.

Usage (parent orchestrates everything):
    python tools/multihost_dryrun.py            # writes reports/multihost_dryrun.json
Internal modes:
    python tools/multihost_dryrun.py --worker I --nprocs N --coordinator H:P
    python tools/multihost_dryrun.py --single
"""
import argparse
import json
import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROCS = 2
LOCAL_DEVICES = 4
N_DEVICES = N_PROCS * LOCAL_DEVICES


def _build_batch(cfg):
    """Deterministic tiny SSL batch, identical in every process (same
    construction as __graft_entry__.dryrun_multichip, bl=bu=8)."""
    n_points, n_gt = 256, 4
    bl = bu = N_DEVICES
    b = bl + bu
    rng = np.random.RandomState(0)
    mask = np.ones((bl, n_gt), np.float32)
    mask[:, -1] = 0
    return bl, {
        "point_clouds": rng.randn(b, n_points, 4).astype(np.float32),
        "ema_point_clouds": rng.randn(b, n_points, 4).astype(np.float32),
        "center_label": rng.uniform(-2, 2, (bl, n_gt, 3)).astype(np.float32),
        "box_label_mask": mask,
        "heading_class_label": np.zeros((bl, n_gt), np.int32),
        "heading_residual_label": np.zeros((bl, n_gt), np.float32),
        "size_class_label": rng.randint(0, cfg.num_size_cluster, (bl, n_gt)),
        "size_residual_label": rng.uniform(
            -0.05, 0.05, (bl, n_gt, 3)).astype(np.float32),
        "sem_cls_label": rng.randint(0, cfg.num_class, (bl, n_gt)),
        "vote_label": (rng.randn(bl, n_points, 9) * 0.1).astype(np.float32),
        "vote_label_mask": rng.randint(0, 2, (bl, n_points)).astype(np.int32),
        "flip_x_axis": rng.randint(0, 2, (b,)),
        "flip_y_axis": rng.randint(0, 2, (b,)),
        "rot_mat": np.tile(np.eye(3, dtype=np.float32), (b, 1, 1)),
        "rot_angle": np.zeros((b,), np.float32),
        "scale": np.ones((b, 1, 3), np.float32),
    }


def _force_cpu(n_local):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _run_step(jax, local_batch_fn):
    """Common step body for worker and single-process modes.

    ``local_batch_fn(batch_np, mesh)`` turns the global numpy batch into
    globally-sharded device arrays."""
    from iou3dmatch_tpu.models.factory import build_votenet
    from iou3dmatch_tpu.train import create_train_state, make_ssl_step
    from iou3dmatch_tpu.utils.compile_cache import enable_compilation_cache
    from jax.sharding import NamedSharding, PartitionSpec as P

    enable_compilation_cache()
    model, cfg = build_votenet("scannet", tiny=True)
    bl, batch_np = _build_batch(cfg)

    state = create_train_state(
        model, jax.random.PRNGKey(0), batch_np, with_ema=True)

    from iou3dmatch_tpu.parallel import make_global_mesh

    mesh = make_global_mesh()
    repl = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        # Establish the cross-process Gloo context NOW, while the workers
        # are still within seconds of each other: Gloo's KV rendezvous has
        # a 30 s deadline, and the first collective otherwise happens deep
        # inside the SSL step — if one worker's compile (minutes, cold
        # cache) finishes >30 s before the other's, context init times out
        # and both workers die.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gloo-context-warmup")
    # replicate state as GLOBAL arrays: every process holds the identical
    # host value (deterministic init), so the process-local portion of a
    # fully-replicated array is the full array
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state)
    batch = local_batch_fn(batch_np, mesh)

    # Loosened pseudo-label thresholds: at random init no teacher proposal
    # clears the production 0.9/0.9/0.25 filter (train.py:263-275), which
    # would leave the unlabeled loss identically zero and the on-device
    # pseudo-label -> LHS -> frame-transform path unexercised across the
    # process boundary. With the filter open, that path contributes a real
    # nonzero loss that must still agree bit-for-bit between processes.
    step = make_ssl_step(model, cfg, num_labeled=bl,
                         obj_threshold=0.0, cls_threshold=0.0,
                         iou_threshold=0.0)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1), 2e-3, 0.5)
    jax.block_until_ready(new_state.params)
    return float(metrics["loss"]), float(metrics["unlabeled_detection_loss"])


def worker(i, nprocs, coordinator):
    jax = _force_cpu(LOCAL_DEVICES)
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nprocs, process_id=i)
    assert jax.process_count() == nprocs
    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == N_DEVICES

    from iou3dmatch_tpu.parallel import host_local_batch_to_global

    def local_batch(batch_np, mesh):
        # each process loads ONLY its own contiguous slice of the global
        # batch (what a per-host loader would produce)
        def slice_local(x):
            rows = x.shape[0]
            assert rows % nprocs == 0, rows
            per = rows // nprocs
            return x[i * per:(i + 1) * per]

        local = {k: slice_local(v) for k, v in batch_np.items()}
        return host_local_batch_to_global(local, mesh)

    loss, unl = _run_step(jax, local_batch)
    print(f"WORKER {i} LOSS {loss!r} UNLABELED {unl!r}", flush=True)


def single():
    jax = _force_cpu(N_DEVICES)
    assert jax.device_count() == N_DEVICES

    from iou3dmatch_tpu.parallel import shard_batch

    def local_batch(batch_np, mesh):
        return shard_batch(batch_np, mesh)

    loss, unl = _run_step(jax, local_batch)
    print(f"SINGLE LOSS {loss!r} UNLABELED {unl!r}", flush=True)


def parent():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device counts
    # XLA:CPU persistent-cache entries are AOT machine code; reloading them
    # inside a jax.distributed multi-process run breaks the Gloo clique
    # rendezvous (workers hang in context init: GetKeyValue/connect
    # timeouts — reproduced deterministically, passes with the cache off)
    # and spams 'could lead to SIGILL' feature-mismatch E-logs. Workers
    # compile fresh; the single-process control keeps the cache.
    worker_env = dict(env, IOU3DMATCH_NO_COMPILE_CACHE="1")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--nprocs", str(N_PROCS), "--coordinator", coordinator],
            cwd=REPO, env=worker_env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(N_PROCS)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    failed = [i for i, p in enumerate(procs) if p.returncode != 0]
    if failed:
        # dump EVERY failed worker: the root cause is usually in the one
        # that died first, not the one that timed out waiting for it
        for i in failed:
            sys.stderr.write(f"--- worker {i} output ---\n{outs[i]}\n")
        raise SystemExit(
            f"workers {failed} failed "
            f"rc={[procs[i].returncode for i in failed]}")

    single_p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=1800)
    if single_p.returncode != 0:
        sys.stderr.write(single_p.stdout)
        raise SystemExit("single-process run failed")

    def grab(pattern, text):
        m = re.search(pattern + r" LOSS (\S+) UNLABELED (\S+)", text)
        assert m, f"no loss line matching {pattern!r} in:\n{text}"
        return float(m.group(1)), float(m.group(2))

    w = [grab(f"WORKER {i}", outs[i]) for i in range(N_PROCS)]
    s_loss = grab("SINGLE", single_p.stdout)

    result = {
        "n_processes": N_PROCS,
        "local_devices": LOCAL_DEVICES,
        "worker_losses": [x[0] for x in w],
        "worker_unlabeled": [x[1] for x in w],
        "single_process_loss": s_loss[0],
        "single_process_unlabeled": s_loss[1],
    }
    # replicated outputs must agree exactly between the two processes
    assert w[0] == w[1], result
    # and match the single-process value to f32 roundoff (collective
    # reduction order may differ across process boundaries)
    np.testing.assert_allclose(w[0][0], s_loss[0], rtol=1e-5)
    np.testing.assert_allclose(w[0][1], s_loss[1], rtol=1e-5)
    # the pseudo-label path must actually fire (see the threshold note in
    # _run_step) — a zero unlabeled loss would mean the cross-process run
    # never exercised the on-device LHS/transform pipeline
    assert s_loss[1] > 0.0, result
    result["max_rel_diff"] = abs(w[0][0] - s_loss[0]) / abs(s_loss[0])

    os.makedirs(os.path.join(REPO, "reports"), exist_ok=True)
    out_path = os.path.join(REPO, "reports", "multihost_dryrun.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print(f"multihost dryrun OK: {N_PROCS} processes x {LOCAL_DEVICES} "
          f"devices, loss matches single-process run -> {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=N_PROCS)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--single", action="store_true")
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.nprocs, args.coordinator)
    elif args.single:
        single()
    else:
        parent()


if __name__ == "__main__":
    main()
