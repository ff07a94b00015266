"""Persistent XLA compilation cache.

The full SSL train step takes 6-8 minutes to compile for TPU; the persistent
cache brings repeat runs (drivers, bench, eval) down to seconds. Verified to
work through the tunneled TPU backend. Opt out with
IOU3DMATCH_NO_COMPILE_CACHE=1; relocate with JAX_COMPILATION_CACHE_DIR.
"""
import hashlib
import os


def _host_cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU identity + feature flags.

    XLA:CPU's persistent cache stores AOT-compiled machine code keyed
    WITHOUT the target machine features; an entry compiled on a host with
    a different ISA loads with a 'could lead to SIGILL' error. Keying the
    CPU cache directory on the host's identity makes entries non-portable
    by construction instead of crash-prone by accident.

    The key must include vendor/family/model/stepping and the model name,
    not just the ``flags`` line: LLVM derives tuning pseudo-features
    (``+prefer-no-gather``/``+prefer-no-scatter``, the exact mismatch XLA
    logged in round 2) from the CPUID-detected microarchitecture, so two
    hosts with identical flag sets can still compile incompatible AOT
    entries.
    """
    keys = ("vendor_id", "cpu family", "model", "stepping", "model name",
            "flags")
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                k, _, v = line.partition(":")
                k = k.strip()
                if k in keys and not any(p.startswith(k + "=") for p in parts):
                    val = v.strip()
                    if k == "flags":
                        val = " ".join(sorted(val.split()))
                    parts.append(f"{k}={val}")
    except OSError:
        pass
    if parts:
        return hashlib.sha256("|".join(sorted(parts)).encode()).hexdigest()[:12]
    import platform

    return platform.machine() or "unknown"


def enable_compilation_cache() -> None:
    """Known limitation: do NOT enable this in a multi-process
    (``jax.distributed``) CPU run — reloading XLA:CPU AOT entries there
    wedges the Gloo clique rendezvous (GetKeyValue/connect timeouts in
    context init; reproduced deterministically by tools/multihost_dryrun.py,
    which therefore launches its workers with IOU3DMATCH_NO_COMPILE_CACHE=1).
    Single-process CPU and all TPU paths are unaffected.

    Second limitation: reloading an XLA:CPU AOT entry always logs a spurious
    'could lead to SIGILL' feature-mismatch error — even on the host that
    compiled it — because LLVM appends tuning pseudo-features
    (+prefer-no-gather/+prefer-no-scatter) to the compile-feature list and
    XLA compares that against raw CPUID host features, which can never
    contain them. The fingerprint keying below prevents the GENUINE
    cross-host hazard; the same-host log line is cosmetic but unavoidable,
    so artifact-producing paths (``__graft_entry__.dryrun_multichip``) skip
    the cache entirely."""
    if os.environ.get("IOU3DMATCH_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/iou3dmatch_jax"),
    )
    platforms = (getattr(jax.config, "jax_platforms", None)
                 or os.environ.get("JAX_PLATFORMS", ""))
    if not platforms:
        # neither the config nor the env pins a platform: XLA:CPU may still
        # be selected by default, and an unkeyed dir would re-expose the
        # SIGILL hazard — resolve the actual backend (initializes jax, which
        # is fine: callers invoke this right before compiling anyway)
        try:
            platforms = jax.default_backend()
        except Exception:
            platforms = ""
    if "cpu" in platforms.lower():
        cache_dir = os.path.join(cache_dir, "cpu-" + _host_cpu_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # older jax without these options
