"""Test configuration: force CPU platform with 8 virtual devices.

Multi-chip sharding (parallel/) is validated on a virtual CPU mesh, per the
build environment contract. NOTE: this image's sitecustomize imports jax at
interpreter start with JAX_PLATFORMS=axon baked in, so env vars set here are
too late — use jax.config.update instead (must run before any backend use).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """Every test not explicitly @pytest.mark.slow is `fast`, so
    `pytest -m fast` (the pre-commit subset, ~1/3 of suite wall-clock)
    needs no per-test bookkeeping. The full suite remains the gate;
    `pytest -n auto` (pytest-xdist) parallelizes it on multi-core hosts."""
    import pytest

    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
