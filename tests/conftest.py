"""Test configuration: force CPU platform with 8 virtual devices.

Multi-chip sharding (parallel/) is validated on a virtual CPU mesh, per the
build environment contract. Must run before `import jax` anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
