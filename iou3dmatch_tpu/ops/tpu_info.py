"""Shared TPU hardware constants for the Pallas kernels.

v5e has 128 MB of VMEM per core; the 16 MB figure often quoted is only the
default *scoped* limit XLA grants a kernel (raise it per-kernel via
``pltpu.CompilerParams(vmem_limit_bytes=...)``). One budget constant keeps
the FPS and gather kernels' VMEM assumptions in sync; retune here for a
different TPU generation.
"""

VMEM_BUDGET_BYTES = 100 << 20  # of the 128 MB physical, leave headroom
