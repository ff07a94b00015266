"""Pallas TPU kernel for the grouping gather (VMEM-resident table).

XLA's TPU gather streams rows from HBM at a fixed ~9 ns/row issue rate —
at SA1 train shapes (12 scenes x 2048 centers x 64 neighbors from 40k
points) that is ~14 ms per model forward, the single hottest op in the
step. The per-scene table is tiny (40960 x 4 f32), so this kernel pins it
whole in VMEM and turns the gather into VMEM-local dynamic-sublane loads:
~5.2 ns/row, 1.7x the XLA gather (8.2 vs 14.0 ms measured at SA1 shapes,
G-sweep plateau at 16 rows/iteration).

Mosaic constraints that shaped the kernel:
- dynamic indexing is sublane-only, so the table keeps points on sublanes
  (lane-padding to 128 is physical but VMEM is 128 MB on v5e — the default
  16 MB *scoped* limit is raised via CompilerParams);
- the output block is written G rows at a time (concat of G (1, C) loads);
- indices live in SMEM (1 MB cap -> the output axis is chunked into grid
  steps of QC rows).

Semantics: identical to ops.ball_query.group_points (a plain gather);
the custom VJP reuses the same one-hot-matmul backward.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_info import VMEM_BUDGET_BYTES as _VMEM_BUDGET

_G = 16  # rows gathered per loop iteration (ILP; v5e sweep optimum)
_QC = 1 << 14  # output rows per grid step (VMEM window + SMEM idx window)


def _kernel(qc, tab_ref, idx_ref, out_ref):
    def body(i, _):
        base = i * _G
        rows = [
            tab_ref[0, pl.ds(idx_ref[0, 0, base + g], 1), :] for g in range(_G)
        ]
        out_ref[0, pl.ds(base, _G), :] = jnp.concatenate(rows, axis=0)
        return 0

    jax.lax.fori_loop(0, qc // _G, body, 0)


def gather_rows_vmem_supported(n, q, c, dtype) -> bool:
    """True if (B, n, c) tables x (B, q) flat indices fit this kernel.

    f32-only: Mosaic cannot dynamic-sublane-index (16, 128)-tiled bf16
    tables, and routing bf16 rows through bitcast-f32 pairs loses its edge
    to the (b, q, c/2, 2)->(b, q, c) un-pairing relayout on the output (v5e
    sweep: XLA 12.2 vs bitcast-pallas 11.8 ns/row at SA2 train shapes — a
    wash). Width cap 256 lanes: VMEM-local loads keep their ~2x row-rate
    edge through at least 2 lane-tiles (v5e: 8.2 vs 13.9 ns/row at 131
    lanes, 3.1 vs 7.4 at 4 lanes); beyond that the HBM gather is
    width-bound anyway and the lane-padded table bloats VMEM.
    """
    if jnp.dtype(dtype) != jnp.float32 or c > 256:
        return False
    if q <= 0 or n <= 0:  # empty gathers stay on the XLA path
        return False
    c_pad = -(-c // 128) * 128  # physical lane padding
    qc = min(q, _QC)
    vmem = 2 * n * c_pad * 4 + 2 * qc * c_pad * 4
    return q % _G == 0 and q % qc == 0 and vmem < _VMEM_BUDGET


@partial(jax.jit, static_argnums=(2,))
def gather_rows_vmem(table: jax.Array, idx: jax.Array, interpret: bool = False):
    """table: (B, N, C), idx: (B, Q) int32 -> (B, Q, C) gather.

    Out-of-range indices are clamped to [0, N-1], matching XLA gather
    semantics, so the Pallas and fallback paths agree on any input."""
    b, n, c = table.shape
    q = idx.shape[1]
    qc = min(q, _QC)
    nch = q // qc
    return pl.pallas_call(
        partial(_kernel, qc),
        grid=(b, nch),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qc), lambda i, j: (i, 0, j),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, qc, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, q, c), table.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(table, jnp.clip(idx.astype(jnp.int32), 0, n - 1).reshape(b, 1, q))
