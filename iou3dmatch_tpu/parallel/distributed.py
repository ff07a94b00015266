"""Multi-host initialization and mesh construction.

The reference's only distributed path is single-process nn.DataParallel
(train.py:187-191); vestigial OpenPCDet carries NCCL DDP launchers that
3DIoUMatch never uses (SURVEY.md §2.3). The TPU-native equivalent needs no
process groups or collectives in user code: initialize the JAX distributed
runtime once per host, build a global mesh, and GSPMD inserts gradient
all-reduces over ICI (intra-slice) / DCN (cross-slice) from the sharding
annotations alone.
"""
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up. On TPU pods the arguments are auto-detected from
    the environment; pass them explicitly elsewhere. Safe to skip entirely
    for single-host runs."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_global_mesh(axis_name: str = "data") -> Mesh:
    """1-D data mesh over ALL devices across hosts (jax.devices() is global
    after initialize_distributed). Per-host data feeding should use
    jax.make_array_from_process_local_data with the batch sharding."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def host_local_batch_to_global(batch, mesh: Mesh, axis_name: str = "data"):
    """Assemble a globally-sharded batch from per-host shards: each host
    loads its own scenes; the logical global batch is their concatenation
    along axis 0."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
