"""Scale-out over a jax.sharding.Mesh (data parallelism).

The reference's complete parallelism surface is single-process
``nn.DataParallel`` batch splitting (train.py:187-191) plus vestigial NCCL
DDP in OpenPCDet (SURVEY.md §2.3). The TPU-native equivalent is GSPMD over a
1-D ``data`` mesh: batches are sharded on axis 0, parameters/EMA are
replicated, and the per-step gradient all-reduce + cross-replica BatchNorm
statistics fall out of sharding propagation over ICI — no process groups,
no collective calls in user code. TP/PP/SP/EP are not applicable to this
~1M-parameter model family (documented in SURVEY.md §2.3).
"""
from .mesh import make_mesh, shard_batch, replicate, shard_train_step
from .distributed import (
    initialize_distributed, make_global_mesh, host_local_batch_to_global)

__all__ = [
    "make_mesh", "shard_batch", "replicate", "shard_train_step",
    "initialize_distributed", "make_global_mesh", "host_local_batch_to_global",
]
