"""Device mesh + sharding helpers — the DP layer (reference: DDP/NCCL).

The reference's only parallelism is data-parallel DDP over NCCL
(``scripts/train.py:73-74,100-102``, SURVEY.md §2.3). TPU-native equivalent:
one ``jax.sharding.Mesh`` whose leading axis is 'data'; batches are sharded on
it, parameters replicated, and XLA emits the gradient all-reduce over ICI
automatically inside the single jitted train step. SyncBN also falls out for
free: under GSPMD, BatchNorm's ``jnp.mean`` over the sharded batch axis IS the
cross-replica mean.

A 'model' axis is reserved so future tensor-parallel layouts need no API
change (SURVEY.md §2.3 notes the reference has none).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None,
              batch_size: Optional[int] = None) -> Mesh:
    """Create a (data, model) mesh over available devices; model axis defaults
    to size 1 (pure DP, matching the reference's DDP scope).

    When ``batch_size`` is given, the data axis is capped at the largest
    divisor of the batch so sharding always divides evenly."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    n_data = n // model_parallel
    if batch_size is not None:
        while n_data > 1 and batch_size % n_data != 0:
            n_data -= 1
    devices = devices[: n_data * model_parallel]
    grid = np.asarray(devices).reshape(n_data, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put every array in the batch with its leading dim sharded over
    'data' (the TPU analogue of the reference's per-rank sampler slice +
    ``.cuda()`` H2D copies, ``base_training_hooks.py:37-40``)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(state, mesh: Mesh):
    """Replicate a train state (params/opt state) across the mesh."""
    return jax.device_put(state, replicated(mesh))


def process_is_logger() -> bool:
    """Rank-0-only logging predicate (reference ``train.py:39-41``)."""
    return jax.process_index() == 0


def sync_global_devices(name: str = "barrier") -> None:
    """Host barrier (reference ``dist.barrier()``, ``train.py:205``)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
