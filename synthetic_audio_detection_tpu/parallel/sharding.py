"""Device mesh + sharding helpers (SPMD over ICI).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(replicate-scatter-gather each step, submodel_trainer.py:637-639) plus CPU
pools for ETL (SURVEY.md §2.4). The TPU-native replacement is single-controller
JAX SPMD: one ``Mesh`` over the slice, ``NamedSharding`` annotations, and XLA
inserting the collectives (gradient all-reduce over ICI for data-parallel;
head-sharded ensemble = the MoE-like 'expert' layout for very large N).

Axes:
- ``data``: batch dimension — the primary scaling axis (both training and the
  windows axis of hour-long-recording inference, SURVEY.md §5 long-context).
- ``model``: reserved axis for sharding the *ensemble heads* (N sub-models)
  or future tensor parallelism; size 1 on a single chip.

Multi-host: call :func:`initialize_distributed` before any jax op; the mesh
then spans all processes' devices (ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (no-op single-process). Safe to call twice."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Mesh('data', 'model'). data_parallel=-1 → all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel < 1:
        model_parallel = 1
    if data_parallel == -1:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} != {n} devices")
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def head_sharded(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (ensemble-head) axis over 'model'."""
    return NamedSharding(mesh, P(MODEL_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put every leaf with its leading axis over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharded(mesh, np.ndim(x) or 1)), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, replicated(mesh))


def shard_ensemble_heads(mesh: Mesh, variables: Any) -> Any:
    """Stacked ensemble variables [N, ...] → leading axis over 'model'
    (expert-parallel layout for very large head counts, SURVEY.md §2.4 EP)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, head_sharded(mesh, np.ndim(x) or 1)),
        variables,
    )


def pad_batch_to_multiple(batch_size: int, mesh: Mesh) -> int:
    """Round a global batch up so it divides evenly over the 'data' axis."""
    d = mesh.shape[DATA_AXIS]
    return ((batch_size + d - 1) // d) * d
