"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's DDP/DataParallel layer (see SURVEY.md section 2.6).

The reference's two strategies (torch DDP over NCCL and single-process
nn.DataParallel, main_unopose.py:129-132,175-182) collapse into one pjit
program over a 1-D ``data`` mesh: parameters replicated, batch sharded on
axis 0, gradient all-reduce inserted automatically by GSPMD where the
replicated-param gradients meet the sharded batch. Multi-host runs reuse
the same code — `jax.distributed.initialize()` + per-process data loading
(engine/train.py)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put a host batch with dim-0 sharding over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)


def is_main_process() -> bool:
    """Replaces detectron2 comm.is_main_process (reference engine.py)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch_size: int) -> slice:
    """Per-process slice of a globally indexed batch (multi-host input
    sharding; replaces TrainingSampler rank slicing,
    reference my_distributed_sampler.py:58-60)."""
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def sync_processes(name: str = "sync") -> None:
    """Cross-process barrier (replaces detectron2 comm.synchronize,
    reference engine.py:201). No-op in single-process runs."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
