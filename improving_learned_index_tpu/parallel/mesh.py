"""Device mesh construction and sharding helpers.

The reference's only parallelism is NCCL DDP (src/deep_impact/training/trainer.py:183-186)
and single-process DataParallel (src/deep_impact/indexing/indexer.py:25-26).
Here the single mechanism is a ``jax.sharding.Mesh`` with ``data`` and
``model`` axes: gradients psum over the data axis (replacing the DDP
all-reduce), batches shard over ``data`` (replacing DistributedSampler +
DataParallel scatter), and tensor-parallel doc2query decoding shards over
``model``.  All collectives are emitted by XLA from the sharding annotations
and ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig


def make_mesh(config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    model = max(1, config.model)
    if n % model != 0:
        raise ValueError(f"device count {n} not divisible by model axis {model}")
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=config.axis_names)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_put, batch)


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (SURVEY.md §2.7: `jax.distributed.initialize`
    replaces torchrun/NCCL process groups).  On TPU pods all arguments are
    discovered from the environment; pass them explicitly elsewhere.  Call
    once per host before any jax device use; afterwards ``jax.devices()``
    spans the full slice and ``make_mesh`` builds the global mesh."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
