"""Device mesh and sharding helpers.

The reference parallelizes with Lightning DDP over NCCL (exp_base.py:197-198);
the TPU-native equivalent is a single ``jax.sharding.Mesh`` with a ``data``
axis (pure DP, gradients all-reduced over ICI by XLA) plus an optional
``model`` axis for tensor-parallel extensions.  Multi-host runs initialize
``jax.distributed`` and shard the global batch per process.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """jax.distributed.initialize() when launched multi-host (DCN).

    Must run BEFORE any backend use — so the already-initialized check reads
    jax's distributed client state instead of calling ``jax.process_count()``
    (which would initialize a single-process backend and break the
    coordination handshake).
    """
    if not os.environ.get("OFD_COORDINATOR"):
        return
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return  # already initialized
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=os.environ["OFD_COORDINATOR"],
        num_processes=int(os.environ.get("OFD_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("OFD_PROCESS_ID", "0")),
    )


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """DP x SP: batch over ``data``, image height over ``model``.

    For NHWC image batches; under pjit the XLA SPMD partitioner inserts the
    conv halo exchanges and attention collectives automatically (SURVEY.md
    §5 long-context plan: spatial sharding is the full-res Sintel scaling
    lever — the reference has no equivalent, its largest parallelism is
    DDP).
    """
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Device-put a host batch with leading-dim sharding over `data`
    (``spatial=True`` additionally shards dim 1 — NHWC height — over
    ``model``; non-image leaves with <3 dims stay data-sharded only).

    Multi-process: each host holds its per-host slice of the global batch
    (the loader shards the dataset by ``jax.process_index()``), assembled
    into one global jax.Array — the DistributedSampler-equivalent
    (reference exp_base.py:135-169 + DDP).
    """
    data_sh = data_sharding(mesh)
    sp_sh = spatial_sharding(mesh) if spatial else data_sh

    def sh_for(x):
        return sp_sh if (spatial and np.ndim(x) >= 3) else data_sh

    if jax.process_count() > 1:
        nproc = jax.process_count()

        def put(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * nproc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sh_for(x), x, global_shape
            )

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh_for(x)), batch
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


__all__ = [
    "make_mesh", "data_sharding", "spatial_sharding", "replicated",
    "shard_batch",
    "maybe_init_distributed", "is_main_process", "DATA_AXIS", "MODEL_AXIS",
]
