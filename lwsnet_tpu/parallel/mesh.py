"""Device mesh + sharding utilities for data-parallel training.

The reference has no distributed support at all (reference: train.py:52 pins
one GPU). This module is new design (SURVEY.md §2.3, §5.8): a 1-D (or 2-D
data x spatial) mesh over all chips, batch inputs sharded on `data`, state
replicated. Gradient all-reduce and global batch-norm statistics fall out of
XLA's GSPMD partitioner — no hand-written collectives on the compute path.

Multi-host: call `jax.distributed.initialize()` once per host before building
the mesh (`maybe_initialize_distributed`); `jax.devices()` then spans all
hosts and the same code runs unchanged, with each host feeding its local
shard of the batch via `jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lwsnet_tpu.config import MeshConfig


def maybe_initialize_distributed() -> None:
    """Initialize JAX's multi-host runtime when launched under a multi-host
    coordinator (no-op in single-process runs).

    MUST run before any other call that touches the JAX backend
    (`jax.devices()`, `jax.process_count()`, any computation): the first
    backend touch initializes a single-process runtime and a later
    `jax.distributed.initialize()` cannot fix it. The launch-mode decision
    here therefore reads ONLY environment variables; idempotence is checked
    against `jax.distributed.global_state` (plain module state, no backend
    touch)."""
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return  # single-process launch
    from jax._src import distributed as _distributed
    if _distributed.is_initialized():
        return  # already initialized
    jax.distributed.initialize()


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[list] = None) -> Mesh:
    """Build a (data, spatial) mesh. data axis defaults to all devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // cfg.spatial_parallel
    sp = cfg.spatial_parallel
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, (cfg.data_axis, cfg.spatial_axis))


def batch_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Images/GT: batch on `data`, rows on `spatial` (if used)."""
    return NamedSharding(mesh, P(cfg.data_axis, cfg.spatial_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, cfg: MeshConfig = MeshConfig()) -> Any:
    """Device-put a host-local batch pytree with batch sharded on `data`
    and, when the mesh has a non-trivial `spatial` axis, image rows (dim 1
    of any rank>=3 array) sharded on `spatial` — GSPMD inserts the conv halo
    exchanges; the full-res refinement stage is the intended beneficiary
    (SURVEY.md §2.3: spatial sharding is new design, absent in the
    reference).

    Single-process: a plain sharded device_put. Multi-host: assembles the
    global array from per-process local shards.
    """
    spatial = (cfg.spatial_axis
               if dict(zip(mesh.axis_names, mesh.devices.shape)).get(
                   cfg.spatial_axis, 1) > 1 else None)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 3:  # (B, H, ...) images / GT: rows on `spatial`
            spec = P(cfg.data_axis, spatial, *([None] * (x.ndim - 2)))
        elif x.ndim >= 1:
            spec = P(cfg.data_axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        s = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(s, x)
        return jax.device_put(x, s)

    return jax.tree.map(put, tree)


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Replicate a state pytree across the mesh."""
    return jax.device_put(state, replicated(mesh))
