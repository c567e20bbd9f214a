"""Device-mesh utilities.

The framework's parallelism model (new capability vs the single-device
reference — SURVEY.md §2c): one ``jax.sharding.Mesh`` threaded through index
build and query. Single-chip is simply the mesh of size 1 — no separate code
path. The corpus axis shards vector rows across ICI; model axes (dp/tp) are
defined in ``crs_tpu.models.sharding`` for the LLM stack.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["corpus_mesh", "shard_rows", "replicate"]


def corpus_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "corpus",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 1-D mesh over available devices (or the first ``num_devices``)."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_rows(arr: jax.Array, mesh: Mesh, axis_name: str = "corpus") -> jax.Array:
    """Shard the leading (row) axis of an array across the mesh."""
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(arr: jax.Array, mesh: Mesh) -> jax.Array:
    """Replicate an array on every device of the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P()))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host (DCN) initialization via ``jax.distributed.initialize``.

    The DCN tier from SURVEY.md §5: on a multi-host pod slice each host calls
    this before building meshes; ``jax.devices()`` then spans all hosts and
    the same mesh/sharding code runs unchanged (collectives ride ICI within
    a slice and DCN across). On a single host this is a no-op returning 1.

    Args default to the standard env-based auto-detection (GKE/TPU-VM set the
    coordinator env vars); returns the process count.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        import os

        if "COORDINATOR_ADDRESS" not in os.environ and "JAX_COORDINATOR_ADDRESS" not in os.environ:
            return 1  # single host — nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()
