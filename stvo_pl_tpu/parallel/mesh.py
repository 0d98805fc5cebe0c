"""Device mesh construction and sharding helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize the multi-host runtime (the reference has no communication
    backend at all, SURVEY.md §2.4; here XLA collectives over ICI/DCN are
    the NCCL equivalent).  No-op when already initialized or single-host
    with no coordinator configured."""
    import jax
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # single-host / already initialized


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a [data, model] mesh over the available devices.

    n_data defaults to len(devices) // n_model.  For multi-host runs call
    `jax.distributed.initialize()` first; `jax.devices()` then spans hosts
    and the data axis rides DCN across hosts, ICI within a slice.
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    arr = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
