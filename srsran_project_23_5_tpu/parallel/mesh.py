"""Device mesh and sharding layout for multi-carrier/multi-slot scale-out.

Re-expresses the reference's parallelism strategies (SURVEY.md §2.7) the
TPU way: instead of per-cell processor pools and executor threads
(downlink_processor_pool_impl.cpp, apps/gnb/gnb.cpp:160-370), carriers and
slot batches are leading array dimensions sharded over a
`jax.sharding.Mesh`; XLA inserts ICI collectives where cross-shard data
movement is needed.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CARRIER_AXIS = "carrier"


def make_mesh(n_devices: int | None = None,
              devices: list | None = None) -> Mesh:
    """1-D mesh over the carrier axis (the natural RAN scale-out unit)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CARRIER_AXIS,))


def carrier_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (carrier) dim, replicate the rest."""
    return NamedSharding(mesh, P(CARRIER_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
