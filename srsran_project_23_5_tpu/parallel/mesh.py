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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CARRIER_AXIS = "carrier"
SLOT_AXIS = "slot"


def make_mesh(n_devices: int | None = None,
              devices: list | None = None) -> Mesh:
    """1-D mesh over the carrier axis (the natural RAN scale-out unit)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CARRIER_AXIS,))


def make_mesh_2d(n_slot: int, n_carrier: int,
                 devices: list | None = None) -> Mesh:
    """2-D ("slot", "carrier") mesh: carriers scale across one axis, the
    slot/time batch across the other (SURVEY §2.7-P6: the time axis is the
    RAN analogue of sequence parallelism; shards exchange boundary-sample
    halos over ICI instead of overlapping reads)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_slot * n_carrier]).reshape(
        n_slot, n_carrier)
    return Mesh(devices, (SLOT_AXIS, CARRIER_AXIS))


def carrier_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (carrier) dim, replicate the rest."""
    return NamedSharding(mesh, P(CARRIER_AXIS))


def slot_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (slot-batch) dim."""
    return NamedSharding(mesh, P(SLOT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def halo_from_prev(x: jnp.ndarray, halo: int, axis_name: str,
                   axis_size: int) -> jnp.ndarray:
    """Ring halo exchange along a sharded slot/time axis (inside
    shard_map): prepend the PREVIOUS shard's trailing `halo` samples to
    this shard's sample axis (first shard receives the last shard's tail —
    callers treat the stream as circular or mask shard 0).

    The RAN use case is a PRACH/filter window that starts near the end of
    slot-shard i-1 and completes in shard i
    (ofdm_prach_demodulator_impl.cpp window accumulation; the reference
    reads a contiguous host ring buffer instead).  One `ppermute` rides
    ICI; no gather, no host round trip.
    """
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    tail = x[..., -halo:]
    prev_tail = jax.lax.ppermute(tail, axis_name, perm)
    return jnp.concatenate([prev_tail, x], axis=-1)
