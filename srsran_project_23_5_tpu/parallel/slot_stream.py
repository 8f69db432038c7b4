"""Slot-axis (time) sharded stream processing — the production consumer
of the ring-halo exchange (SURVEY §2.7-P6; VERDICT r3 next #4).

A baseband stream processed slot-parallel shards the slot axis over the
mesh; windows that straddle a shard boundary (PRACH long formats: a
format-0 window is ~0.9 ms vs the 0.5 ms mu=1 slot; also any filter
lookback) pull their leading samples from the previous shard with ONE
`ppermute` riding ICI — the TPU re-expression of the reference's
contiguous host ring buffer (prach_processor_worker.cpp,
ofdm_prach_demodulator_impl.cpp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..phy.lower import prach_demod
from . import mesh as mesh_lib


def sharded_prach_windows(stream: jnp.ndarray, mesh, start_sample: int,
                          prach_fft: int, length: int,
                          freq_offset_bins: int, cp_samples: int,
                          nof_repetitions: int = 1) -> jnp.ndarray:
    """Demodulate one PRACH occasion per slot shard from a slot-sharded
    baseband stream.

    stream: [nslots, slot_samples] with the slot axis sharded over
    `mesh`'s slot axis (1+ slots per device).  Each slot's occasion
    window BEGINS at `start_sample` relative to its own slot start —
    negative values reach into the previous slot, which is exactly the
    cross-shard case the halo serves.  Returns [nslots, length]
    frequency-domain windows (input to ops.prach.detect), slot-sharded.
    """
    nslots, slot_samples = stream.shape
    need = prach_demod.prach_window_samples(prach_fft, cp_samples,
                                            nof_repetitions)
    halo = max(0, -start_sample)
    assert start_sample + need <= slot_samples, "window exceeds the slot"
    axis = mesh_lib.SLOT_AXIS
    n_shards = mesh.shape[axis]
    assert nslots % n_shards == 0

    def per_shard(x):                       # x: [local_slots, S]
        local = x.shape[0]
        if halo:
            # previous shard's tail serves the first local slot; within
            # the shard, slot i-1's tail serves slot i directly
            flat = x.reshape(-1)
            ext = mesh_lib.halo_from_prev(flat, halo, axis, n_shards)
            windows = [
                jax.lax.dynamic_slice_in_dim(
                    ext, i * slot_samples + halo + start_sample, need)
                for i in range(local)
            ]
        else:
            windows = [x[i, start_sample:start_sample + need]
                       for i in range(local)]
        w = jnp.stack(windows)
        if nof_repetitions == 1:
            return prach_demod.demodulate(w, prach_fft, length,
                                          freq_offset_bins, cp_samples)
        return prach_demod.demodulate_long(w, prach_fft, length,
                                           freq_offset_bins, cp_samples,
                                           nof_repetitions)

    spec = P(axis, None)
    fn = shard_map(per_shard, mesh=mesh, in_specs=spec, out_specs=spec)
    return fn(stream)


def slot_stream_sharding(mesh) -> NamedSharding:
    return NamedSharding(mesh, P(mesh_lib.SLOT_AXIS, None))
