"""Amplitude control: gain + soft clipping with statistics.

Counterpart of amplitude_controller_clipping_impl
(lib/phy/lower/amplitude_controller/amplitude_controller_clipping_impl.h:24-44).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class AmplitudeStats:
    mean_power_dbfs: jnp.ndarray
    peak_power_dbfs: jnp.ndarray
    papr_db: jnp.ndarray
    clipped_ratio: jnp.ndarray


def control(samples: jnp.ndarray, gain_db: float = 0.0,
            enable_clipping: bool = False, ceiling_dbfs: float = 0.0
            ) -> tuple[jnp.ndarray, AmplitudeStats]:
    """Apply gain and optional magnitude clipping; report stats."""
    gain = 10.0 ** (gain_db / 20.0)
    out = samples * gain
    power = jnp.abs(out) ** 2
    mean_p = jnp.mean(power)
    peak_p = jnp.max(power)
    ceiling = 10.0 ** (ceiling_dbfs / 10.0)
    if enable_clipping:
        mag = jnp.sqrt(jnp.maximum(power, 1e-30))
        limit = jnp.sqrt(ceiling)
        scale = jnp.minimum(1.0, limit / mag)
        clipped = jnp.mean((mag > limit).astype(jnp.float32))
        out = out * scale
    else:
        clipped = jnp.float32(0)
    stats = AmplitudeStats(
        mean_power_dbfs=10.0 * jnp.log10(jnp.maximum(mean_p, 1e-30)),
        peak_power_dbfs=10.0 * jnp.log10(jnp.maximum(peak_p, 1e-30)),
        papr_db=10.0 * jnp.log10(jnp.maximum(peak_p / jnp.maximum(mean_p, 1e-30), 1.0)),
        clipped_ratio=clipped)
    return out, stats
