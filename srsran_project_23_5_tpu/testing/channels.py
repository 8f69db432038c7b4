"""Baseband channel emulation for loopback tests and benches.

The reference's receiver conformance runs against MATLAB-generated TDL
fading vectors (tests/unittests/phy/upper/channel_processors vectortests,
port_channel_estimator_average_impl.cpp:97-225 is tuned on them).  This
module provides the in-framework analogue: deterministic multi-tap
(TDL-like) channels applied at baseband with static integer-sample tap
delays — slice-structured (pad + shift + scale), no dynamic rolls, so XLA
fuses the whole channel into the surrounding OFDM program.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize_taps(delays, gains_db):
    """(delays, power-normalized linear gains) from dB tap profiles."""
    g = 10.0 ** (np.asarray(gains_db, np.float64) / 20.0)
    g = g / np.sqrt(np.sum(g ** 2))
    return tuple(int(d) for d in delays), tuple(float(x) for x in g)


def tdl_apply(x: jnp.ndarray, delays, gains) -> jnp.ndarray:
    """y[n] = Σ_k g_k · x[n − d_k] over the last axis with STATIC shifts.

    Gains may be real or complex scalars; delays are integer samples.
    Empty taps ⇒ identity (frequency-flat).
    """
    out = None
    for d, g in zip(delays, gains):
        if d == 0:
            t = x
        else:
            pad = jnp.zeros((*x.shape[:-1], d), x.dtype)
            t = jnp.concatenate([pad, x[..., :-d]], axis=-1)
        out = g * t if out is None else out + g * t
    return out if out is not None else x
