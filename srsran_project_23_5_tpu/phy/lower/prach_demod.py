"""OFDM PRACH demodulator: baseband window → frequency-domain preamble.

Counterpart of ofdm_prach_demodulator_impl
(lib/phy/lower/modulation/ofdm_prach_demodulator_impl.cpp:31-113): the
PRACH occupies its own numerology (1.25 kHz long formats / 15·2^mu kHz
short formats); a window of the carrier baseband is DFT'd at the PRACH
FFT size and the L_RA preamble bins are extracted at the configured
frequency offset.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def demodulate(samples: jnp.ndarray, prach_fft: int, length: int,
               freq_offset_bins: int, cp_samples: int) -> jnp.ndarray:
    """Extract the frequency-domain PRACH window.

    samples: [..., cp_samples + prach_fft] baseband at the PRACH sample
    rate (callers decimate/slice the carrier baseband; with the carrier fs
    an integer multiple of prach_scs*prach_fft no resampling is needed —
    prach_fft = fs / prach_scs).
    freq_offset_bins: first preamble subcarrier relative to DC.
    Returns [..., length] complex64 (input to ops.prach.detect).
    """
    body = samples[..., cp_samples:cp_samples + prach_fft]
    bins = jnp.fft.fft(body, axis=-1) / prach_fft
    idx = (jnp.arange(length) + freq_offset_bins) % prach_fft
    return bins[..., idx].astype(jnp.complex64)


def prach_window_samples(prach_fft: int, cp_samples: int) -> int:
    return prach_fft + cp_samples
