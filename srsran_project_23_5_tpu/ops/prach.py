"""PRACH preamble generation and detection (TS 38.211 §6.3.3).

Generator: frequency-domain Zadoff-Chu preambles y_{u,v} (long 839 and
short 139 formats), precomputed per root on the host (the 839-point DFT is
a one-time constant), matching prach_generator_impl.cpp:205-300.

Detector: the reference's frequency-domain correlation
(prach_detector_simple_impl.cpp:35-110) re-expressed as batched device
ops: conj-multiply against the root sequence, zero-padded IDFT to a
power-of-two (sidestepping the non-power-of-two 839-point transform the
reference needs FFTW for), power-delay profile, and a windowed max per
cyclic-shift hypothesis — all preambles of a root evaluated in parallel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sequences import zadoff_chu


@functools.lru_cache(maxsize=256)
def root_sequence_freq(root: int, length: int) -> np.ndarray:
    """Frequency-domain ZC preamble y_u = DFT(x_u), unit average power."""
    x = zadoff_chu(root, length)
    return (np.fft.fft(x) / np.sqrt(length)).astype(np.complex64)


def num_shifts(length: int, n_cs: int) -> int:
    """Number of cyclic-shift preambles per root (unrestricted set).

    N_cs = 0 ⇒ single preamble per root (TS 38.211 §6.3.3.1)."""
    return 1 if n_cs == 0 else length // n_cs


def generate(root: int, shift_idx: int, length: int, n_cs: int) -> np.ndarray:
    """Freq-domain preamble for cyclic shift v (host constant).

    Time shift by C_v = v*N_cs ⇔ frequency-domain phase ramp.
    """
    y = root_sequence_freq(root, length)
    cv = shift_idx * n_cs
    k = np.arange(length)
    return (y * np.exp(2j * np.pi * cv * k / length)).astype(np.complex64)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def detect(rx_freq: jnp.ndarray, root: int, length: int, n_cs: int,
           dft_size: int = 2048):
    """Detect preambles in a received frequency-domain PRACH window.

    rx_freq: [..., length] complex64 (one PRACH occasion per leading index).
    Returns (metric [..., n_shifts], delay_samples [..., n_shifts],
    rssi [...]): per-preamble peak-to-noise metric and time-of-arrival in
    ZC-chip units; threshold upstream (reference uses a fixed margin).
    """
    y = jnp.asarray(root_sequence_freq(root, length))
    corr = rx_freq * jnp.conj(y)
    pad = jnp.zeros((*rx_freq.shape[:-1], dft_size - length), corr.dtype)
    padded = jnp.concatenate([corr, pad], axis=-1)
    td = jnp.fft.ifft(padded, axis=-1)
    pdp = jnp.abs(td) ** 2                        # [..., dft_size]

    n_sh = num_shifts(length, n_cs)
    win_chips = n_cs if n_cs else length
    scale = dft_size / length                     # samples per ZC chip
    noise = jnp.mean(pdp, axis=-1, keepdims=True)

    # The spec preamble x_u((n + C_v) mod L) advances the sequence, so the
    # correlation peak of shift v with propagation delay d chips lands at
    # sample (d - C_v)*scale mod D: window v starts at D - C_v*scale and
    # delay grows toward larger sample index.
    metrics, delays = [], []
    # Trailing guard: interpolation sidelobes (~-13 dB, up to ~1.5 chips
    # wide from the zero-padded IDFT) of a zero-delay peak in window v+1
    # spill into the tail of window v; delays there are ≥ N_cs-2 chips
    # (beyond the usable TA range) so exclude the last 2 chips.
    guard = int(np.ceil(2 * scale))
    for v in range(n_sh):
        begin = (dft_size - int(round(v * n_cs * scale))) % dft_size
        width = int(round(win_chips * scale))
        width = min(width, dft_size)
        if n_sh > 1:
            width = max(width - guard, 1)
        win = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([pdp, pdp[..., :width]], axis=-1),
            begin, width, axis=-1)
        peak = jnp.max(win, axis=-1)
        arg = jnp.argmax(win, axis=-1)
        metrics.append(peak / (noise[..., 0] + 1e-12))
        delays.append(arg.astype(jnp.float32) / scale)
    rssi = jnp.mean(jnp.abs(rx_freq) ** 2, axis=-1)
    return (jnp.stack(metrics, axis=-1), jnp.stack(delays, axis=-1), rssi)
