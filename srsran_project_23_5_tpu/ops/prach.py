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

from .devconst import const_c64
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


@functools.lru_cache(maxsize=256)
def restricted_a_cv(length: int, n_cs: int, root: int) -> tuple[int, ...]:
    """Restricted set A cyclic shifts C_v (TS 38.211 §6.3.3.1; reference
    prach_generator_impl.cpp:205-300).

    Doppler-robust shifts: d_u is the cyclic distance a 1-chip Doppler
    offset moves root u's correlation peak; shifts are grouped so a
    preamble and its Doppler images never collide.
    """
    # d_u: u * d ≡ 1 (mod L), folded to < L/2
    d = pow(root, -1, length)
    d_u = d if 2 * d < length else length - d
    if n_cs <= d_u < length / 3:
        n_shift = d_u // n_cs
        d_start = 2 * d_u + n_shift * n_cs
        n_group = length // d_start
        n_shift_bar = max((length - 2 * d_u - n_group * d_start) // n_cs, 0)
    elif length / 3 <= d_u <= (length - n_cs) // 2:
        n_shift = (length - 2 * d_u) // n_cs
        d_start = length - 2 * d_u + n_shift * n_cs
        n_group = d_u // d_start
        n_shift_bar = min(max((d_u - n_group * d_start) // n_cs, 0),
                          n_shift)
    else:
        return ()
    w = n_shift * n_group + n_shift_bar
    return tuple(d_start * (v // n_shift) + (v % n_shift) * n_cs
                 for v in range(w))


def unrestricted_cv(length: int, n_cs: int) -> tuple[int, ...]:
    return tuple(v * n_cs for v in range(num_shifts(length, n_cs)))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def detect_cv(rx_freq: jnp.ndarray, root: int, length: int,
              cvs: tuple[int, ...], win_chips: int, dft_size: int = 2048):
    """Core detector over an explicit cyclic-shift list (C_v tuple).

    Serves both the unrestricted (C_v = v·N_cs) and restricted-set
    windows.  win_chips bounds each preamble's delay search span.
    """
    y = const_c64(root_sequence_freq(root, length))
    corr = rx_freq * jnp.conj(y)
    pad = jnp.zeros((*rx_freq.shape[:-1], dft_size - length), corr.dtype)
    padded = jnp.concatenate([corr, pad], axis=-1)
    td = jnp.fft.ifft(padded, axis=-1)
    pdp = jnp.abs(td) ** 2                        # [..., dft_size]

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
    width = int(round(win_chips * scale))
    width = min(width, dft_size)
    if len(cvs) > 1:
        width = max(width - guard, 1)
    ext = jnp.concatenate([pdp, pdp[..., :width]], axis=-1)
    for cv in cvs:
        begin = (dft_size - int(round(cv * scale))) % dft_size
        win = jax.lax.dynamic_slice_in_dim(ext, begin, width, axis=-1)
        peak = jnp.max(win, axis=-1)
        arg = jnp.argmax(win, axis=-1)
        metrics.append(peak / (noise[..., 0] + 1e-12))
        delays.append(arg.astype(jnp.float32) / scale)
    rssi = jnp.mean(jnp.abs(rx_freq) ** 2, axis=-1)
    return (jnp.stack(metrics, axis=-1), jnp.stack(delays, axis=-1), rssi)


def detect(rx_freq: jnp.ndarray, root: int, length: int, n_cs: int,
           dft_size: int = 2048, restricted_set: str = "unrestricted"):
    """Detect preambles in a received frequency-domain PRACH window.

    rx_freq: [..., length] complex64 (one PRACH occasion per leading index).
    restricted_set: "unrestricted" | "type_a".
    Returns (metric [..., n_shifts], delay_samples [..., n_shifts],
    rssi [...]): per-preamble peak-to-noise metric and time-of-arrival in
    ZC-chip units; threshold upstream (reference uses a fixed margin).
    """
    if restricted_set == "type_a":
        cvs = restricted_a_cv(length, n_cs, root)
        assert cvs, f"no restricted-A shifts for root {root}, N_cs {n_cs}"
    else:
        cvs = unrestricted_cv(length, n_cs)
    win = n_cs if n_cs else length
    return detect_cv(rx_freq, root, length, cvs, win, dft_size)


def generate_cv(root: int, cv: int, length: int) -> np.ndarray:
    """Freq-domain preamble for an explicit cyclic shift C_v."""
    y = root_sequence_freq(root, length)
    k = np.arange(length)
    return (y * np.exp(2j * np.pi * cv * k / length)).astype(np.complex64)
