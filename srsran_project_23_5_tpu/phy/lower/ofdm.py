"""OFDM slot modulation/demodulation (TS 38.211 §5.3, §5.4).

TPU-idiomatic lower PHY: a whole slot of symbols is transformed in one
jitted program — batched IFFT/FFT over [port, symbol, nfft] plus static
concatenations for cyclic prefixes — instead of the reference's
symbol-at-a-time loop (lib/phy/lower/modulation/ofdm_modulator_impl.cpp:55-138,
ofdm_demodulator_impl.cpp:40-128).  Phase compensation follows TS 38.211
§5.4 (the reference's phase_compensation_lut.h) and is exact for any center
frequency.

Grid frequency convention: grid[..., sc] with sc in [0, nsc); subcarrier
sc maps to centered frequency index sc - nsc/2 (negative frequencies land
in the upper half of the FFT input, as in ofdm_modulator_impl.cpp:82-86).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ran import numerology
from ...ran.constants import MAX_NSYMB_PER_SLOT


def _grid_to_bins(grid: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """[..., nsc] → [..., nfft] with DC-centered mapping."""
    nsc = grid.shape[-1]
    half = nsc // 2
    pos = grid[..., half:]              # freqs 0 .. half-1
    neg = grid[..., :half]              # freqs -half .. -1
    pad = jnp.zeros((*grid.shape[:-1], nfft - nsc), dtype=grid.dtype)
    return jnp.concatenate([pos, pad, neg], axis=-1)


def _bins_to_grid(bins: jnp.ndarray, nsc: int) -> jnp.ndarray:
    half = nsc // 2
    pos = bins[..., :half]
    neg = bins[..., -half:]
    return jnp.concatenate([neg, pos], axis=-1)


def _symbol_starts(mu: int, nfft: int, slot_in_subframe: int) -> np.ndarray:
    cps = numerology.cp_lengths(mu, nfft, slot_in_subframe)
    starts = np.zeros(MAX_NSYMB_PER_SLOT, dtype=np.int64)
    acc = 0
    for l in range(MAX_NSYMB_PER_SLOT):
        starts[l] = acc
        acc += int(cps[l]) + nfft
    return starts


def phase_compensation(mu: int, nfft: int, slot_in_subframe: int,
                       center_freq_hz: float) -> np.ndarray:
    """Per-symbol phase factor e^{-j 2π f_c t_start(l)} (TS 38.211 §5.4)."""
    fs = numerology.sample_rate_hz(mu, nfft)
    cps = numerology.cp_lengths(mu, nfft, slot_in_subframe)
    starts = _symbol_starts(mu, nfft, slot_in_subframe)
    t_start = (starts + cps) / fs  # symbol body start times (after CP)
    # exact modular phase: f_c * t mod 1
    phase = np.mod(center_freq_hz * t_start, 1.0)
    return np.exp(-2j * np.pi * phase).astype(np.complex64)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def modulate_slot(grid: jnp.ndarray, mu: int, nfft: int,
                  slot_in_subframe: int = 0,
                  center_freq_hz: float = 0.0) -> jnp.ndarray:
    """OFDM-modulate one slot.

    grid: [..., 14, nsc] complex64 resource grid (any leading batch/port
    dims).  Returns baseband [..., slot_samples] complex64 at the carrier's
    sample rate, scaled so a unit-power grid yields unit-power subcarrier
    amplitudes (s[n] = Σ_k a_k e^{j2πkn/N}, matching the reference's DFT
    convention before its amplitude controller).
    """
    nsym = grid.shape[-2]
    assert nsym == MAX_NSYMB_PER_SLOT
    bins = _grid_to_bins(grid, nfft)
    time = jnp.fft.ifft(bins, axis=-1).astype(jnp.complex64) * nfft
    comp = jnp.asarray(
        phase_compensation(mu, nfft, slot_in_subframe, center_freq_hz))
    time = time * comp[..., :, None]
    cps = numerology.cp_lengths(mu, nfft, slot_in_subframe)
    pieces = []
    for l in range(nsym):
        sym = time[..., l, :]
        cp = sym[..., nfft - int(cps[l]):]
        pieces.append(jnp.concatenate([cp, sym], axis=-1))
    return jnp.concatenate(pieces, axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def demodulate_slot(samples: jnp.ndarray, nsc: int, mu: int, nfft: int,
                    slot_in_subframe: int = 0,
                    center_freq_hz: float = 0.0,
                    rx_window_offset: float = 0.0) -> jnp.ndarray:
    """Inverse of modulate_slot: [..., slot_samples] → [..., 14, nsc].

    rx_window_offset ∈ [0, 1): fraction of each symbol's cyclic prefix by
    which the demodulation window is ADVANCED into the CP (the reference's
    optional rx-to-tx offset compensation,
    ofdm_demodulator_impl.cpp:60-75,121-128).  Advancing by a_l samples
    turns the body into a circular shift x[(n−a_l) mod N], so each FFT bin
    k picks up e^{−j2πk a_l/N}; the per-(symbol, bin) phasor below undoes
    it exactly.  The margin buys ISI robustness: channel taps with delay
    up to (1−offset)·CP stay inside the (shifted) window.
    """
    cps = numerology.cp_lengths(mu, nfft, slot_in_subframe)
    starts = _symbol_starts(mu, nfft, slot_in_subframe)
    adv = np.asarray([int(rx_window_offset * int(cps[l]))
                      for l in range(MAX_NSYMB_PER_SLOT)], np.int64)
    syms = []
    for l in range(MAX_NSYMB_PER_SLOT):
        begin = int(starts[l]) + int(cps[l]) - int(adv[l])
        syms.append(samples[..., begin:begin + nfft])
    time = jnp.stack(syms, axis=-2)
    comp = jnp.asarray(
        phase_compensation(mu, nfft, slot_in_subframe, center_freq_hz))
    time = time * jnp.conj(comp)[..., :, None]
    bins = jnp.fft.fft(time, axis=-1).astype(jnp.complex64) / nfft
    if rx_window_offset:
        k = np.arange(nfft)
        win = np.exp(2j * np.pi * adv[:, None] * k[None, :] / nfft
                     ).astype(np.complex64)
        bins = bins * jnp.asarray(win)
    return _bins_to_grid(bins, nsc)
