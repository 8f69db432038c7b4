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


def prach_window_samples(prach_fft: int, cp_samples: int,
                         nof_repetitions: int = 1) -> int:
    return nof_repetitions * prach_fft + cp_samples


# Long preamble formats (TS 38.211 Table 6.3.3.1-1), in T_c units with
# kappa = 64: (subcarrier spacing Hz, sequence repetitions, N_CP * kappa).
# Reference: ofdm_prach_demodulator_impl.cpp:31-113 (16*kappa adjustment
# is the per-0.5ms-boundary CP correction absorbed in these totals).
LONG_FORMATS = {
    "0": (1250.0, 1, 3168 * 64),
    "1": (1250.0, 2, 21024 * 64),
    "2": (1250.0, 4, 4688 * 64),
    "3": (5000.0, 4, 3168 * 64),
}
_TC = 1.0 / (480e3 * 4096)          # 3GPP basic time unit


def long_format_geometry(fmt: str, fs_hz: float) -> tuple[int, int, int]:
    """(prach_fft, nof_repetitions, cp_samples) at carrier rate fs_hz."""
    scs, nrep, cp_tc = LONG_FORMATS[fmt]
    prach_fft = int(round(fs_hz / scs))
    cp = int(round(cp_tc * _TC * fs_hz))
    return prach_fft, nrep, cp


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def demodulate_long(samples: jnp.ndarray, prach_fft: int, length: int,
                    freq_offset_bins: int, cp_samples: int,
                    nof_repetitions: int) -> jnp.ndarray:
    """Repetition-accumulating PRACH demodulation (formats 1/2/3).

    The repeated ZC sequence occupies nof_repetitions back-to-back
    prach_fft windows after the CP; their spectra are coherently averaged
    (+10·log10(nrep) dB processing gain), the reference's per-window
    accumulation loop in one batched FFT.
    """
    body = samples[..., cp_samples:cp_samples
                   + nof_repetitions * prach_fft]
    reps = body.reshape(*body.shape[:-1], nof_repetitions, prach_fft)
    bins = jnp.fft.fft(reps, axis=-1).mean(axis=-2) / prach_fft
    idx = (jnp.arange(length) + freq_offset_bins) % prach_fft
    return bins[..., idx].astype(jnp.complex64)


class PrachWindowAssembler:
    """Multi-slot PRACH window accumulation (the prach_processor_worker
    analogue, lib/phy/lower/processors/uplink/prach/
    prach_processor_worker.cpp): long-format windows (e.g. format 0:
    ~0.9 ms ≫ one 0.5 ms slot at mu=1) span slot boundaries, so per-slot
    baseband chunks are buffered until the window completes, then
    demodulated in one shot.
    """

    def __init__(self, start_sample: int, prach_fft: int, length: int,
                 freq_offset_bins: int, cp_samples: int,
                 nof_repetitions: int = 1) -> None:
        self.start = start_sample
        self.prach_fft = prach_fft
        self.length = length
        self.freq_offset_bins = freq_offset_bins
        self.cp = cp_samples
        self.nrep = nof_repetitions
        self.need = prach_window_samples(prach_fft, cp_samples,
                                         nof_repetitions)
        self._buf: list = []
        self._have = 0
        self._pos = 0               # absolute sample count consumed

    @property
    def ready(self) -> bool:
        return self._have >= self.need

    def feed(self, slot_samples) -> bool:
        """Append one slot's baseband; True once the window is complete."""
        n = int(slot_samples.shape[-1])
        lo, hi = self._pos, self._pos + n
        self._pos = hi
        w0, w1 = self.start, self.start + self.need
        if hi <= w0 or lo >= w1 or self.ready:
            return self.ready
        a = max(lo, w0) - lo
        b = min(hi, w1) - lo
        self._buf.append(slot_samples[..., a:b])
        self._have += b - a
        return self.ready

    def demodulate(self) -> jnp.ndarray:
        assert self.ready, "PRACH window incomplete"
        window = jnp.concatenate(self._buf, axis=-1)
        if self.nrep == 1:
            return demodulate(window, self.prach_fft, self.length,
                              self.freq_offset_bins, self.cp)
        return demodulate_long(window, self.prach_fft, self.length,
                               self.freq_offset_bins, self.cp, self.nrep)
