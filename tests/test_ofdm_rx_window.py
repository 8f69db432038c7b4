"""OFDM demodulator rx-window offset compensation (VERDICT r4 weak #8:
ofdm_demodulator_impl.cpp:60-75,121-128).

The demodulation window is advanced a fraction of each CP into the cyclic
prefix and the induced per-bin phase rotation is compensated exactly.
The margin buys ISI robustness: a channel tap delayed by up to
(1-offset)*CP stays inside every shifted window, so a delayed path that
would otherwise smear symbol boundaries demodulates cleanly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_project_23_5_tpu.phy.lower import ofdm

MU, NFFT, NSC = 1, 1024, 52 * 12


def _random_grid(seed, nsym=14):
    rng = np.random.default_rng(seed)
    g = (rng.standard_normal((nsym, NSC)) + 1j * rng.standard_normal(
        (nsym, NSC))) / np.sqrt(2)
    return jnp.asarray(g.astype(np.complex64))


@pytest.mark.parametrize("offset", [0.25, 0.5, 0.8])
def test_rx_window_offset_exact_roundtrip(offset):
    """With no channel, the advanced+compensated window is EXACT: the CP
    makes the early window a circular shift, and the per-(symbol, bin)
    phasor undoes it to float precision."""
    grid = _random_grid(0)
    bb = ofdm.modulate_slot(grid, MU, NFFT)
    out = ofdm.demodulate_slot(bb, NSC, MU, NFFT,
                               rx_window_offset=offset)
    np.testing.assert_allclose(np.asarray(out), np.asarray(grid),
                               atol=2e-4)


def test_rx_window_offset_absorbs_early_arrival():
    """A signal arriving EARLY (negative timing error — the case the CP
    cannot absorb) leaks the NEXT symbol's cyclic prefix into the tail of
    every zero-offset window; advancing the window half a CP puts the
    boundary back inside the margin.  The compensated output is then the
    clean linear-phase ramp e^{+j2πkd/N} of the timing shift, which the
    channel estimator's TA loop measures (ops/estimator.py)."""
    grid = _random_grid(1)
    bb = np.asarray(ofdm.modulate_slot(grid, MU, NFFT))
    d = 30  # early arrival, < floor(0.5 * CP72) = 36 advanced samples
    early = np.concatenate([bb[d:], np.zeros(d, np.complex64)])

    k = np.arange(NSC) - NSC // 2
    ramp = np.exp(2j * np.pi * k * d / NFFT).astype(np.complex64)

    def rel_err(out):
        e = np.abs(np.asarray(out) * np.conj(ramp)[None, :]
                   - np.asarray(grid))
        return float(np.mean(e ** 2))

    clean = rel_err(ofdm.demodulate_slot(
        jnp.asarray(early), NSC, MU, NFFT, rx_window_offset=0.5))
    isi = rel_err(ofdm.demodulate_slot(
        jnp.asarray(early), NSC, MU, NFFT))
    assert clean < 1e-7, clean
    assert isi > 100 * max(clean, 1e-12), (isi, clean)


def test_rx_window_zero_offset_unchanged():
    """offset=0 is bit-identical to the historical demodulator path."""
    grid = _random_grid(2)
    bb = ofdm.modulate_slot(grid, MU, NFFT)
    a = ofdm.demodulate_slot(bb, NSC, MU, NFFT)
    b = ofdm.demodulate_slot(bb, NSC, MU, NFFT, rx_window_offset=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
