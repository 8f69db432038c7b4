"""End-to-end slice: PDSCH TX → OFDM → channel → OFDM demod → PUSCH-style RX.

This is the framework's "minimum end-to-end model" (SURVEY.md §7 step 5):
the full transmit chain produces a slot grid, the lower PHY modulates it to
baseband, an AWGN (or flat-fading) channel perturbs it, and the receive
chain recovers the transport block, checking CRC and SINR estimates.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_project_23_5_tpu.ops import modulation
from srsran_project_23_5_tpu.phy.lower import ofdm
from srsran_project_23_5_tpu.phy.upper import sch


def _small_cfg(qm=2, tbs=1608, nof_prb=24):
    return sch.ShConfig(
        rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
        dmrs_symbols=(2, 7, 11), dmrs_cdm_groups_without_data=2)


def test_ofdm_mod_demod_identity():
    rng = np.random.default_rng(0)
    nsc, nfft, mu = 288, 512, 1
    grid = (rng.standard_normal((2, 14, nsc)) +
            1j * rng.standard_normal((2, 14, nsc))).astype(np.complex64)
    bb = ofdm.modulate_slot(jnp.asarray(grid), mu, nfft)
    out = ofdm.demodulate_slot(bb, nsc, mu, nfft)
    assert np.allclose(np.asarray(out), grid, atol=1e-4)


def test_ofdm_phase_compensation_roundtrip():
    rng = np.random.default_rng(1)
    nsc, nfft, mu = 288, 512, 1
    fc = 3.5e9
    grid = (rng.standard_normal((14, nsc)) +
            1j * rng.standard_normal((14, nsc))).astype(np.complex64)
    bb = ofdm.modulate_slot(jnp.asarray(grid), mu, nfft, 0, fc)
    out = ofdm.demodulate_slot(bb, nsc, mu, nfft, 0, fc)
    assert np.allclose(np.asarray(out), grid, atol=1e-3)
    # different fc on rx must NOT match (compensation is real)
    out_wrong = ofdm.demodulate_slot(bb, nsc, mu, nfft, 0, fc + 7.5e3)
    assert not np.allclose(np.asarray(out_wrong), grid, atol=1e-3)


def test_ofdm_cp_makes_delay_tolerable():
    # A delay shorter than the CP must appear as a pure per-subcarrier
    # phase rotation (no ISI): demod(delay(mod(grid))) has |.| ≈ |grid|.
    rng = np.random.default_rng(2)
    nsc, nfft, mu = 144, 256, 1
    grid = np.exp(2j * np.pi * rng.random((14, nsc))).astype(np.complex64)
    bb = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), mu, nfft))
    delay = 5  # < CP (18 samples at nfft=256)
    delayed = np.concatenate([np.zeros(delay, np.complex64), bb[:-delay]])
    out = np.asarray(ofdm.demodulate_slot(jnp.asarray(delayed), nsc, mu, nfft))
    assert np.allclose(np.abs(out), np.abs(grid), atol=5e-2)


@pytest.mark.parametrize("qm,snr_db", [(2, 8.0), (4, 14.0)])
def test_grid_loopback_awgn(qm, snr_db):
    """TX grid → AWGN at RE level → RX chain recovers the TB."""
    rng = np.random.default_rng(3)
    cfg = _small_cfg(qm=qm)
    tb = rng.integers(0, 2, size=cfg.tbs).astype(np.int8)
    nsc = cfg.nof_prb * 12
    grid = jnp.zeros((14, nsc), dtype=jnp.complex64)
    grid = sch.pdsch_transmit(jnp.asarray(tb), cfg, grid)
    sigma = 10 ** (-snr_db / 20)
    noise = sigma / np.sqrt(2) * (
        rng.standard_normal((1, 14, nsc)) + 1j * rng.standard_normal((1, 14, nsc)))
    rx = grid[None] + jnp.asarray(noise.astype(np.complex64))
    res = sch.pusch_receive(rx, cfg, nof_ldpc_iterations=8)
    assert bool(res.tb_crc_ok)
    assert np.array_equal(np.asarray(res.tb_bits), tb)
    est_snr = float(res.sinr_db)
    assert abs(est_snr - snr_db) < 3.0, est_snr


def test_full_ofdm_loopback_with_fading():
    """TB → grid → OFDM → flat channel + AWGN → OFDM demod → TB."""
    rng = np.random.default_rng(4)
    cfg = _small_cfg(qm=4, tbs=3624)
    tb = rng.integers(0, 2, size=cfg.tbs).astype(np.int8)
    nsc = cfg.nof_prb * 12
    nfft, mu = 512, 1
    grid = jnp.zeros((14, nsc), dtype=jnp.complex64)
    grid = sch.pdsch_transmit(jnp.asarray(tb), cfg, grid)
    bb = ofdm.modulate_slot(grid, mu, nfft)
    # flat complex channel gain + AWGN at 20 dB (relative to RE power ~1;
    # time-domain noise scales by sqrt(nsc/nfft) after FFT)
    h = np.complex64(0.8 * np.exp(1j * 0.7))
    snr_db = 20.0
    sigma_re = 10 ** (-snr_db / 20)
    sigma_t = sigma_re * np.sqrt(nsc) / nfft  # fft scales noise by 1/nfft... measured below
    bb_np = np.asarray(bb)
    noise = (rng.standard_normal(bb_np.shape) + 1j * rng.standard_normal(bb_np.shape))
    rx_bb = h * bb_np + (sigma_t / np.sqrt(2)) * noise.astype(np.complex64) * nfft / np.sqrt(nfft)
    rx_grid = ofdm.demodulate_slot(jnp.asarray(rx_bb.astype(np.complex64)), nsc, mu, nfft)
    res = sch.pusch_receive(rx_grid[None], cfg, nof_ldpc_iterations=8)
    assert bool(res.tb_crc_ok)
    assert np.array_equal(np.asarray(res.tb_bits), tb)


def test_pusch_fails_cleanly_on_garbage():
    rng = np.random.default_rng(5)
    cfg = _small_cfg()
    nsc = cfg.nof_prb * 12
    rx = jnp.asarray((rng.standard_normal((1, 14, nsc)) +
                      1j * rng.standard_normal((1, 14, nsc))).astype(np.complex64))
    res = sch.pusch_receive(rx, cfg, nof_ldpc_iterations=4)
    assert not bool(res.tb_crc_ok)
