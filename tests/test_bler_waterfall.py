"""BLER waterfall tests at real operating points (VERDICT r2 item 2).

The reference's acceptance mechanism is vector tests with BLER/EVM
tolerances (pusch_processor_vectortest.cpp).  Here each MCS bucket runs
the FULL loopback chain — PDSCH TX → OFDM → calibrated AWGN → OFDM demod →
LS estimation from noisy DM-RS → ZF → max-log demap → LDPC decode — and
asserts the BLER cliff sits where it was characterized (52 PRB, 8 slots
per point; empirical cliffs: QPSK r0.3 ≈ +0.5 dB, 16QAM r0.5 ≈ +8 dB,
64QAM r0.65 ≈ +15.5 dB — 2.5-3.5 dB above Shannon for the MCS, a sane
implementation margin).  A shifted cliff ⇒ receiver fidelity regression.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_project_23_5_tpu.models import gnb_flagship
from srsran_project_23_5_tpu.phy.lower import ofdm
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import numerology, tbs as tbs_mod
from srsran_project_23_5_tpu.testing import channels

N_SLOTS = 8


def _carrier(qm, rate, nof_prb=52):
    tbs = tbs_mod.tbs_calculate(14, 36, 0, rate, qm, 1, nof_prb)
    return gnb_flagship.CarrierConfig(
        mu=1, nfft=numerology.min_nfft(nof_prb), nof_prb=nof_prb,
        sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                        dmrs_symbols=(2, 7, 11)))


def _bler_step(cfg):
    ss = numerology.slot_num_samples(cfg.mu, cfg.nfft)

    def slot(tb, key, sigma):
        bb = gnb_flagship.tx_slot(tb, cfg)
        nz = sigma / np.sqrt(2) * jax.random.normal(key, (2, ss), jnp.float32)
        g = ofdm.demodulate_slot(bb + jax.lax.complex(nz[0], nz[1]),
                                 cfg.nsc, cfg.mu, cfg.nfft)
        res = sch.pusch_receive(g[None], cfg.sh, 8, decoder_backend="xla")
        return res.tb_crc_ok, res.sinr_db

    return jax.jit(jax.vmap(slot, in_axes=(0, 0, None)))


def _run(step, cfg, snr_db, seed):
    rng = np.random.default_rng(seed)
    tb = jnp.asarray(
        rng.integers(0, 2, size=(N_SLOTS, cfg.sh.tbs)).astype(np.int8))
    sigma = float(np.sqrt(cfg.nfft) * 10 ** (-snr_db / 20))
    keys = jax.random.split(jax.random.PRNGKey(seed), N_SLOTS)
    ok, sinr = step(tb, keys, sigma)
    return np.asarray(ok), np.asarray(sinr)


# (qm, rate, empirical cliff SNR in dB — characterized 2026-08, r3)
# 64QAM (the bench operating point) runs in the default tier; the other
# MCS cliffs ride the slow tier.
MCS_CLIFFS = [pytest.param(2, 0.3, 0.5, marks=pytest.mark.slow),
              pytest.param(4, 0.5, 8.0, marks=pytest.mark.slow),
              (6, 0.65, 15.5)]


@pytest.mark.parametrize("qm,rate,cliff", MCS_CLIFFS)
def test_waterfall_cliff(qm, rate, cliff):
    cfg = _carrier(qm, rate)
    step = _bler_step(cfg)
    ok_below, _ = _run(step, cfg, cliff - 2.0, seed=qm * 100 + 1)
    ok_above, _ = _run(step, cfg, cliff + 1.0, seed=qm * 100 + 2)
    ok_clear, sinr = _run(step, cfg, cliff + 2.5, seed=qm * 100 + 3)
    assert ok_below.mean() <= 0.25, (
        f"decodes {ok_below.mean():.2f} at {cliff - 2} dB — cliff moved "
        f"down (noise calibration broken?)")
    assert ok_above.mean() >= 0.75, (
        f"only {ok_above.mean():.2f} decode at {cliff + 1} dB — receiver "
        f"fidelity regressed")
    assert ok_clear.all(), f"failures persist at {cliff + 2.5} dB"
    # measured post-eq SINR tracks the injected channel SNR
    assert abs(float(sinr.mean()) - (cliff + 2.5)) < 2.0


def test_sinr_calibration_high_snr():
    """Stated channel SNR == receiver-measured SINR (±1 dB) at 25 dB."""
    cfg = _carrier(6, 0.65)
    step = _bler_step(cfg)
    ok, sinr = _run(step, cfg, 25.0, seed=7)
    assert ok.all()
    assert abs(float(sinr.mean()) - 25.0) < 1.0


# ---------------------------------------------------------------------------
# frequency-selective operating point (VERDICT r4 next #5): same chain
# through a deterministic 3-tap channel applied at BASEBAND — per-RE |H|
# varies by ~8 dB across the allocation, so the LS estimator's frequency
# interpolation and the per-RE ZF/noise weighting are load-bearing, and
# the demod window rides the CP margin (rx_window_offset).
TDL_DELAYS, TDL_GAINS = channels.normalize_taps((0, 12, 30),
                                                (0.0, -8.0, -16.0))


def _tdl_step(cfg):
    ss = numerology.slot_num_samples(cfg.mu, cfg.nfft)

    def slot(tb, key, sigma):
        bb = gnb_flagship.tx_slot(tb, cfg)
        rx = channels.tdl_apply(bb, TDL_DELAYS, TDL_GAINS)
        nz = sigma / np.sqrt(2) * jax.random.normal(key, (2, ss), jnp.float32)
        g = ofdm.demodulate_slot(rx + jax.lax.complex(nz[0], nz[1]),
                                 cfg.nsc, cfg.mu, cfg.nfft,
                                 rx_window_offset=0.25)
        res = sch.pusch_receive(g[None], cfg.sh, 8, decoder_backend="xla")
        return res.tb_crc_ok, res.sinr_db

    return jax.jit(jax.vmap(slot, in_axes=(0, 0, None)))


def test_waterfall_selective_channel():
    """16QAM r0.5 under the 3-tap channel: the cliff sits ≈1 dB above the
    flat-channel 8 dB point (characterized 2026-08 r5: 8.0 dB → 0/8
    decode, 9.0 dB → 8/8; the per-RE noise weighting keeps the selective
    penalty at ~1 dB while measured post-eq SINR runs ~2 dB below the
    injected SNR).  A regression in the estimator's frequency
    interpolation or the per-RE equalization collapses the clear point."""
    cliff = 9.0
    cfg = _carrier(4, 0.5)
    step = _tdl_step(cfg)
    ok_below, _ = _run(step, cfg, cliff - 2.0, seed=411)
    ok_clear, sinr = _run(step, cfg, cliff + 2.0, seed=412)
    assert ok_below.mean() <= 0.25, (
        f"decodes {ok_below.mean():.2f} at {cliff - 2.0} dB under delay "
        f"spread — selective penalty vanished (channel not applied?)")
    assert ok_clear.all(), (
        f"failures at {cliff + 2.0} dB under delay spread — estimator "
        f"frequency-interpolation / per-RE equalization regressed")
    # measured post-eq SINR reflects the selective loss (~2 dB)
    assert (cliff - 1.5) < float(sinr.mean()) < (cliff + 1.5), sinr.mean()
