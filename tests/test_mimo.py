"""MIMO end-to-end tests: 2-layer spatial multiplexing, SIMO gains,
precoded transmit (VERDICT r2 item 3).

Reference counterparts: channel_precoder_avx2.cpp, equalize_zf_2x2.cpp,
port_channel_estimator CDM despreading, resource_grid.h:77-192.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_project_23_5_tpu.ops import precoding
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import tbs as tbs_mod


def _cfg(nof_layers, nof_prb=24, qm=4, rate=0.4):
    tbs = tbs_mod.tbs_calculate(14, 36, 0, rate, qm, nof_layers, nof_prb)
    return sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                        nof_layers=nof_layers, dmrs_symbols=(2, 7, 11))


def _awgn(rng, shape, sigma):
    return sigma / np.sqrt(2) * (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex64)


def test_2x2_two_layer_loopback():
    """Both layers decode through a random well-conditioned 2x2 channel."""
    cfg = _cfg(2)
    rng = np.random.default_rng(1)
    tb = jnp.asarray(rng.integers(0, 2, size=cfg.tbs).astype(np.int8))
    grid = sch.pdsch_transmit(
        tb, cfg, jnp.zeros((2, 14, cfg.nof_prb * 12), jnp.complex64),
        encoder_backend="xla")
    # constant-in-frequency 2x2 channel, distinct spatial signatures
    h = np.array([[1.0 + 0.2j, 0.4 - 0.3j],
                  [-0.3 + 0.5j, 0.9 - 0.1j]], np.complex64)
    rx = jnp.einsum("rt,tsk->rsk", h, grid)
    rx = rx + jnp.asarray(_awgn(rng, rx.shape, 0.05))
    res = sch.pusch_receive(rx, cfg, nof_ldpc_iterations=8,
                            decoder_backend="xla")
    assert bool(res.tb_crc_ok)
    np.testing.assert_array_equal(np.asarray(res.tb_bits), np.asarray(tb))


def test_2x2_identity_channel_loopback():
    # same (qm, rate) as the random-channel test: reuses its compiled
    # decoder shape (one fewer large XLA:CPU compile in the suite process)
    cfg = _cfg(2)
    rng = np.random.default_rng(2)
    tb = jnp.asarray(rng.integers(0, 2, size=cfg.tbs).astype(np.int8))
    grid = sch.pdsch_transmit(
        tb, cfg, jnp.zeros((2, 14, cfg.nof_prb * 12), jnp.complex64),
        encoder_backend="xla")
    rx = grid + jnp.asarray(_awgn(rng, grid.shape, 0.03))
    res = sch.pusch_receive(rx, cfg, nof_ldpc_iterations=8,
                            decoder_backend="xla")
    assert bool(res.tb_crc_ok)


def test_simo_sinr_gain():
    """1x2 receive combining beats 1x1 by ~3 dB measured SINR."""
    cfg = _cfg(1)
    rng = np.random.default_rng(3)
    tb = jnp.asarray(rng.integers(0, 2, size=cfg.tbs).astype(np.int8))
    grid = sch.pdsch_transmit(
        tb, cfg, jnp.zeros((14, cfg.nof_prb * 12), jnp.complex64),
        encoder_backend="xla")
    sigma = 0.1
    sinrs = {}
    for nrx in (1, 2, 4):
        rx = jnp.broadcast_to(grid, (nrx, *grid.shape))
        rx = rx + jnp.asarray(_awgn(rng, rx.shape, sigma))
        res = sch.pusch_receive(rx, cfg, nof_ldpc_iterations=6,
                                decoder_backend="xla")
        assert bool(res.tb_crc_ok)
        sinrs[nrx] = float(res.sinr_db)
    assert sinrs[2] > sinrs[1] + 1.5
    assert sinrs[4] > sinrs[2] + 1.5


@pytest.mark.parametrize("pmi", [0, 1, 2, 3])
def test_precoded_single_layer(pmi):
    """1-layer 2-port codebook precoding decodes through a 2x1-combining
    channel (the UE sees the precoded sum)."""
    cfg = _cfg(1, qm=2, rate=0.3)
    rng = np.random.default_rng(4 + pmi)
    tb = jnp.asarray(rng.integers(0, 2, size=cfg.tbs).astype(np.int8))
    w = jnp.asarray(precoding.one_layer_codebook(2, pmi))

    syms_cw = sch._encode_sch(tb, cfg, "xla")
    # transmit the same codeword through the layer-plane path with W
    grid2 = sch.pdsch_transmit(
        tb, cfg, jnp.zeros((14, cfg.nof_prb * 12), jnp.complex64),
        encoder_backend="xla")
    # port planes: plane_p = w[p] * single-layer plane
    port_grids = jnp.stack([w[0, 0] * grid2, w[1, 0] * grid2])
    # channel vector matched to the beam: h = conj(w) → coherent combine
    hvec = jnp.conj(jnp.asarray(w[:, 0]))
    rx = jnp.einsum("t,tsk->sk", hvec, port_grids)
    rx = rx + jnp.asarray(_awgn(rng, rx.shape, 0.05))
    res = sch.pusch_receive(rx[None], cfg, nof_ldpc_iterations=6,
                            decoder_backend="xla")
    assert bool(res.tb_crc_ok)


def test_layer_map_roundtrip():
    rng = np.random.default_rng(7)
    syms = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    lay = precoding.layer_map(syms, 2)
    back = precoding.layer_demap(lay)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(syms))


def test_layer_demap_llr_order():
    """Bit order matches TS 38.211: codeword bit (L*i+l)*qm+q."""
    qm, L, m = 4, 2, 6
    # layer LLRs numbered by their codeword position
    cw = np.arange(L * m * qm, dtype=np.float32)
    lay = np.zeros((L, m * qm), np.float32)
    for i in range(m):
        for l in range(L):
            for q in range(qm):
                lay[l, i * qm + q] = cw[(L * i + l) * qm + q]
    out = precoding.layer_demap_llr(jnp.asarray(lay), qm)
    np.testing.assert_array_equal(np.asarray(out), cw)


def test_4x4_four_layer_loopback():
    """Four spatial layers through a random well-conditioned 4x4 channel
    decode end-to-end: CDM groups 0/1 on both combs, Schur-block n x 4
    ZF (ops/equalizer.zf_nx4), 4-layer (de)mapping."""
    cfg = _cfg(4)
    rng = np.random.default_rng(7)
    tb = jnp.asarray(rng.integers(0, 2, size=cfg.tbs).astype(np.int8))
    grid = sch.pdsch_transmit(
        tb, cfg, jnp.zeros((4, 14, cfg.nof_prb * 12), jnp.complex64),
        encoder_backend="xla")
    # DM-RS combs: layers 0/1 pilots on even SCs, layers 2/3 on odd SCs
    g = np.asarray(grid)
    assert np.abs(g[0, 2, 0::2]).min() > 0 and np.abs(g[0, 2, 1::2]).max() == 0
    assert np.abs(g[2, 2, 1::2]).min() > 0 and np.abs(g[2, 2, 0::2]).max() == 0
    h = np.linalg.qr(rng.standard_normal((4, 4))
                     + 1j * rng.standard_normal((4, 4)))[0].astype(
        np.complex64)              # unitary: well-conditioned, unit power
    rx = jnp.einsum("rt,tsk->rsk", jnp.asarray(h), grid)
    rx = rx + jnp.asarray(_awgn(rng, rx.shape, 0.05))
    res = sch.pusch_receive(rx, cfg, nof_ldpc_iterations=8,
                            decoder_backend="xla")
    assert bool(res.tb_crc_ok)
    np.testing.assert_array_equal(np.asarray(res.tb_bits), np.asarray(tb))
    # unitary channel keeps post-ZF SINR at the per-RE SNR (~26 dB)
    assert abs(float(res.sinr_db) - 26.0) < 2.0, res.sinr_db


def test_6rx_4layer_overdetermined():
    """nrx > nof_layers: the n x 4 solver uses all 6 receive ports and
    beats the square case's post-eq noise."""
    cfg = _cfg(4)
    rng = np.random.default_rng(8)
    tb = jnp.asarray(rng.integers(0, 2, size=cfg.tbs).astype(np.int8))
    grid = sch.pdsch_transmit(
        tb, cfg, jnp.zeros((4, 14, cfg.nof_prb * 12), jnp.complex64),
        encoder_backend="xla")
    h = (rng.standard_normal((6, 4)) + 1j * rng.standard_normal((6, 4))
         ).astype(np.complex64) / np.sqrt(4)
    rx = jnp.einsum("rt,tsk->rsk", jnp.asarray(h), grid)
    rx = rx + jnp.asarray(_awgn(rng, rx.shape, 0.05))
    res = sch.pusch_receive(rx, cfg, nof_ldpc_iterations=8,
                            decoder_backend="xla")
    assert bool(res.tb_crc_ok)
