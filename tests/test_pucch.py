"""PUCCH F1/F2 loopback tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_23_5_tpu.phy.upper import pucch


def _noisy(grid, snr_db, rng, nrx=1):
    g = np.asarray(grid)
    sigma = 10 ** (-snr_db / 20)
    out = np.stack([g for _ in range(nrx)])
    noise = sigma / np.sqrt(2) * (
        rng.standard_normal(out.shape) + 1j * rng.standard_normal(out.shape))
    return jnp.asarray((out + noise).astype(np.complex64))


@pytest.mark.parametrize("nof_bits,bits", [(1, [0]), (1, [1]), (2, [1, 0]),
                                           (2, [0, 1])])
def test_pucch_f1_roundtrip(nof_bits, bits):
    rng = np.random.default_rng(0)
    cfg = pucch.PucchF1Config(prb=3, nof_symbols=14, initial_cyclic_shift=5,
                              occ_index=1, n_id=17, nof_harq_bits=nof_bits)
    grid = jnp.zeros((14, 12 * 6), dtype=jnp.complex64)
    grid = pucch.pucch_f1_transmit(jnp.asarray(bits, dtype=jnp.int8), cfg, grid)
    rx = _noisy(grid, 5.0, rng)
    res = pucch.pucch_f1_detect(rx, cfg)
    assert bool(res.detected)
    assert np.array_equal(np.asarray(res.bits).ravel()[:nof_bits], bits)


def test_pucch_f1_dtx():
    rng = np.random.default_rng(1)
    cfg = pucch.PucchF1Config(prb=3, nof_symbols=14, nof_harq_bits=1)
    rx = _noisy(jnp.zeros((14, 72), dtype=jnp.complex64), 0.0, rng)
    res = pucch.pucch_f1_detect(rx, cfg)
    assert not bool(res.detected)


def test_pucch_f1_occ_separates_users():
    """Two users on same PRB with different OCC indices must not collide."""
    rng = np.random.default_rng(2)
    cfg_a = pucch.PucchF1Config(prb=0, nof_symbols=14, occ_index=0,
                                nof_harq_bits=1)
    cfg_b = pucch.PucchF1Config(prb=0, nof_symbols=14, occ_index=3,
                                nof_harq_bits=1)
    grid = jnp.zeros((14, 12), dtype=jnp.complex64)
    grid = pucch.pucch_f1_transmit(jnp.asarray([1], dtype=jnp.int8), cfg_a, grid)
    # user b transmits on top with its own OCC
    gb = jnp.zeros((14, 12), dtype=jnp.complex64)
    gb = pucch.pucch_f1_transmit(jnp.asarray([0], dtype=jnp.int8), cfg_b, gb)
    combined = grid + gb
    rx = _noisy(combined, 15.0, rng)
    res_a = pucch.pucch_f1_detect(rx, cfg_a)
    res_b = pucch.pucch_f1_detect(rx, cfg_b)
    assert int(np.asarray(res_a.bits).ravel()[0]) == 1
    assert int(np.asarray(res_b.bits).ravel()[0]) == 0


@pytest.mark.parametrize("k", [3, 7, 11])
def test_pucch_f2_roundtrip(k):
    rng = np.random.default_rng(3)
    cfg = pucch.PucchF2Config(prb_start=2, nof_prb=4, start_symbol=12,
                              nof_symbols=2, rnti=0x1234, nof_uci_bits=k)
    bits = rng.integers(0, 2, size=k).astype(np.int8)
    grid = jnp.zeros((14, 12 * 10), dtype=jnp.complex64)
    grid = pucch.pucch_f2_transmit(jnp.asarray(bits), cfg, grid)
    rx = _noisy(grid, 10.0, rng, nrx=2)
    res = pucch.pucch_f2_receive(rx, cfg)
    assert bool(res.detected)
    assert np.array_equal(np.asarray(res.uci_bits), bits)
