"""VRB→PRB interleaved mapping (TS 38.211 §7.3.1.6;
vrb_to_prb_mapper.cpp)."""
import numpy as np

import jax.numpy as jnp

from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import vrb_prb


def test_permutation_bijective_nontrivial():
    for n in (24, 51, 52, 106, 273):
        m = vrb_prb.interleaved_vrb_to_prb(n, 2)
        assert sorted(m.tolist()) == list(range(n))
        assert not np.array_equal(m, np.arange(n))
        inv = vrb_prb.prb_to_vrb(n, 2)
        assert np.array_equal(m[inv], np.arange(n))
        # last (possibly short) bundle maps to itself
        nb = -(-n // 2)
        assert m[(nb - 1) * 2] == (nb - 1) * 2


def test_interleaved_pdsch_loopback():
    rng = np.random.default_rng(0)
    kw = dict(rnti=0x4601, tbs=4096, qm=4, nof_prb=52,
              dmrs_symbols=(2, 7, 11))
    cfg_i = sch.ShConfig(**kw, vrb_to_prb_interleaved=True)
    cfg_n = sch.ShConfig(**kw)
    tb = jnp.asarray(rng.integers(0, 2, size=4096).astype(np.int8))
    z = jnp.zeros((14, 624), jnp.complex64)
    g_i = sch.pdsch_transmit(tb, cfg_i, z, encoder_backend="xla")
    g_n = sch.pdsch_transmit(tb, cfg_n, z, encoder_backend="xla")
    # the grids differ (REs moved) but carry identical total energy
    assert not np.allclose(np.asarray(g_i), np.asarray(g_n))
    np.testing.assert_allclose(np.abs(np.asarray(g_i)).sum(),
                               np.abs(np.asarray(g_n)).sum(), rtol=1e-5)
    nz = 0.03 / np.sqrt(2) * (
        rng.standard_normal((14, 624))
        + 1j * rng.standard_normal((14, 624))).astype(np.complex64)
    rx = g_i + jnp.asarray(nz)
    r = sch.pusch_receive(rx, cfg_i, 6, decoder_backend="xla")
    assert bool(r.tb_crc_ok)
    assert np.array_equal(np.asarray(r.tb_bits), np.asarray(tb))
    # a receiver that skips the de-interleave must NOT decode
    r2 = sch.pusch_receive(rx, cfg_n, 6, decoder_backend="xla")
    assert not bool(r2.tb_crc_ok)
