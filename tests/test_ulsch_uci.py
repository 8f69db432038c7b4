"""UL-SCH demultiplex + UCI-on-PUSCH loopback (TS 38.212 §6.2.7).

Mirrors the reference's pusch_processor UCI path
(lib/phy/upper/channel_processors/ulsch_demultiplex_impl.cpp,
pusch_processor_impl.cpp:259-279): one PUSCH carries data + HARQ-ACK +
CSI part 1 and all three must decode.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from srsran_project_23_5_tpu.phy.upper import sch, ulsch


def _cfg(qm=4, nof_prb=24, o_ack=2, o_csi1=4, csi2=0):
    tbs = 3824
    g_ack = 12 * qm
    uci = ulsch.UciOnPusch(
        nof_harq_ack_bits=o_ack,
        nof_csi_part1_bits=o_csi1,
        nof_csi_part2_bits=csi2,
        g_harq_ack=g_ack if o_ack else 0,
        g_harq_ack_rvd=g_ack if o_ack and o_ack <= 2 else 0,
        g_csi_part1=32 * qm if o_csi1 else 0,
        g_csi_part2=16 * qm if csi2 else 0,
    )
    return sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                        dmrs_symbols=(2, 7, 11), uci=uci)


def test_demux_positions_partition():
    """Every codeword bit belongs to exactly one field; G_sch accounts for
    punctured (reserved) positions."""
    cfg = _cfg()
    maps = cfg.uci_maps
    u = cfg.uci
    assert len(maps["ack"]) == u.g_harq_ack
    assert len(maps["csi1"]) == u.g_csi_part1
    total = maps["total_bits"]
    assert total == cfg.nof_bits
    # stream positions partition exactly
    owned = np.concatenate([m[m >= 0] for m in
                            (maps["sch"], maps["ack"], maps["csi1"],
                             maps["csi2"])])
    assert len(owned) == total
    assert len(np.unique(owned)) == total
    # reserved ACK punctures SCH: sch has exactly g_ack -1 sentinels
    assert int((maps["sch"] < 0).sum()) == u.g_harq_ack_rvd


def test_mux_demux_roundtrip():
    """multiplex → demultiplex recovers each field bit-exactly (LLR sign)."""
    cfg = _cfg()
    maps = cfg.uci_maps
    rng = np.random.default_rng(1)
    g_sch = cfg.g_sch
    sch_bits = jnp.asarray(rng.integers(0, 2, g_sch).astype(np.int8))
    ack = jnp.asarray(rng.integers(0, 2, len(maps["ack"])).astype(np.int8))
    csi1 = jnp.asarray(rng.integers(0, 2, len(maps["csi1"])).astype(np.int8))
    cw = ulsch.multiplex(sch_bits, ack, csi1, jnp.zeros((0,), jnp.int8),
                         cfg.uci_maps_key)
    llr = 1.0 - 2.0 * np.asarray(cw, np.float32)
    s_llr, a_llr, c1_llr, _ = ulsch.demultiplex(jnp.asarray(llr), maps)
    np.testing.assert_array_equal(np.asarray(a_llr) < 0, np.asarray(ack) == 1)
    np.testing.assert_array_equal(np.asarray(c1_llr) < 0,
                                  np.asarray(csi1) == 1)
    # non-punctured SCH positions round-trip; punctured read exactly 0
    s = np.asarray(s_llr)
    punct = np.asarray(maps["sch"]) < 0
    np.testing.assert_array_equal(s[punct], 0.0)
    np.testing.assert_array_equal(s[~punct] < 0,
                                  np.asarray(sch_bits)[~punct] == 1)


@pytest.mark.parametrize("o_ack,o_csi1", [(2, 4), (1, 0), (2, 0), (0, 7)])
def test_uci_on_pusch_loopback(o_ack, o_csi1):
    """Data + ACK + CSI1 all decode through the full PUSCH chain with
    noise (pusch_processor_impl.cpp:259-279 semantics)."""
    cfg = _cfg(o_ack=o_ack, o_csi1=o_csi1)
    rng = np.random.default_rng(2)
    tb = jnp.asarray(rng.integers(0, 2, cfg.tbs).astype(np.int8))
    ack = jnp.asarray(rng.integers(0, 2, max(o_ack, 1)).astype(np.int8))
    csi1 = jnp.asarray(rng.integers(0, 2, max(o_csi1, 1)).astype(np.int8))

    grid = jnp.zeros((14, cfg.nof_prb * 12), dtype=jnp.complex64)
    grid = sch.pusch_transmit(tb, cfg, grid,
                              ack_bits=ack if o_ack else None,
                              csi1_bits=csi1 if o_csi1 else None)
    noise = (rng.standard_normal(grid.shape) +
             1j * rng.standard_normal(grid.shape)).astype(np.complex64)
    rx = grid + 0.02 * jnp.asarray(noise)

    res = sch.pusch_receive(rx[None], cfg, nof_ldpc_iterations=8)
    assert bool(res.tb_crc_ok), "data TB failed"
    np.testing.assert_array_equal(np.asarray(res.tb_bits)[:cfg.tbs],
                                  np.asarray(tb))
    if o_ack:
        assert bool(res.ack_valid)
        np.testing.assert_array_equal(np.asarray(res.ack_bits),
                                      np.asarray(ack))
    if o_csi1:
        assert bool(res.csi1_valid)
        np.testing.assert_array_equal(np.asarray(res.csi1_bits),
                                      np.asarray(csi1))


def test_uci_encoded_bits_formula():
    """§6.3.2.4 Q' derivation: beta scales, alpha caps."""
    g = ulsch.uci_encoded_bits(o_uci=2, crc_bits=0, beta=2.0, alpha=0.5,
                               sum_kr=1000, m_uci_sc=500, qm=2)
    assert g == 2 * 2  # ceil(2*2.0*500/1000)=2 REs * Qm
    g_cap = ulsch.uci_encoded_bits(o_uci=11, crc_bits=6, beta=100.0,
                                   alpha=0.1, sum_kr=100, m_uci_sc=100, qm=2)
    assert g_cap == 10 * 2  # alpha cap: ceil(0.1*100)=10 REs
