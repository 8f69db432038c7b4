"""Upper PHY orchestration: FAPI slot requests through DL+UL with HARQ."""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_23_5_tpu.fapi import messages as fapi
from srsran_project_23_5_tpu.ops import precoding, prach as prach_ops
from srsran_project_23_5_tpu.phy.upper import csi_rs, pucch, sch, upper_phy
from srsran_project_23_5_tpu.phy.upper.ssb import SsbConfig
from srsran_project_23_5_tpu.phy.upper.pdcch import PdcchConfig


def _phy(nof_prb=24):
    return upper_phy.UpperPhy(upper_phy.UpperPhyConfig(nof_prb=nof_prb))


def test_dl_slot_assembly_with_all_pdus():
    rng = np.random.default_rng(0)
    phy = _phy(nof_prb=52)
    sh = sch.ShConfig(rnti=0x100, tbs=1608, qm=2, prb_start=30, nof_prb=20,
                      dmrs_symbols=(2, 7, 11))
    req = fapi.DlTtiRequest(
        sfn=0, slot=0,
        ssb_pdus=[fapi.SsbPdu(SsbConfig(pci=7), rng.integers(0, 2, 32).astype(np.int8), 12)],
        pdcch_pdus=[fapi.PdcchPdu(
            PdcchConfig(rnti=0x100, payload_size=30, aggregation_level=2,
                        coreset_start_prb=0, start_symbol=0),
            rng.integers(0, 2, 30).astype(np.int8))],
        pdsch_pdus=[fapi.PdschPdu(sh)],
    )
    tb = rng.integers(0, 2, sh.tbs).astype(np.int8)
    data = fapi.TxDataRequest(0, 0, [tb])
    grid = phy.process_dl_slot(req, data)
    g = np.asarray(grid)
    assert g.shape == (14, 52 * 12)
    assert (np.abs(g) > 0).sum() > 1000  # all three channels present


def test_ul_slot_pusch_harq_retransmission():
    """First TX at hopeless SNR fails; retransmission combines and passes."""
    rng = np.random.default_rng(1)
    phy = _phy(nof_prb=24)
    sh = sch.ShConfig(rnti=0x200, tbs=1608, qm=2, nof_prb=24,
                      dmrs_symbols=(2, 7, 11))
    tb = rng.integers(0, 2, sh.tbs).astype(np.int8)
    clean = sch.pdsch_transmit(jnp.asarray(tb), sh,
                               jnp.zeros((14, 288), jnp.complex64))

    def rx_at(snr_db, seed):
        r = np.random.default_rng(seed)
        sigma = 10 ** (-snr_db / 20)
        noise = sigma / np.sqrt(2) * (r.standard_normal((1, 14, 288))
                                      + 1j * r.standard_normal((1, 14, 288)))
        return jnp.asarray((np.asarray(clean)[None] + noise).astype(np.complex64))

    req1 = fapi.UlTtiRequest(0, 0, pusch_pdus=[
        fapi.PuschPdu(sh, harq_process=3, new_data=True)])
    out1 = phy.process_ul_slot(rx_at(-2.0, 10), req1, slot_count=0)
    crc1 = [o for o in out1 if isinstance(o, fapi.CrcIndication)][0]
    assert not crc1.tb_crc_ok
    assert len(phy.softbuffers) == 1

    # Retransmission at the same bad SNR: combining doubles the energy.
    req2 = fapi.UlTtiRequest(0, 1, pusch_pdus=[
        fapi.PuschPdu(sh, harq_process=3, new_data=False)])
    out2 = phy.process_ul_slot(rx_at(-2.0, 11), req2, slot_count=1)
    crc2 = [o for o in out2 if isinstance(o, fapi.CrcIndication)][0]
    assert crc2.tb_crc_ok
    rx = [o for o in out2 if isinstance(o, fapi.RxDataIndication)][0]
    assert np.array_equal(rx.payload, tb)
    assert len(phy.softbuffers) == 0  # released on CRC pass


def test_ul_slot_pucch_and_prach():
    rng = np.random.default_rng(2)
    phy = _phy(nof_prb=24)
    f1 = pucch.PucchF1Config(prb=0, nof_symbols=14, nof_harq_bits=1)
    grid = pucch.pucch_f1_transmit(jnp.asarray([1], dtype=jnp.int8), f1,
                                   jnp.zeros((14, 288), jnp.complex64))
    noise = 0.1 * (rng.standard_normal((1, 14, 288))
                   + 1j * rng.standard_normal((1, 14, 288)))
    rx = jnp.asarray((np.asarray(grid)[None] + noise).astype(np.complex64))
    tx_pre = prach_ops.generate(11, 4, 839, 13)
    prach_rx = jnp.asarray((tx_pre + 0.05 * (
        rng.standard_normal(839) + 1j * rng.standard_normal(839))
        ).astype(np.complex64)[None])
    req = fapi.UlTtiRequest(
        0, 2, prach_pdus=[fapi.PrachPdu(root_sequence_index=11)],
        pucch_pdus=[fapi.PucchPdu(format1=f1)])
    out = phy.process_ul_slot(rx, req, slot_count=2, prach_rx=prach_rx)
    uci = [o for o in out if isinstance(o, fapi.UciIndication)][0]
    assert uci.detected and uci.harq_bits.ravel()[0] == 1
    rach = [o for o in out if isinstance(o, fapi.RachIndication)][0]
    assert [p[0] for p in rach.preambles] == [4]


def test_softbuffer_expiry():
    pool = upper_phy.SoftbufferPool(expiry_slots=5)
    pool.combine(1, 0, jnp.zeros((1, 100)), True, slot_count=0)
    assert len(pool) == 1
    pool.run_slot(4)
    assert len(pool) == 1
    pool.run_slot(5)
    assert len(pool) == 0


# ---------------------------------------------------------------- precoding
def test_layer_map_roundtrip():
    rng = np.random.default_rng(3)
    s = jnp.asarray((rng.standard_normal(24) + 1j * rng.standard_normal(24)
                     ).astype(np.complex64))
    layers = precoding.layer_map(s, 4)
    assert layers.shape == (4, 6)
    back = precoding.layer_demap(layers)
    assert np.allclose(np.asarray(back), np.asarray(s))


def test_precoding_shapes_and_power():
    rng = np.random.default_rng(4)
    layers = jnp.asarray((rng.standard_normal((2, 50))
                          + 1j * rng.standard_normal((2, 50))).astype(np.complex64))
    w = precoding.identity_precoder(4, 2)
    out = precoding.apply_precoding(layers, jnp.asarray(w))
    assert out.shape == (4, 50)
    w2 = precoding.one_layer_codebook(2, 1)
    assert np.allclose(np.abs(w2), 1 / np.sqrt(2))


# ---------------------------------------------------------------- CSI-RS
def test_csi_rs_generation():
    cfg = csi_rs.CsiRsConfig(row=1, nof_prb=10, symbol=4)
    grid = csi_rs.generate(cfg, jnp.zeros((14, 120), jnp.complex64))
    g = np.asarray(grid)
    occupied = np.abs(g[4]) > 0
    assert occupied.sum() == 30  # density 3 * 10 PRB
    assert not (np.abs(g[np.arange(14) != 4]) > 0).any()
    cfg2 = csi_rs.CsiRsConfig(row=2, nof_prb=10, symbol=4, subcarrier_offset=3)
    g2 = np.asarray(csi_rs.generate(cfg2, jnp.zeros((14, 120), jnp.complex64)))
    assert (np.abs(g2[4]) > 0).sum() == 10
