"""Bucketed fused UL slot programs (VERDICT r4 next #4 / weak #5).

A mixed-traffic run — many slots, varied PDU mixes drawn from the
scheduler's grant buckets — must compile O(buckets) fused programs, not
O(PDUs): the per-PDU jitted calls are retired, every slot is ONE
dispatch, and the results stay bit-identical to the legacy per-PDU path
(upper_phy_factories.cpp:108-127 is the reference's single production
path over arbitrary mixes).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsran_project_23_5_tpu.fapi import messages as fapi
from srsran_project_23_5_tpu.phy.upper import pucch, sch, upper_phy

NOF_PRB = 36
NSC = NOF_PRB * 12


def _sh(rnti, prb_start, nof_prb, qm=2, rate=0.5):
    from srsran_project_23_5_tpu.ran import tbs as tbs_mod
    bits = tbs_mod.tbs_calculate(14, 36, 0, rate, qm, 1, nof_prb)
    return sch.ShConfig(rnti=rnti, tbs=bits, qm=qm, prb_start=prb_start,
                        nof_prb=nof_prb, dmrs_symbols=(2, 7, 11))


def _tx_slot(rng, pdus, f1_cfgs, acks):
    grid = jnp.zeros((14, NSC), jnp.complex64)
    tbs = []
    for pdu in pdus:
        tb = rng.integers(0, 2, pdu.config.tbs).astype(np.int8)
        tbs.append(tb)
        grid = sch.pusch_transmit(jnp.asarray(tb), pdu.config, grid)
    for cfg, ack in zip(f1_cfgs, acks):
        grid = pucch.pucch_f1_transmit(
            jnp.asarray([ack], jnp.int8), cfg, grid)
    noise = 0.02 / np.sqrt(2) * (
        rng.standard_normal((1, 14, NSC))
        + 1j * rng.standard_normal((1, 14, NSC)))
    return (jnp.asarray((np.asarray(grid)[None] + noise)
                        .astype(np.complex64)), tbs)


def test_mixed_traffic_compiles_o_buckets_programs():
    rng = np.random.default_rng(0)
    phy = upper_phy.UpperPhy(upper_phy.UpperPhyConfig(nof_prb=NOF_PRB))
    # two grant buckets (8 and 16 PRB), rotating rnti/start/payloads —
    # the traffic varies every slot, the SIGNATURES cycle over 3 shapes
    bucket_a = [_sh(0x10, 0, 8), _sh(0x11, 8, 8)]
    bucket_b = [_sh(0x12, 16, 16)]
    f1 = pucch.PucchF1Config(prb=NOF_PRB - 1, nof_harq_bits=1)

    nof_pusch_done = 0
    for slot in range(9):
        if slot % 3 == 0:
            cfgs, f1s = bucket_a, [f1]
        elif slot % 3 == 1:
            cfgs, f1s = bucket_b, []
        else:
            cfgs, f1s = bucket_a + bucket_b, [f1]
        pdus = [fapi.PuschPdu(c, harq_process=slot % 8) for c in cfgs]
        req = fapi.UlTtiRequest(
            0, slot, pusch_pdus=pdus,
            pucch_pdus=[fapi.PucchPdu(format1=c) for c in f1s])
        rx, tbs = _tx_slot(rng, pdus, f1s, [1] * len(f1s))
        inds = phy.process_ul_slot(rx, req, slot_count=slot)
        crc = [i for i in inds if isinstance(i, fapi.CrcIndication)]
        rxd = [i for i in inds if isinstance(i, fapi.RxDataIndication)]
        assert len(crc) == len(pdus) and all(c.tb_crc_ok for c in crc)
        assert len(rxd) == len(pdus)
        for ind, tb in zip(rxd, tbs):
            np.testing.assert_array_equal(ind.payload, tb)
        for i in inds:
            if isinstance(i, fapi.UciIndication) and i.harq_bits is not None:
                assert i.detected and i.harq_bits[0] == 1
        nof_pusch_done += len(pdus)

    # 9 slots x up-to-3 PDUs processed through THREE compiled programs
    assert nof_pusch_done == 18
    assert phy.ul_programs.nof_compiled == 3, phy.ul_programs.nof_compiled


def test_fused_matches_legacy_per_pdu_path():
    """Same slot through bucketed and legacy paths: identical verdicts,
    payloads, SINRs (the 'one PHY' guarantee)."""
    rng = np.random.default_rng(1)
    cfgs = [_sh(0x20, 0, 8), _sh(0x21, 8, 16, qm=4, rate=0.4)]
    pdus = [fapi.PuschPdu(c) for c in cfgs]
    req = fapi.UlTtiRequest(0, 0, pusch_pdus=pdus)
    rx, tbs = _tx_slot(rng, pdus, [], [])

    outs = []
    for bucketed in (True, False):
        phy = upper_phy.UpperPhy(
            upper_phy.UpperPhyConfig(nof_prb=NOF_PRB, bucketed=bucketed))
        inds = phy.process_ul_slot(rx, req, slot_count=0)
        crc = [i for i in inds if isinstance(i, fapi.CrcIndication)]
        rxd = [i for i in inds if isinstance(i, fapi.RxDataIndication)]
        outs.append((crc, rxd))
    (crc_b, rxd_b), (crc_l, rxd_l) = outs
    assert [c.tb_crc_ok for c in crc_b] == [c.tb_crc_ok for c in crc_l]
    for b, l in zip(rxd_b, rxd_l):
        np.testing.assert_array_equal(b.payload, l.payload)
    for b, l in zip(crc_b, crc_l):
        assert abs(b.sinr_db - l.sinr_db) < 1e-3
