"""SCF builders → translation → bucketed UL production path: an
SCF-speaking MAC drives the SAME fused slot programs and gets identical
results to the processor-config path (fapi_to_phy_translator.cpp ul)."""
import numpy as np

import jax.numpy as jnp

from srsran_project_23_5_tpu.fapi import builders, messages as fapi, scf
from srsran_project_23_5_tpu.phy.upper import pucch, sch, upper_phy
from srsran_project_23_5_tpu.ran import tbs as tbs_mod

NOF_PRB = 36
NSC = NOF_PRB * 12


def test_scf_ul_request_drives_bucketed_path():
    rng = np.random.default_rng(3)
    qm, rate, nof_prb = 2, 0.5, 16
    tbs_bits = tbs_mod.tbs_calculate(14, 36, 0, rate, qm, 1, nof_prb)
    slot = 5

    # --- the SCF-speaking MAC side
    b = builders.UlTtiRequestBuilder(sfn=0, slot=slot)
    (b.add_pusch_pdu()
      .set_basic_parameters(rnti=0x4601)
      .set_bwp_parameters(bwp_size=NOF_PRB, bwp_start=0)
      .set_information_parameters(
          target_code_rate=int(rate * 10240), qam_mod_order=qm,
          mcs_index=5, mcs_table=0, transform_precoding=False,
          nid_pusch=1, num_layers=1)
      .set_dmrs_parameters(
          dmrs_symbol_mask=scf.symbols_to_dmrs_mask((2, 7, 11)),
          dmrs_type=scf.DmrsCfgType.TYPE_1, scrambling_id=1,
          pusch_dmrs_identity=1, nscid=0, num_cdm_grps_no_data=2,
          dmrs_ports=0b1)
      .set_allocation_in_frequency_type_1_parameters(rb_start=0,
                                                     rb_size=nof_prb)
      .set_allocation_in_time_parameters(0, 14)
      .add_optional_pusch_data(rv_index=0, harq_process_id=3,
                               new_data=True,
                               tb_size_bytes=tbs_bits // 8))
    (b.add_pucch_pdu()
      .set_basic_parameters(0x4601, scf.PucchFormatType.F1)
      .set_allocation_in_frequency_parameters(prb_start=NOF_PRB - 1)
      .set_allocation_in_time_parameters(0, 14)
      .set_format1_parameters(initial_cyclic_shift=0)
      .set_uci_bit_lengths(harq_bits=1))
    scf_req = b.build()
    req = scf.ul_tti_to_processor_request(scf_req)
    assert req.pusch_pdus[0].harq_process == 3
    cfg = req.pusch_pdus[0].config
    assert (cfg.rnti, cfg.tbs, cfg.nof_prb) == (0x4601, tbs_bits, nof_prb)

    # --- air: transmit with the translated configs
    tb = rng.integers(0, 2, cfg.tbs).astype(np.int8)
    grid = sch.pusch_transmit(jnp.asarray(tb), cfg,
                              jnp.zeros((14, NSC), jnp.complex64))
    grid = pucch.pucch_f1_transmit(jnp.asarray([1], jnp.int8),
                                   req.pucch_pdus[0].format1, grid)
    noise = 0.02 / np.sqrt(2) * (
        rng.standard_normal((1, 14, NSC))
        + 1j * rng.standard_normal((1, 14, NSC)))
    rx = jnp.asarray((np.asarray(grid)[None] + noise).astype(np.complex64))

    # --- gNB: the SCF-built request through the bucketed programs
    phy = upper_phy.UpperPhy(upper_phy.UpperPhyConfig(nof_prb=NOF_PRB))
    inds = phy.process_ul_slot(rx, req, slot_count=slot)
    crc = [i for i in inds if isinstance(i, fapi.CrcIndication)]
    rxd = [i for i in inds if isinstance(i, fapi.RxDataIndication)]
    uci = [i for i in inds if isinstance(i, fapi.UciIndication)]
    assert len(crc) == 1 and crc[0].tb_crc_ok
    assert crc[0].harq_process == 3
    np.testing.assert_array_equal(rxd[0].payload, tb)
    assert uci and uci[0].detected and uci[0].harq_bits[0] == 1


def test_scf_dl_request_translation():
    """builders DL request -> processor request: PDSCH config and PDCCH
    DCI bit unpacking land where the direct path puts them."""
    b = builders.DlTtiRequestBuilder(sfn=1, slot=2)
    (b.add_pdsch_pdu()
      .set_basic_parameters(rnti=0x4601)
      .set_bwp_parameters(bwp_size=NOF_PRB, bwp_start=0)
      .add_codeword(target_code_rate=5120, qam_mod_order=4, mcs_index=10,
                    mcs_table=0, rv_index=0, tb_size_bytes=100)
      .set_codeword_information_parameters(nid_pdsch=1, num_layers=1)
      .set_dmrs_parameters(
          dmrs_symbol_mask=scf.symbols_to_dmrs_mask((2, 7, 11)),
          dmrs_type=scf.DmrsCfgType.TYPE_1, scrambling_id=1, nscid=0,
          num_cdm_grps_no_data=2, dmrs_ports=0b1)
      .set_pdsch_allocation_in_frequency_type_1(rb_start=4, rb_size=8)
      .set_pdsch_allocation_in_time_parameters(2, 12))
    dci_payload_bits = np.array([1, 0, 1, 1, 0, 1, 0, 0, 1, 1], np.uint8)
    b.add_pdcch_pdu(scf.DlPdcchPdu(
        coreset_bwp_size=NOF_PRB, start_symbol_index=0,
        duration_symbols=1,
        dl_dci=[scf.DlDciPdu(
            rnti=0x4601, cce_index=0, aggregation_level=4,
            payload=np.packbits(dci_payload_bits).tobytes(),
            payload_size_bits=len(dci_payload_bits))]))
    req = scf.dl_tti_to_processor_request(b.build())
    assert req.pdsch_pdus[0].config.tbs == 800
    assert req.pdsch_pdus[0].config.prb_start == 4
    assert req.pdcch_pdus[0].config.payload_size == 10
    np.testing.assert_array_equal(req.pdcch_pdus[0].payload_bits,
                                  dci_payload_bits.astype(np.int8))
