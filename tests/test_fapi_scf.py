"""SCF full-surface PDUs + builders + processor translation."""
import numpy as np
import pytest

from srsran_project_23_5_tpu.fapi import builders, scf
from srsran_project_23_5_tpu.phy.upper.pucch import (PucchF1Config,
                                                     PucchF2Config)
from srsran_project_23_5_tpu.phy.upper.sch import ShConfig


def test_dmrs_mask_roundtrip():
    for syms in [(2, 7, 11), (0,), (2, 11), ()]:
        assert scf.dmrs_mask_to_symbols(
            scf.symbols_to_dmrs_mask(syms)) == syms


def test_pdsch_builder_translates_to_processor_config():
    b = builders.DlTtiRequestBuilder(sfn=12, slot=3)
    (b.add_pdsch_pdu()
      .set_basic_parameters(rnti=0x4601)
      .set_bwp_parameters(bwp_size=106, bwp_start=0)
      .add_codeword(target_code_rate=6580, qam_mod_order=6, mcs_index=20,
                    mcs_table=0, rv_index=0, tb_size_bytes=1000)
      .set_codeword_information_parameters(nid_pdsch=1, num_layers=1)
      .set_dmrs_parameters(
          dmrs_symbol_mask=scf.symbols_to_dmrs_mask((2, 7, 11)),
          dmrs_type=scf.DmrsCfgType.TYPE_1, scrambling_id=1, nscid=0,
          num_cdm_grps_no_data=2, dmrs_ports=0b1)
      .set_pdsch_allocation_in_frequency_type_1(rb_start=10, rb_size=52)
      .set_pdsch_allocation_in_time_parameters(2, 12))
    req = b.build()
    cfg = scf.pdsch_to_config(req.pdsch_pdus[0], slot_in_frame=3)
    ref = ShConfig(rnti=0x4601, tbs=8000, qm=6, rv=0, nof_layers=1,
                   prb_start=10, nof_prb=52, first_symbol=2,
                   nof_symbols=12, dmrs_symbols=(2, 7, 11),
                   dmrs_cdm_groups_without_data=2, nid=1, nid_dmrs=1,
                   n_scid=0, slot_in_frame=3)
    assert cfg == ref


def test_pusch_builder_with_uci_g_computation():
    b = builders.UlTtiRequestBuilder(sfn=0, slot=9)
    (b.add_pusch_pdu()
      .set_basic_parameters(rnti=0x4602)
      .set_bwp_parameters(bwp_size=106, bwp_start=0)
      .set_information_parameters(target_code_rate=3080, qam_mod_order=4,
                                  mcs_index=10, mcs_table=0,
                                  transform_precoding=False, nid_pusch=1,
                                  num_layers=1)
      .set_dmrs_parameters(
          dmrs_symbol_mask=scf.symbols_to_dmrs_mask((2, 7, 11)),
          dmrs_type=scf.DmrsCfgType.TYPE_1, scrambling_id=1,
          pusch_dmrs_identity=1, nscid=0, num_cdm_grps_no_data=2,
          dmrs_ports=0b1)
      .set_allocation_in_frequency_type_1_parameters(rb_start=0,
                                                     rb_size=24)
      .set_allocation_in_time_parameters(0, 14)
      .add_optional_pusch_data(rv_index=0, harq_process_id=2,
                               new_data=True, tb_size_bytes=300)
      .add_optional_pusch_uci(harq_ack_bits=1, csi1_bits=4))
    req = b.build()
    cfg = scf.pusch_to_config(req.pusch_pdus[0], slot_in_frame=9)
    assert cfg.rnti == 0x4602 and cfg.tbs == 2400
    # O_ack=1 rides the reserved-bit puncturing path; CSI1 is rate-matched
    assert cfg.uci.nof_harq_ack_bits == 1
    assert cfg.uci.g_harq_ack_rvd > 0 and cfg.uci.g_harq_ack == 0
    assert cfg.uci.nof_csi_part1_bits == 4 and cfg.uci.g_csi_part1 > 0
    # encoded lengths are multiples of Qm
    assert cfg.uci.g_csi_part1 % cfg.qm == 0


def test_pucch_builder_f1_f2():
    b = builders.UlTtiRequestBuilder(0, 5)
    (b.add_pucch_pdu()
      .set_basic_parameters(0x4601, scf.PucchFormatType.F1)
      .set_allocation_in_frequency_parameters(prb_start=105)
      .set_allocation_in_time_parameters(0, 14)
      .set_format1_parameters(initial_cyclic_shift=6)
      .set_uci_bit_lengths(harq_bits=1))
    (b.add_pucch_pdu()
      .set_basic_parameters(0x4601, scf.PucchFormatType.F2)
      .set_allocation_in_frequency_parameters(prb_start=1, prb_size=1)
      .set_allocation_in_time_parameters(12, 2)
      .set_uci_bit_lengths(harq_bits=0, csi1_bits=4)
      .set_scrambling(nid_scrambling=1))
    req = b.build()
    f1 = scf.pucch_to_config(req.pucch_pdus[0], slot_in_frame=5)
    assert isinstance(f1, PucchF1Config)
    assert (f1.prb, f1.initial_cyclic_shift, f1.slot_in_frame) == (105, 6, 5)
    f2 = scf.pucch_to_config(req.pucch_pdus[1], slot_in_frame=5)
    assert isinstance(f2, PucchF2Config)
    assert (f2.prb_start, f2.nof_uci_bits, f2.n_id) == (1, 4, 1)
    # F0/F3/F4 are outside the 23.5 scope, as upstream
    bad = scf.UlPucchPdu(format_type=scf.PucchFormatType.F3)
    with pytest.raises(ValueError):
        scf.pucch_to_config(bad)


def test_pdcch_pdu_to_configs():
    pdu = scf.DlPdcchPdu(
        coreset_bwp_size=48, coreset_bwp_start=0, start_symbol_index=0,
        duration_symbols=1,
        cce_reg_mapping_type=scf.CceToRegMappingType.INTERLEAVED,
        interleaver_size=2, shift_index=17,
        dl_dci=[scf.DlDciPdu(rnti=0x4601, nid_pdcch_data=1,
                             nrnti_pdcch_data=0x4601, cce_index=4,
                             aggregation_level=4,
                             payload_size_bits=39)])
    cfgs = scf.pdcch_to_configs(pdu)
    assert len(cfgs) == 1
    c = cfgs[0]
    assert (c.rnti, c.cce_index, c.aggregation_level) == (0x4601, 4, 4)
    assert c.interleaved and c.shift == 17 and c.coreset_nof_prb == 48
