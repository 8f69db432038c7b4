"""FAPI message validators: positive paths + negative cases (VERDICT r3
next #9, reference lib/fapi/message_validators.cpp)."""
import dataclasses

import numpy as np
import pytest

from srsran_project_23_5_tpu.fapi import messages as fapi
from srsran_project_23_5_tpu.fapi import validators as val
from srsran_project_23_5_tpu.phy.upper.csi_rs import CsiRsConfig
from srsran_project_23_5_tpu.phy.upper.pdcch import PdcchConfig
from srsran_project_23_5_tpu.phy.upper.pucch import (PucchF1Config,
                                                     PucchF2Config)
from srsran_project_23_5_tpu.phy.upper.sch import ShConfig
from srsran_project_23_5_tpu.phy.upper.ssb import SsbConfig

NOF_PRB = 52


def sh(**over):
    base = dict(rnti=0x4601, tbs=1024, qm=4, prb_start=0, nof_prb=24,
                first_symbol=0, nof_symbols=14, dmrs_symbols=(2, 7, 11))
    base.update(over)
    return ShConfig(**base)


def good_dl():
    req = fapi.DlTtiRequest(sfn=10, slot=3)
    req.pdsch_pdus.append(fapi.PdschPdu(sh()))
    req.pdcch_pdus.append(fapi.PdcchPdu(
        PdcchConfig(rnti=0x4601, payload_size=40),
        np.zeros(40, np.int8)))
    req.ssb_pdus.append(fapi.SsbPdu(SsbConfig(pci=123),
                                    np.zeros(32, np.int8),
                                    first_subcarrier=6))
    req.csi_rs_pdus.append(fapi.CsiRsPdu(CsiRsConfig(
        row=2, prb_start=0, nof_prb=NOF_PRB, symbol=5)))
    return req


def good_ul():
    req = fapi.UlTtiRequest(sfn=10, slot=3)
    req.pusch_pdus.append(fapi.PuschPdu(sh()))
    req.pucch_pdus.append(fapi.PucchPdu(format1=PucchF1Config(prb=50)))
    req.prach_pdus.append(fapi.PrachPdu(root_sequence_index=22,
                                        length=139,
                                        zero_correlation_zone=13))
    return req


def test_valid_requests_pass():
    dl = good_dl()
    assert val.validate_dl_tti(dl, NOF_PRB) == []
    ul = good_ul()
    assert val.validate_ul_tti(ul, NOF_PRB) == []
    tx = fapi.TxDataRequest(10, 3, [np.zeros(1024, np.int8)])
    assert val.validate_tx_data(tx, dl) == []


@pytest.mark.parametrize("mut,frag", [
    (dict(sfn=1024), "sfn"),
    (dict(slot=20), "slot"),
])
def test_bad_timing(mut, frag):
    req = good_dl()
    for k, v in mut.items():
        setattr(req, k, v)
    errs = val.validate_dl_tti(req, NOF_PRB)
    assert any(frag in e for e in errs), errs


@pytest.mark.parametrize("over,frag", [
    (dict(rnti=0), "rnti"),
    (dict(qm=5), "modulation"),
    (dict(rv=4), "rv"),
    (dict(nof_layers=3), "nof_layers"),
    (dict(prb_start=40, nof_prb=24), "outside carrier"),
    (dict(first_symbol=6, nof_symbols=10, dmrs_symbols=(7, 11)),
     "outside the slot"),
    (dict(tbs=-8), "positive"),
    (dict(tbs=10 ** 6), "exceeds allocation"),
    (dict(dmrs_symbols=(2, 7, 13), nof_symbols=12), "DM-RS symbol"),
])
def test_bad_pdsch(over, frag):
    req = fapi.DlTtiRequest(10, 3)
    req.pdsch_pdus.append(fapi.PdschPdu(sh(**over)))
    errs = val.validate_dl_tti(req, NOF_PRB)
    assert any(frag in e for e in errs), (errs, over)


def test_bad_pdcch_payload_size_mismatch():
    req = fapi.DlTtiRequest(10, 3)
    req.pdcch_pdus.append(fapi.PdcchPdu(
        PdcchConfig(rnti=1, payload_size=40), np.zeros(39, np.int8)))
    errs = val.validate_dl_tti(req, NOF_PRB)
    assert any("payload has 39" in e for e in errs), errs


def test_bad_pdcch_outside_carrier():
    req = fapi.DlTtiRequest(10, 3)
    req.pdcch_pdus.append(fapi.PdcchPdu(
        PdcchConfig(rnti=1, payload_size=40, aggregation_level=8,
                    cce_index=6), np.zeros(40, np.int8)))
    errs = val.validate_dl_tti(req, NOF_PRB)
    assert any("outside carrier" in e for e in errs), errs


def test_bad_ssb():
    req = fapi.DlTtiRequest(10, 3)
    req.ssb_pdus.append(fapi.SsbPdu(SsbConfig(pci=2000),
                                    np.zeros(31, np.int8),
                                    first_subcarrier=NOF_PRB * 12 - 100))
    errs = val.validate_dl_tti(req, NOF_PRB)
    assert any("pci" in e for e in errs)
    assert any("32 bits" in e for e in errs)
    assert any("outside the carrier" in e for e in errs)


def test_bad_csi_rs_row():
    req = fapi.DlTtiRequest(10, 3)
    req.csi_rs_pdus.append(fapi.CsiRsPdu(CsiRsConfig(row=3)))
    errs = val.validate_dl_tti(req, NOF_PRB)
    assert any("row 3" in e for e in errs), errs


def test_tx_data_mismatches():
    dl = good_dl()
    tx = fapi.TxDataRequest(10, 3, [])
    errs = val.validate_tx_data(tx, dl)
    assert any("0 TBs for 1" in e for e in errs), errs
    tx2 = fapi.TxDataRequest(10, 3, [np.zeros(100, np.int8)])
    errs2 = val.validate_tx_data(tx2, dl)
    assert any("!= tbs" in e for e in errs2), errs2
    tx3 = fapi.TxDataRequest(9, 3, [np.zeros(1024, np.int8)])
    assert any("timing" in e for e in val.validate_tx_data(tx3, dl))


@pytest.mark.parametrize("pdu,frag", [
    (fapi.PucchPdu(), "no format"),
    (fapi.PucchPdu(format1=PucchF1Config(prb=99)), "outside"),
    (fapi.PucchPdu(format1=PucchF1Config(prb=1, nof_symbols=2)),
     "length"),
    (fapi.PucchPdu(format1=PucchF1Config(prb=1, nof_harq_bits=3)),
     "HARQ bits"),
    (fapi.PucchPdu(format1=PucchF1Config(prb=1,
                                         initial_cyclic_shift=12)),
     "cyclic shift"),
    (fapi.PucchPdu(format2=PucchF2Config(prb_start=50, nof_prb=4)),
     "outside carrier"),
    (fapi.PucchPdu(format2=PucchF2Config(prb_start=0, nof_prb=1,
                                         nof_uci_bits=12)),
     "UCI bits"),
])
def test_bad_pucch(pdu, frag):
    req = fapi.UlTtiRequest(10, 3)
    req.pucch_pdus.append(pdu)
    errs = val.validate_ul_tti(req, NOF_PRB)
    assert any(frag in e for e in errs), (errs, frag)


@pytest.mark.parametrize("pdu,frag", [
    (fapi.PrachPdu(root_sequence_index=1, length=100), "length"),
    (fapi.PrachPdu(root_sequence_index=839, length=839), "root"),
    (fapi.PrachPdu(root_sequence_index=1, length=139,
                   zero_correlation_zone=200), "N_cs"),
])
def test_bad_prach(pdu, frag):
    req = fapi.UlTtiRequest(10, 3)
    req.prach_pdus.append(pdu)
    errs = val.validate_ul_tti(req, NOF_PRB)
    assert any(frag in e for e in errs), (errs, frag)


def test_bad_harq_process():
    req = fapi.UlTtiRequest(10, 3)
    req.pusch_pdus.append(fapi.PuschPdu(sh(), harq_process=16))
    errs = val.validate_ul_tti(req, NOF_PRB)
    assert any("harq process" in e for e in errs), errs


def test_validate_or_raise():
    with pytest.raises(val.FapiValidationError):
        val.validate_or_raise(["boom"], "ul_tti")
    val.validate_or_raise([])  # no error
