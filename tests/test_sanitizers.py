"""Grid write-overlap sanitizer + executor race detector (the
framework's TSAN analogue — SURVEY §5 race detection row)."""
import threading

import numpy as np
import pytest

from srsran_project_23_5_tpu.fapi import messages as fapi
from srsran_project_23_5_tpu.phy.upper.csi_rs import CsiRsConfig
from srsran_project_23_5_tpu.phy.upper.pdcch import PdcchConfig
from srsran_project_23_5_tpu.phy.upper.sch import ShConfig
from srsran_project_23_5_tpu.phy.upper.ssb import SsbConfig
from srsran_project_23_5_tpu.support import sanitizers


def _pdsch(prb_start, nof_prb, first_symbol=2, nof_symbols=12, layers=1,
           reserved=()):
    return ShConfig(rnti=0x4601, tbs=128, qm=2, prb_start=prb_start,
                    nof_prb=nof_prb, first_symbol=first_symbol,
                    nof_symbols=nof_symbols, nof_layers=layers,
                    reserved_patterns=reserved)


def test_disjoint_slot_passes():
    req = fapi.DlTtiRequest(
        sfn=0, slot=0,
        pdsch_pdus=[fapi.PdschPdu(_pdsch(0, 20)),
                    fapi.PdschPdu(_pdsch(24, 20, layers=2))],
        pdcch_pdus=[fapi.PdcchPdu(PdcchConfig(
            rnti=0x4601, payload_size=39, cce_index=0), np.zeros(39))],
        csi_rs_pdus=[fapi.CsiRsPdu(CsiRsConfig(
            row=2, prb_start=0, nof_prb=48, symbol=1))])
    sanitizers.check_dl_slot(req, nof_ports=2, nof_sc=52 * 12)


def test_overlapping_pdsch_flagged():
    req = fapi.DlTtiRequest(
        sfn=0, slot=0,
        pdsch_pdus=[fapi.PdschPdu(_pdsch(0, 20)),
                    fapi.PdschPdu(_pdsch(16, 20))])   # PRB 16-19 overlap
    with pytest.raises(sanitizers.GridOverlapError, match="pdsch"):
        sanitizers.check_dl_slot(req, nof_ports=1, nof_sc=52 * 12)


def test_csi_rs_collision_without_reservation_flagged():
    """PDSCH over a CSI-RS symbol WITHOUT the RE reservation is exactly
    the bug class the sanitizer exists for; with the reservation the
    same slot passes."""
    csi = CsiRsConfig(row=2, prb_start=0, nof_prb=20, symbol=5)
    bad = fapi.DlTtiRequest(
        sfn=0, slot=0,
        pdsch_pdus=[fapi.PdschPdu(_pdsch(0, 20))],
        csi_rs_pdus=[fapi.CsiRsPdu(csi)])
    with pytest.raises(sanitizers.GridOverlapError):
        sanitizers.check_dl_slot(bad, nof_ports=1, nof_sc=52 * 12)
    good = fapi.DlTtiRequest(
        sfn=0, slot=0,
        pdsch_pdus=[fapi.PdschPdu(_pdsch(0, 20,
                                         reserved=((5, (0,)),)))],
        csi_rs_pdus=[fapi.CsiRsPdu(csi)])
    sanitizers.check_dl_slot(good, nof_ports=1, nof_sc=52 * 12)


def test_ssb_overlap_flagged():
    ssb = fapi.SsbPdu(SsbConfig(pci=1), np.zeros(32, np.int8),
                      first_subcarrier=0)
    req = fapi.DlTtiRequest(sfn=0, slot=0,
                            pdsch_pdus=[fapi.PdschPdu(_pdsch(0, 21))],
                            ssb_pdus=[ssb])
    with pytest.raises(sanitizers.GridOverlapError, match="ssb"):
        sanitizers.check_dl_slot(req, nof_ports=1, nof_sc=52 * 12)


def test_executor_race_detector():
    det = sanitizers.ExecutorRaceDetector()
    # sequential reuse is fine
    with det.section("grid0", "dl_assemble"):
        pass
    with det.section("grid0", "ul_demod"):
        pass
    # concurrent cross-thread hold is a race
    hold = threading.Event()
    release = threading.Event()

    def holder():
        det.enter("grid0", "slow_task")
        hold.set()
        release.wait(5)
        det.leave("grid0")

    t = threading.Thread(target=holder)
    t.start()
    hold.wait(5)
    with pytest.raises(sanitizers.RaceError):
        det.enter("grid0", "intruder")
    release.set()
    t.join()
    assert det.races and "grid0" in det.races[0]
