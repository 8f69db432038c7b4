"""du_manager: pooled RAN resources, cell validation, UE lifecycle,
DU->CU container delivery (reference lib/du_manager)."""
import pytest

from srsran_project_23_5_tpu import du_manager
from srsran_project_23_5_tpu.du_manager.ran_resources import (
    PucchResourceManager, ResourceExhausted)
from srsran_project_23_5_tpu.rrc import messages_38331 as m38331
from srsran_project_23_5_tpu.scheduler.config import CellConfig, TddPattern


def test_pucch_pool_uniqueness_and_reuse():
    cell = CellConfig(nof_prb=52)
    mgr = PucchResourceManager(cell)
    allocs = {r: mgr.alloc_ue(r) for r in range(0x4601, 0x4601 + 16)}
    # no two UEs share an SR (prb, cs, offset) triple
    keys = {(a.sr.resource.prb, a.sr.resource.initial_cyclic_shift,
             a.sr.offset) for a in allocs.values()}
    assert len(keys) == len(allocs)
    # idempotent per RNTI
    assert mgr.alloc_ue(0x4601) is allocs[0x4601]
    # free returns the resource for reuse
    freed = allocs[0x4601].sr
    mgr.free_ue(0x4601)
    got = [mgr.alloc_ue(0x9999).sr]
    assert freed in got


def test_pucch_pool_exhaustion():
    cell = CellConfig(nof_prb=52, sr_period_slots=2,
                      csi_report_period_slots=2)
    mgr = PucchResourceManager(cell)
    # sr capacity = 2 offsets x 4 shifts = 8; csi = 2 offsets x 1 res
    assert mgr.csi_capacity == 2
    mgr.alloc_ue(1)
    mgr.alloc_ue(2)
    with pytest.raises(ResourceExhausted):
        mgr.alloc_ue(3)
    mgr.free_ue(1)
    mgr.alloc_ue(3)                        # now fits


def test_tdd_pool_only_ul_offsets():
    cell = CellConfig(nof_prb=52, tdd=TddPattern(10, 7, 2),
                      sr_period_slots=10)
    mgr = PucchResourceManager(cell)
    for _ in range(mgr.sr_capacity):
        a = mgr.alloc_ue(_ + 1)
        assert cell.is_ul_slot(a.sr.offset), a.sr


def test_cell_validation():
    du_manager.DuCellManager().add_cell(CellConfig(nof_prb=52))
    with pytest.raises(ValueError):
        du_manager.DuCellManager.validate(CellConfig(nof_prb=8))
    with pytest.raises(ValueError):
        du_manager.DuCellManager.validate(CellConfig(nof_prb=52,
                                                     pucch_prbs=0))
    with pytest.raises(ValueError):
        du_manager.DuCellManager.validate(
            CellConfig(nof_prb=52, tdd=TddPattern(10, 9, 2)))


def test_ue_manager_lifecycle():
    cell = CellConfig(nof_prb=52)
    mgr = du_manager.DuUeManager(cell)
    res = mgr.create_ue(0x4601, due_id=7)
    assert mgr.by_rnti(0x4601) is res
    lcids = mgr.configure_drbs(7, [1, 2])
    assert lcids == {1: 4, 2: 5}           # DRB lcids start at 4
    # same DRB id again keeps its lcid
    assert mgr.configure_drbs(7, [1]) == {1: 4}
    mgr.delete_ue(7)
    assert mgr.by_rnti(0x4601) is None
    # resources actually returned: a new UE can take them
    res2 = mgr.create_ue(0x4602, due_id=8)
    assert res2.pucch.sr == res.pucch.sr


def test_sp_cell_config_container_roundtrip():
    """The DU's allocation survives the exact 38.331 container chain."""
    sr = {"res_id": 8, "prb": 0, "cs": 3, "period_slots": 16, "offset": 5}
    csi = {"res_id": 12, "prb": 1, "nof_prb": 1, "period_slots": 40,
           "offset": 7}
    blob = m38331.encode_cell_group({
        "cellGroupId": 0,
        "spCellConfig": m38331.build_sp_cell_config(sr, csi)})
    cg = m38331.decode_cell_group(blob)
    sr2, csi2 = m38331.parse_sp_cell_config(cg["spCellConfig"])
    assert sr2 == sr and csi2 == csi
