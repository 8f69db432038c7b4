"""Full gNB stack integration tests (reference style:
tests/integrationtests/du_cu_cp/cu_du_test.cpp — components joined by
in-process connectors, slot-stepped deterministically).

Covers: F1/E1/NG setup, RRC connection + security + reconfiguration,
PDU session resource setup, and end-to-end user-plane traffic
core→GTP-U→CU-UP(PDCP)→F1-U→DU(RLC)→MAC→UE and back.
"""
import pytest

from srsran_project_23_5_tpu import asn1, f1ap, f1u, gtpu, ngap, rrc
from srsran_project_23_5_tpu import security as sec
from srsran_project_23_5_tpu.cu_cp import CuCp
from srsran_project_23_5_tpu.cu_up import CuUp
from srsran_project_23_5_tpu.du_high import DuHigh
from srsran_project_23_5_tpu.gateways import LocalConnector
from srsran_project_23_5_tpu.scheduler import CellConfig
from srsran_project_23_5_tpu.testing import UeEmulator


def test_asn1_codec_roundtrip():
    msg = f1ap.UeContextSetupRequest(3, 4, [1], [asn1.encode(
        f1ap.DrbItem(1, 4, "am", 9))])
    dec = asn1.decode(asn1.encode(msg))
    assert dec.gnb_cu_ue_id == 3 and dec.gnb_du_ue_id == 4
    assert asn1.decode(dec.drbs_to_setup[0]).lcid == 4


def _build_stack():
    """Co-located gNB: CU-CP + CU-UP + DU over local connectors, AMF
    stub, core-side GTP-U catcher. Returns components + helpers."""
    core_rx = []                        # uplink G-PDUs reaching the "UPF"
    f1_link = LocalConnector()
    e1_link = LocalConnector()
    ng_link = LocalConnector()
    broker = f1u.LocalF1uBroker()

    cu_cp = CuCp(amf_send=ng_link.a.send, f1_send=f1_link.a.send,
                 e1_send=e1_link.a.send)
    cu_up = CuUp(e1_send=e1_link.b.send, ngu_send=core_rx.append)
    cu_up.create_f1u_bearer = broker.cu_side
    du = DuHigh(CellConfig(), f1_send=f1_link.b.send, f1u_broker=broker)
    amf = ngap.AmfStub(ng_link.b.send)

    # x.send delivers to its peer's on_rx: CU-CP owns the .a ends
    ng_link.b.on_rx = amf.handle_message
    ng_link.a.on_rx = cu_cp.handle_ngap_message
    f1_link.b.on_rx = du.handle_f1_message
    f1_link.a.on_rx = cu_cp.handle_f1_message
    e1_link.b.on_rx = cu_up.handle_e1_message
    e1_link.a.on_rx = cu_cp.handle_e1_message

    cu_cp.start()
    cu_up.e1ap.e1_setup()
    du.start()
    return cu_cp, cu_up, du, amf, core_rx


def test_setup_procedures():
    cu_cp, cu_up, du, amf, _ = _build_stack()
    assert cu_cp.ngap.setup_done          # NG Setup done
    assert du.f1ap.setup_done             # F1 Setup done
    assert cu_cp.f1_setup_done
    assert cu_cp.e1ap.setup_done          # E1 Setup done


def _run_attach(slots=120):
    cu_cp, cu_up, du, amf, core_rx = _build_stack()
    ue = UeEmulator()
    settle = None
    for slot in range(slots):
        out = du.run_slot(slot)
        ue.step(du.mac, out, slot)
        if (settle is None and ue.rrc.state == rrc.RrcUeState.ACTIVE
                and ue.drb_pdcp):
            settle = slot + 20       # let ReconfigurationComplete flow up
        if settle is not None and slot >= settle:
            break
    return cu_cp, cu_up, du, amf, core_rx, ue, slot


def test_full_attach_to_active():
    cu_cp, cu_up, du, amf, core_rx, ue, slot = _run_attach()
    assert ue.rnti is not None
    assert ue.conres_ok
    assert ue.rrc.state == rrc.RrcUeState.ACTIVE
    assert ue.rrc.ciphering == 2 and ue.rrc.integrity == 2
    # CU-CP reached active and granted the session to the AMF
    cue, ctx = next(iter(cu_cp.ues.items()))
    assert ctx.state == "active"
    assert amf.sessions_granted == [1]
    # registration-accept NAS delivered through RRCReconfiguration
    assert b"nas-registration-accept" in ue.rrc.nas_rx
    # CU-UP has one bearer context with a live DL TEID
    assert len(cu_up.ues) == 1


def test_user_plane_end_to_end():
    cu_cp, cu_up, du, amf, core_rx, ue, slot0 = _run_attach()
    bearer = next(iter(cu_up.ues.values()))[0]
    dl_packets = [b"dl-ip-%03d" % i * 20 for i in range(5)]
    ul_packets = [b"ul-ip-%03d" % i * 15 for i in range(5)]
    # core → gNB (GTP-U encapsulated toward the CU-UP DL TEID)
    for pkt in dl_packets:
        cu_up.handle_ngu_pdu(gtpu.encode(
            gtpu.GtpuHeader(bearer.dl_teid, qfi=9), pkt))
    for pkt in ul_packets:
        ue.send_ip_packet(pkt)
    for slot in range(slot0 + 1, slot0 + 200):
        out = du.run_slot(slot)
        ue.step(du.mac, out, slot)
        if ue.ip_rx == dl_packets and len(core_rx) >= len(ul_packets):
            break
    assert ue.ip_rx == dl_packets
    # uplink arrived at the core on the session's UL TEID, payload intact
    ul_seen = []
    for wire in core_rx:
        h, payload = gtpu.decode(wire)
        assert h.teid == 0xC0DE and h.qfi == 9
        ul_seen.append(payload)
    assert ul_seen == ul_packets


def test_pdcp_ciphering_actually_applied_on_drb():
    cu_cp, cu_up, du, amf, core_rx, ue, slot0 = _run_attach()
    bearer = next(iter(cu_up.ues.values()))[0]
    secret = b"super-secret-user-payload" * 4
    captured = []
    # tap the DU end of the F1-U bearer (attribute looked up per call)
    du_end = bearer.f1u_bearer._peer
    orig_rx = du_end.on_rx
    du_end.on_rx = lambda p: (captured.append(p), orig_rx(p))[1]
    cu_up.handle_ngu_pdu(gtpu.encode(gtpu.GtpuHeader(bearer.dl_teid, qfi=9),
                                     secret))
    assert captured and all(secret not in c for c in captured)


def test_ue_release_via_ngap():
    cu_cp, cu_up, du, amf, core_rx, ue, slot0 = _run_attach()
    cue, ctx = next(iter(cu_cp.ues.items()))
    amf_id = ctx.amf_ue_id
    # AMF orders release
    cu_cp.handle_ngap_message(asn1.encode(
        ngap.UeContextReleaseCommand(amf_id, cue)))
    assert cue not in cu_cp.ues
    assert not du.ues                     # DU context torn down
