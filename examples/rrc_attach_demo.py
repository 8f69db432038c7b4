"""Demo: the full RRC attach flow over exact TS 38.331 UPER encodings.

Prints every control-plane message the attach exchanges — the UL-CCCH
RRCSetupRequest (the canonical 6 octets), the DL-CCCH RRCSetup carrying
the DU-manager-allocated dedicated PUCCH resources inside its
masterCellGroup container, the DCCH security/reconfiguration handshake
— plus the NGAP/F1AP PDUs in their 3GPP PDU/IE-container APER framing.

Run: python examples/rrc_attach_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srsran_project_23_5_tpu import asn1, rrc
from srsran_project_23_5_tpu.du_manager import DuUeManager
from srsran_project_23_5_tpu.ngap import NgSetupRequest
from srsran_project_23_5_tpu.rrc import messages_38331 as m38331
from srsran_project_23_5_tpu.scheduler.config import CellConfig


def show(name: str, data: bytes) -> None:
    print(f"  {name:34s} {len(data):4d} B  {data[:16].hex()}"
          f"{'…' if len(data) > 16 else ''}")


def main() -> None:
    print("== NGAP (ALIGNED PER, NGAP-PDU framing) ==")
    show("NGSetupRequest (proc=21)", asn1.encode(NgSetupRequest()))

    print("== DU manager: pooled PUCCH resources for one UE ==")
    cell = CellConfig(nof_prb=52)
    mgr = DuUeManager(cell)
    res = mgr.create_ue(0x4601, due_id=1)
    a = res.pucch
    print(f"  SR  resource: PRB {a.sr.resource.prb} CS "
          f"{a.sr.resource.initial_cyclic_shift} every "
          f"{a.sr.period_slots} slots @ offset {a.sr.offset}")
    print(f"  CSI resource: PRB {a.csi.resource.prb_start} every "
          f"{a.csi.period_slots} slots @ offset {a.csi.offset}")

    print("== RRC attach (UNALIGNED PER, exact 38.331) ==")
    dl_q, ul_q = [], []
    ue = rrc.RrcUeSide(send_ul=ul_q.append)
    gnb = rrc.RrcUe(0, send_dl=dl_q.append)

    msg3 = ue.connect(b"\x00\x00\xaa\xbb\xcc\xdd", b"nas-registration")
    show("RRCSetupRequest (UL-CCCH, Msg3)", msg3)
    cg = m38331.encode_cell_group({
        "cellGroupId": 0,
        "rlc-BearerToAddModList": [{
            "logicalChannelIdentity": 1,
            "servedRadioBearer": ("srb-Identity", 1)}],
        "spCellConfig": m38331.build_sp_cell_config(
            sr={"res_id": a.sr.resource.res_id, "prb": a.sr.resource.prb,
                "cs": a.sr.resource.initial_cyclic_shift,
                "period_slots": a.sr.period_slots, "offset": a.sr.offset},
            csi={"res_id": a.csi.resource.res_id,
                 "prb": a.csi.resource.prb_start,
                 "nof_prb": a.csi.resource.nof_prb,
                 "period_slots": a.csi.period_slots,
                 "offset": a.csi.offset})})
    gnb.handle_setup_request(rrc.decode_setup_request(msg3),
                             du_cell_group=cg)
    show("RRCSetup (DL-CCCH, w/ PUCCH cfg)", dl_q[-1])
    ue.handle_dl_message(dl_q.pop())
    show("RRCSetupComplete (UL-DCCH)", ul_q[-1])
    gnb.handle_ul_message(ul_q.pop())
    sr_cfg, csi_cfg = ue.pucch_cfg
    print(f"  UE parsed dedicated config: SR PRB {sr_cfg['prb']} CS "
          f"{sr_cfg['cs']} sl{sr_cfg['period_slots']}@{sr_cfg['offset']}")
    assert sr_cfg["prb"] == a.sr.resource.prb

    gnb.start_security(b"\x07" * 32)
    show("SecurityModeCommand (DL-DCCH)", dl_q[-1])
    ue.handle_dl_message(dl_q.pop())
    show("SecurityModeComplete (UL-DCCH)", ul_q[-1])
    gnb.handle_ul_message(ul_q.pop())

    gnb.reconfigure([rrc.DrbConfig(drb_id=1, lcid=4)], [b"nas-accept"])
    show("RRCReconfiguration (DL-DCCH)", dl_q[-1])
    ue.handle_dl_message(dl_q.pop())
    show("RRCReconfigurationComplete", ul_q[-1])
    gnb.handle_ul_message(ul_q.pop())
    print(f"  gNB state: {gnb.state}; UE DRBs: "
          f"{[(d.drb_id, d.lcid) for d in ue.drbs]}")
    assert gnb.state == rrc.RrcUeState.ACTIVE


if __name__ == "__main__":
    main()
