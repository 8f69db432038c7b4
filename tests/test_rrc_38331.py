"""Exact TS 38.331 UPER encodings for the attach-flow RRC messages."""
import pytest

from srsran_project_23_5_tpu import rrc
from srsran_project_23_5_tpu.asn1.per import PerError
from srsran_project_23_5_tpu.rrc import messages_38331 as m


def test_rrc_setup_request_is_6_octets():
    """38.331 RRCSetupRequest on UL-CCCH is exactly 48 bits: 1 (msg
    CHOICE) + 2 (c1) + 1 (ue-Identity CHOICE) + 39 (identity) + 4
    (establishmentCause of 16) + 1 (spare)."""
    data = rrc.encode_setup_request(
        rrc.RrcSetupRequest(b"\xaa\xbb\xcc\xdd\xee\xff", "mo-Data"))
    assert len(data) == 6
    out = rrc.decode_setup_request(data)
    assert out.establishment_cause == "mo-Data"
    # low 39 bits of the identity survive
    assert int.from_bytes(out.ue_identity, "big") == (
        int.from_bytes(b"\xaa\xbb\xcc\xdd\xee\xff", "big") & ((1 << 39) - 1))


def test_rrc_setup_request_known_bits():
    """Hand-packed vector: randomValue id=0, cause=emergency, spare=0:
    bits = 0 | 00 | 1 | 39x0 | 0000 | 0 -> 0x10 then zeros."""
    data = m.encode_ul_ccch("rrcSetupRequest", {"rrcSetupRequest": {
        "ue-Identity": ("randomValue", (0, 39)),
        "establishmentCause": "emergency", "spare": (0, 1)}})
    assert data == bytes([0b00010000, 0, 0, 0, 0, 0])


def test_dl_ccch_rrc_setup_roundtrip():
    cg = m.encode_cell_group({
        "cellGroupId": 0,
        "rlc-BearerToAddModList": [{"logicalChannelIdentity": 1,
                                    "servedRadioBearer":
                                        ("srb-Identity", 1)}]})
    enc = m.encode_dl_ccch("rrcSetup", {
        "rrc-TransactionIdentifier": 2,
        "criticalExtensions": ("ies", {
            "radioBearerConfig": {"srb-ToAddModList": [
                {"srb-Identity": 1}]},
            "masterCellGroup": cg})})
    alt, body = m.decode_dl_ccch(enc)
    assert alt == "rrcSetup"
    assert body["rrc-TransactionIdentifier"] == 2
    _, ies = body["criticalExtensions"]
    assert ies["radioBearerConfig"]["srb-ToAddModList"][0][
        "srb-Identity"] == 1
    cg2 = m.decode_cell_group(ies["masterCellGroup"])
    assert cg2["rlc-BearerToAddModList"][0]["logicalChannelIdentity"] == 1


def test_dcch_smc_and_reconfig_roundtrip():
    enc = m.encode_dl_dcch("securityModeCommand", {
        "rrc-TransactionIdentifier": 1,
        "criticalExtensions": ("ies", {"securityConfigSMC": {
            "securityAlgorithmConfig": {"cipheringAlgorithm": "nea2",
                                        "integrityProtAlgorithm":
                                            "nia2"}}})})
    alt, body = m.decode_dl_dcch(enc)
    assert alt == "securityModeCommand"
    _, ies = body["criticalExtensions"]
    assert ies["securityConfigSMC"]["securityAlgorithmConfig"][
        "cipheringAlgorithm"] == "nea2"

    d = rrc.DrbConfig(drb_id=3, lcid=5, pdcp_sn_size=18, qfi=7)
    enc = m.encode_dl_dcch("rrcReconfiguration", {
        "rrc-TransactionIdentifier": 3,
        "criticalExtensions": ("ies", {
            "radioBearerConfig": {
                "drb-ToAddModList": [rrc._drb_to_add_mod(d, True)]},
            "nonCriticalExtension": {
                "masterCellGroup": m.encode_cell_group({
                    "cellGroupId": 0,
                    "rlc-BearerToAddModList": [{
                        "logicalChannelIdentity": 5,
                        "servedRadioBearer": ("drb-Identity", 3)}]}),
                "dedicatedNAS-MessageList": [b"nas-1"]}})})
    alt, body = m.decode_dl_dcch(enc)
    _, ies = body["criticalExtensions"]
    item = ies["radioBearerConfig"]["drb-ToAddModList"][0]
    cg = m.decode_cell_group(
        ies["nonCriticalExtension"]["masterCellGroup"])
    back = rrc._drb_from_add_mod(item, cg)
    assert (back.drb_id, back.lcid, back.pdcp_sn_size, back.qfi) == \
        (3, 5, 18, 7)
    assert ies["nonCriticalExtension"]["dedicatedNAS-MessageList"] == \
        [b"nas-1"]


def test_ul_dcch_setup_complete_and_info_transfer():
    enc = m.encode_ul_dcch("rrcSetupComplete", {
        "rrc-TransactionIdentifier": 0,
        "criticalExtensions": ("ies", {
            "selectedPLMN-Identity": 1,
            "dedicatedNAS-Message": b"\x7e\x00\x41"})})
    alt, body = m.decode_ul_dcch(enc)
    assert alt == "rrcSetupComplete"
    _, ies = body["criticalExtensions"]
    assert ies["dedicatedNAS-Message"] == b"\x7e\x00\x41"

    enc = m.encode_ul_dcch("ulInformationTransfer", {
        "criticalExtensions": ("ies", {
            "dedicatedNAS-Message": b"nas"})})
    alt, body = m.decode_ul_dcch(enc)
    assert alt == "ulInformationTransfer"


def test_stub_types_refuse_to_encode():
    with pytest.raises(PerError, match="MeasConfig"):
        m.encode_dl_dcch("rrcReconfiguration", {
            "rrc-TransactionIdentifier": 0,
            "criticalExtensions": ("ies", {"measConfig": object()})})


def test_full_fsm_on_exact_wire():
    """gNB RrcUe <-> UE RrcUeSide attach over the 38.331 encodings."""
    dl_q, ul_q = [], []
    ue = rrc.RrcUeSide(send_ul=ul_q.append)
    gnb = rrc.RrcUe(0, send_dl=dl_q.append)

    msg3 = ue.connect(b"\x00\x00\xaa\xbb\xcc\xdd", b"nas-reg")
    gnb.handle_setup_request(rrc.decode_setup_request(msg3))
    ue.handle_dl_message(dl_q.pop())          # RRCSetup
    gnb.handle_ul_message(ul_q.pop())         # SetupComplete
    assert gnb.setup_complete_nas == b"nas-reg"
    gnb.start_security(b"\x07" * 32)
    ue.handle_dl_message(dl_q.pop())          # SMC
    gnb.handle_ul_message(ul_q.pop())         # SMComplete
    assert (ue.ciphering, ue.integrity) == (2, 2)
    gnb.reconfigure([rrc.DrbConfig(drb_id=1, lcid=4)], [b"nas-accept"])
    ue.handle_dl_message(dl_q.pop())          # Reconfiguration
    gnb.handle_ul_message(ul_q.pop())         # ReconfigurationComplete
    assert gnb.state == rrc.RrcUeState.ACTIVE
    assert ue.drbs[0].lcid == 4 and ue.nas_rx == [b"nas-accept"]
