"""RRC (TS 38.331; reference lib/rrc): message set + gNB-side UE FSM.

Messages carry the IEs the procedures actually consume (cause values,
transaction ids, security algorithms, radio-bearer configs); serialization
via the asn1 codec runtime. The CU-CP drives RrcUe through the connection
setup / security / reconfiguration procedures exactly like the
reference's rrc_ue_impl procedures.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from .. import asn1
from .. import security as sec


# ------------------------------------------------------------- messages
@asn1.message(0x101)
class RrcSetupRequest:
    ue_identity: bytes = b""          # 39-bit random / 5G-S-TMSI part
    establishment_cause: str = "mo-Data"


@asn1.message(0x102)
class RrcSetup:
    transaction_id: int = 0
    srb1_config: bytes = b""          # opaque radioBearerConfig


@asn1.message(0x103)
class RrcSetupComplete:
    transaction_id: int = 0
    selected_plmn: int = 1
    dedicated_nas_message: bytes = b""


@asn1.message(0x104)
class RrcSecurityModeCommand:
    transaction_id: int = 0
    ciphering_algorithm: int = 2      # NEA2
    integrity_algorithm: int = 2      # NIA2


@asn1.message(0x105)
class RrcSecurityModeComplete:
    transaction_id: int = 0


@asn1.message(0x106)
class RrcReconfiguration:
    transaction_id: int = 0
    drb_configs: list = dataclasses.field(default_factory=list)
    nas_messages: list = dataclasses.field(default_factory=list)


@asn1.message(0x107)
class RrcReconfigurationComplete:
    transaction_id: int = 0


@asn1.message(0x108)
class RrcDlInformationTransfer:
    nas_message: bytes = b""


@asn1.message(0x109)
class RrcUlInformationTransfer:
    nas_message: bytes = b""


@asn1.message(0x10A)
class RrcRelease:
    transaction_id: int = 0


@asn1.message(0x10B)
class DrbConfig:
    drb_id: int = 1
    lcid: int = 4
    pdcp_sn_size: int = 12
    qfi: int = 9


# -------------------------------------------------------------- gNB FSM
class RrcUeState:
    IDLE = "idle"
    SETUP_SENT = "setup-sent"
    CONNECTED = "connected"
    SMC_SENT = "smc-sent"
    SECURE = "secure"
    RECONFIG_SENT = "reconfig-sent"
    ACTIVE = "active"


class RrcUe:
    """gNB (CU-CP) side RRC state machine for one UE
    (reference lib/rrc/ue/rrc_ue_impl.cpp procedures)."""

    def __init__(self, ue_index: int,
                 send_dl: Callable[[bytes], None],
                 on_nas_ul: Optional[Callable[[bytes], None]] = None,
                 on_active: Optional[Callable[["RrcUe"], None]] = None
                 ) -> None:
        self.ue_index = ue_index
        self.state = RrcUeState.IDLE
        self._send_dl = send_dl           # DL-DCCH/CCCH via F1AP→RLC SRB
        self._on_nas_ul = on_nas_ul or (lambda nas: None)
        self._on_active = on_active or (lambda ue: None)
        self._transaction = 0
        self.security_ctx: Optional[sec.SecurityContext] = None
        self.ue_identity = b""
        self.pending_drbs: list = []
        self.setup_complete_nas: bytes = b""

    def _next_transaction(self) -> int:
        self._transaction = (self._transaction + 1) & 3
        return self._transaction

    # -------------------------------------------------------- procedures
    def handle_setup_request(self, msg: RrcSetupRequest) -> None:
        self.ue_identity = msg.ue_identity
        self._send_dl(asn1.encode(RrcSetup(self._next_transaction(),
                                           b"srb1")))
        self.state = RrcUeState.SETUP_SENT

    def start_security(self, k_gnb: bytes, ciphering: int = 2,
                       integrity: int = 2) -> None:
        self.security_ctx = sec.SecurityContext(
            k_gnb, sec.CipheringAlgorithm(ciphering),
            sec.IntegrityAlgorithm(integrity))
        self._send_dl(asn1.encode(RrcSecurityModeCommand(
            self._next_transaction(), ciphering, integrity)))
        self.state = RrcUeState.SMC_SENT

    def reconfigure(self, drbs: list, nas: list | None = None) -> None:
        self.pending_drbs = drbs
        self._send_dl(asn1.encode(RrcReconfiguration(
            self._next_transaction(), [asn1.encode(d) for d in drbs],
            nas or [])))
        self.state = RrcUeState.RECONFIG_SENT

    def send_dl_nas(self, nas: bytes) -> None:
        self._send_dl(asn1.encode(RrcDlInformationTransfer(nas)))

    def handle_ul_message(self, data: bytes) -> None:
        msg = asn1.decode(data)
        if isinstance(msg, RrcSetupComplete):
            self.state = RrcUeState.CONNECTED
            self.setup_complete_nas = msg.dedicated_nas_message
            self._on_nas_ul(msg.dedicated_nas_message)
        elif isinstance(msg, RrcSecurityModeComplete):
            self.state = RrcUeState.SECURE
        elif isinstance(msg, RrcReconfigurationComplete):
            self.state = RrcUeState.ACTIVE
            self._on_active(self)
        elif isinstance(msg, RrcUlInformationTransfer):
            self._on_nas_ul(msg.nas_message)


class RrcUeSide:
    """UE-side mini RRC used in loopback/integration tests (the reference
    tests against srsUE / test doubles; this is the in-framework double)."""

    def __init__(self, send_ul: Callable[[bytes], None]) -> None:
        self._send_ul = send_ul
        self.state = RrcUeState.IDLE
        self.drbs: list = []
        self.ciphering = 0
        self.integrity = 0
        self.nas_rx: list[bytes] = []

    def connect(self, ue_identity: bytes, nas: bytes = b"") -> bytes:
        """Returns the CCCH RRCSetupRequest payload for Msg3."""
        self._pending_nas = nas
        return asn1.encode(RrcSetupRequest(ue_identity, "mo-Data"))

    def handle_dl_message(self, data: bytes) -> None:
        msg = asn1.decode(data)
        if isinstance(msg, RrcSetup):
            self.state = RrcUeState.CONNECTED
            self._send_ul(asn1.encode(RrcSetupComplete(
                msg.transaction_id, 1, getattr(self, "_pending_nas", b""))))
        elif isinstance(msg, RrcSecurityModeCommand):
            self.ciphering = msg.ciphering_algorithm
            self.integrity = msg.integrity_algorithm
            self.state = RrcUeState.SECURE
            self._send_ul(asn1.encode(RrcSecurityModeComplete(
                msg.transaction_id)))
        elif isinstance(msg, RrcReconfiguration):
            self.drbs = [asn1.decode(d) for d in msg.drb_configs]
            self.nas_rx.extend(msg.nas_messages)
            self.state = RrcUeState.ACTIVE
            self._send_ul(asn1.encode(RrcReconfigurationComplete(
                msg.transaction_id)))
        elif isinstance(msg, RrcDlInformationTransfer):
            self.nas_rx.append(msg.nas_message)
