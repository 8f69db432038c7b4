"""O-RAN fronthaul (split 7.2) — reference lib/ofh.

Sector = transmitter (DL resource grid → C-plane + U-plane eCPRI/VLAN
frames) + receiver (frames → UL resource grid), with BFP IQ compression.
The frame transport is a byte-pipe callable (UDP/in-memory stand-in for
the raw AF_PACKET socket of ethernet_transmitter_impl.cpp).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

from ..ran.constants import NRE
from . import compression, ecpri, ethernet, serdes

__all__ = ["compression", "ecpri", "ethernet", "serdes", "OfhSector",
           "OfhSectorConfig"]

_MAX_PRB_PER_MSG = 255


@dataclasses.dataclass
class OfhSectorConfig:
    nof_prb: int = 106
    eaxc_dl: int = 0
    eaxc_ul: int = 1
    comp_width: int = 9
    vlan: ethernet.VlanFrameParams = dataclasses.field(
        default_factory=ethernet.VlanFrameParams)


class OfhSector:
    """One OFH sector (ofh_sector_impl.cpp): DL handler + UL receiver."""

    def __init__(self, cfg: OfhSectorConfig,
                 send_frame: Callable[[bytes], None]) -> None:
        self.cfg = cfg
        self._send = send_frame
        self._seq_dl = 0
        self._seq_cp = 0
        # UL reassembly: (frame, subframe, slot) -> grid accumulator
        self._ul_grids: dict[tuple, np.ndarray] = {}
        self._ul_symbols_seen: dict[tuple, set] = {}
        self.on_ul_slot: Callable[[tuple, np.ndarray], None] = \
            lambda key, grid: None
        # per-eAxC sequence tracking + C-plane reception windows
        self._rx_expected_seq: dict[int, int] = {}
        self._rx_last_seq: dict[int, int] = {}
        self._cp_windows: dict[tuple, int] = {}   # slot key -> nof symbols
        self.require_cplane = True
        # statistics
        self.tx_frames = 0
        self.rx_frames = 0
        self.rx_dropped = 0
        self.rx_filtered = 0          # foreign eAxC
        self.rx_duplicates = 0
        self.rx_seq_errors = 0        # sequence-number gaps
        self.rx_no_cplane = 0         # U-plane outside a C-plane window

    # --------------------------------------------------------------- DL
    def transmit_dl_slot(self, frame: int, subframe: int, slot: int,
                         grid: np.ndarray) -> None:
        """grid: [nof_symbols, nof_prb*12] complex → one C-plane section +
        per-symbol U-plane messages (ofh_downlink_handler_impl.cpp:38-46)."""
        timing = serdes.TimingHeader(serdes.DIR_DL, frame, subframe, slot, 0)
        cp = serdes.cplane_encode(serdes.CplaneSection(
            timing, 0, 0, self.cfg.nof_prb, grid.shape[0]))
        self._emit(ecpri.MSG_TYPE_RT_CONTROL, self.cfg.eaxc_dl,
                   self._seq_cp, cp)
        self._seq_cp = (self._seq_cp + 1) & 0xFFFF
        for sym in range(grid.shape[0]):
            iq = np.asarray(grid[sym]).reshape(self.cfg.nof_prb, NRE)
            for start in range(0, self.cfg.nof_prb, _MAX_PRB_PER_MSG):
                n = min(_MAX_PRB_PER_MSG, self.cfg.nof_prb - start)
                up = serdes.uplane_encode(serdes.UplaneMessage(
                    serdes.TimingHeader(serdes.DIR_DL, frame, subframe,
                                        slot, sym),
                    0, start, n, iq[start:start + n], self.cfg.comp_width))
                self._emit(ecpri.MSG_TYPE_IQ_DATA, self.cfg.eaxc_dl,
                           self._seq_dl, up)
                self._seq_dl = (self._seq_dl + 1) & 0xFFFF

    def _emit(self, msg_type: int, eaxc: int, seq: int,
              payload: bytes) -> None:
        pkt = ecpri.encode(ecpri.EcpriHeader(msg_type, eaxc, seq), payload)
        self._send(ethernet.encode(self.cfg.vlan, pkt))
        self.tx_frames += 1

    # --------------------------------------------------------------- UL
    def handle_rx_frame(self, frame_bytes: bytes,
                        nof_symbols: int = 14) -> None:
        """UL U-plane frame → grid accumulation; fires on_ul_slot when all
        symbols arrived (receiver/uplink symbol manager equivalent)."""
        self.rx_frames += 1
        import struct as _struct
        try:
            _vlan, pkt = ethernet.decode(frame_bytes)
            hdr, payload = ecpri.decode(pkt)
        except (AssertionError, IndexError, _struct.error):
            self.rx_dropped += 1
            return
        # eAxC filtering (reference data_flow eAxC demux): only this
        # sector's UL stream is accepted
        if hdr.pc_id != self.cfg.eaxc_ul:
            self.rx_filtered += 1
            return
        # sequence-number handling per (eAxC, plane): duplicates dropped,
        # gaps counted and resynchronized (receiver sequence_id_checker)
        sk = (hdr.pc_id, hdr.msg_type)
        last = self._rx_last_seq.get(sk)
        if last is not None and hdr.seq_id == last:
            self.rx_duplicates += 1
            return
        expected = self._rx_expected_seq.get(sk)
        if expected is not None and hdr.seq_id != expected:
            self.rx_seq_errors += 1
        self._rx_last_seq[sk] = hdr.seq_id
        self._rx_expected_seq[sk] = (hdr.seq_id + 1) & 0xFFFF

        if hdr.msg_type == ecpri.MSG_TYPE_RT_CONTROL:
            # C-plane type 1: opens the slot's U-plane reception window
            sec = serdes.cplane_decode(payload)
            t = sec.timing
            self._cp_windows[(t.frame, t.subframe, t.slot)] = \
                sec.nof_symbols
            return
        msg = serdes.uplane_decode(payload)
        t = msg.timing
        key = (t.frame, t.subframe, t.slot)
        nof_syms = self._cp_windows.get(key)
        if nof_syms is None:
            if self.require_cplane:
                self.rx_no_cplane += 1   # U-plane with no C-plane: drop
                return
            nof_syms = nof_symbols
        if key not in self._ul_grids:
            self._ul_grids[key] = np.zeros(
                (nof_syms, self.cfg.nof_prb * NRE), dtype=np.complex64)
            self._ul_symbols_seen[key] = set()
        lo = msg.start_prb * NRE
        hi = lo + msg.nof_prb * NRE
        self._ul_grids[key][t.symbol, lo:hi] = msg.iq.reshape(-1)
        self._ul_symbols_seen[key].add(t.symbol)
        if len(self._ul_symbols_seen[key]) == nof_syms:
            grid = self._ul_grids.pop(key)
            del self._ul_symbols_seen[key]
            self._cp_windows.pop(key, None)
            self.on_ul_slot(key, grid)
