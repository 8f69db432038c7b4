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
        # statistics
        self.tx_frames = 0
        self.rx_frames = 0
        self.rx_dropped = 0

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
        if hdr.msg_type != ecpri.MSG_TYPE_IQ_DATA:
            return                      # C-plane: scheduling hints only
        msg = serdes.uplane_decode(payload)
        t = msg.timing
        key = (t.frame, t.subframe, t.slot)
        if key not in self._ul_grids:
            self._ul_grids[key] = np.zeros(
                (nof_symbols, self.cfg.nof_prb * NRE), dtype=np.complex64)
            self._ul_symbols_seen[key] = set()
        lo = msg.start_prb * NRE
        hi = lo + msg.nof_prb * NRE
        self._ul_grids[key][t.symbol, lo:hi] = msg.iq.reshape(-1)
        self._ul_symbols_seen[key].add(t.symbol)
        if len(self._ul_symbols_seen[key]) == nof_symbols:
            grid = self._ul_grids.pop(key)
            del self._ul_symbols_seen[key]
            self.on_ul_slot(key, grid)
