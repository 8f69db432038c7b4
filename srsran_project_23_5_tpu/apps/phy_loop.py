"""PHY-in-the-loop data path for the gnb app's loopback-UE mode.

Runs the slot's PDSCH/PUSCH PDUs through the real jitted PHY:
DL: upper-PHY grid assembly → OFDM modulate → AWGN channel →
    UE OFDM demodulate → PUSCH-style receiver per PDSCH PDU.
UL: UE MAC PDU → SCH transmit onto the UL grid → AWGN →
    gNB upper-PHY uplink processing → CRC/RxData indications.

This is the app-level equivalent of the reference's ZMQ virtual RF
loopback (lib/radio/zmq) collapsed to one process.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..fapi import messages as fapi
from ..fapi_adaptor import _bits, _bytes
from ..phy.lower import ofdm
from ..phy.upper import sch
from ..phy.upper.upper_phy import UpperPhy, UpperPhyConfig
from ..ran import numerology
from ..scheduler import CellConfig


class PhyLoop:
    def __init__(self, cell: CellConfig, snr_db: float = 30.0) -> None:
        self.cell = cell
        self.nfft = numerology.min_nfft(cell.nof_prb)
        self.upper = UpperPhy(UpperPhyConfig(nof_prb=cell.nof_prb))
        self.snr_db = snr_db
        self._rng = np.random.default_rng(1234)
        self._slot_count = 0

    # --------------------------------------------------------------- helpers
    def _awgn(self, samples: jnp.ndarray) -> jnp.ndarray:
        sigma = (10 ** (-self.snr_db / 20)
                 * np.sqrt(self.cell.nof_prb * 12) / np.sqrt(self.nfft))
        n = (self._rng.standard_normal(samples.shape)
             + 1j * self._rng.standard_normal(samples.shape)) * sigma / 2**0.5
        return samples + jnp.asarray(n.astype(np.complex64))

    def _ofdm_roundtrip(self, grid: jnp.ndarray) -> jnp.ndarray:
        bb = ofdm.modulate_slot(grid, self.cell.mu, self.nfft)
        bb = self._awgn(bb)
        return ofdm.demodulate_slot(bb, self.cell.nof_prb * 12,
                                    self.cell.mu, self.nfft)

    # ------------------------------------------------------------- slot run
    def run_slot(self, dl_req: fapi.DlTtiRequest, tx_req: fapi.TxDataRequest,
                 ul_req: fapi.UlTtiRequest, mac_out, ue) -> list:
        """Returns uplink FAPI indications for the MAC."""
        inds: list = []
        self._slot_count += 1
        # ----------------------------------------------------------- DL
        if dl_req.pdsch_pdus and ue is not None:
            grid = self.upper.process_dl_slot(dl_req, tx_req)
            rx = self._ofdm_roundtrip(grid)
            for pdu in dl_req.pdsch_pdus:
                cfg = pdu.config
                if cfg.rnti != ue.rnti:
                    continue              # RAR/SIB: decoded at MAC level
                res = sch.pusch_receive(rx[None], cfg, 6)
                if bool(res.tb_crc_ok):
                    ue.consume_dl_pdu(_bytes(np.asarray(res.tb_bits)))
        # ----------------------------------------------------------- UL
        if ul_req.pusch_pdus and ue is not None:
            ul_grid = jnp.zeros((14, self.cell.nof_prb * 12),
                                dtype=jnp.complex64)
            grants = {(g.rnti, g.harq_pid): g
                      for g in mac_out.result.ul_grants}
            for pdu in ul_req.pusch_pdus:
                g = grants.get((pdu.config.rnti, pdu.harq_process))
                if g is None or g.rnti != ue.rnti:
                    continue
                wire = ue.build_ul_pdu(g)
                bits = jnp.asarray(_bits(wire, pdu.config.tbs))
                ul_grid = sch.pdsch_transmit(bits, pdu.config, ul_grid)
            rx_ul = self._ofdm_roundtrip(ul_grid)
            inds = self.upper.process_ul_slot(rx_ul[None], ul_req,
                                              self._slot_count)
        return inds
