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
from ..phy.upper import pdcch as pdcch_proc
from ..phy.upper import sch
from ..phy.upper.upper_phy import UpperPhy, UpperPhyConfig
from ..ran import mcs_tables, numerology, tbs as tbs_mod
from ..scheduler import CellConfig, dci as dci_mod
from ..scheduler.pdcch_alloc import PdcchSlotAllocator


import functools


@functools.lru_cache(maxsize=32)
def _csi_meas(csi_cfg):
    """Jitted CSI-RS SINR measurement, cached per (static) resource."""
    from ..phy.upper import csi_rs as csi_rs_proc

    @jax.jit
    def meas(rx):
        ref = csi_rs_proc.generate(csi_cfg, jnp.zeros_like(rx))
        mask = jnp.abs(ref) > 0
        err = jnp.where(mask, rx - ref, 0.0)
        sig = jnp.where(mask, jnp.abs(ref) ** 2, 0.0).sum()
        npow = jnp.maximum((jnp.abs(err) ** 2).sum(), 1e-12)
        return 10.0 * jnp.log10(sig / npow)

    return meas


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
        # per-RE SNR calibration (see phy.pipeline: sigma² of time-domain
        # noise lands on each RE as sigma²/nfft after demodulate_slot)
        sigma = np.sqrt(self.nfft) * 10 ** (-self.snr_db / 20)
        n = (self._rng.standard_normal(samples.shape)
             + 1j * self._rng.standard_normal(samples.shape)) * sigma / 2**0.5
        return samples + jnp.asarray(n.astype(np.complex64))

    def _ofdm_roundtrip(self, grid: jnp.ndarray) -> jnp.ndarray:
        bb = ofdm.modulate_slot(grid, self.cell.mu, self.nfft)
        bb = self._awgn(bb)
        return ofdm.demodulate_slot(bb, self.cell.nof_prb * 12,
                                    self.cell.mu, self.nfft)

    # ----------------------------------------------------- UE DCI decode
    def _ue_blind_decode_dci(self, rx_grid: jnp.ndarray, rnti: int,
                             slot: int) -> dict:
        """Search-space blind decode (one jitted program, candidates as a
        traced batch).  Returns {(is_dl, prb_start): Dci}."""
        n = self.cell.nof_prb
        cfg = pdcch_proc.PdcchConfig(
            rnti=rnti, payload_size=dci_mod.dci_size(n),
            aggregation_level=self.cell.pdcch_aggregation_level,
            n_id=self.cell.pci, n_rnti=rnti)
        alloc = PdcchSlotAllocator(self.cell.nof_cces)
        cand = alloc._candidates(cfg.aggregation_level,
                                 self.cell.pdcch_candidates, rnti, slot)
        # dedupe, keep static batch width for one compiled shape
        cand = sorted(set(cand))
        width = self.cell.pdcch_candidates
        cand = (cand + cand[:1] * width)[:width]
        payloads, oks = jax.jit(
            lambda g, c: pdcch_proc.pdcch_blind_receive(g, cfg, c)
        )(rx_grid, jnp.asarray(cand, jnp.int32))
        out: dict = {}
        oks = np.asarray(oks)
        payloads = np.asarray(payloads)
        for i in range(len(cand)):
            if oks[i]:
                d = dci_mod.unpack(payloads[i], n)
                out[(d.is_dl, d.prb_start)] = d
        return out

    def _is_csi_slot(self, slot: int) -> bool:
        return (slot % self.cell.csi_rs_period_slots
                == self.cell.csi_rs_slot_offset)

    def _ue_sh_config(self, d, rnti: int, slot: int) -> sch.ShConfig:
        """Rebuild the PDSCH config from decoded DCI fields (the UE's
        view: TS 38.214 TBS determination from MCS + allocation)."""
        qm, r = mcs_tables.mcs_to_qm_rate(d.mcs, self.cell.mcs_table)
        bits = tbs_mod.tbs_calculate(
            self.cell.pdsch_symbols, self.cell.dl_dmrs_per_prb, 0, r, qm,
            1, d.prb_len)
        resv = (((self.cell.csi_rs_symbol, (0,)),)
                if self._is_csi_slot(slot) else ())
        return sch.ShConfig(
            rnti=rnti, tbs=(bits // 8) * 8, qm=qm, rv=d.rv,
            prb_start=d.prb_start, nof_prb=d.prb_len,
            first_symbol=2, nof_symbols=12, dmrs_symbols=(2, 7, 11),
            nid=self.cell.pci, nid_dmrs=self.cell.pci,
            slot_in_frame=slot % self.cell.slots_per_frame,
            reserved_patterns=resv)

    def _ue_measure_csi(self, rx_grid: jnp.ndarray, csi_cfg) -> tuple:
        """CSI-RS based wideband SINR/CQI (UE-side CSI measurement)."""
        from ..ran import mcs_tables as mt
        sinr_db = float(np.asarray(_csi_meas(csi_cfg)(rx_grid)))
        return mt.sinr_to_cqi(sinr_db), sinr_db

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
            # UE blind-decodes its DCIs from the control region FIRST —
            # the PDSCH allocation comes from the decoded DCI fields, not
            # from side-channel knowledge of the gNB's FAPI PDUs.
            dcis = (self._ue_blind_decode_dci(rx, ue.rnti, dl_req.slot)
                    if ue.rnti is not None else {})
            if dl_req.csi_rs_pdus and ue.rnti is not None:
                cqi, sinr_db = self._ue_measure_csi(
                    rx, dl_req.csi_rs_pdus[0].config)
                inds.append(fapi.CsiIndication(
                    dl_req.sfn, dl_req.slot, ue.rnti, cqi, sinr_db))
            for pdu in dl_req.pdsch_pdus:
                cfg = pdu.config
                if cfg.rnti != ue.rnti:
                    continue              # RAR/SIB: decoded at MAC level
                d = dcis.get((True, cfg.prb_start))
                if d is None:
                    continue              # no DCI decoded -> no PDSCH
                ue_cfg = self._ue_sh_config(d, ue.rnti, dl_req.slot)
                res = sch.pusch_receive(rx[None], ue_cfg, 6)
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
