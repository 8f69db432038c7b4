"""Upper PHY orchestration: FAPI slot requests → grids → indications.

Functional re-design of the reference's upper_phy_impl +
downlink_processor_single_executor_impl + uplink_processor_impl
(lib/phy/upper/upper_phy_impl.h:46-160): instead of executor pools
serializing per-PDU tasks, each slot's PDUs are dispatched into jitted
static-shape processors that XLA runs asynchronously; the host side only
routes messages and owns the HARQ softbuffer pool.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...fapi import messages as fapi
from . import csi_rs as csi_rs_proc
from . import pdcch as pdcch_proc
from . import pucch as pucch_proc
from . import sch, slot_programs, ssb as ssb_proc
from ...ops import prach as prach_ops
from .harq import SoftbufferPool


@dataclasses.dataclass(frozen=True)
class UpperPhyConfig:
    nof_prb: int = 106
    nof_rx_ports: int = 1
    nof_tx_ports: int = 1
    prach_detection_threshold: float = 16.0
    nfft: int = 0                 # carrier FFT size (TA chip→sample conv)
    # bucketed=True routes UL slots through ONE fused jitted program per
    # slot signature (slot_programs.py — the production path); False keeps
    # the legacy per-PDU dispatch for A/B comparison.
    bucketed: bool = True
    nof_ldpc_iterations: int = 6
    # sanitize=True runs the grid write-overlap sanitizer on every DL
    # slot (support/sanitizers.py — the TSAN-analogue debug mode); keep
    # off on the real-time path
    sanitize: bool = False

    @property
    def nsc(self) -> int:
        return self.nof_prb * 12


class UpperPhy:
    """One carrier's upper PHY: DL grid assembly + UL processing."""

    def __init__(self, config: UpperPhyConfig) -> None:
        self.config = config
        self.softbuffers = SoftbufferPool()
        self.ul_programs = slot_programs.UlSlotPrograms(
            config.nof_ldpc_iterations)
        self.dl_programs = slot_programs.DlSlotPrograms(config.nsc)

    # ------------------------------------------------------------- downlink
    def process_dl_slot(self, req: fapi.DlTtiRequest,
                        data: fapi.TxDataRequest | None = None
                        ) -> jnp.ndarray:
        """Build the slot's DL resource grid from FAPI PDUs
        (fapi_to_phy_translator.cpp:234 + downlink_processor dispatch).

        Default (bucketed): ONE fused jitted assembly program per slot
        signature (slot_programs.DlSlotPrograms)."""
        if self.config.sanitize:
            from ...support import sanitizers
            sanitizers.check_dl_slot(req, self.config.nof_tx_ports,
                                     self.config.nsc)
        if self.config.bucketed:
            tbs = data.transport_blocks if data else []
            if len(tbs) < len(req.pdsch_pdus):
                # legacy zip semantics: PDSCH PDUs without TX_Data are
                # skipped (the reference validator would reject the slot)
                req = dataclasses.replace(
                    req, pdsch_pdus=req.pdsch_pdus[:len(tbs)])
            sig = slot_programs.dl_signature(req)
            fn = self.dl_programs.get(sig)
            return fn(
                tuple(jnp.asarray(p.payload_bits, jnp.int8)
                      for p in req.ssb_pdus),
                tuple(jnp.asarray(p.payload_bits, jnp.int8)
                      for p in req.pdcch_pdus),
                tuple(jnp.asarray(tb, jnp.int8)
                      for tb in tbs[:len(req.pdsch_pdus)]),
                tuple(slot_programs.pusch_cinits(p.config)
                      for p in req.pdsch_pdus))
        grid = jnp.zeros((14, self.config.nsc), dtype=jnp.complex64)
        for pdu in req.ssb_pdus:
            block = ssb_proc.ssb_assemble(
                jnp.asarray(pdu.payload_bits, dtype=jnp.int8), pdu.config)
            k0 = pdu.first_subcarrier
            # SSB spans symbols 0..3 of its half-slot position; place at
            # symbols 2..5 (case A first candidate) for simplicity.
            grid = grid.at[2:6, k0:k0 + ssb_proc.SSB_NSC].set(block)
        for pdu in req.pdcch_pdus:
            grid = pdcch_proc.pdcch_transmit(
                jnp.asarray(pdu.payload_bits, dtype=jnp.int8), pdu.config,
                grid)
        tbs = data.transport_blocks if data else []
        for pdu, tb in zip(req.pdsch_pdus, tbs):
            grid = sch.pdsch_transmit(jnp.asarray(tb, dtype=jnp.int8),
                                      pdu.config, grid)
        # CSI-RS after PDSCH: its REs sit in the PDSCH's reserved pattern
        for pdu in req.csi_rs_pdus:
            grid = csi_rs_proc.generate(pdu.config, grid)
        return grid

    # --------------------------------------------------------------- uplink
    def process_ul_slot(self, rx_grid: jnp.ndarray, req: fapi.UlTtiRequest,
                        slot_count: int = 0,
                        prach_rx: jnp.ndarray | None = None
                        ) -> list[object]:
        """Run the slot's UL PDUs; returns FAPI indications
        (uplink_processor_impl.cpp:94-173).

        Default (bucketed): ONE fused jitted program per slot signature
        processes every PDU — HARQ combine on device, cross-PDU-batched
        LDPC, one dispatch, one host sync (slot_programs.py; VERDICT r4
        next #4).  The legacy per-PDU path below dispatches each PDU's
        programs asynchronously with a single slot-level sync (the
        device queue stands in for the reference's uplink processor
        pool, upper_phy_factories.cpp:108-127).
        """
        if self.config.bucketed:
            return self._process_ul_slot_fused(rx_grid, req, slot_count,
                                               prach_rx)
        pend_pusch, pend_pucch, pend_prach = [], [], []
        for pdu in req.pusch_pdus:
            cfg = pdu.config
            d = sch.pusch_demodulate(rx_grid, cfg)
            llr = self.softbuffers.combine(cfg.rnti, pdu.harq_process,
                                           d.llr_full, pdu.new_data,
                                           slot_count)
            res = sch.pusch_decode(llr, cfg, d.noise_var, d.rsrp, demod=d)
            pend_pusch.append((pdu, res))
        for pdu in req.pucch_pdus:
            r1 = (pucch_proc.pucch_f1_detect(rx_grid, pdu.format1)
                  if pdu.format1 is not None else None)
            r2 = (pucch_proc.pucch_f2_receive(rx_grid, pdu.format2)
                  if pdu.format2 is not None else None)
            pend_pucch.append((pdu, r1, r2))
        for pdu in req.prach_pdus:
            if prach_rx is None:
                continue
            # scan as many roots as the cell's preamble count needs: the
            # global preamble index p maps to (root + p // n_shifts,
            # C_v index p % n_shifts) — prach_detector_generic scans the
            # whole preamble set the same way
            ns = prach_ops.num_shifts(pdu.length,
                                      pdu.zero_correlation_zone)
            nroots = max(1, -(-pdu.nof_preambles // ns))
            ms, ds = [], []
            for ri in range(nroots):
                metric, delay, _ = prach_ops.detect(
                    prach_rx, pdu.root_sequence_index + ri, pdu.length,
                    pdu.zero_correlation_zone)
                ms.append(metric)
                ds.append(delay)
            metric = jnp.concatenate(ms, axis=-1)[..., :pdu.nof_preambles]
            delay = jnp.concatenate(ds, axis=-1)[..., :pdu.nof_preambles]
            pend_prach.append((pdu, metric, delay))

        # ---- single sync point for the whole slot
        jax.block_until_ready(
            [[r.tb_crc_ok for _, r in pend_pusch],
             [x for _, r1, r2 in pend_pucch
              for x in (r1.detection_metric if r1 else None,
                        r2.metric if r2 else None) if x is not None],
             [m for _, m, _ in pend_prach]])

        out: list[object] = []
        for pdu, res in pend_pusch:
            cfg = pdu.config
            ok = bool(res.tb_crc_ok)
            if ok:
                self.softbuffers.release(cfg.rnti, pdu.harq_process)
                out.append(fapi.RxDataIndication(
                    req.sfn, req.slot, cfg.rnti, pdu.harq_process,
                    np.asarray(res.tb_bits)))
            ta = 0.0
            if res.ta_norm is not None and self.config.nfft:
                ta = float(res.ta_norm) * self.config.nfft
            out.append(fapi.CrcIndication(
                req.sfn, req.slot, cfg.rnti, pdu.harq_process, ok,
                float(res.sinr_db), ta_samples=ta))
        for pdu, r1, r2 in pend_pucch:
            if r1 is not None:
                out.append(fapi.UciIndication(
                    req.sfn, req.slot, pdu.rnti, np.asarray(r1.bits),
                    None, bool(r1.detected), float(r1.detection_metric),
                    harq_pid=pdu.harq_pid, is_sr=pdu.is_sr))
            if r2 is not None:
                out.append(fapi.UciIndication(
                    req.sfn, req.slot, pdu.format2.rnti, None,
                    np.asarray(r2.uci_bits), bool(r2.detected),
                    float(r2.metric)))
        for pdu, metric, delay in pend_prach:
            m = np.asarray(metric)
            d = np.asarray(delay)
            if m.ndim > 1:          # combine rx ports
                m = m.mean(axis=0)
                d = d[0]
            # delay arrives in ZC-chip units; convert to samples at the
            # carrier rate for the MAC's TA command (chip = nfft/length
            # samples for the in-grid short format)
            scale = (self.config.nfft / pdu.length if self.config.nfft
                     else 1.0)
            hits = [(int(i), float(m[i]), float(d[i]) * scale)
                    for i in np.nonzero(
                        m > self.config.prach_detection_threshold)[0]]
            out.append(fapi.RachIndication(req.sfn, req.slot, pdu.occasion,
                                           hits))
        self.softbuffers.run_slot(slot_count)
        return out

    # ---------------------------------------------- fused (bucketed) path
    def _process_ul_slot_fused(self, rx_grid: jnp.ndarray,
                               req: fapi.UlTtiRequest, slot_count: int,
                               prach_rx: jnp.ndarray | None
                               ) -> list[object]:
        if prach_rx is None and req.prach_pdus:
            # no PRACH window captured this slot (legacy semantics: the
            # occasion's PDUs are skipped, no RACH.indication raised)
            req = fapi.UlTtiRequest(req.sfn, req.slot, prach_pdus=[],
                                    pusch_pdus=req.pusch_pdus,
                                    pucch_pdus=req.pucch_pdus)
        sig = slot_programs.signature(req)
        fn = self.ul_programs.get(sig)

        priors, new_data = [], []
        for pdu in req.pusch_pdus:
            st = self.softbuffers.get(pdu.config.rnti, pdu.harq_process)
            shape = sch.llr_full_shape(pdu.config)
            fresh = pdu.new_data or st is None or st.shape != shape
            priors.append(st if not fresh
                          else jnp.zeros(shape, jnp.float32))
            new_data.append(jnp.bool_(fresh))
        if prach_rx is None:
            prach_rx = jnp.zeros((1, 139), jnp.complex64)
        # per-slot DM-RS cinits ride as DATA (the signature normalizes
        # slot_in_frame away — slot_programs.signature)
        cinits = tuple(slot_programs.pusch_cinits(pdu.config)
                       for pdu in req.pusch_pdus)
        pucch_data = tuple(slot_programs.pucch_slot_data(pdu)
                           for pdu in req.pucch_pdus)

        out = fn(rx_grid, tuple(priors), tuple(new_data), prach_rx, cinits,
                 pucch_data)
        # store combined LLRs as device arrays (no host round trip), then
        # ONE sync materializes the whole slot's results
        for pdu, o in zip(req.pusch_pdus, out["pusch"]):
            self.softbuffers.put(pdu.config.rnti, pdu.harq_process,
                                 o["combined_llr"], slot_count)
        jax.block_until_ready(out)

        inds: list[object] = []
        for pdu, o in zip(req.pusch_pdus, out["pusch"]):
            cfg = pdu.config
            ok = bool(np.asarray(o["tb_crc_ok"]))
            if ok:
                self.softbuffers.release(cfg.rnti, pdu.harq_process)
                inds.append(fapi.RxDataIndication(
                    req.sfn, req.slot, cfg.rnti, pdu.harq_process,
                    np.asarray(o["tb_bits"])))
            ta = (float(np.asarray(o["ta_norm"])) * self.config.nfft
                  if self.config.nfft else 0.0)
            inds.append(fapi.CrcIndication(
                req.sfn, req.slot, cfg.rnti, pdu.harq_process, ok,
                float(np.asarray(o["sinr_db"])), ta_samples=ta))
        for pdu, o in zip(req.pucch_pdus, out["pucch"]):
            if "f1" in o:
                r = o["f1"]
                inds.append(fapi.UciIndication(
                    req.sfn, req.slot, pdu.rnti, np.asarray(r["bits"]),
                    None, bool(np.asarray(r["detected"])),
                    float(np.asarray(r["metric"])),
                    harq_pid=pdu.harq_pid, is_sr=pdu.is_sr))
            if "f2" in o:
                r = o["f2"]
                inds.append(fapi.UciIndication(
                    req.sfn, req.slot, pdu.format2.rnti, None,
                    np.asarray(r["uci_bits"]),
                    bool(np.asarray(r["detected"])),
                    float(np.asarray(r["metric"]))))
        for pdu, o in zip(req.prach_pdus, out["prach"]):
            m = np.asarray(o["metric"])
            d = np.asarray(o["delay"])
            if m.ndim > 1:          # combine rx ports
                m = m.mean(axis=0)
                d = d[0]
            scale = (self.config.nfft / pdu.length if self.config.nfft
                     else 1.0)
            hits = [(int(i), float(m[i]), float(d[i]) * scale)
                    for i in np.nonzero(
                        m > self.config.prach_detection_threshold)[0]]
            inds.append(fapi.RachIndication(req.sfn, req.slot,
                                            pdu.occasion, hits))
        self.softbuffers.run_slot(slot_count)
        return inds
