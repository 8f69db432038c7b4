"""Cell configuration for the scheduler (reference
lib/scheduler/cell/cell_configuration.h, du_cell_config)."""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class TddPattern:
    """TDD-UL-DL-ConfigCommon (TS 38.331): pattern over `period` slots with
    nof_dl leading DL slots and nof_ul trailing UL slots (rest flexible,
    used as guard)."""
    period: int = 10
    nof_dl_slots: int = 7
    nof_ul_slots: int = 2

    def is_dl(self, slot: int) -> bool:
        return (slot % self.period) < self.nof_dl_slots

    def is_ul(self, slot: int) -> bool:
        return (slot % self.period) >= self.period - self.nof_ul_slots


@dataclasses.dataclass
class CellConfig:
    pci: int = 1
    nof_prb: int = 106
    mu: int = 1                          # 30 kHz SCS
    tdd: Optional[TddPattern] = None     # None = FDD
    ssb_period_slots: int = 20           # every 10 ms at mu=1
    sib1_period_slots: int = 40
    prach_period_slots: int = 20         # one occasion per period
    prach_slot_offset: int = 19
    ra_window_slots: int = 10
    k1: int = 4                          # PDSCH → HARQ-ACK PUCCH delay
    k2: int = 4                          # DCI → PUSCH delay
    nof_harqs: int = 16
    max_dl_retx: int = 4
    mcs_table: str = "qam64"
    fixed_dl_mcs: int = 20               # link adaptation: fixed in v1
    fixed_ul_mcs: int = 15
    max_prb_per_ue: int = 0              # 0 = unlimited
    # PDSCH occupies symbols 2..13 (symbols 0-1 are the PDCCH control
    # region); 3 DM-RS symbols with CDM-groups-without-data = 2 cost the
    # full 12 RE/PRB each ⇒ TBS geometry matches the transmitted shape
    pdsch_symbols: int = 12
    pusch_symbols: int = 14
    dl_dmrs_per_prb: int = 36            # DM-RS REs/PRB (3 symbols, CDM=2)
    ul_dmrs_per_prb: int = 36
    pucch_prbs: int = 2                  # PRBs reserved at band edges
    # CORESET#0-style control region: `coreset_prbs` PRBs × 1 symbol at
    # symbol 0 ⇒ coreset_prbs // 6 CCEs shared by every DCI of the slot
    coreset_prbs: int = 48
    pdcch_candidates: int = 4            # candidates per aggregation level
    pdcch_aggregation_level: int = 4
    ssb_prbs: int = 21                   # SSB span (240 SC + rounding)
    # NZP-CSI-RS resource (row 2: 1 RE/PRB) for DL CSI acquisition
    csi_rs_period_slots: int = 20
    csi_rs_slot_offset: int = 1
    csi_rs_symbol: int = 5
    # paging occasions (common_scheduling/paging_scheduler.cpp)
    paging_period_slots: int = 32
    paging_slot_offset: int = 3
    # Allocation sizes are rounded up to these buckets so every grant maps
    # to one of a few compiled PHY shapes (SURVEY §7: bucketing+padding
    # replaces the reference's dynamic per-PDU dispatch).
    prb_buckets: tuple = (2, 4, 8, 16, 32, 64, 106, 162, 273)

    @property
    def slots_per_frame(self) -> int:
        return 10 * (1 << self.mu)

    @property
    def nof_cces(self) -> int:
        return min(self.coreset_prbs, self.nof_prb) // 6

    def is_dl_slot(self, slot: int) -> bool:
        return self.tdd is None or self.tdd.is_dl(slot % self.slots_per_frame)

    def is_ul_slot(self, slot: int) -> bool:
        return self.tdd is None or self.tdd.is_ul(slot % self.slots_per_frame)
