"""MCS tables (TS 38.214 §5.1.3.1) — standard-defined constants.

Reference embeds the same tables in lib/ran/pdsch/pdsch_mcs.cpp /
lib/ran/pusch/pusch_mcs.cpp. Entries are (Qm, R*1024); spectral
efficiency = Qm * R.
"""
from __future__ import annotations

# Table 5.1.3.1-1: up to 64QAM
MCS_TABLE_QAM64 = (
    (2, 120), (2, 157), (2, 193), (2, 251), (2, 308), (2, 379), (2, 449),
    (2, 526), (2, 602), (2, 679), (4, 340), (4, 378), (4, 434), (4, 490),
    (4, 553), (4, 616), (4, 658), (6, 438), (6, 466), (6, 517), (6, 567),
    (6, 616), (6, 666), (6, 719), (6, 772), (6, 822), (6, 873), (6, 910),
    (6, 948),
)

# Table 5.1.3.1-2: up to 256QAM
MCS_TABLE_QAM256 = (
    (2, 120), (2, 193), (2, 308), (2, 449), (2, 602), (4, 378), (4, 434),
    (4, 490), (4, 553), (4, 616), (4, 658), (6, 466), (6, 517), (6, 567),
    (6, 616), (6, 666), (6, 719), (6, 772), (6, 822), (6, 873), (8, 682.5),
    (8, 711), (8, 754), (8, 797), (8, 841), (8, 885), (8, 916.5), (8, 948),
)


def mcs_to_qm_rate(mcs: int, table: str = "qam64") -> tuple[int, float]:
    """(modulation order, target code rate) for an MCS index."""
    tab = MCS_TABLE_QAM64 if table == "qam64" else MCS_TABLE_QAM256
    qm, r1024 = tab[mcs]
    return qm, r1024 / 1024.0


def max_mcs(table: str = "qam64") -> int:
    return (len(MCS_TABLE_QAM64) if table == "qam64"
            else len(MCS_TABLE_QAM256)) - 1
