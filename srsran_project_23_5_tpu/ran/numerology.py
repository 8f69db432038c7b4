"""NR numerology and slot timing math (TS 38.211 §4.2-4.4, §5.3.1).

Pure-Python/NumPy host helpers; everything here is static configuration used
to specialize compiled kernels.  Mirrors the capabilities of the reference's
slot_point / cyclic_prefix helpers (lib/ran, include/srsran/ran/slot_point.h)
with a functional API.
"""
from __future__ import annotations

import dataclasses
import numpy as np

from .constants import MAX_NSYMB_PER_SLOT, NRE

# Reference FFT size against which TS 38.211 CP durations are defined
# (N_u = 2048 kappa 2^-mu in T_c units).
_REF_NFFT = 2048


def scs_khz(mu: int) -> int:
    """Subcarrier spacing in kHz for numerology mu (TS 38.211 Table 4.2-1)."""
    return 15 << mu


def slots_per_subframe(mu: int) -> int:
    return 1 << mu


def slots_per_frame(mu: int) -> int:
    return 10 << mu


def slot_duration_s(mu: int) -> float:
    return 1e-3 / slots_per_subframe(mu)


def sample_rate_hz(mu: int, nfft: int) -> float:
    return scs_khz(mu) * 1e3 * nfft


def min_nfft(nof_prb: int) -> int:
    """Smallest power-of-two FFT that fits the carrier's subcarriers."""
    n = 128
    while n < nof_prb * NRE:
        n *= 2
    return n


def cp_lengths(mu: int, nfft: int, slot_in_subframe: int = 0) -> np.ndarray:
    """Cyclic-prefix length in samples for the 14 symbols of a slot.

    Normal CP only (as the reference's 23.5 featureset: CHANGELOG:15).
    Long CP occurs at subframe symbols 0 and 7*2^mu (TS 38.211 §5.3.1).
    """
    base = 144 * nfft // _REF_NFFT
    extra = 16 * (1 << mu) * nfft // _REF_NFFT
    lengths = np.full(MAX_NSYMB_PER_SLOT, base, dtype=np.int32)
    first = slot_in_subframe * MAX_NSYMB_PER_SLOT
    for l in range(MAX_NSYMB_PER_SLOT):
        if (first + l) in (0, 7 << mu):
            lengths[l] += extra
    return lengths


def slot_num_samples(mu: int, nfft: int, slot_in_subframe: int = 0) -> int:
    return int(cp_lengths(mu, nfft, slot_in_subframe).sum()) + MAX_NSYMB_PER_SLOT * nfft


@dataclasses.dataclass(frozen=True, order=True)
class SlotPoint:
    """A (numerology, system-frame, slot) triple — the global slot clock.

    Equivalent role to the reference's slot_point (include/srsran/ran/
    slot_point.h); arithmetic wraps at the 1024-frame SFN period.
    """
    mu: int
    sfn: int
    slot_in_frame: int

    @property
    def nof_slots_per_frame(self) -> int:
        return slots_per_frame(self.mu)

    @property
    def slot_in_subframe(self) -> int:
        return self.slot_in_frame % slots_per_subframe(self.mu)

    @property
    def subframe(self) -> int:
        return self.slot_in_frame // slots_per_subframe(self.mu)

    def count(self) -> int:
        """Monotonic slot count within the 1024-frame hyperperiod."""
        return self.sfn * self.nof_slots_per_frame + self.slot_in_frame

    def __add__(self, nof_slots: int) -> "SlotPoint":
        total = (self.count() + nof_slots) % (1024 * self.nof_slots_per_frame)
        return SlotPoint(self.mu, total // self.nof_slots_per_frame,
                         total % self.nof_slots_per_frame)

    def __sub__(self, other: "SlotPoint") -> int:
        assert self.mu == other.mu
        period = 1024 * self.nof_slots_per_frame
        return (self.count() - other.count() + period) % period
