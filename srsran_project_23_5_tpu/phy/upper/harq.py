"""HARQ receive softbuffer pool — LLR soft-combining across retransmissions.

Counterpart of the reference's rx_softbuffer_pool
(lib/phy/upper/rx_softbuffer_pool_impl.h:37-67): per-(rnti, harq) buffers
of full-codeword LLRs, reserved on first transmission, combined on
retransmission, released on CRC pass or slot expiry.

The buffers hold device arrays (one [C, N_full*Zc] float32 per process) —
combining is a jnp add that XLA fuses into the dematch step.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class _Entry:
    llr: jnp.ndarray            # [C, N_full*Zc] accumulated LLRs
    expiry_slot: int


class SoftbufferPool:
    def __init__(self, expiry_slots: int = 100) -> None:
        self._buffers: dict[tuple[int, int], _Entry] = {}
        self._expiry = expiry_slots

    def combine(self, rnti: int, harq: int, llr: jnp.ndarray,
                new_data: bool, slot_count: int) -> jnp.ndarray:
        """Return combined LLRs, updating the stored buffer."""
        key = (rnti, harq)
        if not new_data and key in self._buffers:
            stored = self._buffers[key].llr
            if stored.shape == llr.shape:
                llr = stored + llr
        self._buffers[key] = _Entry(llr=llr,
                                    expiry_slot=slot_count + self._expiry)
        return llr

    # -- raw storage API for the fused slot programs (the combine itself
    # runs ON DEVICE inside the jitted program; the pool only holds the
    # resulting device arrays between slots — slot_programs.py)
    def get(self, rnti: int, harq: int) -> jnp.ndarray | None:
        e = self._buffers.get((rnti, harq))
        return e.llr if e is not None else None

    def put(self, rnti: int, harq: int, llr: jnp.ndarray,
            slot_count: int) -> None:
        self._buffers[(rnti, harq)] = _Entry(
            llr=llr, expiry_slot=slot_count + self._expiry)

    def release(self, rnti: int, harq: int) -> None:
        self._buffers.pop((rnti, harq), None)

    def run_slot(self, slot_count: int) -> None:
        """Expire stale reservations (upper_phy timing-handler duty,
        upper_phy_impl.h:89-103)."""
        dead = [k for k, e in self._buffers.items()
                if e.expiry_slot <= slot_count]
        for k in dead:
            del self._buffers[k]

    def __len__(self) -> int:
        return len(self._buffers)
