"""Lower PHY engine: slot-clocked baseband processing over a radio gateway.

Functional re-design of the reference's lower_phy_baseband_processor
(lib/phy/lower/lower_phy_baseband_processor.cpp:96-181): instead of four
self-rescheduling executor loops with blocking buffer queues, the engine
exposes a slot-synchronous API — `run_slot` advances the slot clock,
OFDM-modulates the DL grid handed down by the upper PHY, pushes baseband
into the radio gateway, pulls the UL baseband, and OFDM-demodulates it.
Asynchrony comes from XLA's async dispatch rather than host threads; the
2-slot processing pipeline depth of the reference (max_processing_delay_
slots, gnb_appconfig.h:463) maps to keeping 2 slots' programs in flight.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from ...ran import numerology
from . import ofdm


@dataclasses.dataclass(frozen=True)
class LowerPhyConfig:
    mu: int = 1
    nfft: int = 2048
    nof_prb: int = 106
    center_freq_hz: float = 0.0
    tx_gain_db: float = 0.0

    @property
    def nsc(self) -> int:
        return self.nof_prb * 12

    def slot_samples(self, slot_in_subframe: int = 0) -> int:
        return numerology.slot_num_samples(self.mu, self.nfft,
                                           slot_in_subframe)


class LoopbackRadio:
    """In-process radio gateway — the ZMQ virtual-RF analogue
    (lib/radio/zmq): TX baseband becomes RX baseband after an optional
    channel function."""

    def __init__(self, channel: Optional[Callable] = None) -> None:
        self._channel = channel or (lambda x: x)
        self._queue: list[jnp.ndarray] = []

    def transmit(self, samples: jnp.ndarray) -> None:
        self._queue.append(self._channel(samples))

    def receive(self) -> Optional[jnp.ndarray]:
        return self._queue.pop(0) if self._queue else None


class LowerPhy:
    """Slot-synchronous lower PHY for one carrier/sector."""

    def __init__(self, config: LowerPhyConfig, radio: LoopbackRadio) -> None:
        self.config = config
        self.radio = radio
        self.slot = numerology.SlotPoint(config.mu, 0, 0)

    def run_slot(self, dl_grid: Optional[jnp.ndarray]
                 ) -> Optional[jnp.ndarray]:
        """Process one slot: modulate+send DL, receive+demodulate UL.

        Returns the UL slot grid (or None when the radio has no samples).
        """
        c = self.config
        sis = self.slot.slot_in_subframe
        if dl_grid is not None:
            bb = ofdm.modulate_slot(dl_grid, c.mu, c.nfft, sis,
                                    c.center_freq_hz)
            self.radio.transmit(bb)
        rx = self.radio.receive()
        ul_grid = None
        if rx is not None:
            ul_grid = ofdm.demodulate_slot(rx, c.nsc, c.mu, c.nfft, sis,
                                           c.center_freq_hz)
        self.slot = self.slot + 1
        return ul_grid
