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
import numpy as np

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


class BasebandTimeline:
    """Free-running sample-timestamp → (slot count, symbol, offset)
    arithmetic (downlink_processor_baseband_impl.cpp:59-120).

    A subframe has a fixed sample count (nfft*14 + CPs per slot, with the
    long-CP extras on symbols 0 and 7<<mu of the SUBFRAME), so any
    timestamp decomposes as subframe → slot-in-subframe → symbol → offset
    via precomputed boundaries — no iteration at runtime.
    """

    def __init__(self, mu: int, nfft: int) -> None:
        self.mu = mu
        self.nfft = nfft
        self.slots_per_sf = numerology.slots_per_subframe(mu)
        self.slot_sizes = [numerology.slot_num_samples(mu, nfft, s)
                           for s in range(self.slots_per_sf)]
        self.sf_samples = sum(self.slot_sizes)
        self.slot_starts = np.cumsum([0] + self.slot_sizes[:-1])
        # per slot-in-subframe: symbol start offsets within the slot
        self.symbol_starts = []
        for s in range(self.slots_per_sf):
            cps = numerology.cp_lengths(mu, nfft, s)
            starts = np.cumsum([0] + [int(c) + nfft for c in cps[:-1]])
            self.symbol_starts.append(starts)

    def slot_size(self, slot_count: int) -> int:
        return self.slot_sizes[slot_count % self.slots_per_sf]

    def slot_start_sample(self, slot_count: int) -> int:
        sf, sis = divmod(slot_count, self.slots_per_sf)
        return sf * self.sf_samples + int(self.slot_starts[sis])

    def locate(self, timestamp: int) -> tuple[int, int, int]:
        """timestamp → (slot_count, symbol, offset_into_symbol)."""
        sf, rem = divmod(timestamp, self.sf_samples)
        sis = int(np.searchsorted(self.slot_starts, rem, side="right")) - 1
        rem -= int(self.slot_starts[sis])
        sym = int(np.searchsorted(self.symbol_starts[sis], rem,
                                  side="right")) - 1
        off = rem - int(self.symbol_starts[sis][sym])
        return sf * self.slots_per_sf + sis, sym, off


class AsyncLowerPhy:
    """Always-full baseband engine: the reference's 2-slot-deep pipeline
    (lower_phy_baseband_processor.cpp:96-181, max_processing_delay_slots)
    re-expressed as XLA async dispatch.

    TX: `pull_tx(n)` returns the next n baseband samples of the
    continuous DL stream.  The engine keeps `depth` future slots
    modulated ahead of the read cursor — the grid for slot N+depth is
    requested (upper-PHY callback) and its OFDM modulation dispatched
    while slot N streams out, and the amplitude controller rides the
    same dispatch (reference: amplitude_controller in the tx chain).

    RX: `push_rx(chunk)` consumes arbitrary-size UL baseband; whenever a
    slot's samples complete, its demodulation is dispatched and
    `notify_ul_grid(slot_count, grid)` fires — fire-and-forget, no host
    sync (uplink_processor notification style).
    """

    def __init__(self, config: LowerPhyConfig,
                 request_dl_grid: Callable[[int], Optional[jnp.ndarray]],
                 notify_ul_grid: Callable[[int, jnp.ndarray], None],
                 depth: int = 2,
                 enable_clipping: bool = False,
                 ceiling_dbfs: float = 0.0) -> None:
        from . import amplitude
        self._amplitude = amplitude
        self.config = config
        self.timeline = BasebandTimeline(config.mu, config.nfft)
        self.request_dl_grid = request_dl_grid
        self.notify_ul_grid = notify_ul_grid
        self.depth = depth
        self.enable_clipping = enable_clipping
        self.ceiling_dbfs = ceiling_dbfs
        self.tx_stats = None               # last slot's AmplitudeStats
        self._tx_slots: list = []          # modulated, in slot order
        self._tx_next_slot = 0
        self._tx_offset = 0                # cursor into _tx_slots[0]
        self._rx_buf: list = []
        self._rx_have = 0
        self._rx_slot = 0

    # ------------------------------------------------------------ downlink
    def _fill_tx(self) -> None:
        c = self.config
        while len(self._tx_slots) < self.depth:
            slot = self._tx_next_slot
            self._tx_next_slot += 1
            sis = slot % self.timeline.slots_per_sf
            grid = self.request_dl_grid(slot)
            if grid is None:
                bb = jnp.zeros((self.timeline.slot_size(slot),),
                               jnp.complex64)
            else:
                bb = ofdm.modulate_slot(grid, c.mu, c.nfft, sis,
                                        c.center_freq_hz)
                bb, self.tx_stats = self._amplitude.control(
                    bb, c.tx_gain_db, self.enable_clipping,
                    self.ceiling_dbfs)
            self._tx_slots.append(bb)

    def pull_tx(self, nof_samples: int) -> jnp.ndarray:
        """Next nof_samples of the continuous DL baseband stream."""
        out = []
        need = nof_samples
        while need > 0:
            self._fill_tx()
            cur = self._tx_slots[0]
            avail = cur.shape[-1] - self._tx_offset
            take = min(avail, need)
            out.append(cur[..., self._tx_offset:self._tx_offset + take])
            self._tx_offset += take
            need -= take
            if self._tx_offset == cur.shape[-1]:
                self._tx_slots.pop(0)
                self._tx_offset = 0
        return out[0] if len(out) == 1 else jnp.concatenate(out, axis=-1)

    # -------------------------------------------------------------- uplink
    def push_rx(self, chunk: jnp.ndarray) -> None:
        """Consume UL baseband; complete slots dispatch asynchronously."""
        c = self.config
        self._rx_buf.append(chunk)
        self._rx_have += int(chunk.shape[-1])
        while self._rx_have >= self.timeline.slot_size(self._rx_slot):
            size = self.timeline.slot_size(self._rx_slot)
            flat = (self._rx_buf[0] if len(self._rx_buf) == 1
                    else jnp.concatenate(self._rx_buf, axis=-1))
            slot_bb = flat[..., :size]
            rest = flat[..., size:]
            self._rx_buf = [rest] if rest.shape[-1] else []
            self._rx_have -= size
            sis = self._rx_slot % self.timeline.slots_per_sf
            grid = ofdm.demodulate_slot(slot_bb, c.nsc, c.mu, c.nfft, sis,
                                        c.center_freq_hz)
            self.notify_ul_grid(self._rx_slot, grid)
            self._rx_slot += 1


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
