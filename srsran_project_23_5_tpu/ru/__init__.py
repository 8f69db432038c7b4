"""RU abstraction (reference lib/ru): the upper PHY talks to a
radio_unit regardless of split — generic (lower PHY + radio, split 8)
or OFH (split 7.2).

Both expose: handle_dl_grid(context, grid) downlink and an on_ul_grid
callback upward (ru_generic_impl.h:51-75 / ru_ofh_impl).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

from ..ofh import OfhSector, OfhSectorConfig
from ..phy.lower import ofdm
from ..radio import RadioSession
from ..ran import numerology


@dataclasses.dataclass
class RuConfig:
    nof_prb: int = 106
    mu: int = 1

    @property
    def nfft(self) -> int:
        return numerology.min_nfft(self.nof_prb)


class RadioUnit:
    """radio_unit interface: DL-plane handler + UL-plane notifications."""

    def __init__(self) -> None:
        self.on_ul_grid: Callable[[tuple, np.ndarray], None] = \
            lambda ctx, grid: None

    def handle_dl_grid(self, ctx: tuple, grid) -> None:
        raise NotImplementedError

    def trigger_ul_slot(self, ctx: tuple) -> None:
        """Pull one UL slot from the underlying transport (loopback use)."""


class RuGeneric(RadioUnit):
    """Split 8: OFDM-modulates the grid and streams baseband through a
    radio session; receives baseband and demodulates to the UL grid."""

    def __init__(self, cfg: RuConfig, radio: RadioSession) -> None:
        super().__init__()
        self.cfg = cfg
        self.radio = radio
        self._ts = 0
        import jax
        self._mod = jax.jit(lambda g: ofdm.modulate_slot(
            g, cfg.mu, cfg.nfft))
        self._demod = jax.jit(lambda s: ofdm.demodulate_slot(
            s, cfg.nof_prb * 12, cfg.mu, cfg.nfft))

    def handle_dl_grid(self, ctx: tuple, grid) -> None:
        bb = np.asarray(self._mod(grid))
        self.radio.transmit(bb, self._ts)
        self._ts += len(bb)

    def trigger_ul_slot(self, ctx: tuple) -> None:
        samples, _ts = self.radio.receive()
        if samples is not None:
            import jax.numpy as jnp
            grid = np.asarray(self._demod(jnp.asarray(samples)))
            self.on_ul_grid(ctx, grid)


class RuOfh(RadioUnit):
    """Split 7.2: frequency-domain grids over eCPRI/Ethernet frames."""

    def __init__(self, cfg: RuConfig,
                 send_frame: Callable[[bytes], None]) -> None:
        super().__init__()
        self.cfg = cfg
        # loopback-symmetric eAxC: the sector's own DL stream id is also
        # accepted on receive (RU-to-DU UL rides the same id in tests)
        self.sector = OfhSector(OfhSectorConfig(nof_prb=cfg.nof_prb,
                                                eaxc_ul=0), send_frame)
        self.sector.on_ul_slot = lambda key, grid: self.on_ul_grid(key,
                                                                   grid)

    def handle_dl_grid(self, ctx: tuple, grid) -> None:
        frame, subframe, slot = ctx
        self.sector.transmit_dl_slot(frame, subframe, slot,
                                     np.asarray(grid))

    def handle_rx_frame(self, frame: bytes) -> None:
        self.sector.handle_rx_frame(frame)
