"""DM-RS sequence generation and type-1 mapping (TS 38.211 §6.4.1.1, §7.4.1.1).

Pilot values come from the batched Gold generator (one MXU matmul); mapping
positions are static per configuration.  Counterpart of the reference's
dmrs_pdsch_processor_impl / dmrs_pusch_estimator_impl pilot generation
(lib/phy/upper/signal_processors/).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..ran.constants import NRE
from . import gold


def dmrs_cinit(slot_in_frame: int, symbol: int, nid: int, n_scid: int) -> int:
    """c_init for DM-RS (TS 38.211 §7.4.1.1.1 / §6.4.1.1.1)."""
    return ((1 << 17) * (14 * slot_in_frame + symbol + 1) * (2 * nid + 1)
            + 2 * nid + n_scid) % (1 << 31)


@functools.lru_cache(maxsize=256)
def type1_sc_indices(prb_start: int, nof_prb: int, delta: int) -> np.ndarray:
    """Subcarrier indices of type-1 (comb-2) pilots for one CDM group."""
    prbs = np.arange(prb_start, prb_start + nof_prb)
    base = prbs[:, None] * NRE + np.arange(0, NRE, 2)[None, :] + delta
    return base.reshape(-1).astype(np.int32)


def type1_sequence_indices(prb_start: int, nof_prb: int) -> np.ndarray:
    """Gold-pair index m of each pilot (r(m)); type 1 uses 6 values per PRB,
    consumed relative to reference point PRB 0."""
    prbs = np.arange(prb_start, prb_start + nof_prb)
    m = prbs[:, None] * 6 + np.arange(6)[None, :]
    return m.reshape(-1).astype(np.int32)


def pilot_values(cinit: jnp.ndarray, prb_start: int, nof_prb: int
                 ) -> jnp.ndarray:
    """QPSK pilots r(m) for the allocated PRBs: [..., 6*nof_prb] complex64.

    cinit may be batched (e.g. one per DM-RS symbol).
    """
    m0 = 6 * prb_start
    count = 6 * nof_prb
    c = gold.gold_sequence(cinit, 2 * count, offset=2 * m0).astype(jnp.float32)
    c_even = c[..., 0::2]
    c_odd = c[..., 1::2]
    return ((1.0 - 2.0 * c_even) + 1j * (1.0 - 2.0 * c_odd)).astype(
        jnp.complex64) / np.sqrt(2.0)


def map_onto_symbols(grid: jnp.ndarray, pilots: jnp.ndarray,
                     dmrs_symbols: tuple[int, ...], sc_idx: np.ndarray,
                     amplitude: float = 1.0) -> jnp.ndarray:
    """Write pilots into grid symbols.

    grid: [..., nsym, nsc]; pilots: [len(dmrs_symbols), npilot] (or
    broadcastable).  Returns updated grid.
    """
    scs = jnp.asarray(sc_idx)
    for i, l in enumerate(dmrs_symbols):
        grid = grid.at[..., l, scs].set(amplitude * pilots[i])
    return grid


def extract_from_symbols(grid: jnp.ndarray, dmrs_symbols: tuple[int, ...],
                         sc_idx: np.ndarray) -> jnp.ndarray:
    """Gather pilot REs: [..., nsym, nsc] → [..., len(dmrs_symbols), npilot]."""
    scs = jnp.asarray(sc_idx)
    cols = [grid[..., l, scs] for l in dmrs_symbols]
    return jnp.stack(cols, axis=-2)
