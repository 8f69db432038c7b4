"""NZP-CSI-RS generation (TS 38.211 §7.4.1.5).

Common row configurations (1, 2, 4 ports, density 1/3) of Table 7.4.1.5.3-1,
mapped from Gold-sequence QPSK pilots — reference counterpart
lib/phy/upper/signal_processors/nzp_csi_rs_generator_impl.cpp.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ...ops import cplx, gold
from ...ran.constants import NRE


@dataclasses.dataclass(frozen=True)
class CsiRsConfig:
    row: int = 2                  # Table 7.4.1.5.3-1 row (1, 2 or 4)
    prb_start: int = 0
    nof_prb: int = 106
    symbol: int = 4               # l0
    subcarrier_offset: int = 0    # k0
    scrambling_id: int = 0
    slot_in_frame: int = 0
    amplitude: float = 1.0


def _cinit(cfg: CsiRsConfig) -> int:
    return ((1 << 10) * (14 * cfg.slot_in_frame + cfg.symbol + 1)
            * (2 * cfg.scrambling_id + 1) + cfg.scrambling_id) % (1 << 31)


def generate(cfg: CsiRsConfig, grid: jnp.ndarray) -> jnp.ndarray:
    """Write the CSI-RS resource onto [.., nsym, nsc] grid (port 0 view)."""
    if cfg.row == 1:
        # density 3, 1 port: k = k0 + {0,4,8} per PRB
        offs = np.array([0, 4, 8]) + cfg.subcarrier_offset
        seq_per_prb = 3
    elif cfg.row == 2:
        # density 1, 1 port: one RE per PRB
        offs = np.array([cfg.subcarrier_offset])
        seq_per_prb = 1
    elif cfg.row == 4:
        # 4 ports, CDM2 pairs at k0, k0+2 (port-0 component shown)
        offs = np.array([0, 2]) + cfg.subcarrier_offset
        seq_per_prb = 2
    else:
        raise NotImplementedError(f"CSI-RS row {cfg.row}")
    npil = cfg.nof_prb * seq_per_prb
    m0 = seq_per_prb * cfg.prb_start
    c = gold.gold_sequence(jnp.asarray(_cinit(cfg), dtype=jnp.uint32),
                           2 * npil, offset=2 * m0).astype(jnp.float32)
    pil = (((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
           ).astype(jnp.complex64) * cfg.amplitude
    # TPU-structured write: view the allocation's symbol row as
    # [nof_prb, NRE] and update the per-PRB offset columns with basic
    # (integer) indexing — dynamic_update_slice, not scatter.
    lo = cfg.prb_start * NRE
    seg = grid[..., cfg.symbol, lo:lo + cfg.nof_prb * NRE]
    blk = seg.reshape(*seg.shape[:-1], cfg.nof_prb, NRE)
    for i, off in enumerate(offs):
        blk = cplx.cset_col(blk, int(off),
                            cplx.cstride(pil, i, seq_per_prb)
                            if seq_per_prb > 1 else pil)
    return grid.at[..., cfg.symbol, lo:lo + cfg.nof_prb * NRE].set(
        blk.reshape(*seg.shape))
