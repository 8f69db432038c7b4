"""Lifted LDPC base-graph construction (TS 38.212 §5.3.2).

Loads the spec shift-coefficient tables (data/tables_38212.npz, extracted
from the TS 38.212 Tables 5.3.2-2/5.3.2-3 constants) and materializes, for a
given (base_graph, lifting_size), the static edge structure used to
specialize the encoder/decoder kernels.  Counterpart of the reference's
ldpc_graph_impl (lib/phy/upper/channel_coding/ldpc/ldpc_graph_impl.h:39-55),
re-expressed as plain numpy index arrays consumed at trace time.
"""
from __future__ import annotations

import dataclasses
import functools
import importlib.resources
import numpy as np

from ...ran import ldpc_params
from ...ran.constants import (
    LDPC_BG1_K,
    LDPC_BG1_M,
    LDPC_BG1_N_FULL,
    LDPC_BG2_K,
    LDPC_BG2_M,
    LDPC_BG2_N_FULL,
)

NO_EDGE = 0xFFFF


@functools.lru_cache(maxsize=1)
def _tables() -> dict[str, np.ndarray]:
    ref = importlib.resources.files("srsran_project_23_5_tpu.data").joinpath(
        "tables_38212.npz")
    with ref.open("rb") as f:
        return dict(np.load(f))


@dataclasses.dataclass(frozen=True)
class LiftedGraph:
    """Static description of one lifted Tanner graph."""
    base_graph: int
    lifting_size: int
    nof_check_blocks: int      # M  (base rows / layers)
    nof_var_blocks: int        # N_full (base columns incl. punctured)
    nof_msg_blocks: int        # K_b (message columns: 22 or 10)
    # Per-row static edge structure (python lists of numpy arrays):
    row_cols: tuple[tuple[int, ...], ...]    # columns with an edge, per row
    row_shifts: tuple[tuple[int, ...], ...]  # cyclic shift per edge (mod Zc)

    @property
    def nof_edges(self) -> int:
        return sum(len(c) for c in self.row_cols)


@functools.lru_cache(maxsize=64)
def lifted_graph(base_graph: int, lifting_size: int) -> LiftedGraph:
    tabs = _tables()
    ils = ldpc_params.lifting_set_index(lifting_size)
    if base_graph == 1:
        v = tabs["ldpc_bg1"][ils]
        m, n, k = LDPC_BG1_M, LDPC_BG1_N_FULL, LDPC_BG1_K
    else:
        v = tabs["ldpc_bg2"][ils]
        m, n, k = LDPC_BG2_M, LDPC_BG2_N_FULL, LDPC_BG2_K
    row_cols, row_shifts = [], []
    for r in range(m):
        cols = np.nonzero(v[r] != NO_EDGE)[0]
        row_cols.append(tuple(int(c) for c in cols))
        row_shifts.append(tuple(int(v[r, c]) % lifting_size for c in cols))
    return LiftedGraph(
        base_graph=base_graph,
        lifting_size=lifting_size,
        nof_check_blocks=m,
        nof_var_blocks=n,
        nof_msg_blocks=k,
        row_cols=tuple(row_cols),
        row_shifts=tuple(row_shifts),
    )


def parity_check_dense(graph: LiftedGraph) -> np.ndarray:
    """Full lifted H as a dense {0,1} matrix — test/verification helper only."""
    z = graph.lifting_size
    h = np.zeros((graph.nof_check_blocks * z, graph.nof_var_blocks * z),
                 dtype=np.uint8)
    eye = np.eye(z, dtype=np.uint8)
    for r, (cols, shifts) in enumerate(zip(graph.row_cols, graph.row_shifts)):
        for c, s in zip(cols, shifts):
            # circulant P^s: entry (i, (i+s) mod Z) = 1
            h[r * z:(r + 1) * z, c * z:(c + 1) * z] = np.roll(eye, s, axis=1)
    return h
