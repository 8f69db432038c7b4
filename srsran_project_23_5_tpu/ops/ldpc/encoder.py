"""Batched LDPC encoder (TS 38.212 §5.3.2) — TPU-idiomatic design.

The reference encodes one codeblock at a time with SIMD inner loops
(lib/phy/upper/channel_coding/ldpc/ldpc_encoder_impl.cpp, _avx2, _neon).
Here the batch of codeblocks is the parallel axis: messages are int8 bit
blocks [batch, K_b, Zc] and the whole encode is a static graph of cyclic
rolls + XORs over [batch, Zc] lanes, jit-specialized per (BG, Zc).

Algorithm (standard QC-LDPC double-diagonal solve):
1. lam_i = sum_j P^{s_ij} m_j for the 4 core rows (P^s x = roll(x, -s)).
2. XOR of all 4 core rows cancels the double-diagonal parity columns,
   leaving T p0 = Lam with T a sum of circulants that reduces to a single
   P^s for every 5G lifting set -> p0 = roll(Lam, s).
3. Forward-substitute rows 0..2 for p1, p2, p3.
4. Extension rows: p_ext = lam_row (XOR of message+core-parity contributions).

Output is the full lifted codeword [batch, N_full*Zc]; the rate matcher
consumes the punctured circular buffer (columns 2..N_full).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .graphs import LiftedGraph, lifted_graph


def _pshift(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Apply circulant P^s to block x: (P^s x)_k = x_{(k+s) mod Z}."""
    return jnp.roll(x, -s, axis=-1) if s else x


def _core_p0_shift(graph: LiftedGraph) -> int:
    """Effective single shift s with P^s p0 = XOR of the 4 core-row lams."""
    k = graph.nof_msg_blocks
    exps: list[int] = []
    for r in range(4):
        for c, s in zip(graph.row_cols[r], graph.row_shifts[r]):
            if c == k:  # the p0 column
                exps.append(s)
    # mod-2 cancellation of equal exponents
    residual = [e for e in set(exps) if exps.count(e) % 2 == 1]
    assert len(residual) == 1, f"unexpected core structure: {exps}"
    return residual[0]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _encode_impl(msg_blocks: jnp.ndarray, base_graph: int,
                 lifting_size: int) -> jnp.ndarray:
    graph = lifted_graph(base_graph, lifting_size)
    k = graph.nof_msg_blocks
    m = graph.nof_check_blocks
    z = graph.lifting_size

    def row_lam(r: int, blocks: list[jnp.ndarray], max_col: int) -> jnp.ndarray:
        acc = None
        for c, s in zip(graph.row_cols[r], graph.row_shifts[r]):
            if c >= max_col:
                continue
            term = _pshift(blocks[c], s)
            acc = term if acc is None else acc ^ term
        return acc

    mblocks = [msg_blocks[:, j, :] for j in range(k)]

    # Core rows: lam_i over message columns only.
    lam = [row_lam(r, mblocks, k) for r in range(4)]
    lam_sum = lam[0] ^ lam[1] ^ lam[2] ^ lam[3]
    p0 = jnp.roll(lam_sum, _core_p0_shift(graph), axis=-1)

    # Forward substitution for p1..p3 using rows 0..2: each row r contains
    # parity columns k..k+r+1; the highest one is the new unknown.
    parities = [p0]
    blocks_all = mblocks + parities
    for r in range(3):
        new_col = k + len(parities)
        acc = row_lam(r, blocks_all, new_col)  # msg + known parity terms
        s_new = dict(zip(graph.row_cols[r], graph.row_shifts[r]))[new_col]
        # P^{s_new} p_new = acc  ->  p_new = P^{-s_new} acc
        parities.append(jnp.roll(acc, s_new, axis=-1) if s_new else acc)
        blocks_all = mblocks + parities

    # Extension rows 4..m-1: single identity parity at column k+r.
    for r in range(4, m):
        acc = None
        for c, s in zip(graph.row_cols[r], graph.row_shifts[r]):
            if c < k + 4:
                term = _pshift(blocks_all[c], s)
                acc = term if acc is None else acc ^ term
        parities.append(acc)
        blocks_all = mblocks + parities

    cw = jnp.stack(blocks_all, axis=1)  # [batch, N_full, Z]
    return cw.reshape(cw.shape[0], graph.nof_var_blocks * z)


def encode(msg_bits: jnp.ndarray, base_graph: int,
           lifting_size: int) -> jnp.ndarray:
    """Encode a batch of codeblocks.

    msg_bits: [batch, K] {0,1} int8 with K = K_b*Zc (filler bits must
    already be zero).  Returns the full codeword [batch, N_full*Zc];
    the transmit circular buffer is codeword[:, 2*Zc:].
    """
    graph = lifted_graph(base_graph, lifting_size)
    b, klen = msg_bits.shape
    assert klen == graph.nof_msg_blocks * lifting_size
    blocks = msg_bits.reshape(b, graph.nof_msg_blocks, lifting_size)
    return _encode_impl(blocks, base_graph, lifting_size)


def encode_np(msg_bits: np.ndarray, base_graph: int,
              lifting_size: int) -> np.ndarray:
    """Host reference encode via dense H solve — for tests only."""
    from .graphs import parity_check_dense
    graph = lifted_graph(base_graph, lifting_size)
    h = parity_check_dense(graph)
    z = lifting_size
    k = graph.nof_msg_blocks * z
    n = graph.nof_var_blocks * z
    m = n - k
    # Solve H [msg; p]^T = 0 by Gaussian elimination on the parity part.
    hp = h[:, k:].astype(np.uint8)
    rhs = (h[:, :k] @ msg_bits.T.astype(np.uint8)) % 2  # [m, batch]
    # Gaussian elimination over GF(2)
    hp = hp.copy()
    rhs = rhs.copy()
    piv_cols = []
    row = 0
    for col in range(m):
        piv = None
        for r2 in range(row, m):
            if hp[r2, col]:
                piv = r2
                break
        if piv is None:
            continue
        hp[[row, piv]] = hp[[piv, row]]
        rhs[[row, piv]] = rhs[[piv, row]]
        for r2 in range(m):
            if r2 != row and hp[r2, col]:
                hp[r2] ^= hp[row]
                rhs[r2] ^= rhs[row]
        piv_cols.append(col)
        row += 1
    assert row == m, "H parity part not full rank"
    p = np.zeros((m, msg_bits.shape[0]), dtype=np.uint8)
    for i, col in enumerate(piv_cols):
        p[col] = rhs[i]
    return np.concatenate([msg_bits.astype(np.uint8), p.T], axis=1)
