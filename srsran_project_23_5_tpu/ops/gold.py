"""Gold (pseudo-random) sequence generation, TS 38.211 §5.2.1.

TPU-native design: the Gold sequence c(n) = x1(n+Nc) xor x2(n+Nc) is linear
in the x2 initial state (x1 has a fixed init), so a length-L block starting
at offset `off` is

    c = X1[off : off+L]  xor  (cinit_bits @ M2[:, off : off+L])  (mod 2)

one [B, 31] x [31, L] int8 MXU matmul per batch of cinit values.  This
replaces the reference's sequential state-skip generator
(lib/phy/upper/sequence_generators/pseudo_random_generator_impl.h:53-56)
with a closed form that batches over UEs/channels.

X1 and the basis matrix M2 are precomputed on the host with a vectorized
LFSR (the recurrences have dependency distance 28, so 28 steps are advanced
per numpy operation) and grown lazily to the longest requested sequence.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ran.constants import GOLD_NC

_STATE = 31


class _GoldTables:
    """Lazily grown x1 sequence and x2 basis-response matrix."""

    def __init__(self) -> None:
        self.length = 0          # valid sequence samples (past Nc offset)
        self.x1: np.ndarray | None = None          # [Nc + length]
        self.m2: np.ndarray | None = None          # [31, Nc + length]

    def grow(self, length: int) -> None:
        if length <= self.length:
            return
        total = GOLD_NC + length
        x1 = np.zeros(total + _STATE, dtype=np.uint8)
        x1[0] = 1
        # basis responses: row i is the x2 sequence for init state e_i
        m2 = np.zeros((_STATE, total + _STATE), dtype=np.uint8)
        m2[np.arange(_STATE), np.arange(_STATE)] = 1
        # x1(n+31) = x1(n+3) ^ x1(n);  x2(n+31) = x2(n+3)^x2(n+2)^x2(n+1)^x2(n)
        # Dependency distance 28 allows 28-wide vectorized steps.
        n = _STATE
        while n < total + _STATE:
            w = min(28, total + _STATE - n)
            s = slice(n, n + w)
            base = n - _STATE
            x1[s] = x1[base + 3:base + 3 + w] ^ x1[base:base + w]
            m2[:, s] = (m2[:, base + 3:base + 3 + w]
                        ^ m2[:, base + 2:base + 2 + w]
                        ^ m2[:, base + 1:base + 1 + w]
                        ^ m2[:, base:base + w])
            n += w
        self.x1 = x1[:total]
        self.m2 = m2[:, :total]
        self.length = length


_tables = _GoldTables()


def _cinit_bits_np(cinit: np.ndarray) -> np.ndarray:
    """[...] uint32 → [..., 31] bits, LSB-first (x2(i) = bit i of cinit)."""
    shifts = np.arange(_STATE, dtype=np.uint32)
    return ((np.asarray(cinit, dtype=np.uint32)[..., None] >> shifts) & 1).astype(np.uint8)


def gold_tables(length: int, offset: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Host tables (x1 slice, M2 slice) for `length` samples from `offset`."""
    _tables.grow(offset + length)
    lo = GOLD_NC + offset
    return _tables.x1[lo:lo + length], _tables.m2[:, lo:lo + length]


def gold_sequence(cinit: jnp.ndarray, length: int, offset: int = 0) -> jnp.ndarray:
    """Device Gold sequence: cinit [...] uint32 → [..., length] int8 {0,1}."""
    x1, m2 = gold_tables(length, offset)
    bits = _cinit_bits_jnp(cinit)
    acc = jnp.matmul(bits, jnp.asarray(m2, dtype=jnp.int8),
                     preferred_element_type=jnp.int32)
    return ((acc & 1) ^ jnp.asarray(x1, dtype=jnp.int32)).astype(jnp.int8)


def _cinit_bits_jnp(cinit: jnp.ndarray) -> jnp.ndarray:
    shifts = jnp.arange(_STATE, dtype=jnp.uint32)
    return ((cinit.astype(jnp.uint32)[..., None] >> shifts) & 1).astype(jnp.int8)


def gold_sequence_np(cinit: int, length: int, offset: int = 0) -> np.ndarray:
    """Host Gold sequence for tests: scalar cinit → [length] uint8."""
    x1, m2 = gold_tables(length, offset)
    bits = _cinit_bits_np(np.asarray(cinit))
    return (x1 ^ (bits.astype(np.int64) @ m2.astype(np.int64) % 2)).astype(np.uint8)
