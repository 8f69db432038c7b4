"""Short-block coding for UCI ≤ 11 bits (TS 38.212 §5.3.3, §5.4.3).

Encoder: the (32, K) Reed-Muller-like basis (Table 5.3.3.3-1) as one GF(2)
matmul; 1- and 2-bit special cases per §5.3.3.1-2.

Detector: brute-force ML correlation — all 2^K candidate codewords scored
against the soft bits with a single [batch, 32] x [32, 2^K] MXU matmul,
replacing the reference's scalar correlation loops
(lib/phy/upper/channel_coding/short/short_block_detector_impl.cpp).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .ldpc.graphs import _tables


@functools.lru_cache(maxsize=1)
def basis() -> np.ndarray:
    """(11, 32) basis sequences M_{i,n} transposed view (Table 5.3.3.3-1)."""
    return _tables()["short_block_basis"].astype(np.int8)


@functools.lru_cache(maxsize=16)
def codebook(k: int) -> np.ndarray:
    """All 2^k codewords in ±1 form: [2^k, 32] (bit 0 → +1)."""
    b = basis()[:k]                           # [k, 32]
    msgs = ((np.arange(1 << k)[:, None] >> np.arange(k)) & 1).astype(np.int8)
    cw = (msgs @ b) % 2                       # [2^k, 32]
    return (1 - 2 * cw).astype(np.float32)


def encode(bits: jnp.ndarray, e: int, qm: int = 2) -> jnp.ndarray:
    """[..., K] {0,1} → [..., E] encoded+rate-matched bits.

    K in [3, 11] uses the basis; K in {1, 2} uses the §5.3.3.1-2 special
    forms (placeholder x/y bits encoded as 1, matching the reference's
    handling before scrambling substitution).
    """
    k = bits.shape[-1]
    if k == 1:
        b0 = bits[..., 0:1]
        one = jnp.ones_like(b0)
        # c = [b0, y] per Qm; y placeholder = 1
        seq = jnp.concatenate([b0] + [one] * (qm - 1), axis=-1) if qm > 1 else b0
    elif k == 2:
        b0, b1 = bits[..., 0:1], bits[..., 1:2]
        b2 = b0 ^ b1
        one = jnp.ones_like(b0)
        if qm == 1:
            seq = jnp.concatenate([b0, b1, b2], axis=-1)
        else:
            # [c0 c1 x c2 c0 x c1 c2 x ...] pattern for Qm=2 (§5.3.3.2)
            seq = jnp.concatenate([b0, b1, one, b2, b0, one, b1, b2, one],
                                  axis=-1)
    else:
        m = jnp.asarray(basis()[:k].astype(np.int32))
        seq = (jnp.matmul(bits.astype(jnp.int32), m,
                          preferred_element_type=jnp.int32) & 1).astype(jnp.int8)
    # Rate matching §5.4.3: cyclic repetition to E bits.
    reps = -(-e // seq.shape[-1])
    tiled = jnp.concatenate([seq] * reps, axis=-1)
    return tiled[..., :e].astype(jnp.int8)


def detect(llr: jnp.ndarray, k: int, e: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ML-detect K in [3, 11] bits from [..., E] soft bits (LLR>0 ⇒ bit 0).

    Returns (bits [..., K], metric [...]) where metric is the normalized
    correlation of the best codeword (detection confidence).
    """
    assert 3 <= k <= 11
    # Fold the cyclic repetition back to 32 soft bits.
    reps = -(-e // 32)
    pad = reps * 32 - e
    padded = jnp.concatenate(
        [llr, jnp.zeros((*llr.shape[:-1], pad), llr.dtype)], axis=-1)
    folded = padded.reshape(*llr.shape[:-1], reps, 32).sum(axis=-2)
    cb = jnp.asarray(codebook(k))             # [2^k, 32]
    scores = jnp.matmul(folded, cb.T,
                        preferred_element_type=jnp.float32)  # [..., 2^k]
    best = jnp.argmax(scores, axis=-1)
    bits = ((best[..., None] >> jnp.arange(k)) & 1).astype(jnp.int8)
    norm = jnp.sqrt(jnp.sum(folded ** 2, axis=-1) * 32.0) + 1e-9
    metric = jnp.take_along_axis(scores, best[..., None], axis=-1)[..., 0] / norm
    return bits, metric
