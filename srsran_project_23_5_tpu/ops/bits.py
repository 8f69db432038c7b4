"""Bit packing/unpacking primitives.

Framework convention: the canonical in-device representation of a bit string
is an int8 array with one bit per element, MSB-first with respect to the
packed byte form (matching the reference's bit_buffer semantics,
include/srsran/adt/bit_buffer.h).  Packed form is uint8, 8 bits per byte.

All device functions are shape-polymorphic over leading batch dims and
jit-friendly (static shapes, no data-dependent control flow).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_POW2 = np.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=np.uint8)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., 8*n] {0,1} int8 → [..., n] uint8, MSB-first."""
    *lead, length = bits.shape
    assert length % 8 == 0
    grouped = bits.reshape(*lead, length // 8, 8).astype(jnp.uint8)
    return (grouped * jnp.asarray(_POW2)).sum(axis=-1).astype(jnp.uint8)


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., n] uint8 → [..., 8*n] {0,1} int8, MSB-first."""
    *lead, nbytes = packed.shape
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(*lead, nbytes * 8).astype(jnp.int8)


def pack_bits_np(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.astype(np.uint8), axis=-1)


def unpack_bits_np(packed: np.ndarray) -> np.ndarray:
    return np.unpackbits(packed.astype(np.uint8), axis=-1).astype(np.int8)
