"""CRC calculators for all 3GPP generator polynomials (TS 38.212 §5.1).

TPU-native design: a CRC over GF(2) is a linear map, so the device-side
calculator is a single int8 matmul against a precomputed remainder matrix
``M[i] = x^(L-1-i+p) mod g(x)`` followed by a mod-2 — this rides the MXU and
batches over codeblocks, replacing the reference's byte-LUT / CLMUL scalar
loops (lib/phy/upper/channel_coding/crc_calculator_lut_impl.cpp,
crc_calculator_clmul_impl.cpp).

The host-side numpy path uses the same remainder tables for test parity.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# Generator polynomials, MSB (x^p) implicit: value holds coefficients of
# x^(p-1)..x^0 (TS 38.212 §5.1).
POLYNOMIALS: dict[str, tuple[int, int]] = {
    # name: (degree, coefficients below the leading term)
    "crc24A": (24, 0x864CFB),
    "crc24B": (24, 0x800063),
    "crc24C": (24, 0xB2B117),
    "crc16": (16, 0x1021),
    "crc11": (11, 0x621),
    "crc6": (6, 0x21),
}

# Lazily grown tables of x^k mod g(x) (as integers, degree-p remainders).
_power_tables: dict[str, list[int]] = {}


def _powers(name: str, upto: int) -> list[int]:
    """Return table P with P[k] = x^k mod g(x) for k in [0, upto]."""
    degree, coeffs = POLYNOMIALS[name]
    table = _power_tables.setdefault(name, [1])
    top = 1 << degree
    while len(table) <= upto:
        r = table[-1] << 1
        if r & top:
            r ^= top | coeffs
        table.append(r)
    return table


@functools.lru_cache(maxsize=256)
def remainder_matrix(name: str, msg_len: int) -> np.ndarray:
    """[msg_len, degree] uint8 matrix M with crc = bits @ M (mod 2).

    Row i is the remainder of x^(msg_len-1-i+degree) mod g(x), bit j of the
    output being the coefficient of x^(degree-1-j) (CRC bits MSB-first).
    """
    degree, _ = POLYNOMIALS[name]
    powers = _powers(name, msg_len - 1 + degree)
    m = np.zeros((msg_len, degree), dtype=np.uint8)
    for i in range(msg_len):
        r = powers[msg_len - 1 - i + degree]
        for j in range(degree):
            m[i, j] = (r >> (degree - 1 - j)) & 1
    return m


def crc_np(bits: np.ndarray, name: str) -> np.ndarray:
    """Host CRC: [..., L] {0,1} → [..., degree] {0,1} (MSB-first)."""
    m = remainder_matrix(name, bits.shape[-1])
    return (bits.astype(np.int64) @ m.astype(np.int64)) % 2


def crc(bits: jnp.ndarray, name: str) -> jnp.ndarray:
    """Device CRC via MXU matmul: [..., L] int8 {0,1} → [..., degree] int8."""
    m = jnp.asarray(remainder_matrix(name, bits.shape[-1]), dtype=jnp.int8)
    acc = jnp.matmul(bits.astype(jnp.int8), m, preferred_element_type=jnp.int32)
    return (acc & 1).astype(jnp.int8)


def crc_attach(bits: jnp.ndarray, name: str) -> jnp.ndarray:
    """Append CRC bits: [..., L] → [..., L + degree]."""
    return jnp.concatenate([bits, crc(bits, name)], axis=-1)


def crc_check(bits_with_crc: jnp.ndarray, name: str) -> jnp.ndarray:
    """[..., L+degree] → [...] bool, True when the CRC matches."""
    degree, _ = POLYNOMIALS[name]
    payload = bits_with_crc[..., :-degree]
    expected = crc(payload, name)
    return jnp.all(expected == bits_with_crc[..., -degree:], axis=-1)
