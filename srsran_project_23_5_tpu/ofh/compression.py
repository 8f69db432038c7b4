"""O-RAN fronthaul IQ compression (reference lib/ofh/compression).

Block floating point (BFP) per O-RAN WG4 CUS §A.1: each PRB's 24 real
int values share a 4-bit exponent; mantissas are `width`-bit signed.
The reference ships AVX2/AVX512 kernels (iq_compression_bfp_avx2.cpp);
here the compressor is a batched JAX function (VPU-vectorized over all
PRBs of a symbol at once) with a numpy host-side twin for the packing
path, plus the identity "none" scheme (16-bit).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

IQ_SCALE = 32767.0          # float grid → int16 full scale


def bfp_params(iq: jnp.ndarray, width: int) -> tuple[jnp.ndarray,
                                                     jnp.ndarray]:
    """JAX: per-PRB exponent + quantized mantissas.

    iq: [..., nof_prb, 24] float32 (interleaved I/Q scaled to ±1).
    Returns (exponents [..., nof_prb] int32, mantissas [..., nof_prb, 24]
    int32 in [-2^(w-1), 2^(w-1)-1]).
    """
    scaled = iq * IQ_SCALE
    max_abs = jnp.max(jnp.abs(scaled), axis=-1)
    # exponent: smallest e such that max_abs >> e fits in (width-1) bits
    raw_bits = jnp.ceil(jnp.log2(jnp.maximum(max_abs, 1.0) + 1.0))
    exp = jnp.maximum(raw_bits - (width - 1), 0).astype(jnp.int32)
    mant = jnp.round(scaled / (2.0 ** exp)[..., None]).astype(jnp.int32)
    lim = 2 ** (width - 1) - 1
    mant = jnp.clip(mant, -lim - 1, lim)
    return exp, mant


def bfp_reconstruct(exp: jnp.ndarray, mant: jnp.ndarray) -> jnp.ndarray:
    """JAX: mantissas+exponent → float IQ in ±1."""
    return (mant.astype(jnp.float32) * (2.0 ** exp)[..., None]) / IQ_SCALE


def _pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack signed ints MSB-first at `width` bits each."""
    u = (values & ((1 << width) - 1)).astype(np.int64)
    acc = 0
    for v in u.ravel():
        acc = (acc << width) | int(v)
    nbits = width * values.size
    pad = (-nbits) % 8
    acc <<= pad
    return int(acc).to_bytes((nbits + pad) // 8, "big")


def _unpack_bits(data: bytes, count: int, width: int) -> np.ndarray:
    acc = int.from_bytes(data, "big")
    total = 8 * len(data)
    out = np.empty(count, dtype=np.int64)
    for i in range(count):
        shift = total - (i + 1) * width
        v = (acc >> shift) & ((1 << width) - 1)
        if v >= 1 << (width - 1):
            v -= 1 << width
        out[i] = v
    return out


def compress_prbs(iq: np.ndarray, width: int = 9) -> bytes:
    """Host path: [nof_prb, 12] complex → O-RAN BFP bytes
    (per PRB: 1 exponent byte + 12*2*width bits of mantissas)."""
    iq = np.asarray(iq)
    flat = np.empty((iq.shape[0], 24), dtype=np.float32)
    flat[:, 0::2] = iq.real
    flat[:, 1::2] = iq.imag
    if width == 16:               # "none" compression
        vals = np.round(flat * IQ_SCALE).astype(np.int16)
        return vals.tobytes()
    exp, mant = jax.jit(bfp_params, static_argnums=1)(
        jnp.asarray(flat), width)
    exp = np.asarray(exp)
    mant = np.asarray(mant)
    out = bytearray()
    for p in range(iq.shape[0]):
        out.append(int(exp[p]) & 0x0F)
        out += _pack_bits(mant[p], width)
    return bytes(out)


def decompress_prbs(data: bytes, nof_prb: int, width: int = 9
                    ) -> np.ndarray:
    """Host path: O-RAN BFP bytes → [nof_prb, 12] complex64."""
    if width == 16:
        vals = np.frombuffer(data, dtype=np.int16).astype(np.float32)
        flat = vals.reshape(nof_prb, 24) / IQ_SCALE
        return (flat[:, 0::2] + 1j * flat[:, 1::2]).astype(np.complex64)
    per_prb = 1 + (24 * width + 7) // 8
    out = np.empty((nof_prb, 12), dtype=np.complex64)
    for p in range(nof_prb):
        chunk = data[p * per_prb:(p + 1) * per_prb]
        exp = chunk[0] & 0x0F
        mant = _unpack_bits(chunk[1:], 24, width).astype(np.float32)
        flat = mant * (2.0 ** exp) / IQ_SCALE
        out[p] = flat[0::2] + 1j * flat[1::2]
    return out


def compressed_prb_size(width: int) -> int:
    if width == 16:
        return 48
    return 1 + (24 * width + 7) // 8
