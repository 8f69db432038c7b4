"""Polar encoder: x = u · G_N via butterfly XOR stages (TS 38.212 §5.3.1).

The log2(N) butterfly stages are static reshape+XOR operations that batch
over leading dims — the TPU equivalent of the reference's stage loop
(lib/phy/upper/channel_coding/polar/polar_encoder_impl.cpp).
"""
from __future__ import annotations

import jax.numpy as jnp


def allocate(info_bits: jnp.ndarray, info_set: tuple[int, ...],
             n: int) -> jnp.ndarray:
    """Place K info bits into the u-domain vector (frozen = 0).

    info_bits: [..., K] {0,1}; returns [..., N].
    Counterpart of polar_allocator_impl.cpp.  Expressed as one static
    GATHER (u = extended_info[perm]) instead of a scatter — generic
    scatters serialize (and int8 scatters have misbehaved) on the TPU
    backend.
    """
    import numpy as np

    k = info_bits.shape[-1]
    perm = np.full(n, k, dtype=np.int32)      # index k = the frozen zero
    perm[np.asarray(info_set, dtype=np.int32)] = np.arange(k)
    zero = jnp.zeros((*info_bits.shape[:-1], 1), dtype=info_bits.dtype)
    ext = jnp.concatenate([info_bits, zero], axis=-1)
    return ext[..., jnp.asarray(perm)]


def encode(u: jnp.ndarray) -> jnp.ndarray:
    """[..., N] u-domain bits → [..., N] codeword (G_N = F^{⊗log2 N})."""
    n = u.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    x = u
    # Stage s combines pairs at distance n >> (s+1):
    # x = [x_left ^ x_right, x_right] recursively (no bit reversal in NR).
    for s in range(log_n):
        half = n >> (s + 1)
        shaped = x.reshape(*x.shape[:-1], 1 << s, 2, half)
        left = shaped[..., 0, :] ^ shaped[..., 1, :]
        right = shaped[..., 1, :]
        x = jnp.stack([left, right], axis=-2).reshape(*u.shape[:-1], n)
    return x


def extract_message(u_hat: jnp.ndarray, info_set: tuple[int, ...]
                    ) -> jnp.ndarray:
    """[..., N] decoded u-domain bits → [..., K] info bits
    (polar_deallocator_impl.cpp)."""
    return u_hat[..., jnp.asarray(info_set)]
