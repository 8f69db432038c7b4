"""Batched polar decoder — fast simplified successive cancellation (SSC).

Same node-specialization strategy as the reference
(polar_decoder_impl.h:34-83: rate-0 / rate-1 / repetition node classes, NOT
list decoding), but the tree recursion is unrolled at trace time into a
static graph of vectorized f/g/XOR ops over the batch dim.  Min-sum f and
exact g updates in float32.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import encoder as polar_encoder
from .code import PolarCode


def _f(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Check-node (min-sum): sign(a)sign(b)min(|a|,|b|)."""
    return jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a), jnp.abs(b))


def _g(a: jnp.ndarray, b: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Variable-node: b + (1-2u)·a given left partial sum u."""
    return b + (1.0 - 2.0 * u.astype(a.dtype)) * a


def _hard(llr: jnp.ndarray) -> jnp.ndarray:
    return (llr <= 0).astype(jnp.int8)  # positive LLR ⇒ bit 0


def decode(llr: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """SC-decode: [..., N] float32 codeword LLRs → [..., N] u-domain bits."""
    mask = np.asarray(code.frozen_mask, dtype=bool)
    assert llr.shape[-1] == code.n

    def rec(alpha: jnp.ndarray, m: np.ndarray):
        """Returns (beta x-domain bits, u-domain bits), both [..., size]."""
        size = alpha.shape[-1]
        if m.all():  # rate-0: all frozen -> u = x = 0
            z = jnp.zeros(alpha.shape, dtype=jnp.int8)
            return z, z
        if not m.any():  # rate-1: hard decision; u = enc(x) (G_N involution)
            beta = _hard(alpha)
            return beta, polar_encoder.encode(beta)
        if size > 1 and m[:-1].all() and not m[-1]:  # repetition node
            u_last = _hard(jnp.sum(alpha, axis=-1, keepdims=True))
            beta = jnp.broadcast_to(u_last, alpha.shape).astype(jnp.int8)
            u = jnp.concatenate(
                [jnp.zeros((*alpha.shape[:-1], size - 1), jnp.int8), u_last],
                axis=-1)
            return beta, u
        half = size // 2
        a, b = alpha[..., :half], alpha[..., half:]
        beta_l, u_l = rec(_f(a, b), m[:half])
        beta_r, u_r = rec(_g(a, b, beta_l), m[half:])
        beta = jnp.concatenate([beta_l ^ beta_r, beta_r], axis=-1)
        return beta, jnp.concatenate([u_l, u_r], axis=-1)

    _, u = rec(llr.astype(jnp.float32), mask)
    return u
