"""Polar rate matching / dematching (TS 38.212 §5.4.1).

Sub-block interleaving + repetition/puncturing/shortening as static
gathers; recovery restores codeword LLRs with 0 (punctured/unknown) or
+infinity (shortened/known-zero) sentinels.  Counterpart of
polar_rate_matcher_impl.cpp / polar_rate_dematcher_impl.cpp.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .code import PolarCode, RateMatchMode, subblock_interleaver


def match(codeword: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """[..., N] {0,1} → [..., E]."""
    jn = jnp.asarray(subblock_interleaver(code.n))
    y = codeword[..., jn]
    if code.mode == RateMatchMode.REPETITION:
        idx = np.arange(code.e) % code.n
        return y[..., jnp.asarray(idx)]
    if code.mode == RateMatchMode.PUNCTURING:
        return y[..., code.n - code.e:]
    return y[..., :code.e]  # shortening


def dematch(llr: jnp.ndarray, code: PolarCode,
            infty: float = 1e4) -> jnp.ndarray:
    """[..., E] LLRs → [..., N] codeword LLRs (pre-deinterleaved)."""
    lead = llr.shape[:-1]
    y = jnp.zeros((*lead, code.n), dtype=llr.dtype)
    if code.mode == RateMatchMode.REPETITION:
        idx = np.arange(code.e) % code.n
        y = y.at[..., jnp.asarray(idx)].add(llr)
    elif code.mode == RateMatchMode.PUNCTURING:
        y = y.at[..., code.n - code.e:].set(llr)
    else:  # shortening: untransmitted bits are known zeros
        y = y.at[..., :code.e].set(llr)
        y = y.at[..., code.e:].set(infty)
    jn = jnp.asarray(subblock_interleaver(code.n))
    x = jnp.zeros_like(y)
    return x.at[..., jn].set(y)
