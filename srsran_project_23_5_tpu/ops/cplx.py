"""Float-plane complex layout ops for the TPU backend.

The axon backend implements complex64 arithmetic, FFTs, contiguous and
stride-2 slicing — but NOT odd-stride slicing, transposes, or column
picks of complex data (UNIMPLEMENTED; probed in tools/probe_axon2.py:
float stride-3 ok, complex stride-3 / reshape+swapaxes fail).  These
helpers perform the layout on float32 real/imag planes and recombine
with `lax.complex` — the same data movement, twice on float lanes, which
the VPU handles natively.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _planes(x):
    return jnp.real(x), jnp.imag(x)


def cstride(x: jnp.ndarray, start: int, step: int) -> jnp.ndarray:
    """x[..., start::step] for complex x."""
    r, i = _planes(x)
    return jax.lax.complex(r[..., start::step], i[..., start::step])


def cinterleave(cols: list[jnp.ndarray]) -> jnp.ndarray:
    """stack(cols, axis=-1).reshape(..., n*len(cols)) for complex cols."""
    rs = jnp.stack([jnp.real(c) for c in cols], axis=-1)
    is_ = jnp.stack([jnp.imag(c) for c in cols], axis=-1)
    shp = (*rs.shape[:-2], rs.shape[-2] * rs.shape[-1])
    return jax.lax.complex(rs.reshape(shp), is_.reshape(shp))


def cpick(x: jnp.ndarray, idx: int) -> jnp.ndarray:
    """x[..., idx] (static int) for complex x."""
    r, i = _planes(x)
    return jax.lax.complex(r[..., idx], i[..., idx])


def cset_col(x: jnp.ndarray, idx: int, val: jnp.ndarray) -> jnp.ndarray:
    """x.at[..., idx].set(val) (static int column) for complex x."""
    r, i = _planes(x)
    return jax.lax.complex(r.at[..., idx].set(jnp.real(val)),
                           i.at[..., idx].set(jnp.imag(val)))


def cgather(x: jnp.ndarray, idx) -> jnp.ndarray:
    """x[..., idx] with an index ARRAY (static) for complex x."""
    idx = jnp.asarray(idx)
    r, i = _planes(x)
    return jax.lax.complex(r[..., idx], i[..., idx])


def clayer_split(x: jnp.ndarray, nof_layers: int) -> jnp.ndarray:
    """[..., M] → [..., L, M/L] with lay[l, i] = x[i*L + l]
    (TS 38.211 layer mapping) — complex-transpose-free."""
    return jnp.stack([cstride(x, l, nof_layers)
                      for l in range(nof_layers)], axis=-2)
