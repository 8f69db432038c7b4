"""Pallas TPU kernel: QC-LDPC encoder.

The XLA-graph encoder (encoder.py) emits ~650 tiny roll/XOR HLO ops per
codeword batch; per-op launch overhead makes the TX chain latency-bound.
This kernel performs the whole double-diagonal solve in one VMEM-resident
program (same restructuring that took the decoder from ~40 ms to sub-ms).

Layout: message blocks [8, K_b*Z] int32 in VMEM; all cyclic shifts are
static jnp.roll (measured ~15 ns/op in-kernel); output is the full
codeword [8, N_full*Z] int8.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encoder import _core_p0_shift
from .graphs import lifted_graph

B_TILE = 8


def _make_kernel(base_graph: int, z: int):
    graph = lifted_graph(base_graph, z)
    k = graph.nof_msg_blocks
    m = graph.nof_check_blocks
    n = graph.nof_var_blocks
    p0_shift = _core_p0_shift(graph)

    def rot(x, s):
        return jnp.roll(x, -(s % z), axis=1) if s % z else x

    def kernel(msg_ref, cw_ref, work):
        # copy message blocks into the int32 working codeword
        work[:, :k * z] = msg_ref[:].astype(jnp.int32)

        def blk(i):
            return work[:, i * z:(i + 1) * z]

        def row_acc(r, max_col):
            acc = None
            for c, s in zip(graph.row_cols[r], graph.row_shifts[r]):
                if c >= max_col:
                    continue
                t = rot(blk(c), s)
                acc = t if acc is None else acc ^ t
            return acc

        # core: p0 from the XOR of the four core rows
        lam = [row_acc(r, k) for r in range(4)]
        lam_sum = lam[0] ^ lam[1] ^ lam[2] ^ lam[3]
        work[:, k * z:(k + 1) * z] = (
            jnp.roll(lam_sum, p0_shift, axis=1) if p0_shift % z else lam_sum)

        # forward substitution p1..p3
        for r in range(3):
            new_col = k + 1 + r
            acc = row_acc(r, new_col)
            s_new = dict(zip(graph.row_cols[r],
                             graph.row_shifts[r]))[new_col]
            val = jnp.roll(acc, s_new, axis=1) if s_new % z else acc
            work[:, new_col * z:(new_col + 1) * z] = val

        # extension parities
        for r in range(4, m):
            acc = row_acc(r, k + 4)
            work[:, (k + r) * z:(k + r + 1) * z] = acc

        cw_ref[:] = work[:].astype(jnp.int8)

    return kernel, k, n


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _encode_tiles(msg: jnp.ndarray, base_graph: int, z: int,
                  interpret: bool) -> jnp.ndarray:
    kernel, k, n = _make_kernel(base_graph, z)
    bp = msg.shape[0]
    assert bp % B_TILE == 0
    return pl.pallas_call(
        kernel,
        grid=(bp // B_TILE,),
        in_specs=[pl.BlockSpec((B_TILE, k * z), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B_TILE, n * z), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n * z), jnp.int8),
        scratch_shapes=[pltpu.VMEM((B_TILE, n * z), jnp.int32)],
        interpret=interpret,
    )(msg)


def encode(msg_bits: jnp.ndarray, base_graph: int, lifting_size: int,
           interpret: bool = False) -> jnp.ndarray:
    """Same contract as encoder.encode: [batch, K] bits → [batch, N_full*Zc]."""
    graph = lifted_graph(base_graph, lifting_size)
    b, klen = msg_bits.shape
    assert klen == graph.nof_msg_blocks * lifting_size
    bp = -(-b // B_TILE) * B_TILE
    msg = msg_bits
    if bp != b:
        msg = jnp.concatenate(
            [msg, jnp.zeros((bp - b, klen), msg.dtype)], axis=0)
    cw = _encode_tiles(msg.astype(jnp.int8), base_graph, lifting_size,
                       interpret)
    return cw[:b]
