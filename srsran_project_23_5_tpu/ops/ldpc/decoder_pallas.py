"""Pallas TPU kernel: layered normalized min-sum LDPC decoder.

The XLA-graph decoder (decoder.py) expresses each of the ~316 edge updates
as separate HLO ops on [batch, Zc] tensors; per-op dispatch overhead makes
it latency-bound (~tens of ms per slot's codeblocks).  This kernel runs the
ENTIRE layered schedule — all layers × iterations — inside one Pallas
program with the a-posteriori LLRs and check-to-variable messages resident
in VMEM, compiling to straight VPU vector code with no per-op overhead.

Memory layout (per grid step, batch tile of 8 codeblocks):
  app  : [8, N*Z]  f32 VMEM scratch — variable-node LLRs, blocks at Z-strides
  c2v  : [8, E*Z]  f32 VMEM scratch — per-edge check-to-variable messages
  tbuf : [8, d_max*Z] f32 — variable-to-check messages of the active layer
For Zc = 384 every block slice is 3×128 lanes, perfectly tiled; smaller
lifting sizes still work via Mosaic's masked lane handling.

min2 selection uses the |t|==m1 equality trick (ties ⇒ m1==m2) instead of
an argmin index, keeping everything elementwise.  The syndrome is computed
in-kernel after the final iteration (sign-product per check row).

Reference counterpart: ldpc_decoder_impl.cpp:116-134 + AVX512 node kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .graphs import lifted_graph

B_TILE = 8
_BIG = 3.0e38


def _layers(graph):
    out, e0 = [], 0
    for cols, shifts in zip(graph.row_cols, graph.row_shifts):
        out.append((e0, tuple(cols), tuple(shifts)))
        e0 += len(cols)
    return out, e0


def _make_kernel(base_graph: int, z: int, nof_iterations: int, scale: float,
                 early_termination: bool = True):
    graph = lifted_graph(base_graph, z)
    n = graph.nof_var_blocks
    k = graph.nof_msg_blocks
    layers, n_edges = _layers(graph)
    d_max = max(len(c) for _, c, _ in layers)

    def blk(ref, i):
        return ref[:, i * z:(i + 1) * z]

    def rot(x, s):
        # Mosaic rejects zero-length slices from roll-by-0.
        return jnp.roll(x, -(s % z), axis=1) if s % z else x

    def kernel(llr_ref, bits_ref, ok_ref, app, c2v, tbuf):
        app[:] = llr_ref[:]
        c2v[:] = jnp.zeros_like(c2v)

        def syndrome_ok():
            """1.0 iff every check row of every CB in the tile is satisfied
            (in-kernel analogue of the reference's per-iteration CRC early
            stop, ldpc_decoder_impl.cpp:126-133)."""
            allmin = jnp.float32(1.0)
            for e0, cols, shifts in layers:
                rowsgn = jnp.ones((B_TILE, z), jnp.float32)
                for c, s in zip(cols, shifts):
                    v = rot(blk(app, c), s)
                    rowsgn = rowsgn * jnp.where(v <= 0.0, -1.0, 1.0)
                allmin = jnp.minimum(allmin, jnp.min(rowsgn))
            return allmin

        def update_layers():
            for e0, cols, shifts in layers:
                m1 = jnp.full((B_TILE, z), _BIG, jnp.float32)
                m2 = jnp.full((B_TILE, z), _BIG, jnp.float32)
                sgnprod = jnp.ones((B_TILE, z), jnp.float32)
                for i, (c, s) in enumerate(zip(cols, shifts)):
                    t = rot(blk(app, c), s) - blk(c2v, e0 + i)
                    tbuf[:, i * z:(i + 1) * z] = t
                    a = jnp.abs(t)
                    new_m1 = jnp.minimum(m1, a)
                    m2 = jnp.where(a < m1, m1, jnp.minimum(m2, a))
                    m1 = new_m1
                    sgnprod = sgnprod * jnp.where(t < 0.0, -1.0, 1.0)
                for i, (c, s) in enumerate(zip(cols, shifts)):
                    t = tbuf[:, i * z:(i + 1) * z]
                    a = jnp.abs(t)
                    sgn = jnp.where(t < 0.0, -1.0, 1.0)
                    msg = scale * sgnprod * sgn * jnp.where(a == m1, m2, m1)
                    c2v[:, (e0 + i) * z:(e0 + i + 1) * z] = msg
                    app[:, c * z:(c + 1) * z] = rot(t + msg, z - s)

        def body(carry):
            it, _ = carry
            update_layers()
            # early termination: stop iterating once the whole tile's
            # syndrome is clean (typical-case latency lever; high-SNR
            # decodes converge in 2-3 of the max iterations)
            notdone = jnp.where(syndrome_ok() > 0.0, jnp.int32(0),
                                jnp.int32(1))
            return it + 1, notdone

        if early_termination:
            jax.lax.while_loop(
                lambda c: (c[0] < nof_iterations) & (c[1] > 0),
                body, (jnp.int32(0), jnp.int32(1)))
        else:
            def fixed_body(_, carry):
                update_layers()
                return carry
            jax.lax.fori_loop(0, nof_iterations, fixed_body, 0)

        # Hard decisions + syndrome (sign-domain: row product of signs must
        # be positive on every lane of every check row).
        ok = jnp.ones((B_TILE, 128), jnp.float32)
        for e0, cols, shifts in layers:
            rowsgn = jnp.ones((B_TILE, z), jnp.float32)
            for c, s in zip(cols, shifts):
                v = rot(blk(app, c), s)
                rowsgn = rowsgn * jnp.where(v <= 0.0, -1.0, 1.0)
            # row satisfied iff every lane positive
            row_ok = jnp.min(rowsgn, axis=1, keepdims=True)  # [B, 1]
            ok = ok * jnp.broadcast_to(row_ok, (B_TILE, 128))
        ok_ref[:] = (ok > 0.0).astype(jnp.int32)
        bits_ref[:] = (app[:, :k * z] <= 0.0).astype(jnp.int8)

    return kernel, n, k, n_edges, d_max


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _decode_tiles(llr: jnp.ndarray, base_graph: int, z: int,
                  nof_iterations: int, scale: float, interpret: bool,
                  early_termination: bool = True):
    kernel, n, k, n_edges, d_max = _make_kernel(
        base_graph, z, nof_iterations, scale, early_termination)
    bp = llr.shape[0]
    assert bp % B_TILE == 0
    grid = (bp // B_TILE,)
    bits, ok = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((B_TILE, n * z), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((B_TILE, k * z), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, k * z), jnp.int8),
            jax.ShapeDtypeStruct((bp, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B_TILE, n * z), jnp.float32),
            pltpu.VMEM((B_TILE, n_edges * z), jnp.float32),
            pltpu.VMEM((B_TILE, d_max * z), jnp.float32),
        ],
        interpret=interpret,
    )(llr)
    return bits, ok[:, 0] != 0


def decode(llr: jnp.ndarray, base_graph: int, lifting_size: int,
           nof_iterations: int = 6, scale: float = 0.8,
           interpret: bool = False,
           early_termination: bool = True
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas-kernel decode; same contract as decoder.decode.

    llr: [batch, N_full*Zc] float32; returns (bits [batch, K], ok [batch]).
    """
    b = llr.shape[0]
    bp = -(-b // B_TILE) * B_TILE
    if bp != b:
        # pad with a strongly-decided all-zeros codeword (+LLR ⇒ bit 0) so
        # padding rows satisfy the syndrome and never block early exit
        llr = jnp.concatenate(
            [llr, jnp.full((bp - b, llr.shape[1]), 20.0, llr.dtype)],
            axis=0)
    bits, ok = _decode_tiles(llr.astype(jnp.float32), base_graph,
                             lifting_size, nof_iterations, float(scale),
                             interpret, early_termination)
    return bits[:b], ok[:b]
