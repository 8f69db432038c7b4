"""Pallas TPU kernel: layered normalized min-sum LDPC decoder.

The XLA-graph decoder (decoder.py) expresses each of the ~316 edge updates
as separate HLO ops on [batch, Zc] tensors; per-op dispatch overhead makes
it latency-bound (~tens of ms per slot's codeblocks).  This kernel runs the
ENTIRE layered schedule — all layers × iterations — inside one Pallas
program with the a-posteriori LLRs and check-to-variable messages resident
in VMEM, compiling to straight VPU vector code with no per-op overhead.

Memory layout (per grid step, batch tile of B_TILE codeblocks):
  app  : [B, N*Z]  bfloat16 VMEM scratch — variable-node LLRs
  c2v  : [B, E*Z]  bfloat16 VMEM scratch — per-edge check-to-variable msgs
  tbuf : [B, d_max*Z] f32 — variable-to-check messages of the active layer
LLR state is STORED in bfloat16 (the TPU's native half-density dtype —
the analogue of the reference's int8 LLR domain, avx2_support.h:36-78:
half the VMEM of r3's float32 storage with the same exponent range, so no
saturation logic is needed) and COMPUTED in float32 per layer.  Min-sum
messages carry ≤8 significant bits in the reference; bfloat16's 8-bit
mantissa loses nothing.

Early termination (ldpc_decoder_impl.cpp:116-134):
- the syndrome is evaluated every `check_period` iterations (default 1) —
  at operating SNR decodes converge in 2-4 iterations, below the cliff
  the syndrome never passes, so per-iteration checks are wasted work;
- convergence is tracked PER CODEBLOCK: a converged CB's app/c2v state
  freezes (masked writes) so later iterations for a stubborn neighbour
  cannot perturb it, and the tile exits once every CB has converged.

Reference counterpart: ldpc_decoder_impl.cpp:116-134 + AVX512 node kernels.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .graphs import lifted_graph

B_TILE = int(os.environ.get("TPU_RAN_DEC_BTILE", "8"))
_BIG = 3.0e38
STORE = (jnp.float32 if os.environ.get("TPU_RAN_DEC_STORE") == "f32"
         else jnp.bfloat16)
_FREEZE = os.environ.get("TPU_RAN_DEC_FREEZE", "1") != "0"


def _layers(graph, nof_used_blocks=None):
    """Static layer schedule, truncated to the rate-matched graph.

    Rows whose variables all lie beyond `nof_used_blocks` would only
    touch untransmitted (zero-LLR) degree-1 extension parity: their
    min-sum messages to every other edge pass through the zero-magnitude
    edge, so skipping them is EXACT — the reference sizes its row loop
    off the rate-matched codeword length the same way
    (ldpc_decoder_impl.cpp:116-134).  At the flagship rate 0.65 this
    drops 46 base rows to ~16 (3x less decode work)."""
    out, e0 = [], 0
    for cols, shifts in zip(graph.row_cols, graph.row_shifts):
        if nof_used_blocks is None or max(cols) < nof_used_blocks:
            out.append((e0, tuple(cols), tuple(shifts)))
            e0 += len(cols)          # compacted c2v edge offsets
    return out, e0


def used_blocks(base_graph: int, z: int, longest_cb_bits: int) -> int:
    """Variable blocks carrying transmitted LLRs for an rv=0 circular-
    buffer read of `longest_cb_bits` bits (+ the 2Zc punctured blocks)."""
    graph = lifted_graph(base_graph, z)
    n_core = graph.nof_msg_blocks + 4          # systematic + core parity
    n = 2 + -(-longest_cb_bits // z)
    return max(min(n, graph.nof_var_blocks), n_core)


def _make_kernel(base_graph: int, z: int, nof_iterations: int, scale: float,
                 early_termination: bool = True, check_period: int = 1,
                 nof_used_blocks: int | None = None):
    graph = lifted_graph(base_graph, z)
    n = (graph.nof_var_blocks if nof_used_blocks is None
         else min(nof_used_blocks, graph.nof_var_blocks))
    k = graph.nof_msg_blocks
    layers, n_edges = _layers(graph, nof_used_blocks)
    d_max = max(len(c) for _, c, _ in layers)

    def blk(ref, i):
        return ref[:, i * z:(i + 1) * z].astype(jnp.float32)

    def rot(x, s):
        # Mosaic rejects zero-length slices from roll-by-0.
        return jnp.roll(x, -(s % z), axis=1) if s % z else x

    def kernel(llr_ref, bits_ref, ok_ref, app, c2v, tbuf):
        app[:] = llr_ref[:].astype(STORE)
        c2v[:] = jnp.zeros_like(c2v)

        def row_syndrome():
            """[B_TILE, 1] > 0 iff every check row of that CB passes."""
            okrow = jnp.full((B_TILE, 1), 1.0, jnp.float32)
            for e0, cols, shifts in layers:
                rowsgn = jnp.ones((B_TILE, z), jnp.float32)
                for c, s in zip(cols, shifts):
                    v = rot(blk(app, c), s)
                    rowsgn = rowsgn * jnp.where(v <= 0.0, -1.0, 1.0)
                okrow = jnp.minimum(okrow,
                                    jnp.min(rowsgn, axis=1, keepdims=True))
            return okrow

        def update_layers(frozen):
            """One layered sweep; rows with frozen > 0 keep their state
            (per-CB convergence freezing)."""
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
                    if _FREEZE:
                        hold = frozen > 0.0
                        old_msg = blk(c2v, e0 + i)
                        old_app = blk(app, c)
                        c2v[:, (e0 + i) * z:(e0 + i + 1) * z] = jnp.where(
                            hold, old_msg, msg).astype(STORE)
                        app[:, c * z:(c + 1) * z] = jnp.where(
                            hold, old_app,
                            rot(t + msg, z - s)).astype(STORE)
                    else:
                        c2v[:, (e0 + i) * z:(e0 + i + 1) * z] = \
                            msg.astype(STORE)
                        app[:, c * z:(c + 1) * z] = rot(
                            t + msg, z - s).astype(STORE)

        if early_termination:
            # check_period sweeps per loop step, then an UNCONDITIONAL
            # syndrome check: a lax.cond-gated check measured 8.5x slower
            # than checking every step (Mosaic lowers the kernel-internal
            # cond catastrophically — round-5 microbench, exp_dec_r5.py)
            steps = -(-nof_iterations // check_period)

            def body(carry):
                it, done = carry
                for _ in range(check_period):
                    update_layers(done)
                done = jnp.maximum(
                    done, (row_syndrome() > 0.0).astype(jnp.float32))
                return it + 1, done

            _, done = jax.lax.while_loop(
                lambda c: (c[0] < steps) & (jnp.min(c[1]) < 0.5),
                body,
                (jnp.int32(0), jnp.zeros((B_TILE, 1), jnp.float32)))
            # `done` IS the final per-CB syndrome: the body checks after
            # every sweep (incl. the last), so no extra final sweep.
            okrow = done
        else:
            def fixed_body(_, carry):
                update_layers(jnp.zeros((B_TILE, 1), jnp.float32))
                return carry
            jax.lax.fori_loop(0, nof_iterations, fixed_body, 0)
            okrow = row_syndrome()                       # [B, 1]

        ok = jnp.broadcast_to(okrow > 0.0, (B_TILE, 128))
        ok_ref[:] = ok.astype(jnp.int32)
        bits_ref[:] = (app[:, :k * z].astype(jnp.float32)
                       <= 0.0).astype(jnp.int8)

    return kernel, n, k, n_edges, d_max


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def _decode_tiles(llr: jnp.ndarray, base_graph: int, z: int,
                  nof_iterations: int, scale: float, interpret: bool,
                  early_termination: bool = True, check_period: int = 1,
                  nof_used_blocks: int | None = None):
    kernel, n, k, n_edges, d_max = _make_kernel(
        base_graph, z, nof_iterations, scale, early_termination,
        check_period, nof_used_blocks)
    llr = llr[:, :n * z]     # untransmitted tail blocks never enter VMEM
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
            pltpu.VMEM((B_TILE, n * z), STORE),
            pltpu.VMEM((B_TILE, n_edges * z), STORE),
            pltpu.VMEM((B_TILE, d_max * z), jnp.float32),
        ],
        interpret=interpret,
    )(llr)
    return bits, ok[:, 0] != 0


def decode(llr: jnp.ndarray, base_graph: int, lifting_size: int,
           nof_iterations: int = 6, scale: float = 0.8,
           interpret: bool = False,
           early_termination: bool = True,
           check_period: int = 1,
           nof_used_blocks: int | None = None
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas-kernel decode; same contract as decoder.decode.

    llr: [batch, N_full*Zc] float32; returns (bits [batch, K], ok [batch]).
    nof_used_blocks truncates the decoding graph to the rate-matched
    span (see _layers; exact for rv=0 circular-buffer reads).
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
                             interpret, early_termination, check_period,
                             nof_used_blocks)
    return bits[:b], ok[:b]
