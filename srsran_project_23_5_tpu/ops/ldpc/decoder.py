"""Batched layered normalized min-sum LDPC decoder (TS 38.212 base graphs).

TPU-idiomatic re-design of the reference's layered decoder
(lib/phy/upper/channel_coding/ldpc/ldpc_decoder_impl.cpp:116-134, int8 SIMD
node kernels in ldpc_decoder_avx2/avx512/neon.cpp):

- the *batch of codeblocks* replaces the reference's thread/pool axis; every
  node operation is vectorized over [batch, Zc] lanes;
- the layered schedule (46/42 base rows) runs as a `lax.scan` over a
  PADDED static layer table (cols/shifts padded to d_max with a dummy
  always-positive variable block), inside a `lax.fori_loop` over
  iterations — one compiled program per (BG, Zc).  The scan keeps the
  traced graph one-layer-sized: XLA:CPU compiled the fully-unrolled
  46-layer body in ~30 s per (BG, Zc) instance, which dominated every
  test-tier and dryrun compile (round-5 measurement); the scan version
  compiles in seconds with identical results;
- min-sum check update uses the min1/min2 trick with normalization 0.8
  (reference default, ldpc_decoder_impl.h:172,198);
- early stop is a whole-batch syndrome check evaluated between iterations
  (replaces the reference's per-codeblock CRC early exit, which does not
  batch) — iterations are data-independent in count via `lax.while_loop`.

Arithmetic is float32: min/sign/add only, so the VPU is exact; the int8
LLR *interface* convention (±120 soft, ±127 known) is preserved at the
boundary.  A Pallas int8 kernel can later swap in behind the same API.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .graphs import lifted_graph

DEFAULT_SCALE = 0.8


def _layer_slices(graph, nof_used_blocks=None):
    """Static (edge_offset, cols, shifts) per base row.

    Rows beyond `nof_used_blocks` carry only untransmitted zero-LLR
    degree-1 extension parity and are skipped — exact for min-sum; the
    reference sizes its row loop off the rate-matched length the same
    way (ldpc_decoder_impl.cpp:116-134)."""
    out = []
    e0 = 0
    for cols, shifts in zip(graph.row_cols, graph.row_shifts):
        if nof_used_blocks is None or max(cols) < nof_used_blocks:
            out.append((e0, cols, shifts))
            e0 += len(cols)
    return out, e0


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _decode_impl(llr: jnp.ndarray, base_graph: int, lifting_size: int,
                 nof_iterations: int, scale: float, early_stop: bool,
                 nof_used_blocks: int | None = None):
    graph = lifted_graph(base_graph, lifting_size)
    n, z = graph.nof_var_blocks, graph.lifting_size
    if nof_used_blocks is not None:
        n = min(nof_used_blocks, n)
        llr = llr[:, :n * z]
    b = llr.shape[0]
    layers, n_edges = _layer_slices(graph, nof_used_blocks)
    nlay = len(layers)
    d_max = max(len(cols) for _, cols, _ in layers)
    big = jnp.float32(3.0e38)

    # Padded static layer tables: pad column = n (a dummy variable block
    # held at +BIG, so padding edges carry sign +1 and never win the
    # min1/min2 race), pad shift = 0.
    cols_np = np.full((nlay, d_max), n, np.int32)
    shifts_np = np.zeros((nlay, d_max), np.int32)
    for li, (_, cols, shifts) in enumerate(layers):
        cols_np[li, :len(cols)] = cols
        shifts_np[li, :len(cols)] = [s % z for s in shifts]
    cols_t = jnp.asarray(cols_np)
    shifts_t = jnp.asarray(shifts_np)

    app0 = jnp.transpose(llr.reshape(b, n, z), (1, 0, 2)).astype(jnp.float32)
    app0 = jnp.concatenate([app0, jnp.full((1, b, z), big)], axis=0)
    c2v0 = jnp.zeros((nlay, d_max, b, z), dtype=jnp.float32)

    roll_fwd = jax.vmap(lambda x, s: jnp.roll(x, -s, axis=-1))
    roll_bwd = jax.vmap(lambda x, s: jnp.roll(x, s, axis=-1))

    def layer_step(app, xs):
        cols_l, shifts_l, c2v_l = xs
        # variable -> check messages
        t = roll_fwd(app[cols_l], shifts_l) - c2v_l      # [d_max, b, z]
        sgn = jnp.where(t < 0, -1.0, 1.0)
        mag = jnp.abs(t)
        m1 = jnp.min(mag, axis=0)
        amin = jnp.argmin(mag, axis=0)
        edge_ids = jnp.arange(d_max)[:, None, None]
        m2 = jnp.min(jnp.where(edge_ids == amin, big, mag), axis=0)
        sgn_prod = jnp.prod(sgn, axis=0)
        msg = scale * sgn_prod * sgn * jnp.where(edge_ids == amin, m2, m1)
        msg = jnp.where((cols_l == n)[:, None, None], 0.0, msg)
        # check -> variable + app update (rotate back); duplicate padding
        # indices all hit the dummy block, which is re-pinned to +BIG
        app = app.at[cols_l].set(roll_bwd(t + msg, shifts_l))
        app = app.at[n].set(jnp.full((b, z), big))
        return app, msg

    def one_iteration(state):
        app, c2v = state
        return jax.lax.scan(layer_step, app, (cols_t, shifts_t, c2v))

    def syndrome_ok(app):
        hard = (app <= 0).astype(jnp.int32)              # dummy block: 0

        def syn_layer(ok, xs):
            cols_l, shifts_l = xs
            acc = jnp.sum(roll_fwd(hard[cols_l], shifts_l), axis=0) % 2
            return ok & jnp.all(acc == 0, axis=-1), None

        ok, _ = jax.lax.scan(syn_layer, jnp.ones((b,), dtype=bool),
                             (cols_t, shifts_t))
        return ok

    if early_stop:
        # Batch-wide early exit on zero syndrome (costs one syndrome sweep
        # per iteration and a sequential while_loop).
        def cond(state):
            it, app, _ = state
            return (it < nof_iterations) & ~jnp.all(syndrome_ok(app))

        def body(state):
            it, app, c2v = state
            app, c2v = one_iteration((app, c2v))
            return it + 1, app, c2v

        _, app, c2v = jax.lax.while_loop(
            cond, body, (jnp.int32(0), app0, c2v0))
    else:
        # Fixed iteration count — the TPU idiom: predictable latency, no
        # per-iteration sync, pipeline-friendly.
        app, c2v = jax.lax.fori_loop(
            0, nof_iterations, lambda _, s: one_iteration(s), (app0, c2v0))

    hard = jnp.transpose((app[:n] <= 0).astype(jnp.int8), (1, 0, 2))
    ok = syndrome_ok(app)
    k = graph.nof_msg_blocks
    return hard[:, :k].reshape(b, k * z), ok


def decode(llr: jnp.ndarray, base_graph: int, lifting_size: int,
           nof_iterations: int = 6, scale: float = DEFAULT_SCALE,
           early_stop: bool = False,
           nof_used_blocks: int | None = None
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode a batch of codeblocks.

    llr: [batch, N_full*Zc] float32 LLRs over the FULL variable range
    (positive ⇒ bit 0).  Callers must place 0 for the 2*Zc punctured
    systematic positions and a large positive value for filler bits.

    Returns (message_bits [batch, K], syndrome_ok [batch]).
    """
    graph = lifted_graph(base_graph, lifting_size)
    assert llr.shape[-1] == graph.nof_var_blocks * lifting_size
    return _decode_impl(llr, base_graph, lifting_size, nof_iterations,
                        float(scale), early_stop, nof_used_blocks)


def decode_np_bruteforce_check(llr: np.ndarray, base_graph: int,
                               lifting_size: int) -> np.ndarray:
    """Hard-decision syndrome check helper for tests."""
    from .graphs import parity_check_dense
    h = parity_check_dense(lifted_graph(base_graph, lifting_size))
    hard = (llr <= 0).astype(np.uint8)
    return (h.astype(np.int32) @ hard.T.astype(np.int32)) % 2
