"""Pallas decoder parity vs the XLA-graph decoder (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_23_5_tpu.ops.ldpc import (
    decoder, decoder_pallas, encoder, graphs)


@pytest.mark.parametrize("bg,zc", [pytest.param(1, 32, marks=pytest.mark.slow), (2, 32)])
def test_pallas_matches_xla_decoder(bg, zc):
    # batch 6 is deliberately NOT a multiple of the 8-row tile: the same
    # interpret-mode run covers decoder parity AND the padding path the
    # mixed slot leans on (C=17 -> 24)
    rng = np.random.default_rng(0)
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    msg = rng.integers(0, 2, size=(6, k)).astype(np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msg), bg, zc))
    sigma = 10 ** (-4.0 / 20)
    llr = 2.0 * ((1 - 2 * cw.astype(np.float32))
                 + sigma * rng.standard_normal(cw.shape).astype(np.float32)
                 ) / sigma ** 2
    llr[:, :2 * zc] = 0.0
    b_x, ok_x = decoder.decode(jnp.asarray(llr), bg, zc, 4)
    b_p, ok_p = decoder_pallas.decode(jnp.asarray(llr), bg, zc, 4,
                                      interpret=True)
    assert b_p.shape == (6, k) and ok_p.shape == (6,)
    assert np.array_equal(np.asarray(ok_x), np.asarray(ok_p))
    assert np.array_equal(np.asarray(b_x), np.asarray(b_p))
    assert np.asarray(ok_p).all()
    assert np.array_equal(np.asarray(b_p), msg)


@pytest.mark.parametrize("bg,zc", [pytest.param(1, 32, marks=pytest.mark.slow), (2, 24)])
def test_pallas_encoder_matches_xla(bg, zc):
    from srsran_project_23_5_tpu.ops.ldpc import encoder_pallas
    rng = np.random.default_rng(2)
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    msg = rng.integers(0, 2, size=(5, k)).astype(np.int8)  # non-multiple of 8
    ref = np.asarray(encoder.encode(jnp.asarray(msg), bg, zc))
    got = np.asarray(encoder_pallas.encode(jnp.asarray(msg), bg, zc,
                                           interpret=True))
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)
