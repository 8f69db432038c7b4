"""Conformance sweep over the reference's parameter space (VERDICT r2
item 8), mirroring the `_test_data.h` config tables: every lifting-set
index × both base graphs for the encoder (bit-exact vs the dense GF(2)
solve), rv 0-3 × Qm {2,4,6,8} × BG {1,2} rate-match round-trips, and the
full short-block UCI payload range.

Reference: tests/unittests/phy/upper/channel_coding/ldpc/
ldpc_encoder_test_data.h (~100 MATLAB-generated cases).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_23_5_tpu.ops import modulation, short_block
from srsran_project_23_5_tpu.ops.ldpc import encoder, graphs, rate_match
from srsran_project_23_5_tpu.ran import ldpc_params

# one representative lifting size per lifting-set index (TS 38.212
# Table 5.3.2-1: set j contains a·2^x for a in {2,3,5,7,9,11,13,15})
SET_REPS = (16, 12, 20, 28, 9, 11, 13, 15)
assert [ldpc_params.lifting_set_index(z) for z in SET_REPS] == list(range(8))


@pytest.mark.parametrize("bg", [1, 2])
@pytest.mark.parametrize("zc", SET_REPS)
def test_encoder_all_lifting_sets_bit_exact(bg, zc):
    """XLA encoder == dense GF(2) back-substitution, zero syndrome."""
    rng = np.random.default_rng(bg * 100 + zc)
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    msg = rng.integers(0, 2, size=(2, k)).astype(np.int8)
    fast = np.asarray(encoder.encode(jnp.asarray(msg), bg, zc))
    slow = encoder.encode_np(msg, bg, zc)
    assert np.array_equal(fast.astype(np.uint8), slow)
    h = graphs.parity_check_dense(g)
    assert not ((h.astype(np.int32) @ fast.T.astype(np.int32)) % 2).any()


@pytest.mark.parametrize("qm", [6,
                                pytest.param(2, marks=pytest.mark.slow),
                                pytest.param(4, marks=pytest.mark.slow),
                                pytest.param(8, marks=pytest.mark.slow)])
@pytest.mark.parametrize("rv", [0, 2,
                                pytest.param(1, marks=pytest.mark.slow),
                                pytest.param(3, marks=pytest.mark.slow)])
@pytest.mark.parametrize("bg", [1, 2])
def test_rate_match_roundtrip(bg, rv, qm):
    """match_tb → dematch_tb places every transmitted bit at its codeword
    position for all RV starting points and modulation interleavers."""
    zc = 32 if bg == 1 else 16
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    n_full = g.nof_var_blocks * zc
    rng = np.random.default_rng(bg * 1000 + rv * 10 + qm)
    nof_segments = 2
    msg = rng.integers(0, 2, size=(nof_segments, k)).astype(np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msg), bg, zc))
    # rate ~0.7 of the circular buffer, per-CB lengths multiple of qm
    e = (int(0.7 * n_full) // qm) * qm
    cb_lengths = (e,) * nof_segments
    matched = np.asarray(rate_match.match_tb(
        jnp.asarray(cw), bg, zc, rv, k, k, cb_lengths, qm))
    assert matched.shape == (nof_segments * e,)
    llr = (1.0 - 2.0 * matched.astype(np.float32)) * 4.0
    full = np.asarray(rate_match.dematch_tb(
        jnp.asarray(llr), bg, zc, rv, k, k, cb_lengths, qm))
    assert full.shape == (nof_segments, n_full)
    sent = full != 0.0
    assert sent.any()
    hard = (full < 0.0).astype(np.int8)
    np.testing.assert_array_equal(hard[sent], cw[sent.nonzero()[0],
                                                 sent.nonzero()[1]])


@pytest.mark.parametrize("nbits", list(range(3, 12)))
def test_short_block_payload_range(nbits):
    """TS 38.212 §5.3.3 encode + ML detect round-trip for 3..11 bits
    (1-2 bit payloads take the §5.3.3.1-2 special forms, covered by the
    UCI-field round-trip below)."""
    rng = np.random.default_rng(nbits)
    msg = rng.integers(0, 2, size=nbits).astype(np.int8)
    enc = np.asarray(short_block.encode(jnp.asarray(msg), 32))
    llr = (1.0 - 2.0 * enc.astype(np.float32)) * 6.0
    dec, valid = short_block.detect(jnp.asarray(llr), nbits, 32)
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), msg)


@pytest.mark.parametrize("nbits", [1, 2])
@pytest.mark.parametrize("qm", [2, 4])
def test_uci_field_short_payloads(nbits, qm):
    from srsran_project_23_5_tpu.phy.upper import ulsch
    rng = np.random.default_rng(nbits * 10 + qm)
    msg = jnp.asarray(rng.integers(0, 2, size=nbits).astype(np.int8))
    e = 6 * qm
    enc = ulsch.encode_uci_field(msg, nbits, e, qm)
    llr = (1.0 - 2.0 * np.asarray(enc).astype(np.float32)) * 6.0
    dec, valid = ulsch.decode_uci_field(jnp.asarray(llr), nbits, qm)
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec),
                                  np.asarray(msg))


@pytest.mark.parametrize("qm", [1, 2, 4, 6, 8])
def test_modulate_arithmetic_equals_lut(qm):
    rng = np.random.default_rng(qm)
    bits = jnp.asarray(rng.integers(0, 2, size=(3, qm * 64)).astype(np.int8))
    np.testing.assert_allclose(
        np.asarray(modulation.modulate(bits, qm)),
        np.asarray(modulation.modulate_lut(bits, qm)), atol=1e-6)


@pytest.mark.parametrize("zc", ldpc_params.ALL_LIFTING_SIZES[::5])
def test_lifting_selection_tables(zc):
    """Lifting-size membership and set-index derivation stay consistent."""
    i_ls = ldpc_params.lifting_set_index(zc)
    assert 0 <= i_ls < 8
    g = graphs.lifted_graph(1, zc)
    assert g.nof_msg_blocks == 22
