"""Polar chain tests: construction, encoder, SSC decoder, rate matching."""
import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_23_5_tpu.ops.polar import code, decoder, encoder, rate_match


def test_reliability_sequence_nested():
    q1024 = code.reliability_q1024()
    assert sorted(q1024.tolist()) == list(range(1024))
    q64 = code.reliability_sequence(64)
    assert len(q64) == 64 and q64.max() < 64


def test_subblock_interleaver_is_permutation():
    for n in (32, 64, 128, 256, 512, 1024):
        jn = code.subblock_interleaver(n)
        assert sorted(jn.tolist()) == list(range(n))


@pytest.mark.parametrize("k,e", [(12, 48), (30, 100), (56, 864), (40, 108),
                                 (100, 500), (164, 300)])
def test_code_construction_valid(k, e):
    c = code.polar_code(k, e)
    assert c.n >= 32 and (c.n & (c.n - 1)) == 0
    assert len(c.info_set) == k
    frozen = np.asarray(c.frozen_mask)
    assert (~frozen).sum() == k
    assert not frozen[list(c.info_set)].any()


def test_encoder_matches_generator_matrix():
    rng = np.random.default_rng(0)
    n = 64
    u = rng.integers(0, 2, size=(3, n)).astype(np.int8)
    x = np.asarray(encoder.encode(jnp.asarray(u)))
    # G_N via n-fold Kronecker of [[1,0],[1,1]]
    g = np.array([[1]], dtype=np.int64)
    f = np.array([[1, 0], [1, 1]], dtype=np.int64)
    for _ in range(6):
        g = np.kron(g, f)
    expect = (u.astype(np.int64) @ g) % 2
    assert np.array_equal(x, expect)


def test_encode_is_involution():
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, size=(2, 128)).astype(np.int8)
    x = encoder.encode(jnp.asarray(u))
    back = encoder.encode(x)
    assert np.array_equal(np.asarray(back), u)


@pytest.mark.parametrize("k,e,snr_db", [(12, 48, 6.0), (56, 864, 2.0),
                                        (40, 108, 6.0), (80, 256, 5.0)])
def test_polar_roundtrip_awgn(k, e, snr_db):
    rng = np.random.default_rng(2)
    c = code.polar_code(k, e)
    msg = rng.integers(0, 2, size=(8, k)).astype(np.int8)
    u = encoder.allocate(jnp.asarray(msg), c.info_set, c.n)
    x = encoder.encode(u)
    tx = rate_match.match(x, c)
    sigma = 10 ** (-snr_db / 20)
    rx = (1.0 - 2.0 * np.asarray(tx, np.float32)
          + sigma * rng.standard_normal((8, e)).astype(np.float32))
    llr = 2.0 * rx / sigma ** 2
    cw_llr = rate_match.dematch(jnp.asarray(llr), c)
    u_hat = decoder.decode(cw_llr, c)
    got = np.asarray(encoder.extract_message(u_hat, c.info_set))
    # SC decoding at reasonable SNR: all blocks decode
    assert np.array_equal(got, msg)


def test_polar_noiseless_all_modes():
    rng = np.random.default_rng(3)
    # repetition (E>N), puncturing (low rate), shortening (high rate)
    for k, e in [(32, 300), (40, 250), (120, 200)]:
        c = code.polar_code(k, e)
        msg = rng.integers(0, 2, size=(2, k)).astype(np.int8)
        u = encoder.allocate(jnp.asarray(msg), c.info_set, c.n)
        x = encoder.encode(u)
        tx = rate_match.match(x, c)
        llr = 10.0 * (1.0 - 2.0 * np.asarray(tx, np.float32))
        cw_llr = rate_match.dematch(jnp.asarray(llr), c)
        u_hat = decoder.decode(cw_llr, c)
        got = np.asarray(encoder.extract_message(u_hat, c.info_set))
        assert np.array_equal(got, msg), (k, e, c.mode)


def test_input_interleaver_permutation():
    for k in (12, 60, 140, 164):
        pi = code.input_interleaver(k)
        assert sorted(pi.tolist()) == list(range(k))
