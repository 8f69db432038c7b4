"""Tests: short-block codec, low-PAPR sequences, PRACH gen/detect."""
import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_23_5_tpu.ops import prach, sequences, short_block


# ---------------------------------------------------------------- short block
@pytest.mark.parametrize("k", [3, 5, 8, 11])
def test_short_block_roundtrip(k):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(6, k)).astype(np.int8)
    e = 64
    enc = short_block.encode(jnp.asarray(bits), e)
    assert enc.shape == (6, e)
    llr = 4.0 * (1.0 - 2.0 * np.asarray(enc, np.float32))
    llr += 0.8 * rng.standard_normal(llr.shape).astype(np.float32)
    got, metric = short_block.detect(jnp.asarray(llr), k, e)
    assert np.array_equal(np.asarray(got), bits)
    assert (np.asarray(metric) > 0.5).all()


def test_short_block_1_2_bits():
    one = short_block.encode(jnp.asarray([[1]], dtype=jnp.int8), 4, qm=2)
    assert np.asarray(one)[0, 0] == 1
    two = short_block.encode(jnp.asarray([[1, 0]], dtype=jnp.int8), 9, qm=2)
    assert np.asarray(two).shape == (1, 9)
    # c2 = b0 ^ b1 = 1 at position 3
    assert np.asarray(two)[0, 3] == 1


def test_short_block_detects_under_noise_statistics():
    rng = np.random.default_rng(1)
    k, e = 6, 32
    bits = rng.integers(0, 2, size=(50, k)).astype(np.int8)
    enc = short_block.encode(jnp.asarray(bits), e)
    llr = 3.0 * (1.0 - 2.0 * np.asarray(enc, np.float32))
    llr += 1.5 * rng.standard_normal(llr.shape).astype(np.float32)
    got, _ = short_block.detect(jnp.asarray(llr), k, e)
    errors = (np.asarray(got) != bits).any(axis=1).mean()
    assert errors < 0.1


# ---------------------------------------------------------------- sequences
def test_low_papr_unit_modulus():
    for m in (6, 12, 18, 24, 36, 139, 839):
        r = sequences.low_papr_sequence(3, 0, m)
        assert r.shape == (m,)
        assert np.allclose(np.abs(r), 1.0, atol=1e-9)


def test_low_papr_groups_distinct():
    a = sequences.low_papr_sequence(0, 0, 12)
    b = sequences.low_papr_sequence(1, 0, 12)
    assert not np.allclose(a, b)


def test_zadoff_chu_flat_spectrum():
    x = sequences.zadoff_chu(25, 839)
    spec = np.abs(np.fft.fft(x))
    assert np.allclose(spec, spec[0], rtol=1e-6)


def test_prime_lower_than():
    assert sequences.prime_lower_than(36) == 31
    assert sequences.prime_lower_than(139) == 137
    assert sequences.prime_lower_than(839) == 829


# ---------------------------------------------------------------- PRACH
@pytest.mark.parametrize("length,n_cs", [(839, 13), (139, 0)])
def test_prach_detect_clean(length, n_cs):
    rng = np.random.default_rng(2)
    root = 25
    n_sh = prach.num_shifts(length, n_cs)
    v = min(3, n_sh - 1)
    tx = prach.generate(root, v, length, n_cs)
    noise = 0.05 * (rng.standard_normal(length) + 1j * rng.standard_normal(length))
    rx = jnp.asarray((tx + noise.astype(np.complex64))[None])
    metric, delay, rssi = prach.detect(rx, root, length, n_cs)
    m = np.asarray(metric)[0]
    assert m.shape == (n_sh,)
    assert np.argmax(m) == v
    assert m[v] > 20.0  # strong peak over noise floor
    assert abs(float(np.asarray(delay)[0, v])) < 1.5


def test_prach_no_false_alarm_on_noise():
    rng = np.random.default_rng(3)
    length, n_cs, root = 839, 13, 25
    rx = jnp.asarray(
        (rng.standard_normal((2, length)) + 1j * rng.standard_normal((2, length))
         ).astype(np.complex64) / np.sqrt(2))
    metric, _, _ = prach.detect(rx, root, length, n_cs)
    assert (np.asarray(metric) < 15.0).all()


def test_prach_detects_delay():
    rng = np.random.default_rng(4)
    length, n_cs, root, v = 839, 13, 25, 2
    tx = prach.generate(root, v, length, n_cs)
    delay_chips = 5  # < n_cs so still inside window v
    k = np.arange(length)
    rx_freq = tx * np.exp(-2j * np.pi * delay_chips * k / length)
    rx = jnp.asarray(rx_freq.astype(np.complex64)[None])
    metric, delay, _ = prach.detect(rx, root, length, n_cs)
    assert np.argmax(np.asarray(metric)[0]) == v
    assert abs(float(np.asarray(delay)[0, v]) - delay_chips) < 1.0
