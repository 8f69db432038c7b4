"""Tests for ran/ math and foundational ops (bits, CRC, Gold, modulation)."""
import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_23_5_tpu.ran import constants, ldpc_params, numerology, tbs
from srsran_project_23_5_tpu.ops import bits, crc, gold, modulation


# ---------------------------------------------------------------- numerology
def test_slot_samples_match_sample_rate():
    # One subframe (1 ms) must hold exactly fs * 1e-3 samples for every mu.
    for mu, nfft in [(0, 2048), (1, 2048), (1, 4096), (2, 4096)]:
        fs = numerology.sample_rate_hz(mu, nfft)
        total = sum(
            numerology.slot_num_samples(mu, nfft, s)
            for s in range(numerology.slots_per_subframe(mu))
        )
        assert total == round(fs * 1e-3), (mu, nfft)


def test_cp_lengths_long_symbols():
    cps = numerology.cp_lengths(1, 2048, slot_in_subframe=0)
    assert cps[0] == 176 and np.all(cps[1:] == 144)
    cps1 = numerology.cp_lengths(1, 2048, slot_in_subframe=1)
    assert cps1[0] == 176  # subframe symbol 14 = 7*2^1 is long
    cps0 = numerology.cp_lengths(0, 2048)
    assert cps0[0] == 160 and cps0[7] == 160 and cps0[1] == 144


def test_slot_point_arithmetic():
    sp = numerology.SlotPoint(mu=1, sfn=1023, slot_in_frame=19)
    nxt = sp + 1
    assert (nxt.sfn, nxt.slot_in_frame) == (0, 0)
    assert nxt - sp == 1


# ---------------------------------------------------------------- ldpc params
def test_lifting_sizes():
    assert len(ldpc_params.ALL_LIFTING_SIZES) == 51
    assert ldpc_params.ALL_LIFTING_SIZES[0] == 2
    assert ldpc_params.ALL_LIFTING_SIZES[-1] == 384
    assert ldpc_params.lifting_set_index(384) == 1  # 384 = 3*2^7
    assert ldpc_params.lifting_set_index(208) == 6  # 208 = 13*2^4


def test_base_graph_selection():
    assert ldpc_params.base_graph(292, 0.9) == 2
    assert ldpc_params.base_graph(293, 0.9) == 1
    assert ldpc_params.base_graph(3824, 0.6) == 2
    assert ldpc_params.base_graph(8000, 0.2) == 2
    assert ldpc_params.base_graph(8000, 0.5) == 1


def test_segmentation_single_cb():
    p = ldpc_params.segment_tb(5000, bg=1)
    assert p.nof_segments == 1 and p.cb_crc_bits == 0
    assert p.tb_crc_bits == 24
    # K' = 5024, Zc = min Z with 22Z >= 5024 -> 240? 22*229.3 -> Zc=240
    assert 22 * p.lifting_size >= p.payload_length
    assert p.segment_length == 22 * p.lifting_size
    assert p.payload_length == 5024


def test_segmentation_multi_cb():
    # Use a spec-conformant TBS so B' divides evenly across segments.
    tbs_bits = tbs.tbs_calculate(nof_symb_sh=12, nof_dmrs_prb=12, nof_oh_prb=0,
                                 target_code_rate=0.65, qm=6, nof_layers=1,
                                 n_prb=106)
    p = ldpc_params.segment_tb(tbs_bits, bg=1)
    b = tbs_bits + 24
    import math
    assert p.nof_segments == math.ceil(b / (8448 - 24))
    assert p.nof_segments > 1
    assert p.payload_length * p.nof_segments == b + p.nof_segments * 24
    assert p.nof_filler_bits == p.segment_length - p.payload_length


def test_rate_match_k0_rv():
    # BG1 Zc=384 full buffer: Ncb = 66*384
    ncb = 66 * 384
    assert ldpc_params.rate_match_k0(1, 384, 0, ncb) == 0
    assert ldpc_params.rate_match_k0(1, 384, 1, ncb) == 17 * 384
    assert ldpc_params.rate_match_k0(2, 208, 2, 50 * 208) == 25 * 208


def test_rate_match_lengths():
    e = ldpc_params.rate_match_lengths(10000, 3, qm=4, nof_layers=2)
    assert sum(e) == 10000 and all(x % 8 == 0 for x in e)


def test_tbs_calculation():
    # A typical 106-PRB, 12-symbol, QPSK R=0.37 config should round into table.
    val = tbs.tbs_calculate(nof_symb_sh=12, nof_dmrs_prb=12, nof_oh_prb=0,
                            target_code_rate=379 / 1024, qm=2, nof_layers=1,
                            n_prb=106)
    assert val % 8 == 0 and val > 0
    # Small allocation hits the lookup table exactly.
    small = tbs.tbs_calculate(nof_symb_sh=2, nof_dmrs_prb=6, nof_oh_prb=0,
                              target_code_rate=0.3, qm=2, nof_layers=1, n_prb=2)
    assert small in tbs.TBS_TABLE


# ---------------------------------------------------------------- bits
def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.integers(0, 2, size=(3, 64)).astype(np.int8)
    packed = bits.pack_bits(jnp.asarray(b))
    assert np.array_equal(np.asarray(packed), bits.pack_bits_np(b))
    unpacked = bits.unpack_bits(packed)
    assert np.array_equal(np.asarray(unpacked), b)


# ---------------------------------------------------------------- CRC
def _crc_bitwise(msg_bits: np.ndarray, degree: int, coeffs: int) -> np.ndarray:
    """Independent long-division CRC for cross-validation."""
    reg = 0
    top = 1 << degree
    for b in msg_bits:
        reg = (reg << 1) | int(b)
        if reg & top:
            reg ^= top | coeffs
    for _ in range(degree):
        reg <<= 1
        if reg & top:
            reg ^= top | coeffs
    return np.array([(reg >> (degree - 1 - j)) & 1 for j in range(degree)],
                    dtype=np.int8)


@pytest.mark.parametrize("name", list(crc.POLYNOMIALS))
def test_crc_matches_long_division(name):
    rng = np.random.default_rng(1)
    degree, coeffs = crc.POLYNOMIALS[name]
    msg = rng.integers(0, 2, size=200).astype(np.int8)
    expect = _crc_bitwise(msg, degree, coeffs)
    got_host = crc.crc_np(msg, name)
    got_dev = np.asarray(crc.crc(jnp.asarray(msg), name))
    assert np.array_equal(got_host, expect)
    assert np.array_equal(got_dev, expect)


def test_crc_attach_check():
    rng = np.random.default_rng(2)
    msg = jnp.asarray(rng.integers(0, 2, size=(4, 100)).astype(np.int8))
    wired = crc.crc_attach(msg, "crc24A")
    assert bool(crc.crc_check(wired, "crc24A").all())
    corrupted = wired.at[0, 5].set(1 - wired[0, 5])
    assert not bool(crc.crc_check(corrupted, "crc24A")[0])
    assert bool(crc.crc_check(corrupted, "crc24A")[1:].all())


# ---------------------------------------------------------------- Gold
def _gold_reference(cinit: int, length: int) -> np.ndarray:
    """Direct LFSR implementation of TS 38.211 §5.2.1 for cross-validation."""
    nc = 1600
    x1 = np.zeros(nc + length + 31, dtype=np.uint8)
    x2 = np.zeros(nc + length + 31, dtype=np.uint8)
    x1[0] = 1
    for i in range(31):
        x2[i] = (cinit >> i) & 1
    for n in range(nc + length):
        x1[n + 31] = x1[n + 3] ^ x1[n]
        x2[n + 31] = x2[n + 3] ^ x2[n + 2] ^ x2[n + 1] ^ x2[n]
    return x1[nc:nc + length] ^ x2[nc:nc + length]


def test_gold_sequence_matches_lfsr():
    for cinit in (0x12345, 1, 0x7FFFFFFF):
        expect = _gold_reference(cinit, 500)
        got = gold.gold_sequence_np(cinit, 500)
        assert np.array_equal(got, expect), hex(cinit)
    dev = np.asarray(gold.gold_sequence(jnp.asarray([0x12345], dtype=jnp.uint32), 500))
    assert np.array_equal(dev[0], _gold_reference(0x12345, 500))


def test_gold_sequence_offset():
    full = gold.gold_sequence_np(0xABCDE, 300)
    tail = gold.gold_sequence_np(0xABCDE, 100, offset=200)
    assert np.array_equal(full[200:], tail)


# ---------------------------------------------------------------- modulation
@pytest.mark.parametrize("qm", [1, 2, 4, 6, 8])
def test_constellation_unit_power(qm):
    pts = modulation.constellation(qm)
    assert pts.shape == (1 << qm,)
    assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 1e-6
    # Gray property: adjacent-per-axis points differ in exactly one bit is
    # implied by construction; check all points distinct instead.
    assert len(np.unique(pts)) == 1 << qm


@pytest.mark.parametrize("qm", [2, 4, 6, 8])
def test_mod_demod_roundtrip_noiseless(qm):
    rng = np.random.default_rng(3)
    b = rng.integers(0, 2, size=(2, 20 * qm)).astype(np.int8)
    syms = modulation.modulate(jnp.asarray(b), qm)
    nv = jnp.full(syms.shape, 0.1, dtype=jnp.float32)
    llr = modulation.demodulate_soft(syms, nv, qm)
    hard = np.asarray(modulation.hard_decision(llr))
    assert np.array_equal(hard, b)


def test_qpsk_matches_spec_example():
    # b=00 -> (1+j)/sqrt(2)
    syms = np.asarray(modulation.modulate(jnp.asarray([[0, 0, 1, 1]], dtype=jnp.int8), 2))
    assert np.allclose(syms[0, 0], (1 + 1j) / np.sqrt(2))
    assert np.allclose(syms[0, 1], (-1 - 1j) / np.sqrt(2))


def test_pi2_bpsk_rotation():
    syms = np.asarray(modulation.modulate_pi2_bpsk(jnp.asarray([0, 0], dtype=jnp.int8)))
    assert np.allclose(syms[0], (1 + 1j) / np.sqrt(2))
    assert np.allclose(syms[1], 1j * (1 + 1j) / np.sqrt(2))


def test_llr_quantize_saturates():
    llr = jnp.asarray([1000.0, -1000.0, 0.4])
    q = np.asarray(modulation.quantize_llr(llr))
    assert q[0] == constants.LLR_MAX and q[1] == -constants.LLR_MAX and q[2] == 0
