"""LDPC chain tests: graphs, encoder, decoder, rate matching, segmentation."""
import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_23_5_tpu.ops import crc as crc_ops
from srsran_project_23_5_tpu.ops.ldpc import (
    decoder, encoder, graphs, rate_match, segmentation)
from srsran_project_23_5_tpu.ran import ldpc_params


def _awgn_llr(cw: np.ndarray, snr_db: float, rng) -> np.ndarray:
    sigma = 10 ** (-snr_db / 20)
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    rx = tx + sigma * rng.standard_normal(tx.shape).astype(np.float32)
    return 2.0 * rx / sigma ** 2


@pytest.mark.parametrize("bg,zc", [(1, 4), (2, 4), (1, 20), (2, 18)])
def test_encoder_zero_syndrome(bg, zc):
    rng = np.random.default_rng(0)
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    msg = rng.integers(0, 2, size=(3, k)).astype(np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msg), bg, zc))
    h = graphs.parity_check_dense(g)
    syn = (h.astype(np.int32) @ cw.T.astype(np.int32)) % 2
    assert not syn.any()
    assert np.array_equal(cw[:, :k], msg)


@pytest.mark.parametrize("bg,zc", [(1, 8), (2, 16)])
def test_encoder_matches_dense_gf2_solve(bg, zc):
    rng = np.random.default_rng(1)
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    msg = rng.integers(0, 2, size=(2, k)).astype(np.int8)
    fast = np.asarray(encoder.encode(jnp.asarray(msg), bg, zc))
    slow = encoder.encode_np(msg, bg, zc)
    assert np.array_equal(fast.astype(np.uint8), slow)


@pytest.mark.parametrize("bg,zc", [(1, 32), (2, 32)])
def test_decode_awgn_roundtrip(bg, zc):
    rng = np.random.default_rng(2)
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    msg = rng.integers(0, 2, size=(8, k)).astype(np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msg), bg, zc))
    llr = _awgn_llr(cw, snr_db=4.0, rng=rng)
    llr[:, :2 * zc] = 0.0  # punctured systematic columns
    bits, ok = decoder.decode(jnp.asarray(llr), bg, zc, nof_iterations=10)
    assert np.asarray(ok).all()
    assert np.array_equal(np.asarray(bits), msg)


def test_decode_fails_cleanly_at_low_snr():
    rng = np.random.default_rng(3)
    bg, zc = 1, 16
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    msg = rng.integers(0, 2, size=(4, k)).astype(np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msg), bg, zc))
    llr = _awgn_llr(cw, snr_db=-10.0, rng=rng)
    llr[:, :2 * zc] = 0.0
    bits, ok = decoder.decode(jnp.asarray(llr), bg, zc, nof_iterations=4)
    assert not np.asarray(ok).all()  # mostly undecodable at -10 dB


@pytest.mark.parametrize("rv", [0, 1, 2, 3])
def test_rate_match_indices_skip_filler(rv):
    bg, zc = 1, 16
    kp, k = 20 * zc, 22 * zc
    e = 400
    idx = rate_match.selection_indices(bg, zc, rv, kp, k, e)
    f_begin, f_end = kp - 2 * zc, k - 2 * zc
    assert not ((idx >= f_begin) & (idx < f_end)).any()
    assert len(idx) == e


def test_rate_match_dematch_roundtrip():
    rng = np.random.default_rng(4)
    bg, zc, qm = 1, 16, 4
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    kp = k - 2 * zc  # pretend 2*zc filler bits
    msg = rng.integers(0, 2, size=(2, k)).astype(np.int8)
    msg[:, kp:] = 0  # filler must be zero
    cw = encoder.encode(jnp.asarray(msg), bg, zc)
    e = 2048
    tx = rate_match.match(cw, bg, zc, 0, kp, k, e, qm)
    assert tx.shape == (2, e)
    # Noiseless LLRs: +8 for bit 0, -8 for bit 1.
    llr = 8.0 * (1.0 - 2.0 * np.asarray(tx, dtype=np.float32))
    full = rate_match.dematch(jnp.asarray(llr), bg, zc, 0, kp, k, e, qm)
    n_full = g.nof_var_blocks * zc
    assert full.shape == (2, n_full)
    # Every transmitted bit position must agree in sign with the codeword.
    full_np = np.asarray(full)
    nonzero = full_np != 0
    hard = (full_np <= 0).astype(np.int8)
    cw_np = np.asarray(cw)
    assert np.array_equal(hard[nonzero], cw_np[nonzero])
    # Filler positions pinned to +infty.
    assert (full_np[:, 2 * zc + kp - 2 * zc: 2 * zc + k - 2 * zc] > 100).all()


def test_rate_match_repetition_soft_combines():
    # E > buffer size forces wraparound; repeated bits accumulate LLR.
    bg, zc, qm = 2, 8, 2
    g = graphs.lifted_graph(bg, zc)
    k = g.nof_msg_blocks * zc
    n = 50 * zc
    msg = np.zeros((1, k), dtype=np.int8)
    cw = encoder.encode(jnp.asarray(msg), bg, zc)
    e = n * 2  # each buffer bit transmitted exactly twice
    tx = rate_match.match(cw, bg, zc, 0, k, k, e, qm)
    llr = 4.0 * (1.0 - 2.0 * np.asarray(tx, dtype=np.float32))
    full = np.asarray(rate_match.dematch(jnp.asarray(llr), bg, zc, 0, k, k, e, qm))
    # all-zero codeword -> all llrs positive; combined magnitude 8 (2x4)
    assert (full[:, 2 * zc:] == 8.0).all()


def test_full_tb_chain_with_segmentation():
    rng = np.random.default_rng(5)
    a = 3000  # small TB so the test runs quickly: C=1, CRC16
    bg = ldpc_params.base_graph(a, 0.5)
    params = ldpc_params.segment_tb(a, bg)
    tb = rng.integers(0, 2, size=a).astype(np.int8)
    cbs = segmentation.segment_tx(jnp.asarray(tb), params)
    assert cbs.shape == (params.nof_segments, params.segment_length)
    cw = encoder.encode(cbs, bg, params.lifting_size)
    e = 8192
    tx = rate_match.match(cw, bg, params.lifting_size, 0,
                          params.payload_length, params.segment_length, e, 2)
    llr = _awgn_llr(np.asarray(tx), snr_db=3.0, rng=rng)
    full = rate_match.dematch(jnp.asarray(llr), bg, params.lifting_size, 0,
                              params.payload_length, params.segment_length, e, 2)
    bits, ok = decoder.decode(full, bg, params.lifting_size, nof_iterations=8)
    assert np.asarray(ok).all()
    tb_rx, tb_ok, cb_ok = segmentation.desegment_rx(bits, params)
    assert bool(tb_ok) and np.asarray(cb_ok).all()
    assert np.array_equal(np.asarray(tb_rx), tb)


def test_segmentation_multi_cb_roundtrip_noiseless():
    rng = np.random.default_rng(6)
    a = 3824 + 8 * 1000  # force CRC24A and multiple segments on BG2
    bg = 1
    params = ldpc_params.segment_tb(a, bg)
    assert params.nof_segments > 1
    tb = rng.integers(0, 2, size=a).astype(np.int8)
    cbs = np.asarray(segmentation.segment_tx(jnp.asarray(tb), params))
    # per-CB CRC24B present and valid
    ok = crc_ops.crc_check(
        jnp.asarray(cbs[:, :params.payload_length]), "crc24B")
    assert np.asarray(ok).all()
    tb_rx, tb_ok, cb_ok = segmentation.desegment_rx(jnp.asarray(cbs), params)
    assert bool(tb_ok) and np.asarray(cb_ok).all()
    assert np.array_equal(np.asarray(tb_rx), tb)
