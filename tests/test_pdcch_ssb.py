"""PDCCH and SSB/PBCH chain tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from srsran_project_23_5_tpu.phy.upper import pdcch, ssb


# ---------------------------------------------------------------- PDCCH
@pytest.mark.parametrize("al", [1, 2, 4, 8])
def test_pdcch_loopback(al):
    rng = np.random.default_rng(0)
    cfg = pdcch.PdcchConfig(rnti=0x4601, payload_size=39, aggregation_level=al,
                            coreset_start_prb=2, n_rnti=0x4601)
    payload = rng.integers(0, 2, size=39).astype(np.int8)
    nsc = 12 * (2 + 6 * al + 6)
    grid = jnp.zeros((14, nsc), dtype=jnp.complex64)
    grid = pdcch.pdcch_transmit(jnp.asarray(payload), cfg, grid)
    # AWGN
    noise = 0.05 * (rng.standard_normal(grid.shape)
                    + 1j * rng.standard_normal(grid.shape))
    rx = grid + jnp.asarray(noise.astype(np.complex64))
    res = pdcch.pdcch_receive(rx, cfg)
    assert bool(res.crc_ok)
    assert np.array_equal(np.asarray(res.payload), payload)


def test_pdcch_wrong_rnti_fails_crc():
    rng = np.random.default_rng(1)
    cfg = pdcch.PdcchConfig(rnti=0x4601, payload_size=30, aggregation_level=2)
    payload = rng.integers(0, 2, size=30).astype(np.int8)
    grid = jnp.zeros((14, 12 * 20), dtype=jnp.complex64)
    grid = pdcch.pdcch_transmit(jnp.asarray(payload), cfg, grid)
    import dataclasses
    wrong = dataclasses.replace(cfg, rnti=0x1234)
    res = pdcch.pdcch_receive(grid, wrong)
    assert not bool(res.crc_ok)
    res_right = pdcch.pdcch_receive(grid, cfg)
    assert bool(res_right.crc_ok)


def test_pdcch_re_mapping_geometry():
    cfg = pdcch.PdcchConfig(rnti=1, payload_size=20, aggregation_level=1,
                            nof_symbols=1)
    dsym, dsc, msym, msc = cfg.re_indices
    assert len(dsc) == 6 * 9      # 9 data REs per REG
    assert len(msc) == 6 * 3      # 3 DM-RS REs per REG
    assert (np.asarray(msc) % 4 == 1).all()


# ---------------------------------------------------------------- PSS/SSS
def test_pss_properties():
    for nid2 in range(3):
        d = ssb.pss_sequence(nid2)
        assert d.shape == (127,)
        assert np.allclose(np.abs(d), 1.0)
    # distinct shifts decorrelate
    c = np.abs(np.sum(ssb.pss_sequence(0) * ssb.pss_sequence(1))) / 127
    assert c < 0.2


def test_sss_distinguishes_cells():
    a = ssb.sss_sequence(10, 0)
    b = ssb.sss_sequence(11, 0)
    assert np.abs(np.dot(a, b)) / 127 < 0.3
    assert np.allclose(np.abs(a), 1.0)


# ---------------------------------------------------------------- PBCH/SSB
def test_pbch_roundtrip():
    rng = np.random.default_rng(2)
    cfg = ssb.SsbConfig(pci=123, ssb_idx=2, lmax=8, sfn=100)
    payload = rng.integers(0, 2, size=32).astype(np.int8)
    coded = ssb.pbch_encode(jnp.asarray(payload), cfg)
    assert coded.shape == (864,)
    llr = 8.0 * (1.0 - 2.0 * np.asarray(coded, np.float32))
    llr += 1.0 * rng.standard_normal(864).astype(np.float32)
    got, ok = ssb.pbch_decode(jnp.asarray(llr), cfg)
    assert bool(ok)
    assert np.array_equal(np.asarray(got), payload)


def test_ssb_assemble_geometry():
    cfg = ssb.SsbConfig(pci=321, ssb_idx=0)
    block = ssb.ssb_assemble(jnp.zeros(32, dtype=jnp.int8), cfg)
    b = np.asarray(block)
    assert b.shape == (4, 240)
    # PSS/SSS present
    assert (np.abs(b[0, 56:183]) > 0.9).all()
    assert (np.abs(b[2, 56:183]) > 0.9).all()
    # guard bands of symbol 0 empty
    assert (b[0, :56] == 0).all() and (b[0, 183:] == 0).all()
    # PBCH symbols fully occupied
    assert (np.abs(b[1]) > 0.1).all() and (np.abs(b[3]) > 0.1).all()


def test_ssb_full_loopback():
    rng = np.random.default_rng(3)
    cfg = ssb.SsbConfig(pci=77, ssb_idx=1, lmax=8, sfn=42)
    payload = rng.integers(0, 2, size=32).astype(np.int8)
    block = ssb.ssb_assemble(jnp.asarray(payload), cfg)
    noise = 0.1 / np.sqrt(2) * (rng.standard_normal((4, 240))
                                + 1j * rng.standard_normal((4, 240)))
    rx = block + jnp.asarray(noise.astype(np.complex64))
    got, ok = ssb.ssb_receive_pbch(rx, cfg, noise_var=0.01)
    assert bool(ok)
    assert np.array_equal(np.asarray(got), payload)
    # wrong cell id: second scrambling mismatch must break the CRC
    wrong = ssb.SsbConfig(pci=78, ssb_idx=1, lmax=8, sfn=42)
    _, ok_wrong = ssb.ssb_receive_pbch(rx, wrong, noise_var=0.01)
    assert not bool(ok_wrong)


# ---------------------------------------------------------------- r3: CCE
# allocation, interleaved CORESET, dynamic blind decode, DCI codec

def test_pdcch_interleaved_coreset_roundtrip():
    """TX with the §7.3.2.2 REG-bundle interleaver; static RX recovers the
    DCI; the interleaved REs differ from the non-interleaved layout."""
    from srsran_project_23_5_tpu.phy.upper import pdcch as p
    rng = np.random.default_rng(4)
    payload = rng.integers(0, 2, size=20).astype(np.int8)
    base = dict(rnti=0x4601, payload_size=20, aggregation_level=4,
                cce_index=2, n_id=7, n_rnti=0x4601)
    cfg_i = p.PdcchConfig(**base, interleaved=True, coreset_nof_prb=48,
                          shift=7)
    cfg_n = p.PdcchConfig(**base)
    grid = jnp.zeros((14, 48 * 12), dtype=jnp.complex64)
    gi = p.pdcch_transmit(jnp.asarray(payload), cfg_i, grid)
    gn = p.pdcch_transmit(jnp.asarray(payload), cfg_n, grid)
    assert not np.allclose(np.asarray(gi), np.asarray(gn))
    res = p.pdcch_receive(gi, cfg_i)
    assert bool(res.crc_ok)
    assert np.array_equal(np.asarray(res.payload), payload)


def test_pdcch_blind_receive_dynamic_cce():
    """One compiled program scans all candidates; finds the DCI at its
    CCE, rejects empty candidates, rejects a foreign RNTI."""
    import jax
    from srsran_project_23_5_tpu.phy.upper import pdcch as p
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 2, size=24).astype(np.int8)
    cfg = p.PdcchConfig(rnti=0x17, payload_size=24, aggregation_level=2,
                        cce_index=4, n_id=3, n_rnti=0x17)
    grid = jnp.zeros((14, 52 * 12), dtype=jnp.complex64)
    grid = p.pdcch_transmit(jnp.asarray(payload), cfg, grid)
    cands = jnp.asarray([0, 2, 4, 6], jnp.int32)
    payloads, ok = jax.jit(
        lambda g, c: p.pdcch_blind_receive(g, cfg, c))(grid, cands)
    ok = np.asarray(ok)
    assert list(ok) == [False, False, True, False]
    assert np.array_equal(np.asarray(payloads)[2], payload)
    other = p.PdcchConfig(rnti=0x99, payload_size=24, aggregation_level=2,
                          cce_index=4, n_id=3, n_rnti=0x99)
    _, ok2 = jax.jit(
        lambda g, c: p.pdcch_blind_receive(g, other, c))(grid, cands)
    assert not np.asarray(ok2).any()


def test_dci_pack_unpack_roundtrip():
    from srsran_project_23_5_tpu.scheduler import dci
    for n_bwp in (24, 52, 106, 273):
        for (s, l) in ((0, 1), (3, 7), (0, n_bwp), (n_bwp - 1, 1)):
            d = dci.Dci(is_dl=(l % 2 == 0), prb_start=s, prb_len=l,
                        time_domain=3, mcs=17, ndi=1, rv=2, harq_pid=9)
            got = dci.unpack(dci.pack(d, n_bwp), n_bwp)
            assert got == d, (n_bwp, s, l, got)


def test_cce_allocator_no_overlap_and_blocking():
    from srsran_project_23_5_tpu.scheduler.pdcch_alloc import (
        PdcchSlotAllocator)
    a = PdcchSlotAllocator(nof_cces=8)
    got = [a.allocate(0x4601 + i, slot=3, aggregation_level=4,
                      nof_candidates=4) for i in range(4)]
    placed = [g for g in got if g is not None]
    assert len(placed) == 2              # 8 CCEs fit two AL4 DCIs
    assert len(set(placed)) == 2 and all(g % 4 == 0 for g in placed)
    assert got[2] is None or got[3] is None


def test_cce_allocator_hashing_moves_with_slot():
    from srsran_project_23_5_tpu.scheduler.pdcch_alloc import (
        PdcchSlotAllocator, y_p)
    ys = {y_p(0x4601, 0, s) % 4 for s in range(16)}
    assert len(ys) > 1                   # candidates hop across slots
