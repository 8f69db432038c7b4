"""ran derivation helpers: SLIV, band helper, PRACH config tables, SSB
patterns (SURVEY §2.3 `ran` row; VERDICT r2 component #40)."""
import pytest

from srsran_project_23_5_tpu.ran import (band_helper, prach_config, sliv,
                                         ssb_patterns)


def test_sliv_roundtrip_exhaustive():
    for n in (14, 12, 7):
        for s in range(n):
            for l in range(1, n - s + 1):
                v = sliv.sliv_encode(n, s, l)
                assert 0 <= v < n * (n + 1)
                assert sliv.sliv_decode(n, v) == (s, l)


def test_sliv_unique():
    n = 14
    seen = set()
    for s in range(n):
        for l in range(1, n - s + 1):
            seen.add(sliv.sliv_encode(n, s, l))
    assert len(seen) == n * (n + 1) // 2


def test_nr_arfcn_raster():
    assert band_helper.nr_arfcn_to_freq_hz(600_000) == 3e9
    # band 78 center 3.5 GHz
    f = band_helper.nr_arfcn_to_freq_hz(632_628)
    assert abs(f - 3_489_420_000) < 1
    assert band_helper.freq_hz_to_nr_arfcn(f) == 632_628
    # low raster: 5 kHz steps
    assert band_helper.nr_arfcn_to_freq_hz(176_300) == 881.5e6


def test_band_lookup_and_duplex():
    assert band_helper.duplex_mode(78) == "TDD"
    assert band_helper.duplex_mode(3) == "FDD"
    assert band_helper.band_from_dl_freq(3.6e9) in (77, 78)
    assert band_helper.band_from_dl_freq(1.842e9) == 3
    # FDD duplex spacing: band 3 DL-UL = 95 MHz
    dl = band_helper.freq_hz_to_nr_arfcn(1842.5e6)
    ul = band_helper.ul_arfcn_from_dl(3, dl)
    assert abs(band_helper.nr_arfcn_to_freq_hz(ul) - 1747.5e6) < 1e3
    assert band_helper.ul_arfcn_from_dl(78, 632_628) == 632_628


def test_prach_configuration_table():
    c16 = prach_config.prach_configuration(16)
    assert c16.format == "0" and c16.x == 1 and c16.subframes == (1,)
    c27 = prach_config.prach_configuration(27)
    assert len(c27.subframes) == 10
    assert prach_config.prach_slot_match(c16, sfn=5, subframe=1)
    assert not prach_config.prach_slot_match(c16, sfn=5, subframe=2)
    c0 = prach_config.prach_configuration(0)
    assert prach_config.prach_slot_match(c0, sfn=17, subframe=1)
    assert not prach_config.prach_slot_match(c0, sfn=16, subframe=1)


def test_ncs_tables():
    assert prach_config.ncs_from_zcz(13, "0") == 167
    assert prach_config.ncs_from_zcz(13, "0", "type_a") == 202
    assert prach_config.ncs_from_zcz(1, "A1") == 2
    assert prach_config.ncs_from_zcz(0, "0") == 0


def test_ssb_patterns():
    assert ssb_patterns.ssb_first_symbols("A", 4) == (2, 8, 16, 22)
    assert ssb_patterns.ssb_first_symbols("C", 8) == (
        2, 8, 16, 22, 30, 36, 44, 50)
    assert ssb_patterns.ssb_first_symbols("B", 4) == (4, 8, 16, 20)
    assert len(ssb_patterns.ssb_first_symbols("B", 8)) == 8
    assert ssb_patterns.ssb_case_for(0, 2.1e9, True) == "A"
    assert ssb_patterns.ssb_case_for(1, 3.5e9, False) == "C"
    assert ssb_patterns.ssb_lmax(2.6e9) == 4
    assert ssb_patterns.ssb_lmax(3.5e9) == 8
