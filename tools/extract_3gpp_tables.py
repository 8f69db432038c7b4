#!/usr/bin/env python3
"""Extract standard 3GPP constant tables into .npz data files.

The tables extracted here are *standard-defined numeric constants* from
3GPP TS 38.212 (Rel-15) — not code:

- LDPC base-graph shift-coefficient tables V(i,j) per lifting-set index
  (TS 38.212 Tables 5.3.2-2 and 5.3.2-3), shapes (8, 46, 68) and (8, 42, 52).
- Polar universal reliability sequence Q_0^{Nmax-1} for Nmax = 1024
  (TS 38.212 Table 5.3.1.2-1).
- Polar sub-block interleaver base pattern P(i), 32 entries
  (TS 38.212 Table 5.4.1.1-1).
- Short-block (Reed-Muller-like) basis sequences M_{i,n}
  (TS 38.212 Table 5.3.3.3-1), shape (11, 32).

They are read out of the reference tree (which embeds the same spec tables,
see /root/reference/lib/phy/upper/channel_coding/ldpc/ldpc_luts_impl.cpp and
polar_code_impl.cpp) because the environment has no network access to fetch
the spec itself.  Several internal consistency checks validate the extraction
(derived subsequence properties, edge counts, double-diagonal structure).

Run once; the resulting `tables_38212.npz` is committed as package data.
"""
import re
import sys

import numpy as np

REF = "/root/reference/lib/phy/upper/channel_coding"
NO_EDGE = 0xFFFF


def _read(path: str) -> str:
    with open(path) as f:
        text = f.read()
    # Strip // and /* */ comments so their digits don't pollute tokenization.
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    return text


def _array_ints(text: str, name: str, count: int,
                signed: bool = False) -> np.ndarray:
    """Pull `count` integer tokens (NO_EDGE allowed) following `name`."""
    m = re.search(re.escape(name) + r"\s*=?\s*\{", text)
    if not m:
        raise RuntimeError(f"table {name} not found")
    pattern = r"NO_EDGE|-?\d+" if signed else r"NO_EDGE|\d+"
    tokens = re.findall(pattern, text[m.end():])
    vals = []
    for tok in tokens:
        vals.append(NO_EDGE if tok == "NO_EDGE" else int(tok))
        if len(vals) == count:
            break
    if len(vals) != count:
        raise RuntimeError(f"table {name}: wanted {count} ints, got {len(vals)}")
    return np.asarray(vals, dtype=np.int32 if signed else np.uint16)


def main() -> None:
    ldpc_txt = _read(f"{REF}/ldpc/ldpc_luts_impl.cpp")
    polar_txt = _read(f"{REF}/polar/polar_code_impl.cpp")
    short_txt = _read(f"{REF}/short/short_block_encoder_impl.cpp")

    bg1 = _array_ints(ldpc_txt, "BG1_matrices", 8 * 46 * 68).reshape(8, 46, 68)
    bg2 = _array_ints(ldpc_txt, "BG2_matrices", 8 * 42 * 52).reshape(8, 42, 52)

    # Sanity: double-diagonal core structure of the base graphs.  The four
    # core parity columns (22..25 for BG1, 10..13 for BG2) must contain the
    # fixed 0-shift double diagonal in every lifting set.
    for bg, k0, m in ((bg1, 22, 46), (bg2, 10, 42)):
        for ils in range(8):
            assert bg[ils, 0, k0] != NO_EDGE and bg[ils, 1, k0 + 1] != NO_EDGE
            # extension rows have exactly one parity edge (identity)
            for r in range(4, m):
                ext = bg[ils, r, k0 + r]
                assert ext == 0, (ils, r, ext)
    # Edge pattern identical across lifting sets.
    for bg in (bg1, bg2):
        e0 = bg[0] != NO_EDGE
        for ils in range(1, 8):
            assert np.array_equal(e0, bg[ils] != NO_EDGE)
    assert int((bg1[0] != NO_EDGE).sum()) == 316  # TS 38.212 BG1 edge count
    assert int((bg2[0] != NO_EDGE).sum()) == 197  # TS 38.212 BG2 edge count

    polar_q1024 = _array_ints(polar_txt, "mother_code_10", 1024)
    # Nested-sequence property: the Q sequence for N=32 is the subsequence of
    # Q^1024 with entries < 32.
    mother5 = _array_ints(polar_txt, "mother_code_5", 32)
    derived5 = polar_q1024[polar_q1024 < 32]
    assert np.array_equal(derived5, mother5), "polar nesting check failed"

    polar_pi32 = _array_ints(polar_txt, "blk_interleaver_5", 32)
    # Derivation check for N=64 via TS 38.212 §5.4.1.1: J(n) = P(i)*(N/32) + n mod (N/32)
    blk6 = _array_ints(polar_txt, "blk_interleaver_6", 64)
    n = np.arange(64)
    derived6 = polar_pi32[(32 * n) // 64] * (64 // 32) + n % (64 // 32)
    assert np.array_equal(derived6.astype(np.uint16), blk6), "interleaver derivation failed"

    basis = _array_ints(short_txt, "BASIS_SEQUENCES", 11 * 32).reshape(11, 32).astype(np.uint8)
    assert basis.max() <= 1

    # Polar input-bit interleaver pattern Pi_IL^max, 164 entries
    # (TS 38.212 Table 5.3.1.1-1).
    il_txt = _read(f"{REF}/polar/polar_interleaver_impl.cpp")
    polar_pi_il = _array_ints(il_txt, "polar_interleaver_impl::pattern", 164)
    assert sorted(polar_pi_il.tolist()) == list(range(164))

    # Low-PAPR phi tables for M_zc in {6,12,18,24}
    # (TS 38.211 Tables 5.2.2.2-1..4), 30 groups each, values in [-3, 3].
    lp_txt = _read("/root/reference/lib/phy/upper/sequence_generators/"
                   "low_papr_sequence_generator_impl.cpp")
    phi = {}
    for msc in (6, 12, 18, 24):
        t = _array_ints(lp_txt, f"phi_M_sc_{msc}", 30 * msc, signed=True)
        phi[f"phi_{msc}"] = t.reshape(30, msc).astype(np.int8)
        assert abs(phi[f"phi_{msc}"]).max() <= 3

    out = sys.argv[1] if len(sys.argv) > 1 else "srsran_project_23_5_tpu/data/tables_38212.npz"
    np.savez_compressed(
        out,
        ldpc_bg1=bg1,
        ldpc_bg2=bg2,
        polar_q1024=polar_q1024,
        polar_pi32=polar_pi32.astype(np.uint8),
        polar_pi_il=polar_pi_il.astype(np.uint8),
        short_block_basis=basis,
        **phi,
    )
    print(f"wrote {out}: bg1 {bg1.shape}, bg2 {bg2.shape}, polar Q {polar_q1024.shape}")


if __name__ == "__main__":
    main()
