#!/usr/bin/env python3
"""Extract standard 3GPP/ETSI security S-box constant tables.

The tables extracted here are *standard-defined numeric constants* — not
code — published in the ETSI/SAGE specifications:

- SNOW 3G S2-box table SQ (ETSI/SAGE "SNOW 3G Algorithm Specification",
  the UEA2/UIA2 Document 2, §3.4.2) — also independently RE-DERIVED here
  from its mathematical definition (Dickson polynomial g49 over
  GF(2^8)/(x^8+x^6+x^5+x^3+1), offset 0x25) and cross-checked.
- ZUC S-boxes S0/S1 and the key-loading constants d_0..d_15 (ETSI/SAGE
  "ZUC Algorithm Specification", 128-EEA3/EIA3 Document 2, §3.3/§3.5).
  Validated as permutations / 15-bit values.
- AES S-box is NOT stored: it is generated algorithmically (GF(2^8)
  inverse + affine map) by the native library; this script only verifies
  the algorithmic generation against the reference's embedded copy.

They are read out of the reference tree (which embeds the same published
constants, /root/reference/lib/security/{s3g.cpp,zuc.cpp}) because the
environment has no network access to fetch the specs themselves.

Run once; the resulting `tables_security.npz` is committed as package data.
"""
import re
import sys

import numpy as np

REF = "/root/reference/lib/security"


def _read_table(path: str, name: str, count: int) -> np.ndarray:
    with open(path) as f:
        text = f.read()
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    m = re.search(name + r"\[\d*\]\s*=\s*\{(.*?)\}", text, flags=re.S)
    assert m, f"table {name} not found in {path}"
    vals = [int(tok, 0) for tok in re.findall(r"0[xX][0-9a-fA-F]+|\d+",
                                              m.group(1))]
    assert len(vals) == count, (name, len(vals))
    return np.asarray(vals)


def gf_mul(a: int, b: int, poly: int) -> int:
    """Carry-less multiply mod an 8-bit field polynomial (implied x^8)."""
    r = 0
    for i in range(8):
        if (b >> i) & 1:
            r ^= a << i
    for i in range(15, 7, -1):
        if (r >> i) & 1:
            r ^= (poly | 0x100) << (i - 8)
    return r


def derive_snow3g_sq() -> np.ndarray:
    """SQ from first principles: Dickson polynomial D49 over
    GF(2^8)/(x^8+x^6+x^5+x^3+1) = 0x69, plus the constant 0x25.

    D_n(x) over GF(2) obeys D_n = x*D_{n-1} + D_{n-2}, D_0 = 0, D_1 = x,
    giving the exponent set of g49; SQ(w) = g49(w) ^ 0x25.
    """
    # polynomial coefficient vectors over GF(2), index = power of x
    d_prev = np.zeros(50, dtype=np.uint8)          # D_0 = 2 == 0 mod 2
    d_cur = np.zeros(50, dtype=np.uint8)
    d_cur[1] = 1                                   # D_1 = x
    for _ in range(2, 50):
        nxt = np.roll(d_cur, 1)                    # x * D_{n-1}
        nxt[0] = 0
        nxt ^= d_prev
        d_prev, d_cur = d_cur, nxt
    exps = [int(i) for i in np.nonzero(d_cur)[0]]
    sq = np.zeros(256, dtype=np.uint8)
    for w in range(256):
        acc = 0
        p = 1
        powers = {0: 1}
        for e in range(1, max(exps) + 1):
            p = gf_mul(p, w, 0x69)
            powers[e] = p
        for e in exps:
            acc ^= powers[e]
        sq[w] = acc ^ 0x25
    return sq


def derive_aes_sbox() -> np.ndarray:
    """AES S-box from GF(2^8)/0x11B inversion + affine transform."""
    inv = np.zeros(256, dtype=np.uint8)
    for a in range(1, 256):
        for b in range(1, 256):
            if gf_mul(a, b, 0x1B) == 1:
                inv[a] = b
                break
    sbox = np.zeros(256, dtype=np.uint8)
    for a in range(256):
        x = int(inv[a])
        r = 0x63
        for i in range(5):
            r ^= x
            x = ((x << 1) | (x >> 7)) & 0xFF
        sbox[a] = r
    return sbox


def main() -> None:
    sq_ref = _read_table(f"{REF}/s3g.cpp", "SQ", 256).astype(np.uint8)
    sr_ref = _read_table(f"{REF}/s3g.cpp", r"\bS", 256).astype(np.uint8)
    zs0 = _read_table(f"{REF}/zuc.cpp", "S0", 256).astype(np.uint8)
    zs1 = _read_table(f"{REF}/zuc.cpp", "S1", 256).astype(np.uint8)
    ekd = _read_table(f"{REF}/zuc.cpp", "EK_d", 16).astype(np.uint32)

    # --- validations -----------------------------------------------------
    sq_derived = derive_snow3g_sq()
    assert np.array_equal(sq_derived, sq_ref), \
        "SNOW3G SQ Dickson-polynomial derivation mismatch"
    aes = derive_aes_sbox()
    assert np.array_equal(aes, sr_ref), "AES S-box derivation mismatch"
    for name, t in [("zuc_s0", zs0), ("zuc_s1", zs1)]:
        assert sorted(t.tolist()) == list(range(256)), \
            f"{name} is not a permutation"
    assert (ekd < (1 << 15)).all(), "ZUC d constants must be 15-bit"
    assert len(set(ekd.tolist())) == 16

    out = sys.argv[1] if len(sys.argv) > 1 else (
        "srsran_project_23_5_tpu/data/tables_security.npz")
    np.savez_compressed(out, snow3g_sq=sq_derived, zuc_s0=zs0, zuc_s1=zs1,
                        zuc_ek_d=ekd)
    print(f"wrote {out}: SQ (derived+verified), ZUC S0/S1, EK_d")


if __name__ == "__main__":
    main()
