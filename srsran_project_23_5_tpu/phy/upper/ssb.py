"""SSB processor: PSS, SSS, PBCH encode/modulate and SSB assembly.

TS 38.211 §7.4.2-§7.4.3 and TS 38.212 §7.1; reference counterparts:
pss_processor_impl.cpp, sss_processor_impl.cpp, pbch_encoder_impl.cpp
(payload interleaver Table 7.1.1-1, scrambling, polar K=56/E=864),
pbch_modulator_impl.cpp, dmrs_pbch_processor_impl.cpp,
ssb_processor_impl.cpp.

The SSB occupies 4 symbols × 240 subcarriers; this module renders the
whole block as one [4, 240] tensor that the beamformer/grid-writer places
at the configured offset.
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ...ops import crc as crc_ops
from ...ops import gold, modulation
from ...ops import cplx
from ...ops.devconst import const_c64
from ...ops.polar import code as polar_code
from ...ops.polar import decoder as polar_decoder
from ...ops.polar import encoder as polar_encoder
from ...ops.polar import rate_match as polar_rm

SSB_NSYM = 4
SSB_NSC = 240
PBCH_A = 32          # payload bits (24 MIB + 8 timing)
PBCH_K = 56          # A + CRC24
PBCH_E = 864
PBCH_NSYM = 432      # QPSK symbols

# TS 38.212 Table 7.1.1-1: PBCH payload interleaver pattern G(j).
_G = (16, 23, 18, 17, 8, 30, 10, 6, 24, 7, 0, 5, 3, 2, 1, 4,
      9, 11, 12, 13, 14, 15, 19, 20, 21, 22, 25, 26, 27, 28, 29, 31)


@functools.lru_cache(maxsize=8)
def _mseq(taps: tuple[int, ...], init: tuple[int, ...]) -> np.ndarray:
    """Length-127 m-sequence x(i+7) = sum_t x(i+t) mod 2."""
    x = np.zeros(127 + 7, dtype=np.int8)
    x[:7] = init
    for i in range(127):
        x[i + 7] = sum(x[i + t] for t in taps) % 2
    return x[:127]


def pss_sequence(nid2: int) -> np.ndarray:
    """d_PSS (TS 38.211 §7.4.2.2): BPSK of m-seq shifted by 43*NID2."""
    x = _mseq((4, 0), (0, 1, 1, 0, 1, 1, 1))
    n = np.arange(127)
    return (1.0 - 2.0 * x[(n + 43 * nid2) % 127]).astype(np.float32)


def sss_sequence(nid1: int, nid2: int) -> np.ndarray:
    """d_SSS (TS 38.211 §7.4.2.3)."""
    x0 = _mseq((4, 0), (1, 0, 0, 0, 0, 0, 0))
    x1 = _mseq((1, 0), (1, 0, 0, 0, 0, 0, 0))
    m0 = 15 * (nid1 // 112) + 5 * nid2
    m1 = nid1 % 112
    n = np.arange(127)
    return ((1.0 - 2.0 * x0[(n + m0) % 127])
            * (1.0 - 2.0 * x1[(n + m1) % 127])).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class SsbConfig:
    pci: int                     # physical cell id N_ID^cell (0..1007)
    ssb_idx: int = 0             # SS/PBCH block index
    lmax: int = 8                # max SSB candidates (4/8/64)
    sfn: int = 0
    hrf: int = 0                 # half-radio-frame bit

    @property
    def nid1(self) -> int:
        return self.pci // 3

    @property
    def nid2(self) -> int:
        return self.pci % 3


@functools.lru_cache(maxsize=16)
def _pbch_code() -> polar_code.PolarCode:
    return polar_code.polar_code(PBCH_K, PBCH_E, nmax_log=9)


_G_INV = tuple(int(x) for x in np.argsort(np.asarray(_G)))


def _payload_interleave(bits: jnp.ndarray) -> jnp.ndarray:
    """a(G(j)) = payload(j): the reference's ordered placement collapses to
    one static permutation (expressed as a gather for the TPU backend)."""
    return bits[jnp.asarray(_G_INV)]


def _payload_deinterleave(bits: jnp.ndarray) -> jnp.ndarray:
    return bits[jnp.asarray(_G)]


def _first_scrambling_seq(cfg: SsbConfig) -> np.ndarray:
    """First (payload-level) scrambling (TS 38.211 §7.1.1): Gold by PCI,
    offset by v = 2*sfn2 + sfn3 (2nd/3rd LSBs of SFN), sparing SFN/HRF/
    SSB-index bits."""
    v = 2 * ((cfg.sfn >> 1) & 1) + ((cfg.sfn >> 2) & 1)
    m = 29 if cfg.lmax < 64 else 26  # scrambled bit count (A - 3 or A - 6)
    c = gold.gold_sequence_np(cfg.pci, (v + 1) * m)[v * m:]
    # Build per-position mask: SFN 2nd/3rd LSB and HRF (and SSB idx bits
    # for Lmax=64) are NOT scrambled.
    seq = np.zeros(PBCH_A, dtype=np.int8)
    spare = {_G[10 + 2], _G[10 + 1], _G[10 + 7]}  # sfn2nd, sfn3rd, hrf slots
    if cfg.lmax == 64:
        spare |= {_G[10 + 5], _G[10 + 6], _G[29]}
    j = 0
    for i in range(PBCH_A):
        if i in spare:
            continue
        seq[i] = c[j]
        j += 1
    return seq


def pbch_encode(payload: jnp.ndarray, cfg: SsbConfig) -> jnp.ndarray:
    """32-bit payload → 864 coded bits (pbch_encoder_impl.cpp chain)."""
    a = _payload_interleave(payload)
    a = a ^ jnp.asarray(_first_scrambling_seq(cfg))
    with_crc = crc_ops.crc_attach(a[None], "crc24C")
    code = _pbch_code()
    pi = jnp.asarray(polar_code.input_interleaver(PBCH_K))
    interleaved = with_crc[0][pi]
    u = polar_encoder.allocate(interleaved[None], code.info_set, code.n)
    x = polar_encoder.encode(u)
    coded = polar_rm.match(x, code)[0]
    # Second scrambling: full codeword, Gold by PCI, offset by SSB index.
    i_ssb = (cfg.ssb_idx & 0b111) if cfg.lmax >= 8 else \
        ((cfg.ssb_idx & 0b11) + 4 * cfg.hrf)
    seq = gold.gold_sequence(jnp.asarray(cfg.pci, dtype=jnp.uint32),
                             PBCH_E, offset=i_ssb * PBCH_E)
    return coded ^ seq


def pbch_decode(llr: jnp.ndarray, cfg: SsbConfig
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """864 LLRs → (payload 32 bits, crc_ok)."""
    i_ssb = (cfg.ssb_idx & 0b111) if cfg.lmax >= 8 else \
        ((cfg.ssb_idx & 0b11) + 4 * cfg.hrf)
    seq = gold.gold_sequence(jnp.asarray(cfg.pci, dtype=jnp.uint32),
                             PBCH_E, offset=i_ssb * PBCH_E)
    llr = llr * (1.0 - 2.0 * seq.astype(jnp.float32))
    code = _pbch_code()
    u = polar_decoder.decode(polar_rm.dematch(llr, code)[None], code)
    msg = polar_encoder.extract_message(u, code.info_set)[0]
    pi = jnp.asarray(polar_code.input_interleaver(PBCH_K))
    de = jnp.zeros_like(msg).at[pi].set(msg)
    ok = crc_ops.crc_check(de[None], "crc24C")[0]
    a = de[:PBCH_A] ^ jnp.asarray(_first_scrambling_seq(cfg))
    return _payload_deinterleave(a), ok


def _dmrs_positions(cfg: SsbConfig) -> tuple[np.ndarray, np.ndarray]:
    """(symbol, sc) of PBCH DM-RS within the 4×240 block (v = PCI mod 4)."""
    v = cfg.pci % 4
    syms, scs = [], []
    for sc in range(v, SSB_NSC, 4):
        syms.append(1); scs.append(sc)
        syms.append(3); scs.append(sc)
    for sc in range(v, 48, 4):
        syms.append(2); scs.append(sc)
    for sc in range(192 + v, SSB_NSC, 4):
        syms.append(2); scs.append(sc)
    return np.asarray(syms, np.int32), np.asarray(scs, np.int32)


def _data_positions(cfg: SsbConfig) -> tuple[np.ndarray, np.ndarray]:
    v = cfg.pci % 4
    syms, scs = [], []
    for sc in range(SSB_NSC):
        if sc % 4 != v:
            syms.append(1); scs.append(sc)
    for sc in range(48):
        if sc % 4 != v:
            syms.append(2); scs.append(sc)
    for sc in range(192, SSB_NSC):
        if sc % 4 != v:
            syms.append(2); scs.append(sc)
    for sc in range(SSB_NSC):
        if sc % 4 != v:
            syms.append(3); scs.append(sc)
    return np.asarray(syms, np.int32), np.asarray(scs, np.int32)


def dmrs_pbch_pilots(cfg: SsbConfig) -> jnp.ndarray:
    """QPSK DM-RS pilots (TS 38.211 §7.4.1.4.1)."""
    i_ssb = (cfg.ssb_idx & 0b111) if cfg.lmax >= 8 else (cfg.ssb_idx & 0b11)
    ii = i_ssb + 4 * cfg.hrf if cfg.lmax < 8 else i_ssb
    cinit = ((1 << 11) * (ii + 1) * (cfg.pci // 4 + 1)
             + (1 << 6) * (ii + 1) + (cfg.pci % 4)) % (1 << 31)
    npil = 144
    c = gold.gold_sequence(jnp.asarray(cinit, dtype=jnp.uint32),
                           2 * npil).astype(jnp.float32)
    return (((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2]))
            / np.sqrt(2)).astype(jnp.complex64)


def ssb_assemble(payload: jnp.ndarray, cfg: SsbConfig,
                 amplitude: float = 1.0) -> jnp.ndarray:
    """Build the full [4, 240] SS/PBCH block (ssb_processor_impl.cpp).

    TPU-structured: every symbol row is a comb-4 interleave assembled as
    [n, 4] quads (DM-RS at k ≡ v mod 4, data elsewhere) and written with
    slice updates — no generic scatters (they serialize on TPU).  The
    value layout is identical to the `_data_positions`/`_dmrs_positions`
    index order used by the receiver.
    """
    v = cfg.pci % 4
    coded = pbch_encode(payload, cfg)
    syms = modulation.modulate(coded, 2) * amplitude
    pil = dmrs_pbch_pilots(cfg) * amplitude
    dcols = [j for j in range(4) if j != v]

    def comb_rows(data_chunk, pil_chunk, nquad):
        """[nquad, 4] quads: col v = pilots, other cols = data in order
        (float-plane layout: odd-stride complex ops are unimplemented on
        the TPU backend, ops/cplx.py)."""
        cols = [None] * 4
        cols[v] = pil_chunk
        for i, j in enumerate(dcols):
            cols[j] = cplx.cstride(data_chunk, i, 3)
        del nquad
        return cplx.cinterleave(cols)

    # data order: sym1 (180), sym2 lo (36), sym2 hi (36), sym3 (180)
    # pilot order: sym1/sym3 interleaved per sc (120), sym2 lo+hi (24)
    d1, d2a, d2b, d3 = (syms[:180], syms[180:216], syms[216:252],
                        syms[252:432])
    p1, p3 = pil[0:120:2], pil[1:120:2]
    p2a, p2b = pil[120:132], pil[132:144]

    row0 = jnp.zeros((SSB_NSC,), jnp.complex64).at[56:183].set(
        amplitude * const_c64(pss_sequence(cfg.nid2)))
    row1 = comb_rows(d1, p1, 60)
    row2 = jnp.zeros((SSB_NSC,), jnp.complex64)
    row2 = row2.at[0:48].set(comb_rows(d2a, p2a, 12))
    row2 = row2.at[192:240].set(comb_rows(d2b, p2b, 12))
    row2 = row2.at[56:183].set(
        amplitude * const_c64(sss_sequence(cfg.nid1, cfg.nid2)))
    row3 = comb_rows(d3, p3, 60)
    return jnp.stack([row0, row1, row2, row3])


def ssb_receive_pbch(block: jnp.ndarray, cfg: SsbConfig,
                     noise_var: float = 0.05
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extract + decode PBCH from a received [4, 240] SSB block (loopback;
    channel equalization via the DM-RS is left to the caller)."""
    dsym, dsc = _data_positions(cfg)
    y = block[jnp.asarray(dsym), jnp.asarray(dsc)]
    nv = jnp.full(y.shape, noise_var, dtype=jnp.float32)
    llr = modulation.demodulate_soft(y, nv, 2)
    return pbch_decode(llr, cfg)
