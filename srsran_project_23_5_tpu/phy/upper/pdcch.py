"""PDCCH processor: DCI encoding, QPSK mapping, DM-RS; and a receiver.

Chain per TS 38.212 §7.3 / TS 38.211 §7.3.2 and the reference
pdcch_encoder_impl.cpp:33-86, pdcch_modulator_impl.cpp:

TX: DCI payload → CRC24C over (24 ones ‖ payload) → RNTI mask on the last
16 CRC bits → input interleaver (I_IL=1) → polar encode (N ≤ 512) → rate
match (E = 108·AL) → scramble → QPSK → CCE/REG mapping with DM-RS at
k ≡ 1 (mod 4).

RX (UE-side / loopback validation): the inverse with SC polar decoding and
CRC/RNTI check — the blind-decode metric is the CRC pass.

Non-interleaved CORESET CCE-to-REG mapping (6 consecutive REGs per CCE).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import cplx
from ...ops import dmrs as dmrs_ops
from ...ops import gold, modulation
from ...ops.polar import code as polar_code
from ...ops.polar import decoder as polar_decoder
from ...ops.polar import encoder as polar_encoder
from ...ops.polar import rate_match as polar_rm
from ...ops import crc as crc_ops
from ...ran.constants import NRE


@dataclasses.dataclass(frozen=True)
class PdcchConfig:
    rnti: int
    payload_size: int            # DCI bits (A)
    aggregation_level: int = 4   # 1/2/4/8/16 CCEs
    cce_index: int = 0
    coreset_start_prb: int = 0
    start_symbol: int = 0
    nof_symbols: int = 1         # CORESET duration (1..3)
    n_id: int = 1                # pdcch-DMRS-ScramblingID / scrambling id
    n_rnti: int = 0              # scrambling RNTI (C-RNTI UE-specific SS)
    # interleaved CCE-to-REG mapping (TS 38.211 §7.3.2.2): REG bundles of
    # L=6 permuted by the (R, C) block interleaver with shift n_shift
    interleaved: bool = False
    coreset_nof_prb: int = 48    # CORESET width (sets the bundle count)
    interleaver_rows: int = 2    # R
    shift: int = 0               # n_shift (typically the PCI)

    @property
    def e(self) -> int:
        # 1 CCE = 6 REGs = 6 PRBs(1 symbol); 9 data REs/REG, QPSK
        return self.aggregation_level * 6 * 9 * 2

    @property
    def k(self) -> int:
        return self.payload_size + 24

    @functools.cached_property
    def code(self) -> polar_code.PolarCode:
        return polar_code.polar_code(self.k, self.e, nmax_log=9)

    @property
    def scrambling_cinit(self) -> int:
        return ((self.n_rnti << 16) + self.n_id) % (1 << 31)

    @functools.cached_property
    def re_indices(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(data_sym, data_sc, dmrs_sym, dmrs_sc) for the candidate's REGs.

        Non-interleaved mapping: REG r of the candidate occupies PRB
        coreset_start + cce_index*6 + (r // nof_symbols) at symbol
        start + (r % nof_symbols) — REG numbering is time-first
        (TS 38.211 §7.3.2.2).
        """
        nregs = self.aggregation_level * 6
        dsym, dsc, msym, msc = [], [], [], []
        for r in range(nregs):
            cce = self.cce_index + r // 6
            bundle = self._bundle_of(cce)
            # a bundle spans 6/nof_symbols PRBs × nof_symbols symbols
            prb = (self.coreset_start_prb
                   + bundle * (6 // self.nof_symbols)
                   + (r % 6) // self.nof_symbols)
            sym = self.start_symbol + r % self.nof_symbols
            base = prb * NRE
            ks = np.arange(base, base + NRE)
            is_dmrs = (ks % 4) == 1
            dsym.extend([sym] * int((~is_dmrs).sum()))
            dsc.extend(ks[~is_dmrs])
            msym.extend([sym] * int(is_dmrs.sum()))
            msc.extend(ks[is_dmrs])
        return (np.asarray(dsym, np.int32), np.asarray(dsc, np.int32),
                np.asarray(msym, np.int32), np.asarray(msc, np.int32))

    def _bundle_of(self, cce: int) -> int:
        """CCE → REG-bundle via the §7.3.2.2 block interleaver (bundle
        size L=6 ⇒ one bundle per CCE); identity when non-interleaved."""
        if not self.interleaved:
            return cce
        nb = (self.coreset_nof_prb * self.nof_symbols) // 6
        r_rows = self.interleaver_rows
        assert nb % r_rows == 0, (nb, r_rows)
        c_cols = nb // r_rows
        c, r = divmod(cce, r_rows)
        return (r * c_cols + c + self.shift) % nb


def encode_dci(payload: jnp.ndarray, cfg: PdcchConfig) -> jnp.ndarray:
    """DCI payload [A] → rate-matched bits [E] (pdcch_encoder_impl.cpp)."""
    ones = jnp.ones((24,), dtype=payload.dtype)
    crc = crc_ops.crc(jnp.concatenate([ones, payload])[None], "crc24C")[0]
    rnti_bits = jnp.asarray(
        [(cfg.rnti >> (15 - i)) & 1 for i in range(16)], dtype=crc.dtype)
    crc = crc.at[8:].set(crc[8:] ^ rnti_bits)
    c = jnp.concatenate([payload, crc])
    pi = jnp.asarray(polar_code.input_interleaver(cfg.k))
    c = c[pi]
    u = polar_encoder.allocate(c[None], cfg.code.info_set, cfg.code.n)
    x = polar_encoder.encode(u)
    return polar_rm.match(x, cfg.code)[0]


def _pdcch_dmrs(cfg: PdcchConfig, l: int, first_prb: int, npil: int
                ) -> jnp.ndarray:
    """Gold-QPSK DM-RS pilots of one CORESET symbol (3/PRB, §7.4.1.3)."""
    cinit = dmrs_ops.dmrs_cinit(0, l, cfg.n_id, 0)
    m0 = 3 * first_prb
    c = gold.gold_sequence(jnp.asarray(cinit, dtype=jnp.uint32),
                           2 * npil, offset=2 * m0).astype(jnp.float32)
    pil = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
    return pil.astype(jnp.complex64)


def pdcch_transmit(payload: jnp.ndarray, cfg: PdcchConfig,
                   grid: jnp.ndarray) -> jnp.ndarray:
    bits = encode_dci(payload, cfg)
    seq = gold.gold_sequence(
        jnp.asarray(cfg.scrambling_cinit, dtype=jnp.uint32), cfg.e)
    syms = modulation.modulate(bits ^ seq, 2)
    if not cfg.interleaved and cfg.nof_symbols == 1:
        # Structured mapping (TPU: slices, no scatters): the candidate is
        # one contiguous AL·6-PRB span on one symbol; view it as
        # [nreg·3, 4] quads — k≡1 (mod 4) is DM-RS, the rest data — and
        # write the interleave with ONE slice update.
        nregs = cfg.aggregation_level * 6
        first_prb = cfg.coreset_start_prb + cfg.cce_index * 6
        lo = first_prb * NRE
        l = cfg.start_symbol
        pil = _pdcch_dmrs(cfg, l, first_prb, nregs * 3)
        row = cplx.cinterleave([cplx.cstride(syms, 0, 3), pil,
                                cplx.cstride(syms, 1, 3),
                                cplx.cstride(syms, 2, 3)])
        return grid.at[..., l, lo:lo + nregs * NRE].set(row)
    dsym, dsc, msym, msc = cfg.re_indices
    grid = grid.at[..., jnp.asarray(dsym), jnp.asarray(dsc)].set(syms)
    # DM-RS: Gold-QPSK pilots per symbol, sequence indexed by absolute PRB
    # (3 pilots per PRB, TS 38.211 §7.4.1.3).
    for li in range(cfg.nof_symbols):
        l = cfg.start_symbol + li
        sel = np.asarray(msym) == l
        ks = np.asarray(msc)[sel]
        pil = _pdcch_dmrs(cfg, l, int(ks[0] // NRE), len(ks))
        grid = grid.at[..., l, jnp.asarray(ks)].set(pil)
    return grid


@dataclasses.dataclass
class PdcchResult:
    payload: jnp.ndarray
    crc_ok: jnp.ndarray


def _decode_bits_to_payload(llr: jnp.ndarray, cfg: PdcchConfig
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Descrambled candidate LLRs [E] → (payload [A], crc_ok)."""
    cw_llr = polar_rm.dematch(llr, cfg.code)
    u = polar_decoder.decode(cw_llr[None] if cw_llr.ndim == 1 else cw_llr,
                             cfg.code)
    c = polar_encoder.extract_message(u, cfg.code.info_set)[0]
    pi = jnp.asarray(polar_code.input_interleaver(cfg.k))
    de = jnp.zeros_like(c).at[pi].set(c)
    payload, crc = de[:cfg.payload_size], de[cfg.payload_size:]
    rnti_bits = jnp.asarray(
        [(cfg.rnti >> (15 - i)) & 1 for i in range(16)], dtype=crc.dtype)
    crc = crc.at[8:].set(crc[8:] ^ rnti_bits)
    ones = jnp.ones((24,), dtype=payload.dtype)
    expect = crc_ops.crc(jnp.concatenate([ones, payload])[None], "crc24C")[0]
    return payload, jnp.all(expect == crc)


def pdcch_blind_receive(rx_grid: jnp.ndarray, cfg: PdcchConfig,
                        cce_indices: jnp.ndarray
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """UE-side blind decode over search-space candidates of ONE
    aggregation level with the CCE index as a TRACED input: all candidate
    positions share one compiled program (a per-candidate static config
    would recompile every slot as the TS 38.213 hashing moves the
    candidates).  Non-interleaved 1-symbol CORESET: a candidate is a
    contiguous AL·6-PRB span, so extraction is one dynamic_slice and the
    k≡1 (mod 4) DM-RS comb is position-independent (spans start at
    multiples of 72 subcarriers).

    rx_grid: [nsym, nsc] (or [port, nsym, nsc]; port 0 used).
    Returns (payloads [M, A], crc_ok [M]) over the M candidates.
    """
    if rx_grid.ndim == 3:
        rx_grid = rx_grid[0]
    assert cfg.nof_symbols == 1
    row = rx_grid[cfg.start_symbol]
    width = cfg.aggregation_level * 6 * NRE
    seq = gold.gold_sequence(
        jnp.asarray(cfg.scrambling_cinit, dtype=jnp.uint32), cfg.e)
    sign = (1.0 - 2.0 * seq.astype(jnp.float32))

    def one(cce):
        start = cfg.coreset_start_prb * NRE + cce * 6 * NRE
        seg = jax.lax.dynamic_slice(row, (start,), (width,))
        quads = seg.reshape(width // 4, 4)
        data = jnp.concatenate(
            [quads[:, 0:1], quads[:, 2:4]], axis=1).reshape(-1)
        nv = jnp.full(data.shape, 0.1, dtype=jnp.float32)
        llr = modulation.demodulate_soft(data, nv, 2) * sign
        return _decode_bits_to_payload(llr, cfg)

    return jax.vmap(one)(jnp.asarray(cce_indices, jnp.int32))


def decode_dci_llr(llr: jnp.ndarray, cfg: PdcchConfig) -> PdcchResult:
    """Candidate data-RE LLRs [E] (mapping order, pre-descrambling) →
    full DCI decode: descramble, polar rate-dematch, SSC decode, CRC24C
    with RNTI unmasking.  Used by receivers that equalize externally
    (e.g. the mixed slot's per-REG MRC check)."""
    seq = gold.gold_sequence(
        jnp.asarray(cfg.scrambling_cinit, dtype=jnp.uint32), cfg.e)
    llr = llr * (1.0 - 2.0 * seq.astype(jnp.float32))
    payload, ok = _decode_bits_to_payload(llr, cfg)
    return PdcchResult(payload=payload, crc_ok=ok)


def pdcch_receive(rx_grid: jnp.ndarray, cfg: PdcchConfig) -> PdcchResult:
    """Equalization-free receive (assumes |h|≈const per REG is handled by
    upstream estimation; loopback validation path)."""
    dsym, dsc, _, _ = cfg.re_indices
    y = rx_grid[..., jnp.asarray(dsym), jnp.asarray(dsc)]
    nv = jnp.full(y.shape, 0.1, dtype=jnp.float32)
    llr = modulation.demodulate_soft(y, nv, 2)
    seq = gold.gold_sequence(
        jnp.asarray(cfg.scrambling_cinit, dtype=jnp.uint32), cfg.e)
    llr = llr * (1.0 - 2.0 * seq.astype(jnp.float32))
    cw_llr = polar_rm.dematch(llr, cfg.code)
    u = polar_decoder.decode(cw_llr[None] if cw_llr.ndim == 1 else cw_llr,
                             cfg.code)
    c = polar_encoder.extract_message(u, cfg.code.info_set)[0]
    pi = jnp.asarray(polar_code.input_interleaver(cfg.k))
    de = jnp.zeros_like(c).at[pi].set(c)
    payload, crc = de[:cfg.payload_size], de[cfg.payload_size:]
    rnti_bits = jnp.asarray(
        [(cfg.rnti >> (15 - i)) & 1 for i in range(16)], dtype=crc.dtype)
    crc = crc.at[8:].set(crc[8:] ^ rnti_bits)
    ones = jnp.ones((24,), dtype=payload.dtype)
    expect = crc_ops.crc(jnp.concatenate([ones, payload])[None], "crc24C")[0]
    ok = jnp.all(expect == crc)
    return PdcchResult(payload=payload, crc_ok=ok)
