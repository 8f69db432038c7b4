"""PUCCH processors: Format 1 (sequence detection) and Format 2 (UCI demod).

Scope mirrors srsRAN 23.5 (CHANGELOG:15-21, pucch_processor_impl.h:50-82):
F1 with 1-2 HARQ-ACK bits via correlation detection
(pucch_detector_impl.cpp), F2 with ≤11 UCI bits via QPSK demod +
short-block ML detection (pucch_demodulator_impl.cpp, uci_decoder_impl.cpp);
F0/F3/F4 are declared but not implemented, as in the reference.

TPU design: per-symbol base sequences and cyclic-shift hopping phases are
host-precomputed constants; the slot's symbols process as one batched
tensor program.
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ...ops import dmrs as dmrs_ops
from ...ops import gold, modulation, sequences, short_block
from ...ops import equalizer, estimator
from ...ops.devconst import const_c64
from ...ran.constants import NRE


# ---------------------------------------------------------------------- F1
@dataclasses.dataclass(frozen=True)
class PucchF1Config:
    prb: int                     # PRB index of the (single-PRB) resource
    start_symbol: int = 0
    nof_symbols: int = 14        # 4..14
    initial_cyclic_shift: int = 0
    occ_index: int = 0
    n_id: int = 0                # hopping id (group hopping disabled)
    slot_in_frame: int = 0
    nof_harq_bits: int = 1       # 1 or 2

    @property
    def data_symbols(self) -> tuple[int, ...]:
        return tuple(self.start_symbol + i for i in range(1, self.nof_symbols, 2))

    @property
    def dmrs_symbols(self) -> tuple[int, ...]:
        return tuple(self.start_symbol + i for i in range(0, self.nof_symbols, 2))


@functools.lru_cache(maxsize=256)
def _cs_hopping(n_id: int, slot: int) -> np.ndarray:
    """n_cs(l) per symbol of the slot (TS 38.211 §6.3.2.2.2)."""
    c = gold.gold_sequence_np(n_id, 8 * 14, offset=8 * 14 * slot)
    return (c.reshape(14, 8) << np.arange(8)).sum(axis=1) % 12


@functools.lru_cache(maxsize=64)
def _occ_w(length: int, idx: int) -> np.ndarray:
    """Time-domain OCC w_i (DFT basis, TS 38.211 Table 6.3.2.4.1-2)."""
    m = np.arange(length)
    return np.exp(2j * np.pi * idx * m / length).astype(np.complex64)


def _f1_symbol_seqs(cfg: PucchF1Config, symbols: tuple[int, ...]
                    ) -> np.ndarray:
    """Base sequence × cyclic shift for each symbol: [nsym_used, 12]."""
    u = cfg.n_id % 30
    ncs = _cs_hopping(cfg.n_id, cfg.slot_in_frame)
    rows = []
    for l in symbols:
        alpha = 2 * np.pi * ((cfg.initial_cyclic_shift + ncs[l]) % 12) / 12
        rows.append(sequences.cyclic_shifted(u, 0, NRE, alpha))
    return np.asarray(rows, dtype=np.complex64)


def f1_slot_seqs(cfg: PucchF1Config) -> tuple[np.ndarray, np.ndarray]:
    """(data_seqs, dmrs_seqs) for the config's slot — pass as TRACED data
    to pucch_f1_transmit/detect so one compiled program serves every slot
    of the frame (the cyclic-shift hopping n_cs(l) is the only
    slot-dependent term, TS 38.211 §6.3.2.2.2)."""
    return (_f1_symbol_seqs(cfg, cfg.data_symbols),
            _f1_symbol_seqs(cfg, cfg.dmrs_symbols))


def f2_dmrs_cinits(cfg: "PucchF2Config") -> np.ndarray:
    """[nsym] uint32 DM-RS c_init values for the config's slot (traced
    companion of f1_slot_seqs for Format 2)."""
    return np.asarray([dmrs_ops.dmrs_cinit(cfg.slot_in_frame, l,
                                           cfg.n_id0, 0)
                       for l in cfg.symbols], np.uint32)


def pucch_f1_transmit(bits: jnp.ndarray, cfg: PucchF1Config,
                      grid: jnp.ndarray, seqs=None) -> jnp.ndarray:
    """Map a PUCCH F1 resource onto [nsym, nsc] grid (loopback/test aid).

    seqs: optional traced (data_seqs, dmrs_seqs) from f1_slot_seqs."""
    if cfg.nof_harq_bits == 1:
        d = modulation.modulate(bits, 1)[..., 0]
    else:
        d = modulation.modulate(bits, 2)[..., 0]
    if seqs is not None:
        data_seqs, dmrs_seqs = seqs
    else:
        data_seqs = const_c64(_f1_symbol_seqs(cfg, cfg.data_symbols))
        dmrs_seqs = const_c64(_f1_symbol_seqs(cfg, cfg.dmrs_symbols))
    w_d = const_c64(_occ_w(len(cfg.data_symbols), cfg.occ_index))
    w_m = const_c64(_occ_w(len(cfg.dmrs_symbols), cfg.occ_index))
    lo = cfg.prb * NRE
    for i, l in enumerate(cfg.data_symbols):
        grid = grid.at[..., l, lo:lo + NRE].set(d * w_d[i] * data_seqs[i])
    for i, l in enumerate(cfg.dmrs_symbols):
        grid = grid.at[..., l, lo:lo + NRE].set(w_m[i] * dmrs_seqs[i])
    return grid


@dataclasses.dataclass
class PucchF1Result:
    bits: jnp.ndarray           # detected HARQ-ACK bits
    detection_metric: jnp.ndarray
    detected: jnp.ndarray       # bool: energy over DTX threshold


def pucch_f1_detect(rx_grid: jnp.ndarray, cfg: PucchF1Config,
                    dtx_threshold: float = 4.0,
                    seqs=None) -> PucchF1Result:
    """Detect F1 HARQ bits from [nrx, nsym, nsc] grid
    (pucch_detector_impl.cpp re-expressed as batched correlation).

    seqs: optional traced (data_seqs, dmrs_seqs) from f1_slot_seqs."""
    if rx_grid.ndim == 2:
        rx_grid = rx_grid[None]
    lo = cfg.prb * NRE
    if seqs is not None:
        data_seqs, dmrs_seqs = seqs
    else:
        data_seqs = const_c64(_f1_symbol_seqs(cfg, cfg.data_symbols))
        dmrs_seqs = const_c64(_f1_symbol_seqs(cfg, cfg.dmrs_symbols))
    w_d = const_c64(_occ_w(len(cfg.data_symbols), cfg.occ_index))
    w_m = const_c64(_occ_w(len(cfg.dmrs_symbols), cfg.occ_index))

    # Despread DM-RS symbols -> channel estimate per rx port.
    y_m = jnp.stack([rx_grid[..., l, lo:lo + NRE]
                     for l in cfg.dmrs_symbols], axis=-2)
    h_est = jnp.mean(y_m * jnp.conj(dmrs_seqs * w_m[:, None]), axis=-2)
    # Despread data symbols -> modulated symbol estimate.
    y_d = jnp.stack([rx_grid[..., l, lo:lo + NRE]
                     for l in cfg.data_symbols], axis=-2)
    d_est_res = y_d * jnp.conj(data_seqs * w_d[:, None])
    # MRC across subcarriers, symbols and rx ports.
    num = jnp.sum(jnp.conj(h_est)[..., None, :] * d_est_res, axis=(-2, -1))
    den = jnp.sum(jnp.abs(h_est) ** 2, axis=-1) * len(cfg.data_symbols)
    d_hat = jnp.sum(num, axis=0) / jnp.maximum(jnp.sum(den, axis=0), 1e-12)

    # Noise estimate: residual of DM-RS around the averaged channel.
    resid = y_m - h_est[..., None, :] * (dmrs_seqs * w_m[:, None])
    noise = jnp.mean(jnp.abs(resid) ** 2) + 1e-12
    metric = jnp.abs(d_hat) ** 2 * jnp.sum(den) / noise
    detected = metric > dtx_threshold

    if cfg.nof_harq_bits == 1:
        bits = (jnp.real(d_hat) + jnp.imag(d_hat) <= 0).astype(jnp.int8)[None]
    else:
        bits = jnp.stack([(jnp.real(d_hat) <= 0).astype(jnp.int8),
                          (jnp.imag(d_hat) <= 0).astype(jnp.int8)])
    return PucchF1Result(bits=bits, detection_metric=metric, detected=detected)


# ---------------------------------------------------------------------- F2
@dataclasses.dataclass(frozen=True)
class PucchF2Config:
    prb_start: int
    nof_prb: int                 # 1..16
    start_symbol: int = 12
    nof_symbols: int = 2         # 1 or 2
    rnti: int = 0
    n_id: int = 0                # data scrambling
    n_id0: int = 0               # DM-RS scrambling
    nof_uci_bits: int = 4        # 3..11 (short-block path, 23.5 scope)
    slot_in_frame: int = 0

    @property
    def symbols(self) -> tuple[int, ...]:
        return tuple(self.start_symbol + i for i in range(self.nof_symbols))

    @functools.cached_property
    def data_sc(self) -> np.ndarray:
        """Data subcarriers: all except DM-RS at k ≡ 1 (mod 3)."""
        lo, hi = self.prb_start * NRE, (self.prb_start + self.nof_prb) * NRE
        ks = np.arange(lo, hi)
        return ks[ks % 3 != 1].astype(np.int32)

    @functools.cached_property
    def dmrs_sc(self) -> np.ndarray:
        lo, hi = self.prb_start * NRE, (self.prb_start + self.nof_prb) * NRE
        ks = np.arange(lo, hi)
        return ks[ks % 3 == 1].astype(np.int32)

    @property
    def nof_data_re(self) -> int:
        return len(self.data_sc) * self.nof_symbols

    @property
    def scrambling_cinit(self) -> int:
        return ((self.rnti << 15) + self.n_id) % (1 << 31)


def _f2_dmrs_pilots(cfg: PucchF2Config,
                    cinits: jnp.ndarray | None = None) -> jnp.ndarray:
    """[nsym, npilot] DM-RS pilots (TS 38.211 §6.4.1.3.2: Gold-QPSK with
    sequence offset aligned to the PRB position).  cinits: optional
    traced [nsym] uint32 (f2_dmrs_cinits) — keeps the slot number out of
    the compiled shape."""
    npil = len(cfg.dmrs_sc)
    m0 = 4 * cfg.prb_start          # 4 pilots per PRB, PRB-offset sequence
    if cinits is None:
        cinits = jnp.asarray([dmrs_ops.dmrs_cinit(cfg.slot_in_frame, l,
                                                  cfg.n_id0, 0)
                              for l in cfg.symbols], jnp.uint32)
    c = gold.gold_sequence(cinits, 2 * npil,
                           offset=2 * m0).astype(jnp.float32)
    return (((1 - 2 * c[..., 0::2]) + 1j * (1 - 2 * c[..., 1::2]))
            / np.sqrt(2)).astype(jnp.complex64)


def pucch_f2_transmit(uci_bits: jnp.ndarray, cfg: PucchF2Config,
                      grid: jnp.ndarray,
                      dmrs_cinits: jnp.ndarray | None = None) -> jnp.ndarray:
    e = cfg.nof_data_re * 2
    enc = short_block.encode(uci_bits, e)
    seq = gold.gold_sequence(
        jnp.asarray(cfg.scrambling_cinit, dtype=jnp.uint32), e)
    syms = modulation.modulate(enc ^ seq, 2)
    per_sym = len(cfg.data_sc)
    pilots = _f2_dmrs_pilots(cfg, dmrs_cinits)
    for i, l in enumerate(cfg.symbols):
        chunk = syms[i * per_sym:(i + 1) * per_sym]
        grid = grid.at[..., l, jnp.asarray(cfg.data_sc)].set(chunk)
        grid = grid.at[..., l, jnp.asarray(cfg.dmrs_sc)].set(pilots[i])
    return grid


@dataclasses.dataclass
class PucchF2Result:
    uci_bits: jnp.ndarray
    metric: jnp.ndarray
    detected: jnp.ndarray


def pucch_f2_receive(rx_grid: jnp.ndarray, cfg: PucchF2Config,
                     detection_threshold: float = 0.5,
                     dmrs_cinits: jnp.ndarray | None = None
                     ) -> PucchF2Result:
    if rx_grid.ndim == 2:
        rx_grid = rx_grid[None]
    pilots = _f2_dmrs_pilots(cfg, dmrs_cinits)
    y_p = jnp.stack([rx_grid[..., l, jnp.asarray(cfg.dmrs_sc)]
                     for l in cfg.symbols], axis=-2)
    nsc = rx_grid.shape[-1]
    est = estimator.estimate_port(y_p, pilots, cfg.dmrs_sc, nsc,
                                  rx_grid.shape[-2])
    y = jnp.stack([rx_grid[..., l, jnp.asarray(cfg.data_sc)]
                   for l in cfg.symbols], axis=-2)
    h = jnp.stack([est.h[..., l, jnp.asarray(cfg.data_sc)]
                   for l in cfg.symbols], axis=-2)
    nrx = y.shape[0]
    yf = y.reshape(nrx, -1)
    hf = h.reshape(nrx, -1)
    nv = jnp.maximum(jnp.mean(est.noise_var), 1e-9)
    x_hat, post_nv = equalizer.zf_1xn(yf, hf, nv)
    llr = modulation.demodulate_soft(x_hat, post_nv, 2)
    seq = gold.gold_sequence(
        jnp.asarray(cfg.scrambling_cinit, dtype=jnp.uint32), llr.shape[-1])
    llr = llr * (1.0 - 2.0 * seq.astype(jnp.float32))
    bits, metric = short_block.detect(llr, cfg.nof_uci_bits, llr.shape[-1])
    return PucchF2Result(uci_bits=bits, metric=metric,
                         detected=metric > detection_threshold)
