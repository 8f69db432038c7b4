"""Flagship model: the full PDSCH→channel→PUSCH slot loopback pipeline.

This is the framework's end-to-end "model": for each carrier, a transport
block is encoded onto a downlink slot grid, OFDM-modulated to baseband,
passed through a channel, OFDM-demodulated, and received through the full
PUSCH chain (estimation → equalization → demapping → LDPC decode → CRC).
Carriers batch along the leading axis and shard across the device mesh
(SURVEY.md §2.7 P5/P6: the reference's per-cell pools and CU/DU splits).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..parallel import mesh as mesh_lib
from ..phy.lower import ofdm
from ..phy.upper import sch
from ..ran import numerology


@dataclasses.dataclass(frozen=True)
class CarrierConfig:
    """Static per-carrier configuration of the loopback pipeline."""
    mu: int = 1
    nfft: int = 4096
    nof_prb: int = 273
    sh: sch.ShConfig = dataclasses.field(
        default_factory=lambda: sch.ShConfig(
            rnti=0x4601, tbs=40976, qm=6, nof_prb=273,
            dmrs_symbols=(2, 7, 11)))

    @property
    def nsc(self) -> int:
        return self.nof_prb * 12


def default_carrier(nof_prb: int = 273, qm: int = 6,
                    tbs: int = 40976) -> CarrierConfig:
    nfft = numerology.min_nfft(nof_prb)
    return CarrierConfig(
        mu=1, nfft=nfft, nof_prb=nof_prb,
        sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                        dmrs_symbols=(2, 7, 11)))


def tiny_carrier() -> CarrierConfig:
    """Small shapes for dry runs and CI."""
    return CarrierConfig(
        mu=1, nfft=128, nof_prb=8,
        sh=sch.ShConfig(rnti=0x17, tbs=256, qm=2, nof_prb=8,
                        dmrs_symbols=(2, 7, 11)))


def tx_slot(tb_bits: jnp.ndarray, cfg: CarrierConfig) -> jnp.ndarray:
    """Downlink slot: TB bits → baseband samples (single carrier)."""
    grid = jnp.zeros((14, cfg.nsc), dtype=jnp.complex64)
    grid = sch.pdsch_transmit(tb_bits, cfg.sh, grid)
    return ofdm.modulate_slot(grid, cfg.mu, cfg.nfft)


def loopback_slot(tb_bits: jnp.ndarray, noise: jnp.ndarray,
                  cfg: CarrierConfig, nof_ldpc_iterations: int = 6):
    """Full DL+UL slot: TB → baseband → +noise → RX chain → decoded TB.

    noise: [slot_samples] complex64 additive baseband noise (pass zeros for
    an ideal channel).  Returns (tb_ok, decoded bits, sinr_db).
    """
    bb = tx_slot(tb_bits, cfg)
    rx_grid = ofdm.demodulate_slot(bb + noise, cfg.nsc, cfg.mu, cfg.nfft)
    res = sch.pusch_receive(rx_grid[None], cfg.sh,
                            nof_ldpc_iterations=nof_ldpc_iterations)
    return res.tb_crc_ok, res.tb_bits, res.sinr_db


def multi_carrier_step(cfg: CarrierConfig, nof_ldpc_iterations: int = 6):
    """Build the carrier-batched loopback step fn: ([C, A] bits, [C, S] noise)
    → (ok [C], sinr [C]).  vmap over carriers; shard the C axis on a mesh.
    """
    def step(tb_batch, noise_batch):
        ok, _, sinr = jax.vmap(
            lambda tb, nz: loopback_slot(tb, nz, cfg, nof_ldpc_iterations)
        )(tb_batch, noise_batch)
        return ok, sinr
    return step


def sharded_multi_carrier_step(mesh, cfg: CarrierConfig,
                               nof_ldpc_iterations: int = 6):
    """jit the multi-carrier step with the carrier axis sharded over `mesh`."""
    shard = mesh_lib.carrier_sharding(mesh)
    step = multi_carrier_step(cfg, nof_ldpc_iterations)
    return jax.jit(step, in_shardings=(shard, shard),
                   out_shardings=(shard, shard))
