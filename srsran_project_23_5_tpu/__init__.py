"""tpu-ran: a TPU-native 5G NR PHY framework.

A ground-up re-design of the srsRAN Project 23.5 physical-layer capabilities
(reference: /root/reference, C++17/AVX) as batched JAX/XLA/Pallas programs:

- upper PHY: LDPC/polar/short-block coding, rate matching, scrambling, QAM
  mapping and soft demapping, DM-RS estimation, equalization, PDSCH/PUSCH/
  PDCCH/PBCH/PRACH/PUCCH channel processors (reference layer map:
  SURVEY.md §1-2, lib/phy/upper).
- lower PHY: OFDM modulation/demodulation with cyclic prefix and TS 38.211
  §5.4 phase compensation (reference lib/phy/lower/modulation).
- parallel: carrier/UE-batch/slot sharding over `jax.sharding.Mesh`
  (re-expresses the reference's executor-pool parallelism, SURVEY.md §2.7).

Design rules (see SURVEY.md §7): batch instead of thread pools, static shapes
per (numerology, bandwidth, code) configuration, int8 LLR domain on the
decode path, structure-of-arrays resource grids.
"""

__version__ = "0.1.0"
