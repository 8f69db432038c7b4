"""Benchmark: full PDSCH→channel→PUSCH loopback slot on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target (BASELINE.md): < 500 µs per full DL+UL slot for a 100 MHz
(273-PRB) carrier — vs_baseline = 500 / measured_us (>1 beats target).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main() -> None:
    from srsran_project_23_5_tpu.models import gnb_flagship
    from srsran_project_23_5_tpu.phy.upper import sch
    from srsran_project_23_5_tpu.ran import numerology, tbs as tbs_mod

    nof_prb = int(os.environ.get("BENCH_PRB", "273"))
    qm = 6
    # Full-slot allocation, 3 DM-RS symbols fully reserved (CDM groups
    # without data = 2) -> 132 data REs per PRB; R ~ 0.65 like MCS 20.
    tbs = tbs_mod.tbs_calculate(14, 36, 0, 0.6533, qm, 1, nof_prb)
    cfg = gnb_flagship.CarrierConfig(
        mu=1, nfft=numerology.min_nfft(nof_prb), nof_prb=nof_prb,
        sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                        dmrs_symbols=(2, 7, 11)))

    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, size=tbs).astype(np.int8))
    slot_samples = numerology.slot_num_samples(cfg.mu, cfg.nfft)
    snr_db = 30.0
    sigma = 10 ** (-snr_db / 20) * np.sqrt(cfg.nsc) / np.sqrt(cfg.nfft)
    noise = jnp.asarray(
        (sigma / np.sqrt(2) * (rng.standard_normal(slot_samples)
                               + 1j * rng.standard_normal(slot_samples))
         ).astype(np.complex64))

    iters = int(os.environ.get("BENCH_LDPC_ITERS", "6"))

    # Stage-wise jit (one fused program compiles pathologically slowly on
    # the tunnel; the stage split also mirrors the production slot pipeline
    # where TX and RX run as separate async dispatches).
    from srsran_project_23_5_tpu.phy.lower import ofdm

    from srsran_project_23_5_tpu.phy.lower import ofdm

    tb = jax.device_put(tb)
    noise = jax.device_put(noise)

    # Device-time measurement: chain REPS slots inside one program so the
    # tunnel round-trip (ms-scale, jittery) amortizes away, and fetch a
    # scalar (the only reliably-synchronizing operation on this backend).
    # The noise is scaled by the loop index (tiny perturbation) to defeat
    # loop-invariant hoisting; a slot only counts if its TB CRC passes.
    # (A dynamic jnp.roll of complex data hangs this TPU backend.)
    reps = int(os.environ.get("BENCH_REPS", "20"))

    @jax.jit
    def many(tb_bits, nz):
        def body(i, acc):
            bb = gnb_flagship.tx_slot(tb_bits, cfg)
            wiggle = 1.0 + 1e-5 * i.astype(jnp.float32)
            grid = ofdm.demodulate_slot(bb + nz * wiggle, cfg.nsc,
                                        cfg.mu, cfg.nfft)
            r = sch.pusch_receive(grid[None], cfg.sh, iters)
            return acc + r.tb_crc_ok.astype(jnp.int32), r.sinr_db
        acc, sinr = jax.lax.fori_loop(
            0, reps, lambda i, c: body(i, c[0]),
            (jnp.int32(0), jnp.float32(0)))
        return acc, sinr

    t0 = time.perf_counter()
    n_ok, sinr = many(tb, noise)
    n_ok_v = int(n_ok)
    compile_s = time.perf_counter() - t0
    assert n_ok_v == reps, f"only {n_ok_v}/{reps} slots decoded"
    t0 = time.perf_counter()
    n_ok, sinr = many(tb, noise)
    n_ok_v = int(n_ok)
    total = time.perf_counter() - t0
    lat_us = float(total / reps * 1e6)

    print(json.dumps({
        "metric": "full_slot_loopback_latency_us",
        "value": round(lat_us, 1),
        "unit": "us",
        "vs_baseline": round(500.0 / lat_us, 4),
        "nof_prb": nof_prb,
        "tbs_bits": tbs,
        "ldpc_decode_mbps": round(tbs / lat_us, 1),
        "compile_s": round(compile_s, 1),
        "sinr_db": round(float(np.asarray(sinr)), 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
