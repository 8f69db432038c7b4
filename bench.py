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

    tx = jax.jit(lambda t: gnb_flagship.tx_slot(t, cfg))
    rx_demod = jax.jit(
        lambda b, nz: ofdm.demodulate_slot(b + nz, cfg.nsc, cfg.mu, cfg.nfft))
    rx = jax.jit(
        lambda g: (lambda r: (r.tb_crc_ok, r.sinr_db))(
            sch.pusch_receive(g[None], cfg.sh, iters)))

    def step(tb_bits, nz):
        bb = tx(tb_bits)
        grid = rx_demod(bb, nz)
        return rx(grid)

    tb = jax.device_put(tb)
    noise = jax.device_put(noise)
    t0 = time.perf_counter()
    ok, sinr = step(tb, noise)
    ok.block_until_ready()
    compile_s = time.perf_counter() - t0
    assert bool(ok), "loopback decode failed in benchmark"

    n = int(os.environ.get("BENCH_REPS", "20"))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        ok, _ = step(tb, noise)
        ok.block_until_ready()
        times.append(time.perf_counter() - t0)
    lat_us = float(np.median(times) * 1e6)

    print(json.dumps({
        "metric": "full_slot_loopback_latency_us",
        "value": round(lat_us, 1),
        "unit": "us",
        "vs_baseline": round(500.0 / lat_us, 4),
        "nof_prb": nof_prb,
        "tbs_bits": tbs,
        "compile_s": round(compile_s, 1),
        "sinr_db": round(float(np.asarray(sinr)), 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
