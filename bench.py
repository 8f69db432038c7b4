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

# Persistent compiled-program cache (FFTW-wisdom analogue): repeat bench
# invocations skip the multi-minute XLA compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_ran_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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
    # complex64 host->device transfer is UNIMPLEMENTED on this backend:
    # ship two float32 planes, build the complex noise on device.
    noise_re = (sigma / np.sqrt(2)
                * rng.standard_normal(slot_samples)).astype(np.float32)
    noise_im = (sigma / np.sqrt(2)
                * rng.standard_normal(slot_samples)).astype(np.float32)

    iters = int(os.environ.get("BENCH_LDPC_ITERS", "6"))

    # Stage-wise jit (one fused program compiles pathologically slowly on
    # the tunnel; the stage split also mirrors the production slot pipeline
    # where TX and RX run as separate async dispatches).
    from srsran_project_23_5_tpu.phy.lower import ofdm

    tb = jax.device_put(tb)
    nz_re = jax.device_put(jnp.asarray(noise_re))
    nz_im = jax.device_put(jnp.asarray(noise_im))

    # Device-time measurement: issue REPS async slot dispatches and fetch
    # one scalar at the end.  The device executes the in-order queue
    # back-to-back, so total/REPS amortizes the tunnel round-trip away.
    # (Control-flow-wrapped loops — lax.fori_loop over the slot body —
    # hit UNIMPLEMENTED / hangs on this experimental backend.)
    reps = int(os.environ.get("BENCH_REPS", "20"))

    tx = jax.jit(lambda t: gnb_flagship.tx_slot(t, cfg))
    rx_demod = jax.jit(
        lambda b, nr, ni, w: ofdm.demodulate_slot(
            b + jax.lax.complex(nr, ni) * w, cfg.nsc, cfg.mu, cfg.nfft))
    # Default: stage-split async pipeline (tx / demod / rx as separate
    # dispatches, mirroring the production slot pipeline).  The fully fused
    # one-program variant ("fused") runs slightly tighter steady-state but
    # costs a pathological multi-minute XLA compile on this backend.
    stage = os.environ.get("BENCH_STAGE", "stages")
    if stage == "fused":
        # ONE program per slot: host->tunnel dispatch RTT (~2 ms each on
        # this backend) dominates multi-dispatch pipelines.
        @jax.jit
        def fused_step(t, nr, ni, w):
            bb = gnb_flagship.tx_slot(t, cfg)
            grid = ofdm.demodulate_slot(bb + jax.lax.complex(nr, ni) * w,
                                        cfg.nsc, cfg.mu, cfg.nfft)
            res = sch.pusch_receive(grid[None], cfg.sh, iters)
            return res.tb_crc_ok, res.sinr_db
    else:
        fused_step = None
    if stage == "nodecode":
        rx = jax.jit(lambda g: (lambda t: (t[1] + t[2] + jnp.sum(t[0])) > -1)(
            sch.pusch_demodulate(g[None], cfg.sh)))
    elif stage == "txonly":
        rx = jax.jit(lambda g: jnp.abs(g).sum() > -1.0)
    else:
        rx = jax.jit(lambda g: sch.pusch_receive(
            g[None], cfg.sh, iters).tb_crc_ok)

    def step(w):
        if fused_step is not None:
            return fused_step(tb, nz_re, nz_im, w)[0]
        bb = tx(tb)
        grid = rx_demod(bb, nz_re, nz_im, w)
        return rx(grid)

    # compile + correctness (+ a real measured post-equalization SINR)
    t0 = time.perf_counter()
    ok0 = step(jnp.float32(1.0))
    assert bool(ok0), "loopback decode failed in benchmark"
    compile_s = time.perf_counter() - t0
    if fused_step is not None:
        sinr = float(np.asarray(fused_step(tb, nz_re, nz_im,
                                           jnp.float32(1.0))[1]))
    else:
        res = jax.jit(lambda g: sch.pusch_receive(g[None], cfg.sh, iters)
                      .sinr_db)(rx_demod(tx(tb), nz_re, nz_im,
                                         jnp.float32(1.0)))
        sinr = float(np.asarray(res))

    # Pre-stage every per-rep input on the device: a host scalar argument
    # costs a ~10-25 ms synchronous tunnel transfer per dispatch, which
    # would dominate the measurement.
    wiggles = [jax.device_put(np.float32(1.0 + 1e-5 * i))
               for i in range(reps)]
    jax.block_until_ready(wiggles)
    bool(step(wiggles[0]))  # warm steady-state path

    add = jax.jit(lambda a, b: a & b)
    t0 = time.perf_counter()
    acc = None
    for w in wiggles:
        ok = step(w)
        acc = ok if acc is None else add(acc, ok)
    all_ok = bool(acc)  # single sync drains the in-order queue
    total = time.perf_counter() - t0
    assert all_ok, "some slots failed to decode"
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
