"""Root-cause the bench dispatch stall (VERDICT r2 Weak #1).

Judge measured the same three jitted programs back-to-back at ~105 us/slot
while bench.py's loop reported ~23 ms/slot.  Variants isolate the
difference: per-rep distinct input buffers vs one shared buffer, and the
cross-rep `add(acc, ok)` accumulation chain.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srsran_project_23_5_tpu.models import gnb_flagship
from srsran_project_23_5_tpu.phy.lower import ofdm
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import numerology, tbs as tbs_mod

REPS = int(os.environ.get("REPS", "50"))

nof_prb, qm = 273, 6
tbs = tbs_mod.tbs_calculate(14, 36, 0, 0.6533, qm, 1, nof_prb)
cfg = gnb_flagship.CarrierConfig(
    mu=1, nfft=numerology.min_nfft(nof_prb), nof_prb=nof_prb,
    sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                    dmrs_symbols=(2, 7, 11)))

rng = np.random.default_rng(0)
tb = jax.device_put(jnp.asarray(rng.integers(0, 2, size=tbs).astype(np.int8)))
slot_samples = numerology.slot_num_samples(cfg.mu, cfg.nfft)
snr_db = 20.0
sigma = np.sqrt(cfg.nfft) * 10 ** (-snr_db / 20)  # corrected calibration
noise_re = (sigma / np.sqrt(2)
            * rng.standard_normal(slot_samples)).astype(np.float32)
noise_im = (sigma / np.sqrt(2)
            * rng.standard_normal(slot_samples)).astype(np.float32)
nz_re = jax.device_put(jnp.asarray(noise_re))
nz_im = jax.device_put(jnp.asarray(noise_im))

iters = 6
tx = jax.jit(lambda t: gnb_flagship.tx_slot(t, cfg))
rx_demod = jax.jit(
    lambda b, nr, ni, w: ofdm.demodulate_slot(
        b + jax.lax.complex(nr, ni) * w, cfg.nsc, cfg.mu, cfg.nfft))
rx = jax.jit(lambda g: sch.pusch_receive(g[None], cfg.sh, iters).tb_crc_ok)
add = jax.jit(lambda a, b: a & b)


def step(w):
    bb = tx(tb)
    grid = rx_demod(bb, nz_re, nz_im, w)
    return rx(grid)


t0 = time.perf_counter()
w0 = jax.device_put(np.float32(1.0))
ok0 = step(w0)
print(f"compile: {time.perf_counter()-t0:.1f}s ok={bool(ok0)}", flush=True)
sinr = jax.jit(lambda g: sch.pusch_receive(g[None], cfg.sh, iters).sinr_db)(
    rx_demod(tx(tb), nz_re, nz_im, w0))
print(f"sinr_db={float(np.asarray(sinr)):.1f} (target {snr_db})", flush=True)

wiggles = [jax.device_put(np.float32(1.0 + 1e-5 * i)) for i in range(REPS)]
jax.block_until_ready(wiggles)


def run(name, fn):
    fn()  # warm
    t0 = time.perf_counter()
    fn()
    dt = (time.perf_counter() - t0) / REPS * 1e6
    print(f"{name:>28}: {dt:9.1f} us/slot", flush=True)


def vA():  # same w, list of results, single block
    outs = [step(w0) for _ in range(REPS)]
    jax.block_until_ready(outs)


def vB():  # distinct device-resident scalar per rep
    outs = [step(w) for w in wiggles]
    jax.block_until_ready(outs)


def vC():  # same w + add chain
    acc = None
    for _ in range(REPS):
        ok = step(w0)
        acc = ok if acc is None else add(acc, ok)
    bool(acc)


def vD():  # bench exact: wiggles + add chain
    acc = None
    for w in wiggles:
        ok = step(w)
        acc = ok if acc is None else add(acc, ok)
    bool(acc)


def vE():  # fresh host scalar device_put per rep
    outs = [step(jax.device_put(np.float32(1.0))) for _ in range(REPS)]
    jax.block_until_ready(outs)


run("A same-buf no-chain", vA)
run("B distinct-buf no-chain", vB)
run("C same-buf add-chain", vC)
run("D distinct-buf add-chain", vD)
run("E fresh device_put", vE)
print("done", flush=True)
