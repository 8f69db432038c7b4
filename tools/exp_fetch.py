"""Measure host-fetch RTT and the on-device-accumulate pipeline pattern."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srsran_project_23_5_tpu.models import gnb_flagship
from srsran_project_23_5_tpu.phy.lower import ofdm
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import numerology, tbs as tbs_mod

nof_prb, qm = 273, 6
tbs = tbs_mod.tbs_calculate(14, 36, 0, 0.6533, qm, 1, nof_prb)
cfg = gnb_flagship.CarrierConfig(
    mu=1, nfft=numerology.min_nfft(nof_prb), nof_prb=nof_prb,
    sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                    dmrs_symbols=(2, 7, 11)))
ss = numerology.slot_num_samples(cfg.mu, cfg.nfft)
sigma = float(np.sqrt(cfg.nfft) * 10 ** (-1.0))
rng = np.random.default_rng(0)

# --- fetch RTT on a tiny ready array
x = jax.device_put(jnp.ones((32,), jnp.float32))
np.asarray(x)
t0 = time.perf_counter()
for _ in range(10):
    np.asarray(x)
print(f"fetch tiny ready array: {(time.perf_counter()-t0)/10*1e3:.2f} ms",
      flush=True)


def slot_fn(tb_bits, key):
    bb = gnb_flagship.tx_slot(tb_bits, cfg)
    nz = (sigma / np.sqrt(2)) * jax.random.normal(key, (2, ss), jnp.float32)
    rx = bb + jax.lax.complex(nz[0], nz[1])
    grid = ofdm.demodulate_slot(rx, cfg.nsc, cfg.mu, cfg.nfft)
    res = sch.pusch_receive(grid[None], cfg.sh, 6)
    return res.tb_crc_ok, res.sinr_db


combine = jax.jit(lambda acc_ok, acc_sinr, ok, sinr:
                  (acc_ok & jnp.all(ok), acc_sinr + jnp.sum(sinr)))

for B in (32, 64):
    step = jax.jit(jax.vmap(slot_fn))
    tb_b = jax.device_put(jnp.asarray(
        rng.integers(0, 2, size=(B, tbs)).astype(np.int8)))
    NDISP = 512 // B
    key_sets = [jax.device_put(jax.random.split(jax.random.PRNGKey(i), B))
                for i in range(NDISP)]
    for ks in key_sets:
        jax.block_until_ready(ks)
    # warm (incl. fetch)
    ok, sinr = step(tb_b, key_sets[0])
    np.asarray(ok)

    def window(kss):
        acc_ok = jnp.bool_(True)
        acc_s = jnp.float32(0.0)
        for ks in kss:
            ok, sinr = step(tb_b, ks)
            acc_ok, acc_s = combine(acc_ok, acc_s, ok, sinr)
        return bool(np.asarray(acc_ok)), float(np.asarray(acc_s))

    window(key_sets[:2])  # warm combine
    t0 = time.perf_counter()
    all_ok, s = window(key_sets)
    total = time.perf_counter() - t0
    print(f"B={B:3d}: {total/(NDISP*B)*1e6:8.1f} us/slot "
          f"({NDISP} dispatches, 1 fetch) ok={all_ok} "
          f"sinr={s/(NDISP*B):.1f}", flush=True)
print("done", flush=True)
