"""Does the axon tunnel memoize repeated (program, args) dispatches?"""
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

B, NDISP = 32, 8
nof_prb, qm = 273, 6
tbs = tbs_mod.tbs_calculate(14, 36, 0, 0.6533, qm, 1, nof_prb)
cfg = gnb_flagship.CarrierConfig(
    mu=1, nfft=numerology.min_nfft(nof_prb), nof_prb=nof_prb,
    sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                    dmrs_symbols=(2, 7, 11)))
ss = numerology.slot_num_samples(cfg.mu, cfg.nfft)
sigma = float(np.sqrt(cfg.nfft) * 10 ** (-1.0))
rng = np.random.default_rng(0)
tb_b = jax.device_put(jnp.asarray(
    rng.integers(0, 2, size=(B, tbs)).astype(np.int8)))


def slot_fn(tb_bits, key):
    bb = gnb_flagship.tx_slot(tb_bits, cfg)
    nz = (sigma / np.sqrt(2)) * jax.random.normal(key, (2, ss), jnp.float32)
    rx = bb + jax.lax.complex(nz[0], nz[1])
    grid = ofdm.demodulate_slot(rx, cfg.nsc, cfg.mu, cfg.nfft)
    res = sch.pusch_receive(grid[None], cfg.sh, 6)
    return res.tb_crc_ok, res.sinr_db


step = jax.jit(jax.vmap(slot_fn))
warm_keys = jax.device_put(jax.random.split(jax.random.PRNGKey(999), B))
jax.block_until_ready(step(tb_b, warm_keys))

fresh = [jax.device_put(jax.random.split(jax.random.PRNGKey(100 + i), B))
         for i in range(NDISP)]
jax.block_until_ready(fresh)


def timed(name, key_sets):
    t0 = time.perf_counter()
    outs = [step(tb_b, ks) for ks in key_sets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (NDISP * B) * 1e6
    ok = all(np.asarray(o[0]).all() for o in outs)
    print(f"{name:>18}: {dt:9.1f} us/slot ok={ok}", flush=True)


timed("fresh round1", fresh)
timed("repeat round2", fresh)   # same (prog, args) as round1
timed("repeat round3", fresh)
fresh2 = [jax.device_put(jax.random.split(jax.random.PRNGKey(200 + i), B))
          for i in range(NDISP)]
jax.block_until_ready(fresh2)
timed("fresh round4", fresh2)
# same key buffers, but tb permuted -> genuinely new args
tb_b2 = jax.device_put(jnp.asarray(
    rng.integers(0, 2, size=(B, tbs)).astype(np.int8)))
t0 = time.perf_counter()
outs = [step(tb_b2, ks) for ks in fresh2]
jax.block_until_ready(outs)
print(f"{'fresh tb round5':>18}: "
      f"{(time.perf_counter()-t0)/(NDISP*B)*1e6:9.1f} us/slot", flush=True)
print("done", flush=True)
