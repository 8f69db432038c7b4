"""Isolate why tx_slot times differently across processes (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_ran_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srsran_project_23_5_tpu.models import gnb_flagship
from srsran_project_23_5_tpu.phy.lower import ofdm
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import numerology, tbs as tbs_mod

nof_prb = 273
qm = 6
tbs = tbs_mod.tbs_calculate(14, 36, 0, 0.6533, qm, 1, nof_prb)
cfg = gnb_flagship.CarrierConfig(
    mu=1, nfft=numerology.min_nfft(nof_prb), nof_prb=nof_prb,
    sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                    dmrs_symbols=(2, 7, 11)))
c = cfg.sh
rng = np.random.default_rng(0)
tb = jax.device_put(jnp.asarray(rng.integers(0, 2, size=tbs).astype(np.int8)))

f_tx = jax.jit(lambda t: gnb_flagship.tx_slot(t, cfg))
REPS = 20


def bench(name, fn, arg):
    jax.block_until_ready(fn(arg))
    t0 = time.perf_counter()
    outs = [fn(arg) for _ in range(REPS)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / REPS * 1e6
    print(f"{name:>22}: {dt:9.1f} us", flush=True)


bench("tx_slot (fresh)", f_tx, tb)

f_demod = jax.jit(lambda b: ofdm.demodulate_slot(b, cfg.nsc, cfg.mu, cfg.nfft))
bb = f_tx(tb)
grid = f_demod(bb)
bench("tx_slot (post demod)", f_tx, tb)

f_front = jax.jit(lambda g: sch.pusch_demodulate(g[None], c))
full, nv, rsrp = f_front(grid)
jax.block_until_ready(full)
bench("tx_slot (post front)", f_tx, tb)
bench("ofdm_demod", f_demod, bb)
bench("rx_front", f_front, grid)

f_dec = jax.jit(lambda fl: sch.pusch_decode(fl, c, jnp.float32(1e-3),
                                            jnp.float32(1.0), 6).tb_crc_ok)
ok = f_dec(full)
assert bool(ok)
bench("ldpc_decode6", f_dec, full)
bench("tx_slot (post dec)", f_tx, tb)
bench("ofdm_demod (post dec)", f_demod, bb)
