"""Experiment 4: per-stage device time at slot-batch B, decoder scaling."""
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

B = int(os.environ.get("B", "32"))
NDISP = 8

nof_prb, qm = 273, 6
tbs = tbs_mod.tbs_calculate(14, 36, 0, 0.6533, qm, 1, nof_prb)
cfg = gnb_flagship.CarrierConfig(
    mu=1, nfft=numerology.min_nfft(nof_prb), nof_prb=nof_prb,
    sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                    dmrs_symbols=(2, 7, 11)))
c = cfg.sh
slot_samples = numerology.slot_num_samples(cfg.mu, cfg.nfft)
sigma = float(np.sqrt(cfg.nfft) * 10 ** (-20.0 / 20))

rng = np.random.default_rng(0)
tb_b = jax.device_put(jnp.asarray(
    rng.integers(0, 2, size=(B, tbs)).astype(np.int8)))
keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), B))

tx_b = jax.jit(jax.vmap(lambda t: gnb_flagship.tx_slot(t, cfg)))


def _chan(bb, key):
    nz = (sigma / np.sqrt(2)) * jax.random.normal(
        key, (2, slot_samples), jnp.float32)
    return ofdm.demodulate_slot(bb + jax.lax.complex(nz[0], nz[1]),
                                cfg.nsc, cfg.mu, cfg.nfft)


chan_b = jax.jit(jax.vmap(_chan))
front_b = jax.jit(jax.vmap(lambda g: tuple(sch.pusch_demodulate(g[None], c))))
dec_pallas = {}
for it in (1, 6):
    dec_pallas[it] = jax.jit(jax.vmap(
        lambda fl, it=it: sch.pusch_decode(
            fl, c, jnp.float32(1e-3), jnp.float32(1.0), it,
            decoder_backend="pallas").tb_crc_ok))
dec_xla6 = jax.jit(jax.vmap(
    lambda fl: sch.pusch_decode(fl, c, jnp.float32(1e-3), jnp.float32(1.0),
                                6, decoder_backend="xla").tb_crc_ok))

t0 = time.perf_counter()
bb = tx_b(tb_b)
grid = chan_b(bb, keys)
full, nv, rsrp = front_b(grid)
ok6 = dec_pallas[6](full)
jax.block_until_ready(ok6)
print(f"compile chain: {time.perf_counter()-t0:.1f}s "
      f"ok={np.asarray(ok6).all()}", flush=True)


def run(name, fn, *args):
    outs = [fn(*args) for _ in range(2)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(NDISP)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (NDISP * B) * 1e6
    print(f"{name:>22}: {dt:9.1f} us/slot (B={B})", flush=True)


run("tx_b", tx_b, tb_b)
run("chan_b", chan_b, bb, keys)
run("front_b", front_b, grid)
run("dec_pallas_it1", dec_pallas[1], full)
run("dec_pallas_it6", dec_pallas[6], full)
t0 = time.perf_counter()
ok = dec_xla6(full)
jax.block_until_ready(ok)
print(f"dec_xla6 compile {time.perf_counter()-t0:.1f}s", flush=True)
run("dec_xla_it6", dec_xla6, full)
print("done", flush=True)
