"""Dispatch experiment 2: program-switch cost vs dependency vs arg identity."""
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

REPS = 48

nof_prb, qm = 273, 6
tbs = tbs_mod.tbs_calculate(14, 36, 0, 0.6533, qm, 1, nof_prb)
cfg = gnb_flagship.CarrierConfig(
    mu=1, nfft=numerology.min_nfft(nof_prb), nof_prb=nof_prb,
    sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                    dmrs_symbols=(2, 7, 11)))

rng = np.random.default_rng(0)
tb = jax.device_put(jnp.asarray(rng.integers(0, 2, size=tbs).astype(np.int8)))
tbs_many = [jax.device_put(jnp.asarray(
    rng.integers(0, 2, size=tbs).astype(np.int8))) for _ in range(REPS)]
jax.block_until_ready(tbs_many)

tx = jax.jit(lambda t: gnb_flagship.tx_slot(t, cfg))
demod = jax.jit(lambda b: ofdm.demodulate_slot(b, cfg.nsc, cfg.mu, cfg.nfft))
rx = jax.jit(lambda g: sch.pusch_receive(g[None], cfg.sh, 6).tb_crc_ok)

t0 = time.perf_counter()
bb0 = tx(tb)
g0 = demod(bb0)
ok0 = rx(g0)
jax.block_until_ready(ok0)
print(f"compile: {time.perf_counter()-t0:.1f}s ok={bool(ok0)}", flush=True)


def run(name, fn, n=REPS):
    fn()
    t0 = time.perf_counter()
    fn()
    dt = (time.perf_counter() - t0) / n * 1e6
    print(f"{name:>26}: {dt:9.1f} us/call", flush=True)


def v1():
    outs = [tx(tb) for _ in range(REPS)]
    jax.block_until_ready(outs[-1])


def v2():
    outs = [tx(t) for t in tbs_many]
    jax.block_until_ready(outs[-1])


def v3():  # alternate two programs, independent inputs
    outs = []
    for _ in range(REPS // 2):
        outs.append(tx(tb))
        outs.append(demod(bb0))
    jax.block_until_ready(outs[-1])


def v4():  # 2-program dependency chain
    outs = [demod(tx(tb)) for _ in range(REPS)]
    jax.block_until_ready(outs[-1])


def v5():  # stage-major full chain: tx all, demod all, rx all
    bbs = [tx(t) for t in tbs_many]
    gs = [demod(b) for b in bbs]
    oks = [rx(g) for g in gs]
    jax.block_until_ready(oks[-1])


run("same-prog same-arg", v1)
run("same-prog diff-args", v2)
run("alt-2-prog independent", v3)
run("chain-2-prog", v4)
run("stage-major full chain", v5)

a = jax.jit(lambda x: x + 1)
b = jax.jit(lambda x: x * 2)
xs = jax.device_put(jnp.zeros((128,), jnp.float32))
jax.block_until_ready((a(xs), b(xs)))


def v6():
    outs = []
    for _ in range(REPS // 2):
        outs.append(a(xs))
        outs.append(b(xs))
    jax.block_until_ready(outs[-1])


def v7():
    outs = [a(xs) for _ in range(REPS)]
    jax.block_until_ready(outs[-1])


run("tiny same-prog", v7)
run("tiny alt-2-prog", v6)
print("done", flush=True)
