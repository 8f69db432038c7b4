"""Per-stage device timing of the PDSCH TX chain (dev tool)."""
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
from srsran_project_23_5_tpu.ops import gold, modulation
from srsran_project_23_5_tpu.ops.ldpc import (encoder_pallas, rate_match,
                                              segmentation)
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
seg = c.segments
rng = np.random.default_rng(0)
tb = jax.device_put(jnp.asarray(rng.integers(0, 2, size=tbs).astype(np.int8)))

f_seg = jax.jit(lambda t: segmentation.segment_tx(t, seg))
f_enc = jax.jit(lambda cbs: encoder_pallas.encode(cbs, seg.base_graph,
                                                  seg.lifting_size))


def _rm(cw):
    rm = [rate_match.match(cw[r], seg.base_graph, seg.lifting_size, c.rv,
                           seg.payload_length, seg.segment_length, e, c.qm)
          for r, e in enumerate(c.cb_lengths)]
    return jnp.concatenate(rm, axis=-1)


f_rm = jax.jit(_rm)


def _mod(codeword):
    sq = gold.gold_sequence(jnp.asarray(c.scrambling_cinit, jnp.uint32),
                            c.nof_bits)
    return modulation.modulate(codeword.astype(jnp.int8) ^ sq, c.qm)


f_mod = jax.jit(_mod)


def _map(syms):
    grid = jnp.zeros((14, cfg.nsc), dtype=jnp.complex64)
    lo, hi = c.sc_bounds
    width = hi - lo
    pilots = sch._dmrs_pilots(c)
    dmrs_i = {l: i for i, l in enumerate(c.dmrs_symbols)}
    pos = 0
    for l, kind in c.symbol_plan:
        if kind == "full":
            row = syms[pos:pos + width]
            pos += width
        elif kind == "comb_data":
            chunk = syms[pos:pos + width // 2]
            pos += width // 2
            row = jnp.stack([pilots[dmrs_i[l]], chunk], axis=-1).reshape(-1)
        else:
            zero = jnp.zeros_like(pilots[dmrs_i[l]])
            row = jnp.stack([pilots[dmrs_i[l]], zero], axis=-1).reshape(-1)
        grid = grid.at[..., l, lo:hi].set(row)
    return grid


f_map = jax.jit(_map)
f_ofdm = jax.jit(lambda g: ofdm.modulate_slot(g, cfg.mu, cfg.nfft))

stages = [("segment", f_seg, tb)]
cbs = f_seg(tb)
stages.append(("ldpc_encode", f_enc, cbs))
cw = f_enc(cbs)
stages.append(("rate_match", f_rm, cw))
codeword = f_rm(cw)
stages.append(("scramble+mod", f_mod, codeword))
syms = f_mod(codeword)
stages.append(("grid_map", f_map, syms))
grid = f_map(syms)
stages.append(("ofdm_mod", f_ofdm, grid))

REPS = 20
for name, fn, arg in stages:
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(arg) for _ in range(REPS)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / REPS * 1e6
    print(f"{name:>14}: {dt:9.1f} us")

# Chained dispatch: all six stages back-to-back per rep.
def chain(t):
    return f_ofdm(f_map(f_mod(f_rm(f_enc(f_seg(t))))))

jax.block_until_ready(chain(tb))
t0 = time.perf_counter()
outs = [chain(tb) for _ in range(REPS)]
jax.block_until_ready(outs[-1])
dt = (time.perf_counter() - t0) / REPS * 1e6
print(f"{'chained':>14}: {dt:9.1f} us")

# Monolithic jit of the same chain.
f_all = jax.jit(lambda t: gnb_flagship.tx_slot(t, cfg))
jax.block_until_ready(f_all(tb))
t0 = time.perf_counter()
outs = [f_all(tb) for _ in range(REPS)]
jax.block_until_ready(outs[-1])
dt = (time.perf_counter() - t0) / REPS * 1e6
print(f"{'fused_tx':>14}: {dt:9.1f} us")
