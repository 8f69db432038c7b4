"""Experiment 5: TX substage device times at slot-batch B."""
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
from srsran_project_23_5_tpu.ops import gold, modulation
from srsran_project_23_5_tpu.ops.ldpc import (encoder, encoder_pallas,
                                              rate_match, segmentation)
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
seg = c.segments
rng = np.random.default_rng(0)
tb_b = jax.device_put(jnp.asarray(
    rng.integers(0, 2, size=(B, tbs)).astype(np.int8)))


def run(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    outs = [fn(*args) for _ in range(2)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(NDISP)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (NDISP * B) * 1e6
    print(f"{name:>22}: {dt:9.1f} us/slot (B={B})", flush=True)
    return out


f_seg = jax.jit(jax.vmap(lambda t: segmentation.segment_tx(t, seg)))
cbs = run("segment", f_seg, tb_b)

f_encp = jax.jit(jax.vmap(
    lambda cb: encoder_pallas.encode(cb, seg.base_graph, seg.lifting_size)))
cw = run("encode_pallas", f_encp, cbs)
f_encx = jax.jit(jax.vmap(
    lambda cb: encoder.encode(cb, seg.base_graph, seg.lifting_size)))
run("encode_xla", f_encx, cbs)

f_rm = jax.jit(jax.vmap(lambda w: rate_match.match_tb(
    w, seg.base_graph, seg.lifting_size, c.rv, seg.payload_length,
    seg.segment_length, tuple(c.cb_lengths), c.qm)))
codeword = run("rate_match", f_rm, cw)

seq = gold.gold_sequence(jnp.asarray(c.scrambling_cinit, jnp.uint32),
                         c.nof_bits)
f_scr = jax.jit(jax.vmap(lambda w: w.astype(jnp.int8) ^ seq))
scrambled = run("scramble", f_scr, codeword)

f_mod = jax.jit(jax.vmap(lambda s: modulation.modulate(s, c.qm)))
syms = run("modulate", f_mod, scrambled)

f_map = jax.jit(jax.vmap(lambda s: sch.map_res(
    s, c, jnp.zeros((14, c.nof_prb * 12), jnp.complex64))))
grid = run("map_res", f_map, syms)

f_ofdm = jax.jit(jax.vmap(lambda g: ofdm.modulate_slot(g, cfg.mu, cfg.nfft)))
run("ofdm_mod", f_ofdm, grid)

f_gold = jax.jit(lambda ci: gold.gold_sequence(ci, c.nof_bits))
run("gold(nof_bits) x1", lambda ci: f_gold(ci),
    jnp.asarray(c.scrambling_cinit, jnp.uint32))
print("done", flush=True)
