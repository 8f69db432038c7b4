"""Binary-search profile of pusch_demodulate / pdsch_transmit internals."""
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
from srsran_project_23_5_tpu.ops import equalizer, estimator, gold, modulation
from srsran_project_23_5_tpu.ops.ldpc import (encoder_pallas, rate_match,
                                              segmentation)
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import numerology, tbs as tbs_mod
from srsran_project_23_5_tpu.ran.constants import LLR_MAX

REPS = 20


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / REPS * 1e6
    print(f"{name:>24}: {dt:9.1f} us", flush=True)
    return outs[-1]


nof_prb, qm = 273, 6
tbs = tbs_mod.tbs_calculate(14, 36, 0, 0.6533, qm, 1, nof_prb)
c = sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                 dmrs_symbols=(2, 7, 11))
seg = c.segments
rng = np.random.default_rng(0)
grid_ri = jnp.asarray(rng.standard_normal((1, 14, c.nof_prb * 12, 2))
                      .astype(np.float32))
grid = jax.jit(lambda v: jax.lax.complex(v[..., 0], v[..., 1]))(grid_ri)
tb = jnp.asarray(rng.integers(0, 2, size=tbs).astype(np.int8))

lo, hi = c.sc_bounds


def est_only(g):
    tx_pilots = sch._dmrs_pilots(c)
    rx_pilots = jnp.stack(
        [g[..., l, lo:hi][..., 0::2] for l in c.dmrs_symbols], axis=-2)
    return estimator.estimate_comb2(rx_pilots, tx_pilots)


timeit("est_only", jax.jit(lambda g: est_only(g).h_alloc), grid)


def to_llr(g):
    est = est_only(g)
    y_rows, h_rows = [], []
    for l, kind in c.symbol_plan:
        row = g[..., l, lo:hi]
        if kind == "full":
            y_rows.append(row)
            h_rows.append(est.h_alloc)
        elif kind == "comb_data":
            y_rows.append(row[..., 1::2])
            h_rows.append(est.h_alloc[..., 1::2])
    y = jnp.concatenate(y_rows, axis=-1)
    h = jnp.concatenate(h_rows, axis=-1)
    noise_var = jnp.maximum(jnp.mean(est.noise_var), 1e-9)
    x_hat, post_nv = equalizer.zf_1xn(y, h, noise_var)
    return x_hat, post_nv, noise_var, est


timeit("est_eq", jax.jit(lambda g: to_llr(g)[0]), grid)


def demapped(g):
    x_hat, post_nv, noise_var, est = to_llr(g)
    llr = modulation.demodulate_soft(x_hat, post_nv, c.qm)
    return llr, noise_var, est


timeit("est_eq_demap", jax.jit(lambda g: demapped(g)[0]), grid)


def descrambled(g):
    llr, noise_var, est = demapped(g)
    seq = gold.gold_sequence(
        jnp.asarray(c.scrambling_cinit, dtype=jnp.uint32), c.nof_bits)
    llr = llr * (1.0 - 2.0 * seq.astype(jnp.float32))
    return jnp.clip(llr, -float(LLR_MAX), float(LLR_MAX)), noise_var, est


timeit("est_eq_demap_descr", jax.jit(lambda g: descrambled(g)[0]), grid)
timeit("full_front", jax.jit(lambda g: sch.pusch_demodulate(g, c)[0]), grid)

# --- TX side
timeit("segment_tx", jax.jit(lambda t: segmentation.segment_tx(t, seg)), tb)


def enc(t):
    cbs = segmentation.segment_tx(t, seg)
    return encoder_pallas.encode(cbs, seg.base_graph, seg.lifting_size)


timeit("seg_encode", jax.jit(enc), tb)


def rm_stage(t):
    cw = enc(t)
    return rate_match.match_tb(cw, seg.base_graph, seg.lifting_size, c.rv,
                               seg.payload_length, seg.segment_length,
                               tuple(c.cb_lengths), c.qm)


timeit("seg_enc_rm", jax.jit(rm_stage), tb)


def mod_stage(t):
    codeword = rm_stage(t)
    s = gold.gold_sequence(
        jnp.asarray(c.scrambling_cinit, dtype=jnp.uint32), c.nof_bits)
    return modulation.modulate(codeword.astype(jnp.int8) ^ s, c.qm)


timeit("seg_enc_rm_scr_mod", jax.jit(mod_stage), tb)

def _tx(t):
    g0 = jnp.zeros((14, c.nof_prb * 12), dtype=jnp.complex64)
    return sch.pdsch_transmit(t, c, g0)


timeit("pdsch_transmit", jax.jit(_tx), tb)

# --- modulate variants on the composed path
from srsran_project_23_5_tpu.ops import modulation


def mod_v2(t):
    codeword = rm_stage(t)
    s = gold.gold_sequence(
        jnp.asarray(c.scrambling_cinit, dtype=jnp.uint32), c.nof_bits)
    bits = codeword.astype(jnp.int8) ^ s
    grouped = bits.reshape(-1, c.qm).astype(jnp.int32)
    w = jnp.asarray([1 << (c.qm - 1 - k) for k in range(c.qm)], jnp.int32)
    labels = (grouped * w).sum(axis=-1)
    lut = modulation.constellation(c.qm)
    re = jnp.asarray(lut.real.astype(np.float32))[labels]
    im = jnp.asarray(lut.imag.astype(np.float32))[labels]
    return jax.lax.complex(re, im)


timeit("scr_mod_twinlut", jax.jit(mod_v2), tb)


def mod_v3(t):
    """PAM via matmul: axis bits → level index, no gather."""
    codeword = rm_stage(t)
    s = gold.gold_sequence(
        jnp.asarray(c.scrambling_cinit, dtype=jnp.uint32), c.nof_bits)
    bits = (codeword.astype(jnp.int8) ^ s).astype(jnp.float32)
    grouped = bits.reshape(-1, c.qm)
    lv = modulation.pam_levels(c.qm)
    nb = c.qm // 2
    # level = f(bit pattern) — use per-axis gather on small int index
    wa = jnp.asarray([1 << (nb - 1 - k) for k in range(nb)], jnp.float32)
    ridx = (grouped[:, 0::2] * wa).sum(-1).astype(jnp.int32)
    iidx = (grouped[:, 1::2] * wa).sum(-1).astype(jnp.int32)
    lvj = jnp.asarray(lv)
    return jax.lax.complex(lvj[ridx], lvj[iidx])


timeit("scr_mod_pamidx", jax.jit(mod_v3), tb)

cfg = gnb_flagship.CarrierConfig(mu=1, nfft=numerology.min_nfft(nof_prb),
                                 nof_prb=nof_prb, sh=c)
timeit("tx_slot", jax.jit(lambda t: gnb_flagship.tx_slot(t, cfg)), tb)
print("done", flush=True)
