"""Microbenchmarks of candidate hot-path primitives on the live device.

Dev tool: guides kernel choices (FFT vs matmul-DFT, gather shapes, decoder
tiling).  Each case is a tiny program; compiles are seconds each.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_ran_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / REPS * 1e6
    print(f"{name:>28}: {dt:9.1f} us", flush=True)
    return outs[-1]


rng = np.random.default_rng(0)

# --- FFT: xla fft vs 4-step matmul DFT [14, 4096]
x = jnp.asarray(rng.standard_normal((14, 4096, 2)).astype(np.float32))
xc = jax.jit(lambda v: jax.lax.complex(v[..., 0], v[..., 1]))(x)

f_fft = jax.jit(lambda v: jnp.fft.fft(v, axis=-1))
timeit("xla_fft_14x4096", f_fft, xc)

# --- demod internals: slicing vs fft vs full demodulate_slot
from srsran_project_23_5_tpu.phy.lower import ofdm
from srsran_project_23_5_tpu.ran import numerology

samples = jnp.asarray(rng.standard_normal((61440, 2)).astype(np.float32))
sc = jax.jit(lambda v: jax.lax.complex(v[..., 0], v[..., 1]))(samples)
f_dem = jax.jit(lambda v: ofdm.demodulate_slot(v, 3276, 1, 4096))
timeit("demodulate_slot", f_dem, sc)


def slice_only(v):
    cps = numerology.cp_lengths(1, 4096, 0)
    starts = ofdm._symbol_starts(1, 4096, 0)
    syms = [v[int(starts[l]) + int(cps[l]):int(starts[l]) + int(cps[l]) + 4096]
            for l in range(14)]
    return jnp.stack(syms, axis=-2)


f_sl = jax.jit(slice_only)
timeit("demod_slice_stack", f_sl, sc)

f_slfft = jax.jit(lambda v: jnp.fft.fft(slice_only(v), axis=-1))
timeit("demod_slice_fft", f_slfft, sc)

grid14 = jnp.asarray(rng.standard_normal((14, 3276, 2)).astype(np.float32))
g14 = jax.jit(lambda v: jax.lax.complex(v[..., 0], v[..., 1]))(grid14)
f_modslot = jax.jit(lambda g: ofdm.modulate_slot(g, 1, 4096))
timeit("modulate_slot", f_modslot, g14)

f_ifft = jax.jit(lambda g: jnp.fft.ifft(ofdm._grid_to_bins(g, 4096), axis=-1))
timeit("grid_bins_ifft", f_ifft, g14)

# --- gathers: one big gather vs 17 small ones
G = 216216
N = 8448  # 66*128? use realistic: 66*Zc, Zc=384 -> 25344
N = 25344
C = 17
buf = jnp.asarray(rng.standard_normal((C * N,)).astype(np.float32))
idx_big = jnp.asarray(rng.integers(0, C * N, size=G).astype(np.int32))
f_g1 = jax.jit(lambda b, i: jnp.take(b, i, axis=0))
timeit("gather_216k_from_430k", f_g1, buf, idx_big)

idxs = [jnp.asarray(rng.integers(0, N, size=G // C).astype(np.int32))
        for _ in range(C)]
f_g17 = jax.jit(lambda b, *ii: jnp.concatenate(
    [jnp.take(b[r * N:(r + 1) * N], ii[r], axis=0) for r in range(C)]))
timeit("gather_17_small", f_g17, buf, *idxs)

# --- contiguous-window gather (rate-dematch inverse): [C,N] from [G+1]
inv = jnp.asarray(rng.integers(0, G, size=C * N).astype(np.int32))
llr = jnp.asarray(rng.standard_normal((G + 1,)).astype(np.float32))
f_inv = jax.jit(lambda l, i: jnp.take(l, i, axis=0).reshape(C, N))
timeit("dematch_gather_430k", f_inv, llr, inv)

# --- demap 64QAM distances for 36036 REs
S = 36036
y = jnp.asarray((rng.standard_normal(S) + 1j * rng.standard_normal(S)
                 ).astype(np.complex64))
from srsran_project_23_5_tpu.ops import modulation
f_dm = jax.jit(lambda v: modulation.demodulate_soft(v, jnp.ones(S), 6))
timeit("demap_qam64_36k", f_dm, y)

# --- modulate 216k bits
bits = jnp.asarray(rng.integers(0, 2, size=G).astype(np.int8))
f_mod = jax.jit(lambda b: modulation.modulate(b, 6))
timeit("modulate_qam64_216k", f_mod, bits)

# --- gold sequence 216k
from srsran_project_23_5_tpu.ops import gold
f_gold = jax.jit(lambda c: gold.gold_sequence(c, G))
timeit("gold_216k", f_gold, jnp.uint32(12345))

# --- LDPC decode pallas, 17 CBs BG1 Z=384, 6 iters vs 2 iters
from srsran_project_23_5_tpu.ops.ldpc import decoder_pallas, encoder_pallas
llr17 = jnp.asarray(rng.standard_normal((17, 66 * 384 + 2 * 384)
                                        ).astype(np.float32))
# N_full = 68 blocks
llr17 = jnp.asarray(rng.standard_normal((17, 68 * 384)).astype(np.float32))
f_d6 = jax.jit(lambda l: decoder_pallas.decode(l, 1, 384, 6)[0])
timeit("ldpc_dec_pallas_17cb_6it", f_d6, llr17)
f_d2 = jax.jit(lambda l: decoder_pallas.decode(l, 1, 384, 2)[0])
timeit("ldpc_dec_pallas_17cb_2it", f_d2, llr17)

# --- LDPC encode pallas 17 CBs
msg = jnp.asarray(rng.integers(0, 2, (17, 22 * 384)).astype(np.int8))
f_e = jax.jit(lambda m: encoder_pallas.encode(m, 1, 384))
timeit("ldpc_enc_pallas_17cb", f_e, msg)

# --- estimator + equalizer scale check
h = jnp.asarray((rng.standard_normal((1, S)) + 1j * rng.standard_normal((1, S))).astype(np.complex64))
from srsran_project_23_5_tpu.ops import equalizer
f_eq = jax.jit(lambda yy, hh: equalizer.zf_1xn(yy, hh, jnp.float32(1e-2)))
timeit("zf_1xn_36k", f_eq, y[None], h)

print("done", flush=True)
