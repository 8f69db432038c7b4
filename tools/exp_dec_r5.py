"""Pallas LDPC decoder microbench at the ROUND-5 merged shape.

Decodable LLRs at a realistic operating point (so early termination
behaves as in the bench), shape [B*C, N] as mixed_slot_batch produces.
Sweeps iterations / check_period / early-termination.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from srsran_project_23_5_tpu.ops.ldpc import decoder_pallas, encoder
from srsran_project_23_5_tpu.ran import ldpc_params
from srsran_project_23_5_tpu.utils.cache import enable_default_cache

enable_default_cache()

B = int(os.environ.get("B", "64"))
SNRDB = float(os.environ.get("SNRDB", "6.0"))   # ~64QAM@20dB per-bit LLR noise
REPS = int(os.environ.get("REPS", "8"))

# pusch0 of the flagship: BG1, Zc=384, C=17
seg = ldpc_params.segment_tb(139376, 1)
z = seg.lifting_size
print("seg:", seg)
rng = np.random.default_rng(0)
C = seg.nof_segments
msg = np.zeros((C, seg.nof_message_blocks * z), np.int8)
msg[:, :seg.payload_length] = rng.integers(
    0, 2, (C, seg.payload_length)).astype(np.int8)
# filler region must be zero (encoder contract)
msg[:, seg.payload_length:] = 0
# encode to full codeword (systematic + parity), then make LLRs
cw = np.asarray(jax.jit(lambda m: encoder.encode(
    jnp.asarray(m), seg.base_graph, seg.lifting_size))(msg))
n_full = cw.shape[-1]
sigma = 10 ** (-SNRDB / 20)
def make_llr(seed):
    r = np.random.default_rng(seed)
    y = (1 - 2.0 * cw) + sigma * r.standard_normal(cw.shape)
    llr = 2.0 * y / (sigma ** 2)
    # puncture first 2Zc systematic
    llr[:, :2 * z] = 0.0
    return np.tile(llr.astype(np.float32), (B, 1))

llr_np = make_llr(1)
llr = jax.device_put(jnp.asarray(llr_np))
jax.block_until_ready(llr)
print("llr shape", llr.shape, "CBs", llr.shape[0])


def bench(name, **kw):
    f = jax.jit(lambda l: decoder_pallas.decode(
        l, seg.base_graph, seg.lifting_size, **kw))
    bits, ok = f(llr)
    okh = np.asarray(ok)
    t0 = time.perf_counter()
    for _ in range(REPS):
        bits, ok = f(llr)
    np.asarray(ok[:1])
    dt = (time.perf_counter() - t0) / REPS
    per_cb = dt / llr.shape[0] * 1e6
    per_slot = per_cb * C
    print(f"{name:40s} {per_cb:7.2f} us/CB  {per_slot:7.1f} us/slot-of-{C}"
          f"  ok={okh.all()} ({okh.mean():.2f})", flush=True)


bench("iters=6 et chk2 (current)", nof_iterations=6)
bench("iters=6 et chk1", nof_iterations=6, check_period=1)
bench("iters=2 no-et", nof_iterations=2, early_termination=False)
bench("iters=3 no-et", nof_iterations=3, early_termination=False)
bench("iters=4 no-et", nof_iterations=4, early_termination=False)
bench("iters=6 no-et", nof_iterations=6, early_termination=False)
