"""Sub-stage profile of pusch_decode (decoder vs desegment/CRC)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_ran_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srsran_project_23_5_tpu.ops import crc as crc_ops
from srsran_project_23_5_tpu.ops.ldpc import decoder_pallas, segmentation
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import tbs as tbs_mod

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
full = jnp.asarray(rng.standard_normal(
    (seg.nof_segments, (66 + 2) * seg.lifting_size)).astype(np.float32))
bits = jnp.asarray(rng.integers(
    0, 2, (seg.nof_segments, seg.nof_message_blocks * seg.lifting_size)
).astype(np.int8))

timeit("decode_only", jax.jit(
    lambda l: decoder_pallas.decode(l, seg.base_graph, seg.lifting_size, 6)[0]),
    full)
timeit("desegment", jax.jit(lambda b: segmentation.desegment_rx(b, seg)[1]),
       bits)
timeit("cb_crc24B", jax.jit(
    lambda b: crc_ops.crc_check(b[..., :seg.payload_length], "crc24B")), bits)
tbbits = jnp.asarray(rng.integers(0, 2, (1, tbs + 24)).astype(np.int8))
timeit("tb_crc24A", jax.jit(lambda b: crc_ops.crc_check(b, "crc24A")), tbbits)
timeit("pusch_decode", jax.jit(
    lambda l: sch.pusch_decode(l, c, jnp.float32(1e-3), jnp.float32(1.0),
                               6).tb_crc_ok), full)
print("done", flush=True)
