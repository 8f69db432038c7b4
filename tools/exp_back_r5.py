"""Back-half (desegment/CRC/compare) microbench at the flagship shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from srsran_project_23_5_tpu.ops import crc as crc_ops
from srsran_project_23_5_tpu.ops.ldpc import segmentation
from srsran_project_23_5_tpu.ran import ldpc_params
from srsran_project_23_5_tpu.utils.cache import enable_default_cache

enable_default_cache()

B = int(os.environ.get("B", "64"))
REPS = 8
seg = ldpc_params.segment_tb(139376, 1)
rng = np.random.default_rng(0)
cb = jax.device_put(jnp.asarray(rng.integers(
    0, 2, (B, seg.nof_segments, seg.nof_message_blocks * seg.lifting_size)
).astype(np.int8)))
tb = jax.device_put(jnp.asarray(rng.integers(
    0, 2, (B, 139376)).astype(np.int8)))
tbc = jax.device_put(jnp.asarray(rng.integers(
    0, 2, (B, 139376 + 24)).astype(np.int8)))
jax.block_until_ready((cb, tb, tbc))


def t(name, f, *a):
    out = f(*a)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*a)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:32s} {dt / B * 1e6:8.2f} us/slot", flush=True)


t("desegment_rx full", jax.jit(lambda b: segmentation.desegment_rx(b, seg)[1]), cb)
t("cb crc24B [B,17,8448]", jax.jit(
    lambda b: crc_ops.crc_check(b[..., :seg.payload_length], "crc24B")), cb)
t("tb crc24A [B,139400]", jax.jit(
    lambda b: crc_ops.crc_check(b, "crc24A")), tbc)
t("bitcompare [B,139376]", jax.jit(
    lambda a, b: jnp.all(a == b, axis=-1)), tb, tb)

# f32 CRC variant
def crc_f32(bits, name):
    m = jnp.asarray(crc_ops.remainder_matrix(name, bits.shape[-1]),
                    dtype=jnp.float32)
    acc = jnp.matmul(bits.astype(jnp.float32), m,
                     preferred_element_type=jnp.float32)
    return jnp.mod(acc, 2.0)

t("tb crc24A f32 matmul", jax.jit(lambda b: crc_f32(b, "crc24A")), tbc)
t("cb crc24B f32 matmul", jax.jit(
    lambda b: crc_f32(b[..., :seg.payload_length], "crc24B")), cb)
