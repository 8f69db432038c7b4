"""A/B the Pallas decoder configs on TPU: us per CB at 6 iters."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from srsran_project_23_5_tpu.ops.ldpc import decoder_pallas, encoder, graphs
from srsran_project_23_5_tpu.utils.cache import enable_default_cache
enable_default_cache()

bg, zc, iters, ncb = 1, 384, 6, 256
g = graphs.lifted_graph(bg, zc)
k = g.nof_msg_blocks * zc
rng = np.random.default_rng(0)
msg = rng.integers(0, 2, (8, k)).astype(np.int8)
cw = np.asarray(encoder.encode(jnp.asarray(msg), bg, zc))
good = np.tile(8.0 * (1 - 2 * cw[:1].astype(np.float32)), (ncb, 1))
good[:, :2*zc] = 0.0
bad = 8.0 * (1 - 2 * rng.integers(0, 2, good.shape).astype(np.float32))

def run(llr, label):
    x = jnp.asarray(llr)
    f = jax.jit(lambda v: decoder_pallas.decode(v, bg, zc, iters)[1].sum())
    np.asarray(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(f(x)); ts.append(time.perf_counter()-t0)
    dt = (np.median(ts) - 0.0268)  # tunnel host-read overhead
    print(f"{label}: {dt/ncb*1e6:.1f} us/CB  ({np.median(ts)*1e3:.0f} ms total)", flush=True)

run(good, "decodable")
run(bad, "random")
