"""Sub-stage timing of the 2-layer PUSCH receive at B=64 (scalar reads)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from srsran_project_23_5_tpu.models import gnb_mixed
from srsran_project_23_5_tpu.ops import equalizer, estimator, gold, modulation
from srsran_project_23_5_tpu.ops.ldpc import rate_match
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.utils.cache import enable_default_cache
enable_default_cache()

B = 64
cfg = gnb_mixed.default_mixed()
c0 = cfg.pusch0
rng = np.random.default_rng(0)
p = gnb_mixed.make_payloads(cfg, rng, batch=B)
keys = jax.random.split(jax.random.PRNGKey(0), B)

def _sync(x):
    np.asarray(x)

def timeit(label, fn, *args, n=5):
    f = jax.jit(fn)
    _sync(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); _sync(f(*args)); ts.append(time.perf_counter()-t0)
    print(f"{label}: {(np.median(ts)-0.0268)/B*1e6:.0f} us/slot", flush=True)

# shared synthetic rx grid
@jax.jit
@jax.vmap
def mk_rx(tb0, tb1, key):
    g = jnp.zeros((2, 14, cfg.nsc), jnp.complex64)
    g = sch.pusch_transmit(tb0, cfg.pusch0, g)
    g = sch.pusch_transmit(tb1, cfg.pusch1, g)
    nz = 0.1 * jax.random.normal(key, (2, 2, 14, cfg.nsc), jnp.float32)
    return g + jax.lax.complex(nz[0], nz[1])
rx = mk_rx(p["tb_ul0"], p["tb_ul1"], keys)
_sync(jnp.abs(rx).sum())

def front(rxg):  # estimation + extraction + equalize [2-layer]
    lo, hi = c0.sc_bounds
    tx_pilots = sch._dmrs_pilots(c0)
    rx_pil = jnp.stack([rxg[..., l, lo:hi][..., 0::2] for l in c0.dmrs_symbols], axis=-2)
    est = estimator.estimate_comb2_occ2(rx_pil, tx_pilots)
    y_rows, h_rows = [], []
    for l, kind in c0.symbol_plan:
        if kind == "full":
            y_rows.append(rxg[..., l, lo:hi]); h_rows.append(est.h_alloc)
    y = jnp.concatenate(y_rows, axis=-1); h = jnp.concatenate(h_rows, axis=-1)
    nv = jnp.maximum(jnp.mean(est.noise_var), 1e-9)
    x_lay, nv_lay = equalizer.zf_nx2(y, h, nv)
    return x_lay, nv_lay

timeit("est+eq (2layer)", lambda r: jax.vmap(lambda g: jnp.abs(front(g)[0]).sum())(r), rx)

@jax.vmap
def upto_llr(rxg):
    x_lay, nv_lay = front(rxg)
    llr_lay = modulation.demodulate_soft(x_lay, nv_lay, c0.qm)
    return llr_lay.sum()
timeit("est+eq+demap", lambda r: upto_llr(r).sum(), rx)

@jax.vmap
def upto_descr(rxg):
    from srsran_project_23_5_tpu.ops import precoding
    from srsran_project_23_5_tpu.ran.constants import LLR_MAX
    x_lay, nv_lay = front(rxg)
    llr_lay = modulation.demodulate_soft(x_lay, nv_lay, c0.qm)
    llr = precoding.layer_demap_llr(llr_lay, c0.qm)
    seq = gold.gold_sequence(jnp.asarray(c0.scrambling_cinit, jnp.uint32), c0.nof_bits)
    llr = jnp.clip(llr * (1.0 - 2.0 * seq.astype(jnp.float32)), -LLR_MAX, LLR_MAX)
    return llr.sum()
timeit("est+eq+demap+descr", lambda r: upto_descr(r).sum(), rx)

@jax.vmap
def full_demod(rxg):
    d = sch.pusch_demodulate(rxg, c0)
    return d.llr_full.sum() + d.evm
timeit("full demod (w/ dematch+evm)", lambda r: full_demod(r).sum(), rx)

@jax.vmap
def demod_u1(rxg):
    d = sch.pusch_demodulate(rxg, cfg.pusch1)
    return d.llr_full.sum() + d.evm
timeit("full demod UE1 (1-layer)", lambda r: demod_u1(r).sum(), rx)

@jax.vmap
def full_rx(rxg):
    r0 = sch.pusch_receive(rxg, c0, cfg.nof_ldpc_iterations)
    return r0.tb_crc_ok
timeit("full receive UE0 (demod+decode)", lambda r: full_rx(r).sum(), rx)
