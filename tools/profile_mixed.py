"""Per-stage device-time dissection of the 273-PRB mixed slot at B=64.

Each stage runs as its own jitted program over the same batch; times are
sustained (8 back-to-back dispatches, one sync), per slot.
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from srsran_project_23_5_tpu.models import gnb_mixed
from srsran_project_23_5_tpu.phy.lower import ofdm
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.utils.cache import enable_default_cache

enable_default_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
cfg = gnb_mixed.default_mixed()
rng = np.random.default_rng(0)
p = gnb_mixed.make_payloads(cfg, rng, batch=B)
keyv = jax.random.split(jax.random.PRNGKey(0), B)


# fixed per-dispatch overhead measured with an empty-ish program
@jax.jit
def _nop(x):
    return x + 1.0


_nop(jnp.float32(0))


def _sync(out):
    # block_until_ready resolves early on this backend; a host read of
    # one leaf is the only reliable completion barrier
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def _overhead():
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _sync(_nop(jnp.float32(0)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


OVH = _overhead()
print(f"dispatch overhead ms: {OVH * 1e3:.2f}", flush=True)


def sustain(fn, *args, n=6):
    _sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - OVH) / B * 1e6  # us/slot


# ---- stage 1: DL encodes + grid assembly (no OFDM)
@jax.jit
@jax.vmap
def dl_assemble(tb0, tb1, dci_dl, dci_ul, pbch):
    from srsran_project_23_5_tpu.phy.upper import csi_rs as csi_rs_proc
    from srsran_project_23_5_tpu.phy.upper import pdcch as pdcch_proc
    from srsran_project_23_5_tpu.phy.upper import ssb as ssb_proc
    from srsran_project_23_5_tpu.ran.constants import NRE
    cw0 = sch._encode_sch(tb0, cfg.pdsch0)
    cw1 = sch._encode_sch(tb1, cfg.pdsch1)
    grid = jnp.zeros((2, 14, cfg.nsc), jnp.complex64)
    grid = sch._scramble_modulate_map(cw0, cfg.pdsch0, grid)
    g2d = jnp.zeros((14, cfg.nsc), jnp.complex64)
    g2d = sch._scramble_modulate_map(cw1, cfg.pdsch1, g2d)
    g2d = pdcch_proc.pdcch_transmit(dci_dl, cfg.pdcch_dl, g2d)
    g2d = pdcch_proc.pdcch_transmit(dci_ul, cfg.pdcch_ul, g2d)
    block = ssb_proc.ssb_assemble(pbch, cfg.ssb)
    lo = cfg.ssb_prb_start * NRE
    g2d = g2d.at[2:6, lo:lo + 240].set(block)
    g2d = csi_rs_proc.generate(cfg.csi_rs, g2d)
    return jnp.abs(grid.at[0].add(g2d)).sum()


print("dl_assemble us/slot:",
      round(sustain(dl_assemble, p["tb_dl0"], p["tb_dl1"], p["dci_dl"],
                    p["dci_ul"], p["pbch"]), 1), flush=True)


# ---- stage 2: OFDM mod+demod of a 2-port grid (x1 set; slot has 4)
@jax.jit
@jax.vmap
def ofdm_roundtrip(key):
    g = jax.lax.complex(
        jax.random.normal(key, (2, 14, cfg.nsc), jnp.float32),
        jax.random.normal(key, (2, 14, cfg.nsc), jnp.float32))
    bb = ofdm.modulate_slot(g, cfg.mu, cfg.nfft)
    rx = ofdm.demodulate_slot(bb, cfg.nsc, cfg.mu, cfg.nfft)
    return jnp.abs(rx).sum()


print("ofdm 2-port mod+demod us/slot (x2 in mixed):",
      round(sustain(ofdm_roundtrip, keyv), 1), flush=True)


# ---- stage 3: UL transmit (2 encodes + map + pucch + prach)
@jax.jit
@jax.vmap
def ul_tx(tb0, tb1, ack):
    from srsran_project_23_5_tpu.phy.upper import pucch as pucch_proc
    g0 = jnp.zeros((2, 14, cfg.nsc), jnp.complex64)
    g0 = sch.pusch_transmit(tb0, cfg.pusch0, g0)
    g1 = jnp.zeros((14, cfg.nsc), jnp.complex64)
    g1 = sch.pusch_transmit(tb1, cfg.pusch1, g1)
    g2 = jnp.zeros((14, cfg.nsc), jnp.complex64)
    g2 = pucch_proc.pucch_f1_transmit(ack, cfg.pucch, g2)
    return (jnp.abs(g0).sum() + jnp.abs(g1).sum()
            + jnp.abs(g2).sum())


print("ul_tx us/slot:",
      round(sustain(ul_tx, p["tb_ul0"], p["tb_ul1"], p["ack"]), 1),
      flush=True)


# ---- stage 4: UL receive from a synthetic grid (demod + decode both UEs)
@jax.jit
@jax.vmap
def ul_rx(tb0, tb1, key):
    g0 = jnp.zeros((2, 14, cfg.nsc), jnp.complex64)
    g0 = sch.pusch_transmit(tb0, cfg.pusch0, g0)
    g0 = sch.pusch_transmit(tb1, cfg.pusch1, g0)
    nz = 0.1 * jax.random.normal(key, (2, 2, 14, cfg.nsc), jnp.float32)
    rx = g0 + jax.lax.complex(nz[0], nz[1])
    u0 = sch.pusch_receive(rx, cfg.pusch0, cfg.nof_ldpc_iterations)
    u1 = sch.pusch_receive(rx, cfg.pusch1, cfg.nof_ldpc_iterations)
    return u0.tb_crc_ok & u1.tb_crc_ok


print("ul_tx+rx us/slot:",
      round(sustain(ul_rx, p["tb_ul0"], p["tb_ul1"], keyv), 1), flush=True)


# ---- stage 5: LDPC decode kernel alone at the slot's UL CB load
from srsran_project_23_5_tpu.ops.ldpc import decoder_pallas, encoder  # noqa: E402

seg0 = cfg.pusch0.segments
nc = seg0.nof_segments
# approximate: decode B*nc codewords of pusch0's lifting size
from srsran_project_23_5_tpu.ops.ldpc import graphs
gg = graphs.lifted_graph(seg0.base_graph, seg0.lifting_size)
kbits = gg.nof_msg_blocks * seg0.lifting_size
g = encoder.encode(
    jnp.asarray(rng.integers(0, 2, (8, kbits)).astype(np.int8)),
    seg0.base_graph, seg0.lifting_size)
nfull = g.shape[-1]
llr = jnp.asarray(
    (8.0 * (1 - 2 * rng.integers(0, 2, (B * nc, nfull)))).astype(np.float32))


@jax.jit
def dec(llr):
    return decoder_pallas.decode(llr, seg0.base_graph, seg0.lifting_size,
                                 cfg.nof_ldpc_iterations)


_sync(dec(llr))
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    _sync(dec(llr))
    ts.append(time.perf_counter() - t0)
us = (float(np.median(ts)) - OVH) / B * 1e6
print(f"ldpc decode ({nc} CB x Zc{seg0.lifting_size} bg{seg0.base_graph},"
      f" random llr=worst case) us/slot: {us:.1f}", flush=True)


# ---- stage 6: decode with DECODABLE llr (early exit engages)
llr_good = 8.0 * (1.0 - 2.0 * jnp.tile(g[:1], (B * nc, 1)
                                       ).astype(jnp.float32))
_sync(dec(llr_good))
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    _sync(dec(llr_good))
    ts.append(time.perf_counter() - t0)
us = (float(np.median(ts)) - OVH) / B * 1e6
print(f"ldpc decode (decodable, early exit) us/slot: {us:.1f}", flush=True)

# ---- stage 7: the FULL mixed slot as one program, sync per call
fullfn = jax.jit(jax.vmap(lambda pp, k: gnb_mixed.slot_fn_for_pipeline(
    cfg)(pp, k)))
keys = jax.random.split(jax.random.PRNGKey(1), B)
_sync(fullfn(p, keys))
ts = []
for i in range(6):
    kk = jax.random.split(jax.random.PRNGKey(2 + i), B)
    t0 = time.perf_counter()
    _sync(fullfn(p, kk))
    ts.append(time.perf_counter() - t0)
us = (float(np.median(ts)) - OVH) / B * 1e6
print(f"FULL mixed slot us/slot: {us:.1f}", flush=True)
