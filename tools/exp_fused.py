"""Experiment: fused whole-chain program vs sum-of-stages; ET on/off."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srsran_project_23_5_tpu.models import gnb_flagship
from srsran_project_23_5_tpu.ops.ldpc import decoder_pallas
from srsran_project_23_5_tpu.phy.lower import ofdm
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import numerology, tbs as tbs_mod

B = 32
NDISP = 8
nof_prb, qm = 273, 6
tbs = tbs_mod.tbs_calculate(14, 36, 0, 0.6533, qm, 1, nof_prb)
cfg = gnb_flagship.CarrierConfig(
    mu=1, nfft=numerology.min_nfft(nof_prb), nof_prb=nof_prb,
    sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=qm, nof_prb=nof_prb,
                    dmrs_symbols=(2, 7, 11)))
c = cfg.sh
seg = c.segments
ss = numerology.slot_num_samples(cfg.mu, cfg.nfft)
sigma = float(np.sqrt(cfg.nfft) * 10 ** (-20.0 / 20))
rng = np.random.default_rng(0)
tb_b = jax.device_put(jnp.asarray(
    rng.integers(0, 2, size=(B, tbs)).astype(np.int8)))
key_sets = [jax.device_put(jax.random.split(jax.random.PRNGKey(i), B))
            for i in range(NDISP)]
jax.block_until_ready(key_sets)


def run(name, step):
    t0 = time.perf_counter()
    out = step(tb_b, key_sets[0])
    jax.block_until_ready(out)
    cs = time.perf_counter() - t0
    outs = [step(tb_b, ks) for ks in key_sets[:2]]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [step(tb_b, ks) for ks in key_sets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (NDISP * B) * 1e6
    ok = np.asarray(outs[0][0])
    print(f"{name:>24}: {dt:9.1f} us/slot  compile {cs:5.1f}s "
          f"ok={ok.all()}", flush=True)


def make_slot(et, iters=6, decode=True):
    def slot_fn(tb_bits, key):
        bb = gnb_flagship.tx_slot(tb_bits, cfg)
        nz = (sigma / np.sqrt(2)) * jax.random.normal(key, (2, ss),
                                                      jnp.float32)
        rx = bb + jax.lax.complex(nz[0], nz[1])
        grid = ofdm.demodulate_slot(rx, cfg.nsc, cfg.mu, cfg.nfft)
        d = sch.pusch_demodulate(grid[None], c)
        if not decode:
            return jnp.sum(d.llr_full) > -1e30, d.noise_var
        bits, ok = decoder_pallas.decode(d.llr_full, seg.base_graph,
                                         seg.lifting_size,
                                         nof_iterations=iters,
                                         early_termination=et)
        from srsran_project_23_5_tpu.ops.ldpc import segmentation
        tb, tb_ok, _ = segmentation.desegment_rx(bits, seg)
        return tb_ok & jnp.all(ok), d.noise_var
    return jax.jit(jax.vmap(slot_fn))


run("fused nodecode", make_slot(True, decode=False))
run("fused ET6", make_slot(True, 6))
run("fused fixed6", make_slot(False, 6))
run("fused fixed2", make_slot(False, 2))
print("done", flush=True)
