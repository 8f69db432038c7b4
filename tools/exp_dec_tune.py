"""Decoder tuning experiment: bf16 c2v storage + B_TILE sweep at batch."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srsran_project_23_5_tpu.models import gnb_flagship
from srsran_project_23_5_tpu.phy.lower import ofdm
from srsran_project_23_5_tpu.phy.upper import sch
from srsran_project_23_5_tpu.ran import numerology, tbs as tbs_mod
from srsran_project_23_5_tpu.ops.ldpc import decoder_pallas, segmentation

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
sigma = float(np.sqrt(cfg.nfft) * 10 ** (-1.0))
rng = np.random.default_rng(0)
tb_b = jax.device_put(jnp.asarray(
    rng.integers(0, 2, size=(B, tbs)).astype(np.int8)))
keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), B))

# realistic 20 dB LLRs
front = jax.jit(jax.vmap(lambda t, k: sch.pusch_demodulate(
    ofdm.demodulate_slot(
        gnb_flagship.tx_slot(t, cfg)
        + jax.lax.complex(*((sigma / np.sqrt(2))
                            * jax.random.normal(k, (2, ss), jnp.float32))),
        cfg.nsc, cfg.mu, cfg.nfft)[None], c).llr_full))
full = front(tb_b, keys)
jax.block_until_ready(full)
print("front done", flush=True)


def run(name, fn, *args):
    outs = [fn(*args) for _ in range(2)]
    jax.block_until_ready(outs)
    ok = np.asarray(outs[0][1]).all()
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(NDISP)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (NDISP * B) * 1e6
    print(f"{name:>28}: {dt:9.1f} us/slot ok={ok}", flush=True)


for et in (True, False):
    f = jax.jit(jax.vmap(lambda fl, et=et: decoder_pallas.decode(
        fl, seg.base_graph, seg.lifting_size, nof_iterations=6,
        early_termination=et)))
    run(f"pallas et={et}", f, full)
print("done", flush=True)
