"""Probe axon hazards per mixed-slot component; grids created INSIDE jit
(complex64 host->device transfer and complex np constants are known
hazards on this backend)."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

which = sys.argv[1] if len(sys.argv) > 1 else "const"
t0 = time.perf_counter()

if which == "const":
    c = np.asarray([[0.8, 0.6j], [-0.6j, 0.8]], np.complex64)

    @jax.jit
    def f(xr):
        x = jax.lax.complex(xr, jnp.zeros_like(xr))
        return jnp.einsum("ij,j->i", jnp.asarray(c), x)

    print("const", np.asarray(f(jnp.ones((2,), jnp.float32))), flush=True)
elif which == "const2":
    # complex constant via float planes + lax.complex (proposed fix)
    c = np.asarray([[0.8, 0.6j], [-0.6j, 0.8]], np.complex64)

    @jax.jit
    def f(xr):
        cc = jax.lax.complex(jnp.asarray(c.real), jnp.asarray(c.imag))
        x = jax.lax.complex(xr, jnp.zeros_like(xr))
        return jnp.einsum("ij,j->i", cc, x)

    print("const2", np.asarray(f(jnp.ones((2,), jnp.float32))), flush=True)
elif which == "pucch":
    from srsran_project_23_5_tpu.phy.upper import pucch as pp
    cfg = pp.PucchF1Config(prb=2)

    @jax.jit
    def f(bits):
        g = pp.pucch_f1_transmit(bits, cfg,
                                 jnp.zeros((14, 48), jnp.complex64))
        r = pp.pucch_f1_detect(g, cfg)
        return r.detected, r.bits

    out = f(jnp.zeros((1,), jnp.int8))
    print("pucch", [np.asarray(o) for o in out], flush=True)
elif which == "prach":
    from srsran_project_23_5_tpu.ops import prach as po

    @jax.jit
    def f(z):
        grid = jnp.zeros((14, 160), jnp.complex64) + z
        pre = jnp.asarray(po.generate(22, 3, 139, 13))
        g = grid.at[0:12, 0:139].set(pre[None])
        bins = jnp.mean(g[0:12, 0:139], axis=0)
        m, d, _ = po.detect(bins, 22, 139, 13)
        return m

    print("prach", np.asarray(f(jnp.float32(0))).round(1), flush=True)
elif which == "ssb":
    from srsran_project_23_5_tpu.phy.upper import ssb as sp

    @jax.jit
    def f(payload):
        return sp.ssb_assemble(payload, sp.SsbConfig(pci=123))

    print("ssb", np.asarray(f(jnp.zeros((32,), jnp.int8))).sum().round(2),
          flush=True)
elif which == "pdcch":
    from srsran_project_23_5_tpu.phy.upper import pdcch as pc
    cfg = pc.PdcchConfig(rnti=0x4601, payload_size=40)

    @jax.jit
    def f(payload):
        return pc.pdcch_transmit(payload, cfg,
                                 jnp.zeros((14, 48 * 12), jnp.complex64))

    print("pdcch", np.asarray(f(jnp.zeros((40,), jnp.int8))).sum().round(2),
          flush=True)
elif which == "csirs":
    from srsran_project_23_5_tpu.phy.upper import csi_rs as cr

    @jax.jit
    def f(z):
        grid = jnp.zeros((14, 96), jnp.complex64) + z
        return cr.generate(cr.CsiRsConfig(row=2, nof_prb=8, symbol=5),
                           grid)

    print("csirs", np.asarray(f(jnp.float32(0))).sum().round(2), flush=True)

print(f"{which}: {time.perf_counter() - t0:.1f}s", flush=True)
