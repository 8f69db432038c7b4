"""Second-stage axon bisect: which primitive hangs / is UNIMPLEMENTED."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

which = sys.argv[1]
t0 = time.perf_counter()


def dev_c(shape, seed=0):
    k = jax.random.PRNGKey(seed)
    a = jax.random.normal(k, (2, *shape), jnp.float32)
    return a  # build complex inside jit


if which == "einsum":
    @jax.jit
    def f(a, b):
        x = jax.lax.complex(a[0], a[1])
        y = jax.lax.complex(b[0], b[1])
        return jnp.einsum("ij,jk->ik", x, y)
    print(np.asarray(f(dev_c((4, 4)), dev_c((4, 8), 1))).sum())
elif which == "mulsum":
    @jax.jit
    def f(a, b):
        x = jax.lax.complex(a[0], a[1])       # [2,2]
        y = jax.lax.complex(b[0], b[1])       # [2,N]
        return (x[:, :, None] * y[None, :, :]).sum(axis=1)
    print(np.asarray(f(dev_c((2, 2)), dev_c((2, 64), 1))).sum())
elif which == "cconst":
    c = np.exp(1j * np.arange(8)).astype(np.complex64)

    @jax.jit
    def f(a):
        x = jax.lax.complex(a[0], a[1])
        return x * jnp.asarray(c)
    print(np.asarray(f(dev_c((8,)))).sum())
elif which == "cconst_planes":
    c = np.exp(1j * np.arange(8)).astype(np.complex64)

    @jax.jit
    def f(a):
        x = jax.lax.complex(a[0], a[1])
        cc = jax.lax.complex(jnp.asarray(c.real), jnp.asarray(c.imag))
        return x * cc
    print(np.asarray(f(dev_c((8,)))).sum())
elif which == "polar":
    from srsran_project_23_5_tpu.ops.polar import code as pcode
    from srsran_project_23_5_tpu.ops.polar import encoder as penc
    code = pcode.polar_code(64, 108, nmax_log=9)

    @jax.jit
    def f(bits):
        u = penc.allocate(bits[None], code.info_set, code.n)
        return penc.encode(u)
    print(np.asarray(f(jnp.zeros((64,), jnp.int8))).sum())
elif which == "crc":
    from srsran_project_23_5_tpu.ops import crc as crc_ops

    @jax.jit
    def f(bits):
        return crc_ops.crc(bits[None], "crc24C")
    print(np.asarray(f(jnp.zeros((64,), jnp.int8))).sum())
elif which == "gold_qpsk":
    from srsran_project_23_5_tpu.ops import gold

    @jax.jit
    def f(z):
        c = gold.gold_sequence(jnp.uint32(123), 288).astype(jnp.float32)
        pil = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
        return pil + jax.lax.complex(z, jnp.float32(0))
    print(np.asarray(f(jnp.float32(0))).sum())
elif which == "modulate1":
    from srsran_project_23_5_tpu.ops import modulation

    @jax.jit
    def f(bits):
        return modulation.modulate(bits, 1)
    print(np.asarray(f(jnp.zeros((4,), jnp.int8))).sum())
elif which == "shortblock":
    from srsran_project_23_5_tpu.ops import short_block

    @jax.jit
    def f(llr):
        return short_block.detect(llr, 4, llr.shape[-1])
    print([np.asarray(o).sum() for o in f(jnp.ones((32,), jnp.float32))])
elif which == "ifftpad":
    @jax.jit
    def f(a):
        x = jax.lax.complex(a[0], a[1])
        pad = jnp.zeros((2048 - 139,), x.dtype)
        return jnp.abs(jnp.fft.ifft(jnp.concatenate([x, pad]))) ** 2
    print(np.asarray(f(dev_c((139,)))).sum())
elif which == "dynslice":
    @jax.jit
    def f(a):
        x = jax.lax.complex(a[0], a[1])
        p = jnp.abs(x) ** 2
        return jax.lax.dynamic_slice_in_dim(p, 5, 64, axis=-1)
    print(np.asarray(f(dev_c((2048,)))).sum())

print(f"{which}: ok {time.perf_counter() - t0:.1f}s", flush=True)

if which == "rm":
    from srsran_project_23_5_tpu.ops.polar import code as pcode
    from srsran_project_23_5_tpu.ops.polar import encoder as penc
    from srsran_project_23_5_tpu.ops.polar import rate_match as prm
    code = pcode.polar_code(56, 864, nmax_log=9)   # PBCH shape: repetition

    @jax.jit
    def f(bits):
        u = penc.allocate(bits[None], code.info_set, code.n)
        x = penc.encode(u)
        return prm.match(x, code)
    print(np.asarray(f(jnp.zeros((56,), jnp.int8))).sum())
    print(f"rm: ok {time.perf_counter() - t0:.1f}s", flush=True)
elif which == "ssb_struct":
    # comb-row assembly WITHOUT the pbch chain: dummy QPSK from arg bits
    from srsran_project_23_5_tpu.ops import modulation
    from srsran_project_23_5_tpu.phy.upper import ssb as sp
    cfg = sp.SsbConfig(pci=123)

    @jax.jit
    def f(bits):
        syms = modulation.modulate(bits, 2)
        pil = sp.dmrs_pbch_pilots(cfg)
        v = cfg.pci % 4
        dcols = [j for j in range(4) if j != v]

        def comb_rows(data_chunk, pil_chunk, nquad):
            cols = [None] * 4
            cols[v] = pil_chunk
            for i, j in enumerate(dcols):
                cols[j] = data_chunk[i::3]
            return jnp.stack(cols, axis=-1).reshape(nquad * 4)
        row1 = comb_rows(syms[:180], pil[0:120:2], 60)
        return row1
    print(np.asarray(f(jnp.zeros((864,), jnp.int8))).sum())
    print(f"ssb_struct: ok {time.perf_counter() - t0:.1f}s", flush=True)
elif which == "scramble":
    # int8 np-constant XOR + payload interleave gather (pbch_encode front)
    from srsran_project_23_5_tpu.phy.upper import ssb as sp
    cfg = sp.SsbConfig(pci=123)

    @jax.jit
    def f(payload):
        a = sp._payload_interleave(payload)
        return a ^ jnp.asarray(sp._first_scrambling_seq(cfg))
    print(np.asarray(f(jnp.zeros((32,), jnp.int8))).sum())
    print(f"scramble: ok {time.perf_counter() - t0:.1f}s", flush=True)

if which == "fstride3":
    @jax.jit
    def f(a):          # float stride-3 slice + 4-col interleave
        x = a[..., 0::3]
        y = a[..., 1::3]
        z = a[..., 2::3]
        st = jnp.stack([x, y, z, x], axis=-1)
        return st.reshape(-1)
    print(np.asarray(f(jnp.ones((240,), jnp.float32))).sum())
    print(f"fstride3: ok {time.perf_counter() - t0:.1f}s", flush=True)
elif which == "cstride3":
    @jax.jit
    def f(a):
        x = jax.lax.complex(a, a)
        return x[..., 0::3]
    print(np.asarray(f(jnp.ones((240,), jnp.float32))).sum())
    print(f"cstride3: ok {time.perf_counter() - t0:.1f}s", flush=True)
elif which == "ctrans":
    @jax.jit
    def f(a):          # complex reshape+swapaxes (layer_map shape)
        x = jax.lax.complex(a, 2 * a)
        lay = x.reshape(-1, 2).swapaxes(-1, -2)
        return lay[0] + lay[1]
    print(np.asarray(f(jnp.ones((256,), jnp.float32))).sum())
    print(f"ctrans: ok {time.perf_counter() - t0:.1f}s", flush=True)
