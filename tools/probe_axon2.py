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
        return pil + z
    print(np.asarray(f(jnp.complex64(0))).sum())
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
