"""Minimal repro: XLA:CPU persistent-compilation-cache WRITE segfault.

Upstream-facing repro for the crash that shaped this repo's cache policy
(utils/cache.py, tests/conftest.py): on jax 0.9.0 / XLA:CPU, serializing
a sufficiently LARGE CPU executable into the persistent compilation cache
(`jax_compilation_cache_dir`) crashes the process inside
`compilation_cache.put_executable_and_time` — the same program compiles
and runs fine with the cache off, and the TPU backend serializes the same
graphs without issue.

The child process below builds a large-but-plain program (a lax.scan whose
body is a wide unrolled chain of slices/dots — no Pallas, no custom
calls), jits it with the cache enabled, and runs it.  The parent reports:

  rc == 0          : no crash (not reproduced at this size; bump WIDTH)
  rc < 0 (SIGSEGV) : reproduced — crash during/after cache write

Run: python tools/repro_xla_cpu_cache_segfault.py [width]
Default width reproduces on the 2-core reference box in ~2-4 min.
First observed 2026-08-21 with this repo's tiny-mixed ue_decode program;
this script removes every repo dependency for an upstream filing.
"""
import os
import signal
import subprocess
import sys
import tempfile

CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

WIDTH = int(sys.argv[2])   # number of distinct ops in the scan body

def body(carry, _):
    x = carry
    acc = jnp.zeros_like(x)
    # WIDTH distinct slice+dot+update ops -> a large executable; each
    # iteration differs (distinct constants) so nothing deduplicates
    for i in range(WIDTH):
        w = jnp.float32(1.0 + i)
        seg = jax.lax.dynamic_slice_in_dim(x, (i * 7) % 64, 64, axis=0)
        acc = jax.lax.dynamic_update_slice_in_dim(
            acc, seg * w + jnp.tanh(seg), (i * 13) % 64, axis=0)
    return acc / jnp.float32(WIDTH), jnp.sum(acc)

def fn(x):
    y, s = jax.lax.scan(body, x, jnp.arange(4))
    return jnp.sum(y) + jnp.sum(s)

x = jnp.asarray(np.random.default_rng(0).standard_normal((128, 256)),
                jnp.float32)
print("compiling...", flush=True)
out = jax.jit(fn)(x)
jax.block_until_ready(out)
print("OK", float(out), flush=True)
"""


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    with tempfile.TemporaryDirectory() as cache_dir:
        r = subprocess.run([sys.executable, "-u", "-c", CHILD, cache_dir,
                            str(width)], timeout=1800)
    rc = r.returncode
    if rc < 0:
        sig = signal.Signals(-rc).name
        print(f"REPRODUCED: child died with {sig} (rc={rc}) while the "
              f"persistent cache serialized a width-{width} CPU executable")
    elif rc == 0:
        print(f"not reproduced at width={width}: child exited cleanly — "
              f"retry with a larger width (e.g. {width * 2})")
    else:
        print(f"child exited rc={rc} (not a signal) — see output above")
    sys.exit(0 if rc != 0 else 1)


if __name__ == "__main__":
    main()
