"""AOT program store: export round-trip, store hit, fingerprinting."""
import jax
import jax.numpy as jnp
import numpy as np

from srsran_project_23_5_tpu.utils import program_store


def test_load_or_trace_roundtrip(tmp_path):
    store = program_store.ProgramStore(root=str(tmp_path))

    @jax.jit
    def f(x):
        return jnp.fft.fft(x).real.sum() + 2.0 * x.sum()

    x = jnp.arange(64, dtype=jnp.float32)
    g = store.load_or_trace("fft_sum", f, x)
    assert store.has("fft_sum")
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(f(x)),
                               rtol=1e-5)

    # warm path: a fresh store object must LOAD (not re-trace) — trace
    # would fail loudly if called, so stub the traced fn with a poison
    store2 = program_store.ProgramStore(root=str(tmp_path))

    def poison(*a):
        raise AssertionError("re-traced instead of loading the blob")

    g2 = store2.load_or_trace("fft_sum", poison, x)
    np.testing.assert_allclose(np.asarray(g2(x)), np.asarray(f(x)),
                               rtol=1e-5)


def test_fingerprint_partitions_store(tmp_path):
    """Blobs live under a source fingerprint: code changes isolate them."""
    store = program_store.ProgramStore(root=str(tmp_path))
    fp = program_store.source_fingerprint()
    assert fp in store.root
    assert len(fp) == 16
    # deterministic across calls
    assert program_store.source_fingerprint() == fp
