"""AOT program store — trace-once, warm-start-anywhere slot programs.

The FFTW-wisdom analogue (SURVEY §5.4) has two layers on TPU:

1. the JAX persistent compilation cache (utils/cache.py) — caches the
   XLA *executable* bytes, skipping device compilation; and
2. this store — caches the serialized `jax.export` artifact (StableHLO
   + calling convention) of a named program, skipping Python *tracing*
   (which costs ~8-9 s for the full 273-PRB mixed-slot scan program).

A warm start loads the exported blob (deserialize ≈0.4 s) and compiles
`exported.call` — whose executable the persistent cache already holds
from the run that wrote the blob — measured end-to-end on the flagship
scan program: 33.5 s cold → ≈2.5 s warm (VERDICT r4 next #8).

Staleness: blobs live under `.jax_cache/programs/<source-fingerprint>/`
where the fingerprint hashes every `.py` file of this package, so ANY
code change invalidates the whole store (exactly like recompiling after
editing FFTW's planner inputs).  The reference's analogue is its FFTW
wisdom file handling (lib/phy/generic_functions/dft_processor_fftw_impl.cpp).
"""
from __future__ import annotations

import hashlib
import os
import tempfile


def source_fingerprint() -> str:
    """Hash of every .py source file in this package (content, ordered)."""
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for root, dirs, files in sorted(os.walk(base)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for fn in sorted(files):
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                h.update(os.path.relpath(p, base).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:16]


class ProgramStore:
    """Named store of `jax.export`ed programs, keyed by package version."""

    def __init__(self, root: str | None = None) -> None:
        if root is None:
            base = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            root = os.path.join(base, ".jax_cache", "programs")
        self.root = os.path.join(root, source_fingerprint())
        os.makedirs(self.root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name + ".jaxexport")

    def has(self, name: str) -> bool:
        return os.path.exists(self.path(name))

    def load_or_trace(self, name: str, jitted_fn, *example_args):
        """Return a jitted callable for `name`.

        Warm path: deserialize the stored export and jit its `.call`
        (the executable comes from the persistent compilation cache).
        Cold path: trace+export `jitted_fn` on `example_args`, persist
        the blob, and STILL return the exported `.call` wrapper so the
        executable cached under that key is the one every later warm
        start loads.
        """
        import jax
        from jax import export as jexport

        p = self.path(name)
        if os.path.exists(p):
            with open(p, "rb") as f:
                exp = jexport.deserialize(f.read())
        else:
            exp = jexport.export(jitted_fn)(*example_args)
            blob = exp.serialize()
            fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, p)  # atomic: concurrent processes race safely
        return jax.jit(exp.call)


_default: ProgramStore | None = None


def default_store() -> ProgramStore:
    global _default
    if _default is None:
        _default = ProgramStore()
    return _default
