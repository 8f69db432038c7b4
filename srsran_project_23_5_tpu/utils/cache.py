"""Persistent XLA compilation cache — the FFTW-wisdom analogue
(SURVEY §5.4).  Validated working cross-process on jax 0.9.0 (the
r2-era deserialization segfault is gone).  Opt out: TPU_RAN_JAX_CACHE=off.
"""
from __future__ import annotations

import os


def enable_default_cache(root: str | None = None) -> None:
    import jax

    cache = os.environ.get("TPU_RAN_JAX_CACHE", "")
    if cache.lower() in ("off", "0", "no"):
        return
    if not cache:
        base = root or os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache = os.path.join(base, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
