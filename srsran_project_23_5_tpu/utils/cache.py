"""Persistent XLA compilation cache — the FFTW-wisdom analogue
(SURVEY §5.4).

Scope: TPU(axon) executables only.  Cache READS and TPU-side writes are
safe on jax 0.9.0, but serializing very large XLA:CPU executables
segfaults in `compilation_cache.put_executable_and_time` (reproduced
2026-08-21 with the tiny-mixed ue_decode program; the r2-era crash was
the read path of the same subsystem).  CPU runs therefore skip the
cache unless TPU_RAN_JAX_CACHE is set explicitly.
"""
from __future__ import annotations

import os


def enable_default_cache(root: str | None = None,
                         allow_cpu: bool = False) -> None:
    import jax

    cache = os.environ.get("TPU_RAN_JAX_CACHE", "")
    if cache.lower() in ("off", "0", "no"):
        return
    if not cache and not allow_cpu:
        try:
            if jax.default_backend() == "cpu":
                return
        except Exception:
            return
    if not cache:
        base = root or os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache = os.path.join(base, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Keep Python call-stack locations OUT of the lowered modules: the
    # Mosaic (Pallas) kernel payload embeds caller source locations in
    # its serialized module, which the cache key hashes (the outer
    # StableHLO is strip-debuginfo'd, the inner Mosaic module is not) —
    # so ANY caller-side line shift used to produce a fresh cache key
    # and a full recompile.  Measured: with this limit a line-shifted
    # entry script hits the same scan_step entry (33.5 s -> 11.2 s).
    jax.config.update("jax_traceback_in_locations_limit", 0)
