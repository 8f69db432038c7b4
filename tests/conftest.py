"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py; unit tests favor determinism
and multi-device sharding coverage (mirrors the driver's dryrun_multichip
environment).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import resource

# XLA:CPU compilation of the large LDPC-decoder graphs has segfaulted in
# long-lived suite processes (crash inside backend_compile_and_load with
# plenty of free RAM) — consistent with compiler stack exhaustion.  Lift
# the stack ceiling so the main thread's stack can grow past 8 MiB.
try:
    resource.setrlimit(resource.RLIMIT_STACK,
                       (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: the jax persistent compilation cache is deliberately NOT enabled:
# on this jax build, deserializing cache entries written by another
# process segfaults the interpreter (observed twice in full-suite runs,
# crash inside compilation_cache.get_executable_and_time).  Re-compiling
# is slower but safe; opt in via TPU_RAN_JAX_CACHE=<dir> at your own risk.
_cache = os.environ.get("TPU_RAN_JAX_CACHE")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
