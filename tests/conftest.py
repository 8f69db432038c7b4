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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compiled-kernel cache (the analogue of the reference's FFTW
# wisdom file, SURVEY.md §5.4) — makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_ran_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
