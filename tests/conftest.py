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
