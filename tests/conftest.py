"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py; unit tests favor determinism
and multi-device sharding coverage (mirrors the driver's dryrun_multichip
environment).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
# XLA:CPU compile time dominates the suite (the mixed-slot program alone
# costs ~35 s at the default optimization level).  The unit suite checks
# CORRECTNESS — turning the backend optimizer off cuts the wall clock by
# ~40% (mixed-slot file: 88 s -> 55 s) with identical results.  Opt out
# (e.g. for CPU perf probes) with TPU_RAN_TEST_XLA_OPT=1.
if ("xla_backend_optimization_level" not in flags
        and not os.environ.get("TPU_RAN_TEST_XLA_OPT")):
    flags = flags + " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

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
# NOTE: the persistent compilation cache stays OFF for the CPU suite —
# serializing very large XLA:CPU executables segfaults in
# compilation_cache.put_executable_and_time (reproduced 2026-08-21 on the
# tiny-mixed ue_decode program).  TPU (bench.py) runs keep the cache on.
# Opt in here at your own risk with TPU_RAN_JAX_CACHE=<dir>.
_cache = os.environ.get("TPU_RAN_JAX_CACHE", "")
if _cache and _cache.lower() not in ("off", "0", "no"):
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# XLA:CPU has segfaulted compiling the LARGE LDPC-decoder graphs late in a
# long suite run (after ~200 tests of accumulated compilations) while the
# same tests pass standalone.  Order the compile-heavy PHY modules first so
# every big compile happens early; the host-side L2/L3 tests that follow
# compile nothing.
_HEAVY_FIRST = (
    "test_mimo", "test_bler_waterfall", "test_estimator_ta",
    "test_e2e_loopback", "test_pipeline", "test_upper_phy", "test_ldpc",
    "test_ldpc_pallas", "test_conformance_sweep", "test_gnb_app",
    "test_pdcch_ssb", "test_pucch", "test_uci_prach", "test_ulsch_uci",
    "test_lower_aux", "test_polar", "test_foundations",
)


def pytest_collection_modifyitems(config, items):
    rank = {name: i for i, name in enumerate(_HEAVY_FIRST)}
    items.sort(key=lambda it: rank.get(it.module.__name__,
                                       len(_HEAVY_FIRST)))


import pytest  # noqa: E402

_last_module = [None]


@pytest.fixture(autouse=True)
def _drop_compiled_programs_between_modules(request):
    """The segfault above tracks accumulated executable count, so release
    every compiled program when the suite moves to the next test module
    (costs re-compiles of shared shapes; buys a bounded live-executable
    set)."""
    mod = request.module.__name__
    if _last_module[0] is not None and mod != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = mod
    yield
