"""Multi-process (DCN analogue) coverage: 2 jax.distributed CPU processes
run the carrier-sharded loopback step SPMD with a cross-process
verification reduction (VERDICT r3 next #4; SURVEY §2.7-P6/§5.8).

The subprocess entry lives in tools/multihost_demo.py; the heavier mixed
model variant of the same script is exercised out-of-suite (driver/bench
side) — here the light flagship slot keeps the suite fast.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_step():
    env = dict(os.environ)
    env["MULTIHOST_MODEL"] = "flagship"
    env["MULTIHOST_PORT"] = "8477"
    # a clean env for the subprocesses: the parent pytest pins
    # JAX_PLATFORMS=cpu already; the workers re-pin defensively
    out = subprocess.run(
        [sys.executable, "-u",
         os.path.join(REPO, "tools", "multihost_demo.py")],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "2 processes OK" in out.stdout
    assert out.stdout.count("ok=True") == 2
