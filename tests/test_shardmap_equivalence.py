"""Flagship-shape shard_map equivalence (VERDICT r4 weak #9 / next #10).

The production carrier-sharded step runs with check_vma=False (the LDPC
while_loop carry trips the varying-axis bookkeeping), so this test pins
the guarantee that waiver leans on: per-shard execution over the mesh
produces the SAME per-carrier verdicts and SINRs as unsharded
single-device execution of the identical slot function, at the full
273-PRB mixed-slot shape (__graft_entry__._mixed_carrier_step).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_shardmap_matches_single_device_flagship_shape():
    import __graft_entry__ as ge
    from srsran_project_23_5_tpu.models import gnb_mixed
    from srsran_project_23_5_tpu.parallel import mesh as mesh_lib

    jax.clear_caches()     # XLA:CPU faults on accumulated giant compiles
    n = len(jax.devices())
    assert n >= 2, "needs the 8-device CPU mesh (tests/conftest.py)"

    cfg = gnb_mixed.default_mixed()          # flagship 273-PRB bucket
    rng = np.random.default_rng(0)
    payloads = gnb_mixed.make_payloads(cfg, rng, batch=n)
    seeds = jnp.arange(n, dtype=jnp.uint32)

    mesh = mesh_lib.make_mesh(n)
    step = ge._mixed_carrier_step(cfg, mesh)
    with mesh:
        ok_sh, sinr_sh = step(payloads, seeds)
    ok_sh = np.asarray(ok_sh)
    sinr_sh = np.asarray(sinr_sh)

    # reference: the same slot function, unsharded, one carrier at a time
    # (the globally-vmapped 273-PRB program exhausts XLA:CPU's LLVM stage,
    # so the single-device reference reuses ONE per-carrier executable)
    jax.clear_caches()
    slot = jax.jit(lambda p, s: gnb_mixed.slot_fn_for_pipeline(cfg)(
        p, jax.random.PRNGKey(s)))
    ok_ref, sinr_ref = [], []
    for c in range(n):
        p_c = jax.tree.map(lambda x: x[c], payloads)
        ok_c, sinr_c = slot(p_c, seeds[c])
        ok_ref.append(bool(np.asarray(ok_c)))
        sinr_ref.append(float(np.asarray(sinr_c)))

    assert ok_sh.tolist() == ok_ref, (ok_sh, ok_ref)
    assert ok_sh.all()
    np.testing.assert_allclose(sinr_sh, np.asarray(sinr_ref), atol=1e-3)
