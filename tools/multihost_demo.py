"""Multi-host (DCN analogue) demo: 2-process jax.distributed CPU run of
the carrier-sharded mixed-slot step (VERDICT r3 next #4; SURVEY §2.7-P6).

Each process owns 4 virtual CPU devices; jax.distributed glues them into
one 8-device global mesh.  The carrier-sharded step then runs SPMD across
both processes — each process computes its local carrier shards and the
verification reduction crosses the process boundary (the DCN path).

Run:  python tools/multihost_demo.py            # spawns both processes
      python tools/multihost_demo.py <pid 0|1>  # worker entry
"""
import os
import subprocess
import sys
import time

NPROC = 2
LOCAL_DEVICES = 4
PORT = int(os.environ.get("MULTIHOST_PORT", "8476"))


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=NPROC, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from srsran_project_23_5_tpu.models import gnb_flagship, gnb_mixed
    from srsran_project_23_5_tpu.ran import numerology

    ndev = len(jax.devices())
    assert ndev == NPROC * LOCAL_DEVICES, ndev
    mesh = Mesh(np.asarray(jax.devices()).reshape(ndev), ("carrier",))
    shard = NamedSharding(mesh, P("carrier"))

    model = os.environ.get("MULTIHOST_MODEL", "mixed")
    if model == "flagship":
        # light per-carrier slot (fast compile) for the pytest path
        cc = gnb_flagship.tiny_carrier()
        nsamp = numerology.slot_num_samples(cc.mu, cc.nfft)
        sigma = float(np.sqrt(cc.nfft) * 10 ** (-20.0 / 20))

        class cfg:
            snr_db = 20.0

        def slot(payloads, key):
            nz = (sigma / np.sqrt(2)) * jax.random.normal(
                key, (2, nsamp), jnp.float32)
            ok, _, sinr = gnb_flagship.loopback_slot(
                payloads["tb"], jax.lax.complex(nz[0], nz[1]), cc, 4)
            return ok, sinr

        def mk_payloads(rng, batch):
            return {"tb": rng.integers(0, 2, size=(batch, cc.sh.tbs)
                                       ).astype(np.int8)}
    else:
        mcfg = gnb_mixed.tiny_mixed()
        cfg = mcfg
        slot = gnb_mixed.slot_fn_for_pipeline(mcfg)

        def mk_payloads(rng, batch):
            return gnb_mixed.make_payloads(mcfg, rng, batch=batch)

    def step(payloads, seeds):
        ok, sinr = jax.vmap(
            lambda p, s: slot(p, jax.random.PRNGKey(s)))(payloads, seeds)
        # cross-process (DCN) reduction: one global verdict
        return jnp.all(ok), jnp.mean(sinr)

    jstep = jax.jit(step, in_shardings=(shard, shard),
                    out_shardings=(NamedSharding(mesh, P()),) * 2)

    rng = np.random.default_rng(0)           # same seed on every process
    host = mk_payloads(rng, ndev)
    payloads = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(shard, np.asarray(x)),
        host)
    seeds = jax.make_array_from_process_local_data(
        shard, np.arange(ndev, dtype=np.uint32))
    with mesh:
        ok, sinr = jstep(payloads, seeds)
    ok = bool(np.asarray(ok))
    sinr = float(np.asarray(sinr))
    print(f"[proc {pid}] {ndev}-device/{NPROC}-process mixed step: "
          f"ok={ok} sinr={sinr:.1f} dB", flush=True)
    assert ok and abs(sinr - cfg.snr_db) < 1.5
    jax.distributed.shutdown()


def main() -> None:
    t0 = time.perf_counter()
    env = dict(os.environ)
    procs = [subprocess.Popen([sys.executable, "-u", __file__, str(pid)],
                              env=env) for pid in range(NPROC)]
    rcs = [p.wait(timeout=900) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    print(f"multihost_demo: {NPROC} processes OK "
          f"({time.perf_counter() - t0:.0f}s)")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        main()
