"""Characterize the HARQ retx combine operating point on the flagship
mixed slot (real TPU): sweep snr1 and report first/retx/combined TB-ok
rates for both PUSCH UEs.  Picks the bench's BENCH_HARQ_SNR_DB."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("TPU_RAN_RBG", "on").lower() not in ("off", "0"):
    jax.config.update("jax_default_prng_impl", "rbg")

from srsran_project_23_5_tpu.models import gnb_mixed

B = int(os.environ.get("HB", "8"))


def main():
    cfg = gnb_mixed.default_mixed()
    rng = np.random.default_rng(0)
    payloads = jax.device_put(gnb_mixed.make_payloads(cfg, rng, batch=B))

    for snr1 in [float(x) for x in
                 os.environ.get("SNRS", "11,12,12.5,13,13.5,14").split(",")]:
        fn = jax.jit(lambda p, k: gnb_mixed.harq_retx_batch(p, k, cfg, snr1))
        t0 = time.perf_counter()
        keys = jax.random.split(jax.random.PRNGKey(int(snr1 * 10)), B)
        out = jax.block_until_ready(fn(payloads, keys))
        dt = time.perf_counter() - t0
        msg = f"snr1={snr1:5.1f} compile+run={dt:6.1f}s"
        for name in ("u0", "u1"):
            o = {k: float(np.mean(np.asarray(v)))
                 for k, v in out[name].items()}
            msg += (f" | {name}: first={o['first_ok']:.2f}"
                    f" retx={o['retx_ok']:.2f} comb={o['combined_ok']:.2f}")
        print(msg, flush=True)


if __name__ == "__main__":
    main()
