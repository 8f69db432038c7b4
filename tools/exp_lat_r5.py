"""Latency-budget characterization (VERDICT r4 next #3): for small
dispatch sizes K=1 × B ∈ {1, 16, 32}, measure (a) submission→result
latency of one dispatch on an idle queue, (b) sustained per-slot time
with fire-and-forget pipelining — to find the smallest dispatch that
still beats the 500 µs/slot bar and the tunnel's fixed RTT floor."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("TPU_RAN_RBG", "on").lower() not in ("off", "0"):
    jax.config.update("jax_default_prng_impl", "rbg")

from srsran_project_23_5_tpu.models import gnb_mixed
from srsran_project_23_5_tpu.phy import pipeline


def probe(B, ndisp=64, nlat=16):
    cfg = gnb_mixed.default_mixed()
    pipe = pipeline.SlotPipeline(
        pipeline.PipelineConfig(carrier=None, slots_per_batch=B, depth=3,
                                snr_db=20.0, scan_batches=1),
        batch_fn=gnb_mixed.batch_fn_for_pipeline(cfg))
    rng = np.random.default_rng(0)
    payloads = jax.device_put(gnb_mixed.make_payloads(cfg, rng, batch=B))
    jax.block_until_ready(payloads)
    t0 = time.perf_counter()
    cs, ok, sinr = pipe.warmup_scan(payloads)
    lat = np.asarray([pipe.dispatch_latency(payloads, 1000 + i)
                      for i in range(nlat)]) * 1e3
    for i in range(4):
        pipe.submit_scan(payloads, 2000 + i)
    pipe.fetch_accumulated()
    t0 = time.perf_counter()
    for i in range(ndisp):
        pipe.submit_scan(payloads, 3000 + i)
    okk, s, n = pipe.fetch_accumulated()
    sus = (time.perf_counter() - t0) / n * 1e6
    print(f"B={B:3d}: compile={cs:5.1f}s ok={ok}/{okk} "
          f"lat p50={np.percentile(lat, 50):6.2f} ms "
          f"p99={np.percentile(lat, 99):6.2f} ms "
          f"sustained={sus:7.1f} us/slot", flush=True)


if __name__ == "__main__":
    for b in [int(x) for x in os.environ.get("BS", "1,16,32").split(",")]:
        probe(b)
