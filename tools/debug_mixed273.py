"""Debug: flagship 273-PRB mixed slot on CPU, all diagnostics printed."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from srsran_project_23_5_tpu.models import gnb_mixed  # noqa: E402

cfg = gnb_mixed.default_mixed()
print("tbs", cfg.pdsch0.tbs, cfg.pdsch1.tbs, cfg.pusch0.tbs,
      cfg.pusch1.tbs, flush=True)
rng = np.random.default_rng(0)
payloads = gnb_mixed.make_payloads(cfg, rng)
fn = jax.jit(lambda p, k: gnb_mixed.mixed_slot_dict(p, k, cfg))
out = fn(payloads, jax.random.PRNGKey(0))
for k, v in sorted(out.items()):
    print(f"{k:>14}: {np.asarray(v)}", flush=True)
