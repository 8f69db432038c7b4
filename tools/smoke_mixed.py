"""Dev smoke: tiny mixed slot on CPU, all checks printed."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from srsran_project_23_5_tpu.models import gnb_mixed

cfg = gnb_mixed.tiny_mixed(ue_decode_dl=("--decode" in sys.argv))
print("nfft", cfg.nfft, "nsc", cfg.nsc,
      "tbs", cfg.pdsch0.tbs, cfg.pdsch1.tbs, cfg.pusch0.tbs, cfg.pusch1.tbs)
rng = np.random.default_rng(0)
payloads = gnb_mixed.make_payloads(cfg, rng)
fn = jax.jit(lambda p, k: gnb_mixed.mixed_slot_dict(p, k, cfg))
out = fn(payloads, jax.random.PRNGKey(0))
for k, v in sorted(out.items()):
    print(f"{k:>14}: {np.asarray(v)}")
assert bool(out["ok"]), "mixed slot failed"
print("OK")
