"""Demo: one full mixed slot end-to-end (the r4 flagship program).

Runs the complete per-slot channel mix — DL: PDCCH×2 + SSB + CSI-RS +
2×PDSCH (one 2-layer MIMO); UL: 2×PUSCH (one 2×2) + PUCCH F1 + PRACH —
through unitary channels at a calibrated SNR and prints every
verification output.  CPU by default; pass --tpu to use the default
(axon) platform.

    python examples/mixed_slot_demo.py [--tpu] [--prb 273] [--snr 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from srsran_project_23_5_tpu.utils.cache import enable_default_cache


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--prb", type=int, default=68)
    ap.add_argument("--snr", type=float, default=20.0)
    args = ap.parse_args()
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    enable_default_cache()

    from srsran_project_23_5_tpu.models import gnb_mixed

    qm, rate = (2, 0.5) if args.prb < 100 else (6, 0.6533)
    cfg = gnb_mixed.default_mixed(nof_prb=args.prb, qm=qm, rate=rate,
                                  snr_db=args.snr)
    print(f"{args.prb} PRB mixed slot on {jax.devices()[0]}: "
          f"DL TBs {cfg.pdsch0.tbs}+{cfg.pdsch1.tbs} b (UE0 2-layer), "
          f"UL TBs {cfg.pusch0.tbs}+{cfg.pusch1.tbs} b (UE0 2x2)")
    payloads = gnb_mixed.make_payloads(cfg, np.random.default_rng(0))
    fn = jax.jit(lambda p, k: gnb_mixed.mixed_slot_dict(p, k, cfg))
    t0 = time.perf_counter()
    out = {k: np.asarray(v) for k, v in
           fn(payloads, jax.random.PRNGKey(0)).items()}
    print(f"compile+run: {time.perf_counter() - t0:.1f}s")
    for k in sorted(out):
        print(f"  {k:>14}: {out[k]}")
    assert bool(out["ok"]), "mixed slot verification failed"
    print("all channels verified OK")


if __name__ == "__main__":
    main()
