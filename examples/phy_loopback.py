"""Example: minimal full-chain PDSCH→AWGN→PUSCH loopback on one carrier.

The smallest end-to-end slice of the framework (SURVEY §7 step 5): build
a transport block, run the downlink slot, pass it through a calibrated
AWGN channel, run the uplink receiver, check the CRC.

Run:  python examples/phy_loopback.py [--prb 52] [--qm 4] [--snr-db 15]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("LOOPBACK_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from srsran_project_23_5_tpu.models import gnb_flagship  # noqa: E402
from srsran_project_23_5_tpu.phy.lower import ofdm  # noqa: E402
from srsran_project_23_5_tpu.phy.upper import sch  # noqa: E402
from srsran_project_23_5_tpu.ran import numerology, tbs as tbs_mod  # noqa


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prb", type=int, default=52)
    ap.add_argument("--qm", type=int, default=4, choices=(2, 4, 6, 8))
    ap.add_argument("--rate", type=float, default=0.5)
    ap.add_argument("--snr-db", type=float, default=15.0)
    ap.add_argument("--slots", type=int, default=8)
    args = ap.parse_args()

    tbs = tbs_mod.tbs_calculate(14, 36, 0, args.rate, args.qm, 1, args.prb)
    cfg = gnb_flagship.CarrierConfig(
        mu=1, nfft=numerology.min_nfft(args.prb), nof_prb=args.prb,
        sh=sch.ShConfig(rnti=0x4601, tbs=tbs, qm=args.qm,
                        nof_prb=args.prb, dmrs_symbols=(2, 7, 11)))
    ss = numerology.slot_num_samples(cfg.mu, cfg.nfft)
    sigma = float(np.sqrt(cfg.nfft) * 10 ** (-args.snr_db / 20))

    def slot(tb, key):
        bb = gnb_flagship.tx_slot(tb, cfg)
        nz = sigma / np.sqrt(2) * jax.random.normal(key, (2, ss),
                                                    jnp.float32)
        grid = ofdm.demodulate_slot(bb + jax.lax.complex(nz[0], nz[1]),
                                    cfg.nsc, cfg.mu, cfg.nfft)
        r = sch.pusch_receive(grid[None], cfg.sh, 8)
        return r.tb_crc_ok, r.sinr_db, r.evm

    step = jax.jit(slot)
    rng = np.random.default_rng(0)
    print(f"carrier: {args.prb} PRB, Qm {args.qm}, TBS {tbs} bits, "
          f"SNR {args.snr_db} dB")
    t0 = time.perf_counter()
    for i in range(args.slots):
        tb = jnp.asarray(rng.integers(0, 2, size=tbs).astype(np.int8))
        ok, sinr, evm = step(tb, jax.random.PRNGKey(i))
        print(f"  slot {i}: crc_ok={bool(ok)} "
              f"sinr={float(np.asarray(sinr)):.1f} dB "
              f"evm={float(np.asarray(evm)):.3f}")
    print(f"{args.slots} slots in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
