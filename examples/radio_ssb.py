"""Example: SSB-only transmitter over the async lower PHY + loopback
radio, with a receiver that detects PSS and decodes PBCH.

The apps/examples/phy/radio_ssb.cpp analogue: a lower PHY streaming
continuous baseband whose only content is a periodic SS/PBCH block.

Run:  python examples/radio_ssb.py [--slots 40] [--pci 123]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from srsran_project_23_5_tpu.phy.lower.lower_phy import (  # noqa: E402
    AsyncLowerPhy, LowerPhyConfig)
from srsran_project_23_5_tpu.phy.upper import ssb  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=40)
    ap.add_argument("--pci", type=int, default=123)
    ap.add_argument("--period", type=int, default=20, help="SSB period slots")
    ap.add_argument("--snr-db", type=float, default=10.0)
    args = ap.parse_args()

    cfg = LowerPhyConfig(mu=1, nfft=512, nof_prb=24)
    rng = np.random.default_rng(0)
    scfg = ssb.SsbConfig(pci=args.pci, ssb_idx=0, lmax=8, sfn=0)
    payload = rng.integers(0, 2, size=32).astype(np.int8)
    k0 = (cfg.nsc - 240) // 2
    tx_slots = []

    def dl_grid(slot):
        if slot >= args.slots:
            return None
        if slot % args.period:
            return None
        tx_slots.append(slot)
        grid = jnp.zeros((14, cfg.nsc), jnp.complex64)
        block = ssb.ssb_assemble(jnp.asarray(payload), scfg)
        return grid.at[2:6, k0:k0 + ssb.SSB_NSC].set(block)

    found = []

    def ul_grid(slot, grid):
        # receiver: correlate PSS on symbol 2, decode PBCH on hit
        g = np.asarray(grid)
        pss = ssb.pss_sequence(scfg.nid2)
        win = g[2, k0 + 56:k0 + 183]
        corr = abs(np.vdot(pss, win)) / (np.linalg.norm(win)
                                         * np.linalg.norm(pss) + 1e-12)
        if corr > 0.6:
            block = jnp.asarray(g[2:6, k0:k0 + ssb.SSB_NSC])
            bits, ok = ssb.ssb_receive_pbch(block, scfg, noise_var=0.01)
            match = bool(ok) and np.array_equal(np.asarray(bits), payload)
            found.append((slot, float(corr), match))

    eng = AsyncLowerPhy(cfg, dl_grid, ul_grid, depth=2)
    sigma = float(np.sqrt(cfg.nfft) * 10 ** (-args.snr_db / 20))
    total = sum(eng.timeline.slot_size(s) for s in range(args.slots))
    pulled = 0
    while pulled < total:
        n = min(4096, total - pulled)
        bb = eng.pull_tx(n)
        nz = sigma / np.sqrt(2) * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n))
        eng.push_rx(bb + jnp.asarray(nz.astype(np.complex64)))
        pulled += n

    print(f"transmitted SSBs at slots {tx_slots}")
    for slot, corr, ok in found:
        print(f"  slot {slot:3d}: PSS corr {corr:.2f}  PBCH ok={ok}")
    assert [s for s, _, _ in found] == tx_slots, "missed SSBs"
    assert all(ok for _, _, ok in found), "PBCH decode failed"
    print("radio_ssb example: all SSBs detected and decoded")


if __name__ == "__main__":
    main()
