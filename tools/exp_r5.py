"""Round-5 perf dissection of the 273-PRB mixed slot (scan-amortized).

Variants isolate: time-domain PRACH cost, LDPC decode cost (merged vs
vmap), and front/back composition.  Timing: K-scan program over B-slot
batches, N fire-and-forget dispatches, ONE small-scalar host fetch
(block_until_ready is unreliable on axon); per-slot time =
(wall - fetch_rtt) / (N*K*B).
"""
import dataclasses
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
from srsran_project_23_5_tpu.utils.cache import enable_default_cache

enable_default_cache()

B = int(os.environ.get("B", "64"))
K = int(os.environ.get("K", "8"))
N = int(os.environ.get("N", "6"))
ITERS = int(os.environ.get("ITERS", "6"))
ONLY = os.environ.get("ONLY", "")


def scanner(batch_fn):
    def scan_step(payloads, seed):
        def body(carry, k):
            aok, asum = carry
            base = jax.random.fold_in(jax.random.PRNGKey(0), seed + k)
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                base, jnp.arange(B, dtype=jnp.uint32))
            ok, sinr = batch_fn(payloads, keys)
            return (aok & jnp.all(ok), asum + jnp.sum(sinr)), 0
        (aok, asum), _ = jax.lax.scan(
            body, (jnp.bool_(True), jnp.float32(0.0)),
            jnp.arange(K, dtype=jnp.uint32))
        return aok, asum
    return jax.jit(scan_step)


def measure(name, batch_fn, payloads, expect_ok=True):
    step = scanner(batch_fn)
    t0 = time.perf_counter()
    out = step(payloads, jnp.uint32(0))
    ok0 = bool(np.asarray(out[0]))
    compile_s = time.perf_counter() - t0
    # fetch RTT floor
    rtts = []
    for _ in range(3):
        o = step(payloads, jnp.uint32(1))
        np.asarray(o[0])
        t0 = time.perf_counter()
        np.asarray(o[0])
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(N):
            out = step(payloads, jnp.uint32(100 + rep * N * K + i * K))
        np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    wall = float(np.median(ts))
    us = (wall - rtt) / (N * K * B) * 1e6
    print(f"{name:34s} {us:8.1f} us/slot  ok={ok0} "
          f"compile={compile_s:.1f}s rtt={rtt*1e3:.1f}ms", flush=True)
    if expect_ok:
        assert ok0, name
    return us


def front_only_fn(cfg):
    def fn(payloads, keys):
        f = jax.vmap(lambda p, k: gnb_mixed._mixed_front(p, k, cfg))(
            payloads, keys)
        ok = (f["dl0_pre"] & f["dl1_pre"] & f["pucch_ok"] & f["prach_ok"]
              & (f["pss_corr"] > 0.8))
        sinr = 10.0 * jnp.log10(jnp.maximum(
            1.0 / jnp.maximum(f["u0"].post_noise_var, 1e-12), 1e-12))
        return ok, sinr
    return fn


def front_plus_decode_fn(cfg):
    """Front + merged decodes, NO desegment/CRC/back."""
    def fn(payloads, keys):
        B = keys.shape[0]
        f = jax.vmap(lambda p, k: gnb_mixed._mixed_front(p, k, cfg))(
            payloads, keys)
        oks = []
        for name, sh in gnb_mixed._decode_names(cfg):
            llr = f[name].llr_full
            C, N = llr.shape[-2], llr.shape[-1]
            bits, okc = gnb_mixed._decode_cbs(
                llr.reshape(B * C, N), sh, cfg.nof_ldpc_iterations)
            oks.append(jnp.all(okc.reshape(B, C), axis=-1)
                       & (jnp.sum(bits.reshape(B, -1), axis=-1) >= 0))
        ok = f["prach_ok"] & f["pucch_ok"]
        for o in oks:
            ok = ok & o
        sinr = 10.0 * jnp.log10(jnp.maximum(
            1.0 / jnp.maximum(f["u0"].post_noise_var, 1e-12), 1e-12))
        return ok, sinr
    return fn


def staged_back_fn(cfg, do_cb_crc=False, do_tb_crc=False, do_cmp=False):
    """Front + decode + selectable back-half stages."""
    from srsran_project_23_5_tpu.ops import crc as crc_ops

    def fn(payloads, keys):
        B = keys.shape[0]
        f = jax.vmap(lambda p, k: gnb_mixed._mixed_front(p, k, cfg))(
            payloads, keys)
        ok = f["prach_ok"] & f["pucch_ok"]
        for (name, sh), ref in zip(gnb_mixed._decode_names(cfg),
                                   (payloads["tb_ul0"], payloads["tb_ul1"])):
            llr = f[name].llr_full
            C, N = llr.shape[-2], llr.shape[-1]
            bits, okc = gnb_mixed._decode_cbs(
                llr.reshape(B * C, N), sh, cfg.nof_ldpc_iterations)
            bits = bits.reshape(B, C, -1)
            okc = okc.reshape(B, C)
            ok = ok & jnp.all(okc, axis=-1)
            seg = sh.segments
            pay = bits[..., :seg.payload_length]
            if do_cb_crc:
                ok = ok & jnp.all(crc_ops.crc_check(pay, "crc24B"), axis=-1)
            tbc = pay[..., :-seg.cb_crc_bits].reshape(B, -1)
            if do_tb_crc:
                ok = ok & crc_ops.crc_check(tbc, "crc24A")
            if do_cmp:
                tb = tbc[..., :-seg.tb_crc_bits]
                ok = ok & jnp.all(tb == ref.astype(tb.dtype), axis=-1)
        sinr = 10.0 * jnp.log10(jnp.maximum(
            1.0 / jnp.maximum(f["u0"].post_noise_var, 1e-12), 1e-12))
        return ok, sinr
    return fn


def staged_sv_fn(cfg, sv0=False, sv1=False):
    """fd_allback + selectable symbol_verify checks."""
    from srsran_project_23_5_tpu.phy.upper import sch
    base = staged_back_fn(cfg, True, True, True)

    def fn(payloads, keys):
        ok, sinr = base(payloads, keys)

        def dl(p, k):
            f = gnb_mixed._mixed_front(p, k, cfg)
            return f["dl0_pre"], f["dl1_pre"]
        # recompute front per-slot ONLY for the dl gates we ask for —
        # relies on XLA CSE merging with the base front
        d0, d1 = jax.vmap(dl)(payloads, keys)
        if sv0:
            ok = ok & d0
        if sv1:
            ok = ok & d1
        return ok, sinr
    return fn


def vmap_slot_fn(cfg):
    sf = gnb_mixed.slot_fn_for_pipeline(cfg)
    return lambda p, k: jax.vmap(sf)(p, k)


def main():
    rng = np.random.default_rng(0)
    cfg = gnb_mixed.default_mixed(nof_ldpc_iterations=ITERS)
    cfg_gridpr = dataclasses.replace(cfg, prach_time_domain=False)
    payloads = jax.device_put(gnb_mixed.make_payloads(cfg, rng, batch=B))
    jax.block_until_ready(payloads)

    variants = {
        "batch_merged_full": lambda: measure(
            "batch_merged_full", gnb_mixed.batch_fn_for_pipeline(cfg),
            payloads),
        "batch_merged_gridprach": lambda: measure(
            "batch_merged_gridprach",
            gnb_mixed.batch_fn_for_pipeline(cfg_gridpr), payloads),
        "front_only": lambda: measure(
            "front_only", front_only_fn(cfg), payloads),
        "front_plus_decode": lambda: measure(
            "front_plus_decode", front_plus_decode_fn(cfg), payloads),
        "fd_cbcrc": lambda: measure(
            "fd_cbcrc", staged_back_fn(cfg, do_cb_crc=True), payloads),
        "fd_tbcrc": lambda: measure(
            "fd_tbcrc", staged_back_fn(cfg, do_tb_crc=True), payloads),
        "fd_cmp": lambda: measure(
            "fd_cmp", staged_back_fn(cfg, do_cmp=True), payloads),
        "fd_allback": lambda: measure(
            "fd_allback", staged_back_fn(cfg, True, True, True), payloads),
        "fd_sv0": lambda: measure(
            "fd_sv0", staged_sv_fn(cfg, sv0=True), payloads),
        "fd_sv01": lambda: measure(
            "fd_sv01", staged_sv_fn(cfg, sv0=True, sv1=True), payloads),
        "nodlsch": lambda: measure(
            "nodlsch", gnb_mixed.batch_fn_for_pipeline(
                dataclasses.replace(cfg, verify_dl_sch=False)), payloads),
        "nodl": lambda: measure(
            "nodl", gnb_mixed.batch_fn_for_pipeline(
                dataclasses.replace(cfg, verify_dl_sch=False,
                                    verify_dl_ctrl=False)), payloads),
        "front_only_gridprach": lambda: measure(
            "front_only_gridprach", front_only_fn(cfg_gridpr), payloads),
        "vmap_perslot_full": lambda: measure(
            "vmap_perslot_full", vmap_slot_fn(cfg), payloads),
        "vmap_perslot_gridprach": lambda: measure(
            "vmap_perslot_gridprach", vmap_slot_fn(cfg_gridpr), payloads),
    }
    names = [n for n in variants if not ONLY or n in ONLY.split(",")]
    for n in names:
        variants[n]()


if __name__ == "__main__":
    main()
