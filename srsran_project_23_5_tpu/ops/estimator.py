"""Port channel estimation from DM-RS pilots.

Functional re-design of the reference's
port_channel_estimator_average_impl (lib/phy/upper/signal_processors/
port_channel_estimator_average_impl.cpp:97-225): least-squares at pilots,
averaging across DM-RS symbols, noise-variance estimation from residuals,
and linear frequency interpolation replicated across the slot's symbols
(interpolator_linear_impl).  All steps are batched jnp ops over
[rx_port, dmrs_symbol, pilot] tensors.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ChannelEstimate:
    """Channel state information produced by the estimator."""
    h: jnp.ndarray            # [..., nsym, nsc] complex64 channel estimate
    noise_var: jnp.ndarray    # [...] scalar per leading batch
    epre: jnp.ndarray         # [...] average energy per pilot RE
    rsrp: jnp.ndarray         # [...] |avg channel|^2 power


@dataclasses.dataclass
class CombChannelEstimate:
    """Estimate over a contiguous comb-2 allocation (structured layout —
    no gathers): h_alloc covers the allocation's subcarriers only."""
    h_alloc: jnp.ndarray      # [..., nsc_alloc] complex64
    noise_var: jnp.ndarray
    epre: jnp.ndarray
    rsrp: jnp.ndarray
    # time alignment in normalized units: delay_samples = ta_norm * nfft
    # (phase ramp slope across frequency; reference estimates the same
    # quantity via IDFT peak, port_channel_estimator_average_impl.cpp:97-225)
    ta_norm: jnp.ndarray | None = None
    # per-DM-RS-symbol estimates for time interpolation (optional)
    h_dmrs: jnp.ndarray | None = None     # [..., ndmrs, nsc_alloc]


def _comb2_interp(p: jnp.ndarray, delta: int) -> jnp.ndarray:
    """Pilot-comb values [..., npil] → allocation grid [..., 2*npil] via
    midpoint interpolation with edge extrapolation (structured, no gather)."""
    p_next = jnp.concatenate(
        [p[..., 1:], 2 * p[..., -1:] - p[..., -2:-1]], axis=-1)
    mid = 0.5 * (p + p_next)
    if delta == 0:
        pair = jnp.stack([p, mid], axis=-1)
    else:
        p_prev = jnp.concatenate(
            [2 * p[..., :1] - p[..., 1:2], p[..., :-1]], axis=-1)
        pair = jnp.stack([0.5 * (p + p_prev), p], axis=-1)
    return pair.reshape(*p.shape[:-1], 2 * p.shape[-1])


def estimate_comb2(rx_pilots: jnp.ndarray, tx_pilots: jnp.ndarray,
                   delta: int = 0,
                   time_interp: bool = False) -> CombChannelEstimate:
    """LS + average + structured linear interpolation for comb-2 pilots on
    a contiguous allocation (the PUSCH/PDSCH DM-RS type-1 case).

    rx_pilots: [..., ndmrs_sym, npilot]; pilots sit at allocation-relative
    subcarriers 2k + delta.  Entirely slice/concat ops — TPU-fast.

    Time alignment: a propagation delay τ shows as the frequency ramp
    h[k] ∝ e^{-j2πkτ/nfft}.  The ramp slope is estimated from the mean
    lag-1 pilot correlation, the pilots are DEROTATED before the midpoint
    interpolation (which would otherwise rotate up to πτ·2/nfft between
    pilots) and the ramp is re-applied on the interpolated grid — exact
    for a pure delay, accurate to the channel's delay spread otherwise.
    ta_norm = τ/nfft is reported (reference: IDFT-peak TA estimate).

    time_interp=True additionally returns per-DM-RS-symbol estimates
    (h_dmrs) so callers can interpolate across time for drifting channels.
    """
    lse = rx_pilots * jnp.conj(tx_pilots) / (jnp.abs(tx_pilots) ** 2)
    ndmrs = lse.shape[-2]
    p = jnp.mean(lse, axis=-2)                             # [..., npilot]
    if ndmrs > 1:
        resid = lse - p[..., None, :]
        noise_var = (jnp.mean(jnp.abs(resid) ** 2, axis=(-1, -2))
                     * ndmrs / (ndmrs - 1))
    else:
        diff = lse[..., 0, 1:] - lse[..., 0, :-1]
        noise_var = 0.5 * jnp.mean(jnp.abs(diff) ** 2, axis=-1)
    epre = jnp.mean(jnp.abs(rx_pilots) ** 2, axis=(-1, -2))
    rsrp = jnp.mean(jnp.abs(p) ** 2, axis=-1)

    # --- time-alignment: phase per pilot step (pilots 2 subcarriers apart)
    corr = jnp.sum(p[..., 1:] * jnp.conj(p[..., :-1]), axis=-1)
    phi = jnp.angle(corr)                                  # [...]
    ta_norm = -phi / (4.0 * np.pi)                         # τ / nfft
    # h[sc] = a·e^{j·r·sc} with r = -2πτ/N; corr gives phi = 2r.
    npil = p.shape[-1]
    m_idx = jnp.arange(npil, dtype=jnp.float32)
    derot = jnp.exp(-1j * phi[..., None] * m_idx)          # remove ramp
    sc_idx = jnp.arange(2 * npil, dtype=jnp.float32) - float(delta)
    rerot = jnp.exp(1j * (phi[..., None] / 2.0) * sc_idx)  # re-apply ramp

    h_alloc = _comb2_interp(p * derot, delta) * rerot
    h_dmrs = None
    if time_interp:
        h_dmrs = (_comb2_interp(lse * derot[..., None, :], delta)
                  * rerot[..., None, :])
    return CombChannelEstimate(h_alloc=h_alloc, noise_var=noise_var,
                               epre=epre, rsrp=rsrp, ta_norm=ta_norm,
                               h_dmrs=h_dmrs)


def estimate_comb2_occ2(rx_pilots: jnp.ndarray, tx_pilots: jnp.ndarray,
                        sc_offset: int = 0) -> CombChannelEstimate:
    """Two-layer CDM despread estimate (type-1, CDM group 0, fd-OCC).

    DM-RS ports 0/1 share the comb and are separated by the frequency OCC
    w_f = [+1,+1] / [+1,-1] over consecutive pilot pairs (TS 38.211
    Table 6.4.1.1.3-1; reference port_channel_estimator despreads CDM the
    same way).  rx_pilots: [..., ndmrs_sym, npilot]; tx_pilots the port-0
    (un-OCC'd) pilots.  Returns h_alloc [..., 2, nsc_alloc] — per-LAYER
    channel over the allocation subcarriers.
    """
    lse = rx_pilots * jnp.conj(tx_pilots) / (jnp.abs(tx_pilots) ** 2)
    even = lse[..., 0::2]                                  # pair first pilot
    odd = lse[..., 1::2]
    h0 = 0.5 * (even + odd)                                # [..., nsym, npair]
    h1 = 0.5 * (even - odd)
    h = jnp.stack([h0, h1], axis=-3)                       # [..., 2, nsym, np]
    ndmrs = h.shape[-2]
    p = jnp.mean(h, axis=-2)                               # [..., 2, npair]
    if ndmrs > 1:
        resid = h - p[..., None, :]
        # despreading halves the per-RE noise: scale the residual var by 2
        noise_var = (2.0 * jnp.mean(jnp.abs(resid) ** 2, axis=(-1, -2, -3))
                     * ndmrs / (ndmrs - 1))
    else:
        diff = p[..., 1:] - p[..., :-1]
        noise_var = jnp.mean(jnp.abs(diff) ** 2, axis=(-1, -2))
    epre = jnp.mean(jnp.abs(rx_pilots) ** 2, axis=(-1, -2))
    rsrp = jnp.mean(jnp.abs(p) ** 2, axis=(-1, -2))

    # pair j covers allocation SCs {4j, 4j+2} (+sc_offset for CDM group
    # 1's comb); interpolate from centers 4j+1(+offset) onto every
    # allocation subcarrier.
    npair = h0.shape[-1]
    sc = 4 * np.arange(npair) + 1 + sc_offset
    h_alloc = _interp_freq(p, sc, 4 * npair)
    return CombChannelEstimate(h_alloc=h_alloc, noise_var=noise_var,
                               epre=epre, rsrp=rsrp)


def estimate_port(rx_pilots: jnp.ndarray, tx_pilots: jnp.ndarray,
                  sc_idx: np.ndarray, nsc: int, nsym: int,
                  comb_stride: int = 2) -> ChannelEstimate:
    """LS + average + linear-interp channel estimate.

    rx_pilots: [..., ndmrs_sym, npilot] received pilot REs
    tx_pilots: [ndmrs_sym, npilot] (or broadcastable) transmitted pilots
    sc_idx:    pilot subcarrier indices (static numpy)
    Returns h over the full [..., nsym, nsc] grid (time-constant estimate,
    matching the reference's average-across-symbols strategy).
    """
    # Least-squares estimate at pilots (|tx| = 1/sqrt(2) scale handled by
    # conj division).
    lse = rx_pilots * jnp.conj(tx_pilots) / (jnp.abs(tx_pilots) ** 2)
    ndmrs = lse.shape[-2]
    h_avg = jnp.mean(lse, axis=-2)                         # [..., npilot]

    # Noise variance: residual across DM-RS symbols when >1, else from
    # half the power of first differences along frequency.
    if ndmrs > 1:
        resid = lse - h_avg[..., None, :]
        noise_var = (jnp.mean(jnp.abs(resid) ** 2, axis=(-1, -2))
                     * ndmrs / (ndmrs - 1))
    else:
        diff = lse[..., 0, 1:] - lse[..., 0, :-1]
        noise_var = 0.5 * jnp.mean(jnp.abs(diff) ** 2, axis=-1)

    epre = jnp.mean(jnp.abs(rx_pilots) ** 2, axis=(-1, -2))
    rsrp = jnp.mean(jnp.abs(h_avg) ** 2, axis=-1)

    # Linear interpolation from the pilot comb to all nsc subcarriers.
    h_full = _interp_freq(h_avg, sc_idx, nsc)
    h = jnp.broadcast_to(h_full[..., None, :],
                         (*h_full.shape[:-1], nsym, nsc))
    return ChannelEstimate(h=h, noise_var=noise_var, epre=epre, rsrp=rsrp)


def _interp_freq(h_pilot: jnp.ndarray, sc_idx: np.ndarray,
                 nsc: int) -> jnp.ndarray:
    """Linear interpolation + edge extrapolation onto [0, nsc).

    Regular pilot combs (uniform spacing — every DM-RS pattern in use)
    take a GATHER-FREE path: per-phase weighted sums of two shifted
    pilot views, interleaved by a stack+reshape.  Generic complex
    gathers serialize on the TPU backend (measured ~10s of us per call
    at flagship widths — round-5); the irregular-grid gather path is
    kept only as a fallback.
    """
    sc = np.asarray(sc_idx, dtype=np.int64)
    steps = np.diff(sc)
    if len(sc) >= 2 and np.all(steps == steps[0]):
        return _interp_freq_regular(h_pilot, int(sc[0]), int(steps[0]), nsc)
    scf = sc.astype(np.float64)
    target = np.arange(nsc, dtype=np.float64)
    right = np.searchsorted(scf, target, side="left")
    right = np.clip(right, 1, len(sc) - 1)
    left = right - 1
    w_right = (target - scf[left]) / (scf[right] - scf[left])
    w_left = 1.0 - w_right
    li = jnp.asarray(left)
    ri = jnp.asarray(right)
    wl = jnp.asarray(w_left.astype(np.float32))
    wr = jnp.asarray(w_right.astype(np.float32))
    return h_pilot[..., li] * wl + h_pilot[..., ri] * wr


def _interp_freq_regular(h_pilot: jnp.ndarray, first: int, step: int,
                         nsc: int) -> jnp.ndarray:
    """Gather-free linear interp for pilots at subcarriers first+step*k."""
    npil = h_pilot.shape[-1]
    pl = h_pilot[..., :-1]
    pr = h_pilot[..., 1:]
    phases = []
    for r in range(step):
        w = np.float32(r / step)
        phases.append((1.0 - w) * pl + w * pr if r else pl)
    # interleave: [..., npil-1, step] -> [..., (npil-1)*step], covering
    # targets [first, first + step*(npil-1))
    body = jnp.stack(phases, axis=-1).reshape(
        *h_pilot.shape[:-1], (npil - 1) * step)
    p0, p1 = h_pilot[..., 0:1], h_pilot[..., 1:2]
    pm, pe = h_pilot[..., -2:-1], h_pilot[..., -1:]
    head = [p0 + ((t - first) / step) * (p1 - p0) for t in range(first)]
    ntail = nsc - first - step * (npil - 1)
    tail = [pe + (t / step) * (pe - pm) for t in range(ntail)]
    return jnp.concatenate([*head, body, *tail], axis=-1)
