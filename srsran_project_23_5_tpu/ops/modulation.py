"""Constellation mapping and soft demapping (TS 38.211 §5.1).

Mapper: packed-symbol gather from spec-derived constellation LUTs
(replaces lib/phy/upper/channel_modulation/modulation_mapper_impl.cpp).

Soft demapper: exact max-log LLRs.  NR QAM constellations are Gray-labeled
square QAM with independent I/Q axes, so each axis is demapped as PAM
against at most 16 levels — a small broadcasted distance computation that
vectorizes over all REs, equivalent to the reference's interval method
(lib/phy/upper/channel_modulation/demodulation_mapper_qpsk/qam*.cpp).

LLR sign convention matches the reference: positive LLR ⇒ bit 0
(include/srsran/phy/upper/log_likelihood_ratio.h:86).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ran.constants import LLR_MAX

#: modulation scheme → bits per symbol
QM = {"BPSK": 1, "QPSK": 2, "QAM16": 4, "QAM64": 6, "QAM256": 8}
_NORM = {1: 1.0, 2: np.sqrt(2.0), 4: np.sqrt(10.0), 6: np.sqrt(42.0),
         8: np.sqrt(170.0)}


def _pam_level(bits: np.ndarray) -> float:
    """Amplitude of one axis from its bit labels (TS 38.211 §5.1.3-5.1.6).

    bits[0] is the sign bit, subsequent bits refine the magnitude:
    level = (1-2b0) * (2^(n-1) - (1-2b1)*(2^(n-2) - ... )).
    """
    if len(bits) == 1:
        return 1.0 - 2.0 * bits[0]
    inner = _pam_level(bits[1:])
    return (1.0 - 2.0 * bits[0]) * (2 ** (len(bits) - 1) - inner)


@functools.lru_cache(maxsize=None)
def constellation(qm: int) -> np.ndarray:
    """Complex LUT of size 2^qm indexed by the MSB-first packed bit label."""
    if qm == 1:  # BPSK: d = (1-2b)(1+j)/sqrt(2)
        return np.array([1 + 1j, -1 - 1j], dtype=np.complex64) / np.sqrt(2)
    points = np.empty(1 << qm, dtype=np.complex64)
    for label in range(1 << qm):
        bits = np.array([(label >> (qm - 1 - k)) & 1 for k in range(qm)])
        re = _pam_level(bits[0::2])
        im = _pam_level(bits[1::2])
        points[label] = (re + 1j * im) / _NORM[qm]
    return points


@functools.lru_cache(maxsize=None)
def pam_levels(qm: int) -> np.ndarray:
    """Per-axis PAM level for each axis bit label (size 2^(qm/2))."""
    nb = qm // 2
    levels = np.empty(1 << nb, dtype=np.float32)
    for label in range(1 << nb):
        bits = np.array([(label >> (nb - 1 - k)) & 1 for k in range(nb)])
        levels[label] = _pam_level(bits) / _NORM[qm]
    return levels


def modulate(bits: jnp.ndarray, qm: int) -> jnp.ndarray:
    """[..., E] {0,1} int8 → [..., E/qm] complex64 symbols.

    Gather-free: the Gray-coded PAM amplitude is evaluated arithmetically
    per axis — level = s0·(2^(n-1) − s1·(2^(n-2) − …)), s_k = 1−2b_k —
    as pure elementwise VPU math (a constellation-LUT gather is ~20×
    slower on TPU; see modulate_lut for the reference-style variant).
    """
    *lead, e = bits.shape
    assert e % qm == 0
    grouped = bits.reshape(*lead, e // qm, qm).astype(jnp.float32)
    s = 1.0 - 2.0 * grouped                       # ±1 per bit, MSB first
    if qm == 1:
        v = s[..., 0] / np.float32(np.sqrt(2.0))
        return jax.lax.complex(v, v)

    def axis(sb):
        nb = sb.shape[-1]
        lvl = sb[..., nb - 1]
        for k in range(nb - 2, -1, -1):
            lvl = sb[..., k] * (2.0 ** (nb - 1 - k) - lvl)
        return lvl

    norm = np.float32(_NORM[qm])
    re = axis(s[..., 0::2]) / norm
    im = axis(s[..., 1::2]) / norm
    return jax.lax.complex(re, im)


def modulate_lut(bits: jnp.ndarray, qm: int) -> jnp.ndarray:
    """LUT-gather mapper (reference-style modulation_mapper_impl.cpp)."""
    *lead, e = bits.shape
    assert e % qm == 0
    grouped = bits.reshape(*lead, e // qm, qm).astype(jnp.int32)
    weights = jnp.asarray([1 << (qm - 1 - k) for k in range(qm)], dtype=jnp.int32)
    labels = (grouped * weights).sum(axis=-1)
    return jnp.asarray(constellation(qm))[labels]


def modulate_pi2_bpsk(bits: jnp.ndarray) -> jnp.ndarray:
    """pi/2-BPSK (TS 38.211 §5.1.1): phase rotates with symbol index parity."""
    b = bits.astype(jnp.float32)
    base = ((1 - 2 * b) + 1j * (1 - 2 * b)) / np.sqrt(2)
    idx = jnp.arange(bits.shape[-1])
    rot = jnp.where(idx % 2 == 0, 1.0 + 0.0j, 1j)
    return (base * rot).astype(jnp.complex64)


def demodulate_soft(symbols: jnp.ndarray, noise_var: jnp.ndarray,
                    qm: int) -> jnp.ndarray:
    """Max-log soft demap: [..., S] complex, [..., S] noise → [..., S*qm] f32.

    noise_var is the post-equalization noise variance per RE.  Output LLRs
    follow ln(P(0)/P(1)) (positive ⇒ bit 0).
    """
    if qm == 1:
        proj = (symbols.real + symbols.imag) * np.sqrt(2.0)
        return (2.0 * proj / noise_var)[..., :]
    if qm == 2:
        # QPSK closed form: llr = 2*sqrt(2)*y_axis / sigma^2
        llr_re = 2.0 * np.sqrt(2.0) * symbols.real / noise_var
        llr_im = 2.0 * np.sqrt(2.0) * symbols.imag / noise_var
        return jnp.stack([llr_re, llr_im], axis=-1).reshape(*symbols.shape[:-1], -1)

    nb = qm // 2
    levels = jnp.asarray(pam_levels(qm))             # [2^nb]
    labels = np.arange(1 << nb)
    bit_of = np.stack([(labels >> (nb - 1 - k)) & 1 for k in range(nb)])  # [nb, 2^nb]
    big = jnp.float32(1e30)

    def axis_llr(y):                                  # y: [..., S]
        d2 = (y[..., None] - levels) ** 2             # [..., S, 2^nb]
        outs = []
        for k in range(nb):
            mask1 = jnp.asarray(bit_of[k] == 1)
            d2_1 = jnp.min(jnp.where(mask1, d2, big), axis=-1)
            d2_0 = jnp.min(jnp.where(mask1, big, d2), axis=-1)
            outs.append(d2_1 - d2_0)
        return jnp.stack(outs, axis=-1)               # [..., S, nb]

    llr_re = axis_llr(symbols.real)
    llr_im = axis_llr(symbols.imag)
    # interleave: bit order per symbol is [re0, im0, re1, im1, ...]
    llr = jnp.stack([llr_re, llr_im], axis=-1)        # [..., S, nb, 2]
    llr = llr.reshape(*symbols.shape[:-1], symbols.shape[-1], qm)
    return (llr / noise_var[..., None]).reshape(*symbols.shape[:-1], -1)


def quantize_llr(llr: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Float LLRs → saturating int8 domain (±LLR_MAX), reference-compatible."""
    return jnp.clip(jnp.round(llr * scale), -LLR_MAX, LLR_MAX).astype(jnp.int8)


def hard_decision(llr: jnp.ndarray) -> jnp.ndarray:
    """int8/float LLR → hard bits ({0,1} int8); llr <= 0 ⇒ 1 (reference conv)."""
    return (llr <= 0).astype(jnp.int8)
