"""Channel equalization with post-equalization noise variance.

Counterpart of the reference's channel_equalizer_zf_impl
(lib/phy/upper/equalization/equalize_zf_1xn.h:22-80 — MRC-combining "ZF"
for 1xN SIMO — and equalize_zf_2x2.cpp for 2x2 MIMO), as batched jnp ops
over [..., rx_port, RE] tensors.
"""
from __future__ import annotations

import jax.numpy as jnp


def zf_1xn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
           tx_scaling: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SIMO zero-forcing (= MRC) equalizer.

    y, h: [..., nrx, n_re] complex; noise_var: [...] or broadcastable.
    Returns (x_hat [..., n_re], post_noise_var [..., n_re]).
    """
    num = jnp.sum(jnp.conj(h) * y, axis=-2)
    den = jnp.sum(jnp.abs(h) ** 2, axis=-2)
    den = jnp.maximum(den, 1e-12)
    x_hat = num / (den * tx_scaling)
    nv = jnp.broadcast_to(jnp.asarray(noise_var)[..., None], x_hat.shape)
    post_nv = nv / (den * tx_scaling ** 2)
    return x_hat, post_nv


def mmse_1xn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
             tx_scaling: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SIMO MMSE equalizer (regularized by the noise variance)."""
    nv = jnp.asarray(noise_var)[..., None]
    num = jnp.sum(jnp.conj(h) * y, axis=-2)
    den = jnp.sum(jnp.abs(h) ** 2, axis=-2) + nv / (tx_scaling ** 2)
    x_hat = num / (den * tx_scaling)
    # Effective post-equalization noise variance (unbiased form).
    g = jnp.sum(jnp.abs(h) ** 2, axis=-2) / den
    post_nv = nv / jnp.maximum(
        jnp.sum(jnp.abs(h) ** 2, axis=-2) * tx_scaling ** 2, 1e-12)
    # Scale correction so the estimate is conditionally unbiased.
    x_hat = x_hat / jnp.maximum(g, 1e-6)
    return x_hat, post_nv


def zf_nx2(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """N×2 MIMO zero-forcing via 2×2 normal equations.

    Generalizes the reference's equalize_zf_2x2.cpp to any nof_rx ≥ 2:
    x̂ = (HᴴH)⁻¹ Hᴴ y per RE, post noise var σ²·diag((HᴴH)⁻¹).

    y: [..., nrx, n_re]; h: [..., nrx, 2, n_re]; noise_var broadcastable.
    Returns (x_hat [..., 2, n_re], post_noise_var [..., 2, n_re]).
    """
    h0 = h[..., :, 0, :]                     # [..., nrx, n_re]
    h1 = h[..., :, 1, :]
    a00 = jnp.sum(jnp.abs(h0) ** 2, axis=-2)          # real
    a11 = jnp.sum(jnp.abs(h1) ** 2, axis=-2)
    a01 = jnp.sum(jnp.conj(h0) * h1, axis=-2)         # complex
    b0 = jnp.sum(jnp.conj(h0) * y, axis=-2)
    b1 = jnp.sum(jnp.conj(h1) * y, axis=-2)
    det = a00 * a11 - jnp.abs(a01) ** 2
    det = jnp.maximum(det, 1e-12)
    x0 = (a11 * b0 - a01 * b1) / det
    x1 = (a00 * b1 - jnp.conj(a01) * b0) / det
    nv = jnp.asarray(noise_var)[..., None]
    nv0 = nv * a11 / det
    nv1 = nv * a00 / det
    return (jnp.stack([x0, x1], axis=-2),
            jnp.stack([nv0, nv1], axis=-2))


def zf_2x2(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2x2 MIMO zero-forcing by explicit inverse.

    y: [..., 2, n_re]; h: [..., 2, 2, n_re] with h[rx, tx];
    Returns (x_hat [..., 2, n_re], post_noise_var [..., 2, n_re]).
    """
    h00, h01 = h[..., 0, 0, :], h[..., 0, 1, :]
    h10, h11 = h[..., 1, 0, :], h[..., 1, 1, :]
    det = h00 * h11 - h01 * h10
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12 + 0j, det)
    y0, y1 = y[..., 0, :], y[..., 1, :]
    x0 = (h11 * y0 - h01 * y1) / det
    x1 = (-h10 * y0 + h00 * y1) / det
    inv_det2 = 1.0 / (jnp.abs(det) ** 2)
    nv = jnp.asarray(noise_var)[..., None]
    nv0 = nv * (jnp.abs(h11) ** 2 + jnp.abs(h01) ** 2) * inv_det2
    nv1 = nv * (jnp.abs(h10) ** 2 + jnp.abs(h00) ** 2) * inv_det2
    return (jnp.stack([x0, x1], axis=-2), jnp.stack([nv0, nv1], axis=-2))
