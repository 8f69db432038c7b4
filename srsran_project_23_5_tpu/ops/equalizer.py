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


def zf_nx4(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """N×4 MIMO zero-forcing via 2×2 Schur-block inversion of HᴴH.

    x̂ = (HᴴH)⁻¹Hᴴy per RE with the 4×4 Hermitian Gram matrix inverted
    blockwise (G = [[A,B],[Bᴴ,C]]; S = C − BᴴA⁻¹B) — every step is an
    elementwise complex multiply-add over the RE axis, so nothing lowers
    to the TPU backend's unimplemented complex dot/transpose ops.  The
    reference tops out at specialized 2×2 kernels + a generic Gauss
    fallback (channel_equalizer_zf_impl.cpp); this reuses the 2×2
    algebra the nx2 path already verifies.

    y: [..., nrx, n_re]; h: [..., nrx, 4, n_re]; noise_var broadcastable.
    Returns (x_hat [..., 4, n_re], post_noise_var [..., 4, n_re]).
    """
    hs = [h[..., :, i, :] for i in range(4)]             # [..., nrx, n_re]
    # Gram entries (i<=j) and matched-filter outputs
    g = {}
    for i in range(4):
        for j in range(i, 4):
            g[(i, j)] = jnp.sum(jnp.conj(hs[i]) * hs[j], axis=-2)
    b = [jnp.sum(jnp.conj(hs[i]) * y, axis=-2) for i in range(4)]
    g00, g11 = g[(0, 0)].real, g[(1, 1)].real
    g22, g33 = g[(2, 2)].real, g[(3, 3)].real
    g01, g23 = g[(0, 1)], g[(2, 3)]
    b00, b01v, b10, b11v = g[(0, 2)], g[(0, 3)], g[(1, 2)], g[(1, 3)]
    # A⁻¹ (2x2 Hermitian)
    det_a = jnp.maximum(g00 * g11 - jnp.abs(g01) ** 2, 1e-12)
    i00, i11 = g11 / det_a, g00 / det_a
    i01 = -g01 / det_a
    # T = A⁻¹B
    t00 = i00 * b00 + i01 * b10
    t01 = i00 * b01v + i01 * b11v
    t10 = jnp.conj(i01) * b00 + i11 * b10
    t11 = jnp.conj(i01) * b01v + i11 * b11v
    # S = C − BᴴT (Hermitian)
    s00 = g22 - (jnp.conj(b00) * t00 + jnp.conj(b10) * t10).real
    s11 = g33 - (jnp.conj(b01v) * t01 + jnp.conj(b11v) * t11).real
    s01 = g23 - (jnp.conj(b00) * t01 + jnp.conj(b10) * t11)
    det_s = jnp.maximum(s00 * s11 - jnp.abs(s01) ** 2, 1e-12)
    j00, j11 = s11 / det_s, s00 / det_s
    j01 = -s01 / det_s
    # u = A⁻¹ b_a ; v = b_b − Bᴴu ; x_b = S⁻¹v ; x_a = u − T x_b
    u0 = i00 * b[0] + i01 * b[1]
    u1 = jnp.conj(i01) * b[0] + i11 * b[1]
    v0 = b[2] - (jnp.conj(b00) * u0 + jnp.conj(b10) * u1)
    v1 = b[3] - (jnp.conj(b01v) * u0 + jnp.conj(b11v) * u1)
    x2 = j00 * v0 + j01 * v1
    x3 = jnp.conj(j01) * v0 + j11 * v1
    x0 = u0 - (t00 * x2 + t01 * x3)
    x1 = u1 - (t10 * x2 + t11 * x3)
    # post noise var: σ²·diag(G⁻¹); top block = A⁻¹ + T S⁻¹ Tᴴ
    d0 = i00 + (jnp.abs(t00) ** 2 * j00 + jnp.abs(t01) ** 2 * j11
                + 2.0 * (t00 * j01 * jnp.conj(t01)).real)
    d1 = i11 + (jnp.abs(t10) ** 2 * j00 + jnp.abs(t11) ** 2 * j11
                + 2.0 * (t10 * j01 * jnp.conj(t11)).real)
    nv = jnp.asarray(noise_var)[..., None]
    return (jnp.stack([x0, x1, x2, x3], axis=-2),
            jnp.stack([nv * d0, nv * d1, nv * j00, nv * j11], axis=-2))
