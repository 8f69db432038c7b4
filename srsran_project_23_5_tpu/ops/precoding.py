"""Channel precoding and layer mapping (TS 38.211 §7.3.1.3-4, §6.3.1.5).

Counterpart of the reference's channel_precoder (generic + AVX2,
lib/phy/upper/precoding/channel_precoder_avx2.cpp): RE × precoding-matrix
products, batched over all REs, decomposed into scalar-plane
multiply-adds (the axon TPU backend lacks complex dot/einsum).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def layer_map(symbols: jnp.ndarray, nof_layers: int) -> jnp.ndarray:
    """Codeword symbols [..., M] → layers [..., nof_layers, M/nof_layers]
    (TS 38.211 Table 7.3.1.3-1, single codeword up to 4 layers).
    Float-plane strided split: complex transposes are unimplemented on
    the TPU backend (ops/cplx.py)."""
    m = symbols.shape[-1]
    assert m % nof_layers == 0
    if jnp.iscomplexobj(symbols):
        from . import cplx
        return cplx.clayer_split(symbols, nof_layers)
    return (symbols.reshape(*symbols.shape[:-1], m // nof_layers,
                            nof_layers).swapaxes(-1, -2))


def layer_demap(layers: jnp.ndarray) -> jnp.ndarray:
    *lead, v, mdiv = layers.shape
    return layers.swapaxes(-1, -2).reshape(*lead, v * mdiv)


def layer_demap_llr(llr_layers: jnp.ndarray, qm: int) -> jnp.ndarray:
    """Per-layer LLRs [..., L, M_l*qm] → codeword LLRs [..., L*M_l*qm].

    Inverse of layer_map at bit granularity: codeword symbol d(L·i + l) is
    layer l's i-th symbol, so codeword bit (L·i + l)·qm + q = layer bit
    (l, i·qm + q).
    """
    *lead, v, mq = llr_layers.shape
    m = mq // qm
    x = llr_layers.reshape(*lead, v, m, qm)
    x = jnp.swapaxes(x, -3, -2)                       # [..., m, v, qm]
    return x.reshape(*lead, v * m * qm)


def apply_precoding(layers: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[..., nof_layers, n_re] × w[nof_ports, nof_layers] → [..., nof_ports, n_re].

    Decomposed into per-(port, layer) scalar·plane products: complex
    einsum/dot is unsupported on the axon TPU backend, and with ≤4 ports ×
    ≤4 layers the explicit expansion is the same FLOPs with no MXU need.
    Host `w` enters as float planes (complex host constants are
    device-hostile).
    """
    w = np.asarray(w, np.complex64)
    nports, nlayers = w.shape
    assert layers.shape[-2] == nlayers
    out = []
    for p in range(nports):
        acc = None
        for l in range(nlayers):
            if w[p, l] == 0:
                continue
            c = jax.lax.complex(jnp.float32(w[p, l].real),
                                jnp.float32(w[p, l].imag))
            term = c * layers[..., l, :]
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(layers[..., 0, :])
        out.append(acc)
    return jnp.stack(out, axis=-2)


def identity_precoder(nof_ports: int, nof_layers: int) -> np.ndarray:
    w = np.zeros((nof_ports, nof_layers), dtype=np.complex64)
    for l in range(nof_layers):
        w[l % nof_ports, l] = 1.0
    return w


def one_layer_codebook(nof_ports: int, pmi: int) -> np.ndarray:
    """Single-layer type-I codebook column (TS 38.214 Table 5.2.2.2.1-5
    style, 2-port exact; >2 ports DFT beam)."""
    if nof_ports == 1:
        return np.ones((1, 1), dtype=np.complex64)
    if nof_ports == 2:
        # W in {[1,1],[1,j],[1,-1],[1,-j]} / sqrt(2)
        phase = [1, 1j, -1, -1j][pmi % 4]
        return (np.array([[1.0], [phase]], dtype=np.complex64)
                / np.sqrt(2.0))
    n = np.arange(nof_ports)
    return (np.exp(2j * np.pi * pmi * n / nof_ports)[:, None]
            / np.sqrt(nof_ports)).astype(np.complex64)
