"""LDPC rate matching / dematching (TS 38.212 §5.4.2).

TPU-idiomatic: for a static (BG, Zc, K', Ncb, rv, E, Qm) configuration the
bit-selection pattern is a fixed permutation, precomputed on the host as an
index vector.  Matching is then one gather + reshape (interleaver); recovery
is a scatter-add that also implements LLR soft-combining of repeated bits
— replacing the reference's sequential circular-buffer walks
(lib/phy/upper/channel_coding/ldpc/ldpc_rate_matcher_impl.cpp:64-134 and
ldpc_rate_dematcher_impl.cpp with AVX2/AVX512/NEON variants).

Buffer convention: the circular buffer is the full codeword minus the first
2*Zc punctured systematic columns (length N = 66*Zc or 50*Zc).  Filler bit
positions [K'-2Zc, K-2Zc) are skipped by bit selection and restored as
"known zero" (+LLR_INFTY) on the receive side.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ...ran import ldpc_params
from ...ran.constants import LLR_INFTY


@functools.lru_cache(maxsize=1024)
def selection_indices(base_graph: int, lifting_size: int, rv: int,
                      payload_length: int, segment_length: int, e: int,
                      ncb: int | None = None) -> np.ndarray:
    """Index into the circular buffer for each of the E selected bits."""
    n = (66 if base_graph == 1 else 50) * lifting_size
    ncb = n if ncb is None else ncb
    k0 = ldpc_params.rate_match_k0(base_graph, lifting_size, rv, ncb)
    f_begin = payload_length - 2 * lifting_size   # filler start in buffer
    f_end = segment_length - 2 * lifting_size     # filler end in buffer
    idx = np.empty(e, dtype=np.int32)
    k = k0
    for j in range(e):
        while f_begin <= (k % ncb) < f_end:
            k += 1
        idx[j] = k % ncb
        k += 1
    return idx


def interleave(bits: jnp.ndarray, qm: int) -> jnp.ndarray:
    """Bit interleaver (TS 38.212 §5.4.2.2): [..., E] → [..., E]."""
    *lead, e = bits.shape
    return (bits.reshape(*lead, qm, e // qm)
            .swapaxes(-1, -2)
            .reshape(*lead, e))


def deinterleave(bits: jnp.ndarray, qm: int) -> jnp.ndarray:
    *lead, e = bits.shape
    return (bits.reshape(*lead, e // qm, qm)
            .swapaxes(-1, -2)
            .reshape(*lead, e))


def match(codeword: jnp.ndarray, base_graph: int, lifting_size: int, rv: int,
          payload_length: int, segment_length: int, e: int,
          qm: int) -> jnp.ndarray:
    """Full codeword [..., N_full*Zc] {0,1} → rate-matched bits [..., E]."""
    buffer = codeword[..., 2 * lifting_size:]
    idx = selection_indices(base_graph, lifting_size, rv, payload_length,
                            segment_length, e)
    selected = jnp.take(buffer, jnp.asarray(idx), axis=-1)
    return interleave(selected, qm)


@functools.lru_cache(maxsize=1024)
def inverse_selection_maps(base_graph: int, lifting_size: int, rv: int,
                           payload_length: int, segment_length: int,
                           e: int) -> tuple[np.ndarray, ...]:
    """Per-wrap inverse maps: inv_r[i] = j of the r-th transmission of
    buffer bit i (or e, pointing at a zero pad slot).

    Turns the dematcher's scatter-add into a handful of gathers — TPU
    scatters serialize, gathers vectorize.
    """
    n = (66 if base_graph == 1 else 50) * lifting_size
    idx = selection_indices(base_graph, lifting_size, rv, payload_length,
                            segment_length, e)
    hits = np.zeros(n, dtype=np.int32)
    for i in idx:
        hits[i] += 1
    wraps = int(hits.max()) if len(idx) else 0
    inv = [np.full(n, e, dtype=np.int32) for _ in range(wraps)]
    count = np.zeros(n, dtype=np.int32)
    for j, i in enumerate(idx):
        inv[count[i]][i] = j
        count[i] += 1
    return tuple(inv)


def dematch(llr: jnp.ndarray, base_graph: int, lifting_size: int, rv: int,
            payload_length: int, segment_length: int, e: int, qm: int,
            llr_infty: float = float(LLR_INFTY)) -> jnp.ndarray:
    """Rate-matched LLRs [..., E] → full-codeword LLRs [..., N_full*Zc].

    Repeated transmissions of the same buffer bit are soft-combined.
    Punctured systematic LLRs are 0; filler positions are pinned to
    +llr_infty (bit surely 0).
    """
    z = lifting_size
    de = deinterleave(llr, qm)
    *lead, _ = llr.shape
    de_pad = jnp.concatenate(
        [de, jnp.zeros((*lead, 1), dtype=de.dtype)], axis=-1)
    invs = inverse_selection_maps(base_graph, lifting_size, rv,
                                  payload_length, segment_length, e)
    buffer = de_pad[..., jnp.asarray(invs[0])]
    for inv in invs[1:]:
        buffer = buffer + de_pad[..., jnp.asarray(inv)]
    f_begin = payload_length - 2 * z
    f_end = segment_length - 2 * z
    n = (66 if base_graph == 1 else 50) * z
    pos = jnp.arange(n)
    filler = (pos >= f_begin) & (pos < f_end)
    buffer = jnp.where(filler, jnp.asarray(llr_infty, de.dtype), buffer)
    punct = jnp.zeros((*lead, 2 * z), dtype=de.dtype)
    return jnp.concatenate([punct, buffer], axis=-1)


@functools.lru_cache(maxsize=256)
def tb_maps(base_graph: int, lifting_size: int, rv: int,
            payload_length: int, segment_length: int,
            cb_lengths: tuple[int, ...], qm: int
            ) -> tuple[np.ndarray, tuple[np.ndarray, ...], np.ndarray]:
    """Whole-transport-block forward/inverse rate-match permutations.

    Fuses, on the host, the per-codeblock circular-buffer bit selection
    (TS 38.212 §5.4.2.1) AND the bit interleaver (§5.4.2.2) into single
    index tables so the device work is ONE gather for the whole TB instead
    of one gather+reshape per codeblock (the round-1 per-CB Python loop
    that serialized the hot path and bloated compile time).

    Returns:
      fwd  [G] int32 — final TB codeword bit g comes from
                        flat position fwd[g] of the [C, N_full*Zc] codeword.
      invs tuple of [C*Nbuf] int32 — per-wrap inverse maps into the padded
                        TB LLR vector [G+1] (slot G is a zero pad); summing
                        the gathers soft-combines repeated bits.
      filler [Nbuf] bool — filler positions (same for every CB of a TB).
    """
    z = lifting_size
    nbuf = (66 if base_graph == 1 else 50) * z
    nfull = nbuf + 2 * z
    offs = np.concatenate([[0], np.cumsum(cb_lengths)]).astype(np.int64)
    g_total = int(offs[-1])

    fwd = np.empty(g_total, dtype=np.int32)
    wraps_max = 0
    per_cb = []
    for r, e in enumerate(cb_lengths):
        idx = selection_indices(base_graph, z, rv, payload_length,
                                segment_length, e)
        m = e // qm
        # fold §5.4.2.2 interleaving: output j*qm+q reads selected[q*m+j]
        inter = idx.reshape(qm, m).T.reshape(-1)
        fwd[offs[r]:offs[r + 1]] = r * nfull + 2 * z + inter
        # inverse with deinterleave folded: buffer bit i's w-th transmission
        # sits at raw LLR position (p % m)*qm + (p // m) where p = inv[w][i]
        invs_cb = inverse_selection_maps(base_graph, z, rv, payload_length,
                                         segment_length, e)
        wraps_max = max(wraps_max, len(invs_cb))
        per_cb.append((invs_cb, m, e))

    c = len(cb_lengths)
    invs = [np.full(c * nbuf, g_total, dtype=np.int32)
            for _ in range(wraps_max)]
    for r, (invs_cb, m, e) in enumerate(per_cb):
        for w, inv in enumerate(invs_cb):
            p = inv.astype(np.int64)
            valid = p < e
            raw = (p % m) * qm + (p // m)
            dst = invs[w][r * nbuf:(r + 1) * nbuf]
            dst[valid] = (offs[r] + raw[valid]).astype(np.int32)

    f_begin = payload_length - 2 * z
    f_end = segment_length - 2 * z
    pos = np.arange(nbuf)
    filler = (pos >= f_begin) & (pos < f_end)
    return fwd, tuple(invs), filler


def match_tb(codewords: jnp.ndarray, base_graph: int, lifting_size: int,
             rv: int, payload_length: int, segment_length: int,
             cb_lengths: tuple[int, ...], qm: int) -> jnp.ndarray:
    """All codeblocks [C, N_full*Zc] {0,1} → TB codeword bits [G]: 1 gather."""
    fwd, _, _ = tb_maps(base_graph, lifting_size, rv, payload_length,
                        segment_length, tuple(cb_lengths), qm)
    return codewords.reshape(-1)[jnp.asarray(fwd)]


def dematch_tb(llr: jnp.ndarray, base_graph: int, lifting_size: int,
               rv: int, payload_length: int, segment_length: int,
               cb_lengths: tuple[int, ...], qm: int,
               llr_infty: float = float(LLR_INFTY)) -> jnp.ndarray:
    """TB LLRs [G] → per-CB full-codeword LLRs [C, N_full*Zc]: 1-2 gathers.

    Repetitions soft-combine (one gather per wrap — ≥2 only when E > Ncb),
    fillers pin to +llr_infty, punctured 2Zc systematic positions get 0.
    """
    z = lifting_size
    c = len(cb_lengths)
    _, invs, filler = tb_maps(base_graph, lifting_size, rv, payload_length,
                              segment_length, tuple(cb_lengths), qm)
    nbuf = (66 if base_graph == 1 else 50) * z
    llr_pad = jnp.concatenate([llr, jnp.zeros((1,), llr.dtype)])
    buf = llr_pad[jnp.asarray(invs[0])]
    for inv in invs[1:]:
        buf = buf + llr_pad[jnp.asarray(inv)]
    buf = buf.reshape(c, nbuf)
    buf = jnp.where(jnp.asarray(filler), jnp.asarray(llr_infty, llr.dtype),
                    buf)
    punct = jnp.zeros((c, 2 * z), dtype=llr.dtype)
    return jnp.concatenate([punct, buf], axis=-1)


def combine_retransmission(acc_llr: jnp.ndarray, new_llr: jnp.ndarray,
                           payload_length: int, lifting_size: int,
                           llr_infty: float = float(LLR_INFTY)) -> jnp.ndarray:
    """HARQ soft combining of two full-codeword LLR arrays (saturating at
    the filler sentinel to keep "known" bits known)."""
    s = acc_llr + new_llr
    return jnp.clip(s, -llr_infty, llr_infty)
