"""Transport-block segmentation / desegmentation (TS 38.212 §5.2.2).

TB → codeblocks with TB-CRC and per-CB CRC24B attachment and filler
insertion; static shapes per TBS configuration so the downstream encoder
sees a fixed [C, K] batch.  Reference counterpart:
lib/phy/upper/channel_coding/ldpc/ldpc_segmenter_impl.cpp.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ran.ldpc_params import SegmentParams
from .. import crc as crc_ops


def segment_tx(tb_bits: jnp.ndarray, params: SegmentParams) -> jnp.ndarray:
    """[A] or [B, A] TB bits → [*, C, K] codeblock messages (filler = 0)."""
    squeeze = tb_bits.ndim == 1
    if squeeze:
        tb_bits = tb_bits[None]
    bsz, a = tb_bits.shape
    tb_crc_name = "crc24A" if params.tb_crc_bits == 24 else "crc16"
    with_crc = crc_ops.crc_attach(tb_bits, tb_crc_name)     # [B, A+L]
    c = params.nof_segments
    payload = params.payload_length - params.cb_crc_bits
    assert with_crc.shape[-1] == c * payload
    segments = with_crc.reshape(bsz, c, payload)
    if params.cb_crc_bits:
        segments = crc_ops.crc_attach(segments, "crc24B")   # [B, C, K']
    filler = jnp.zeros((bsz, c, params.nof_filler_bits), dtype=segments.dtype)
    out = jnp.concatenate([segments, filler], axis=-1)      # [B, C, K]
    return out[0] if squeeze else out


def desegment_rx(cb_bits: jnp.ndarray, params: SegmentParams
                 ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[*, C, K] decoded messages → (tb [*, A], tb_crc_ok [*], cb_crc_ok [*, C])."""
    squeeze = cb_bits.ndim == 2
    if squeeze:
        cb_bits = cb_bits[None]
    bsz = cb_bits.shape[0]
    payload_with_crc = cb_bits[..., :params.payload_length]
    if params.cb_crc_bits:
        cb_ok = crc_ops.crc_check(payload_with_crc, "crc24B")
        payload = payload_with_crc[..., :-params.cb_crc_bits]
    else:
        cb_ok = jnp.ones(cb_bits.shape[:-1], dtype=bool)
        payload = payload_with_crc
    tb_with_crc = payload.reshape(bsz, -1)
    tb_crc_name = "crc24A" if params.tb_crc_bits == 24 else "crc16"
    tb_ok = crc_ops.crc_check(tb_with_crc, tb_crc_name)
    tb = tb_with_crc[..., :-params.tb_crc_bits]
    if squeeze:
        return tb[0], tb_ok[0], cb_ok[0]
    return tb, tb_ok, cb_ok
