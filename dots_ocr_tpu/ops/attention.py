"""Attention ops: XLA reference implementations + mask builders.

This module is the always-correct baseline the Pallas kernels in
``dots_ocr_tpu.ops.flash_attention`` are tested against; the dispatcher
``attention()`` picks the implementation. Replaces, TPU-natively, what the
reference delegates to flash-attn 2.8 CUDA kernels (``docker/Dockerfile:5``,
``parser.py:71``) and vLLM's PagedAttention.

Conventions:
  * q: [B, T, H, D], k/v: [B, S, KV, D] with H a multiple of KV (GQA),
  * masks are boolean [B, T, S] (True = attend), built by the helpers below,
  * softmax in float32, outputs in q.dtype,
  * everything static-shaped: padding is masked, never sliced.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def make_causal_mask(q_positions: jnp.ndarray, kv_len: int) -> jnp.ndarray:
    """Causal mask for prefill. q_positions: [B, T] absolute positions of the
    query tokens; keys are positions 0..kv_len-1. Returns bool [B, T, kv_len]."""
    kv_pos = jnp.arange(kv_len)[None, None, :]
    return kv_pos <= q_positions[:, :, None]


def make_length_mask(seq_lens: jnp.ndarray, length: int) -> jnp.ndarray:
    """Valid-token mask: [B] lengths -> bool [B, length]."""
    return jnp.arange(length)[None, :] < seq_lens[:, None]


def make_segment_mask(
    q_segments: jnp.ndarray, kv_segments: jnp.ndarray
) -> jnp.ndarray:
    """Block-diagonal mask for packed sequences (NaViT image packing).

    Segment id < 0 marks padding. Returns bool [..., T, S]: attend only
    within the same non-negative segment.
    """
    same = q_segments[..., :, None] == kv_segments[..., None, :]
    valid = (q_segments[..., :, None] >= 0) & (kv_segments[..., None, :] >= 0)
    return same & valid


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query attention via plain XLA einsums (f32 softmax).

    q: [B, T, H, D]; k, v: [B, S, KV, D]; mask: bool [B, T, S] or [B, 1, T, S].
    """
    batch, q_len, num_heads, head_dim = q.shape
    kv_heads = k.shape[2]
    assert num_heads % kv_heads == 0, (num_heads, kv_heads)
    group = num_heads // kv_heads
    scale = scale if scale is not None else head_dim**-0.5

    qg = q.reshape(batch, q_len, kv_heads, group, head_dim)
    # scores: [B, KV, G, T, S]
    scores = jnp.einsum(
        "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None, None, :, :]
        elif mask.ndim == 4:  # [B, 1, T, S]
            mask = mask[:, :, None, :, :]
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bkgts,bskd->btkgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(batch, q_len, num_heads, head_dim).astype(q.dtype)


def decode_attention_reference(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    seq_lens: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-token decode attention over a contiguous KV cache.

    q: [B, H, D] (one new token per sequence); k_cache/v_cache:
    [B, MAX_S, KV, D]; seq_lens: [B] number of valid cache entries
    (including the token written this step).
    """
    mask = make_length_mask(seq_lens, k_cache.shape[1])  # [B, S]
    out = mha_reference(
        q[:, None], k_cache, v_cache, mask=mask[:, None, :], scale=scale
    )
    return out[:, 0]


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "xla",
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    mesh=None,
    tp_axis: str = "model",
    **kwargs,
) -> jnp.ndarray:
    """Dispatcher.

    impl:
      * 'xla' — dense-mask reference (mask wins; else built from causal/
        segments). Always correct, materializes [B, T, S] scores.
      * 'flash' — Pallas online-softmax kernel (segment ids + causal flag;
        causal assumes query index == absolute position, which holds for
        engine prefill where sequences start at position 0).
      * 'flash_interpret' — same kernel in interpreter mode (CPU tests).

    ``mesh``: a jax.sharding.Mesh with a ``tp_axis`` axis > 1 wraps the
    flash kernel in jax.shard_map over head-sharded operands (ops.tp) —
    the TP serving fast path. Ignored on the XLA path (GSPMD partitions
    plain einsums fine).
    """
    if impl == "xla":
        if mask is None and (q_segment_ids is not None or causal):
            t, s = q.shape[1], k.shape[1]
            mask = jnp.ones((q.shape[0], t, s), bool)
            if q_segment_ids is not None:
                mask &= make_segment_mask(q_segment_ids, kv_segment_ids)
            if causal:
                positions = jnp.broadcast_to(jnp.arange(t), (q.shape[0], t))
                mask &= make_causal_mask(positions, s)
        return mha_reference(q, k, v, mask=mask, **kwargs)
    if impl in ("flash", "flash_interpret"):
        if mesh is not None:
            from dots_ocr_tpu.ops.tp import flash_attention_tp

            return flash_attention_tp(
                q,
                k,
                v,
                q_segment_ids=q_segment_ids,
                kv_segment_ids=kv_segment_ids,
                mesh=mesh,
                axis=tp_axis,
                causal=causal,
                interpret=(impl == "flash_interpret"),
                **kwargs,
            )
        from dots_ocr_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q,
            k,
            v,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            causal=causal,
            interpret=(impl == "flash_interpret"),
            **kwargs,
        )
    raise ValueError(f"unknown attention impl: {impl}")
