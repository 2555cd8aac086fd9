"""The full VLM: vision tokens spliced into the decoder's embedding stream.

The prompt carries an image span ``<|img|><|imgpad|>*N<|endofimg|>`` where N
is the merged-vision-token count for the image (reference client convention
at ``dots_ocr/model/inference.py:33``; vLLM expands the pad server-side).
Here the splice is a static scatter: the host precomputes, per batch row,
the positions of the ``<|imgpad|>`` tokens and which merged vision row fills
each one, so the jitted function does one ``.at[].set`` — no dynamic shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.decoder import (
    KVCache,
    decoder_decode_step,
    decoder_prefill,
    embed_tokens,
    logits_from_hidden,
)
from dots_ocr_tpu.models.vision import encode_images


def splice_vision_embeddings(
    token_embeds: jnp.ndarray,
    vision_tokens: jnp.ndarray,
    batch_idx: jnp.ndarray,
    pos_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Insert vision tokens at imgpad positions.

    token_embeds: [B, T, D]; vision_tokens: [M, D] (padded rows allowed);
    batch_idx/pos_idx: [M] destination coordinates. Bucket-padding rows
    carry out-of-bounds sentinels (B, T) and are dropped by the scatter.
    """
    return token_embeds.at[batch_idx, pos_idx].set(
        vision_tokens.astype(token_embeds.dtype), mode="drop"
    )


def build_scatter_indices(
    input_ids: np.ndarray,
    imgpad_id: int,
    num_merged_padded: int,
    valid_rows: "np.ndarray | None" = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host helper: destination coords of each merged vision row.

    The k-th imgpad token is filled by the k-th VALID merged vision row —
    row ``valid_rows[k]`` when given (window packing interleaves padded
    rows), else row k. All other rows (window/bucket padding) get
    out-of-bounds sentinel coords (B, T); the device scatter uses
    mode="drop" so they are discarded.
    """
    batch_idx, pos_idx = np.nonzero(input_ids == imgpad_id)
    m = len(batch_idx)
    rows = (
        np.asarray(valid_rows)[:m] if valid_rows is not None else np.arange(m)
    )
    if m > (len(valid_rows) if valid_rows is not None else num_merged_padded):
        raise ValueError(
            f"{m} imgpad tokens but only "
            f"{len(valid_rows) if valid_rows is not None else num_merged_padded} "
            "valid vision rows"
        )
    out_b = np.full(num_merged_padded, input_ids.shape[0], np.int32)
    out_p = np.full(num_merged_padded, input_ids.shape[1], np.int32)
    out_b[rows] = batch_idx
    out_p[rows] = pos_idx
    return out_b, out_p


def vlm_embed(
    params: dict,
    config: DotsOCRConfig,
    input_ids: jnp.ndarray,
    patches: Optional[jnp.ndarray] = None,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    scatter_batch: Optional[jnp.ndarray] = None,
    scatter_pos: Optional[jnp.ndarray] = None,
    window_ids: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    mesh=None,
) -> jnp.ndarray:
    """The embedding stage of a prefill only: token embeddings with the
    vision tokens spliced in at the imgpad positions. Returns [B, T, D].

    Split out from :func:`vlm_prefill` so chunked prefill (the scheduler's
    decode-interleaved admission path) can run the encoder once and then
    feed the decoder stack chunk by chunk via ``decoder_prefill_extend``.
    """
    x = embed_tokens(params["decoder"], input_ids)
    if patches is not None:
        vision_tokens = encode_images(
            params["vision"],
            config.vision,
            patches,
            rope_cos,
            rope_sin,
            segment_ids,
            window_ids=window_ids,
            attn_impl=attn_impl,
            mesh=mesh,
        )
        x = splice_vision_embeddings(x, vision_tokens, scatter_batch, scatter_pos)
    return x


def vlm_prefill(
    params: dict,
    config: DotsOCRConfig,
    input_ids: jnp.ndarray,
    positions: jnp.ndarray,
    seq_lens: jnp.ndarray,
    patches: Optional[jnp.ndarray] = None,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    scatter_batch: Optional[jnp.ndarray] = None,
    scatter_pos: Optional[jnp.ndarray] = None,
    window_ids: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    last_logit_only: bool = False,
    remat: bool = False,
    mesh=None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Full multimodal prefill.

    input_ids/positions: [B, T]; seq_lens: [B]. Vision args are the packed
    arrays from ``preprocess.pack_images`` plus scatter coords from
    ``build_scatter_indices`` (all optional: text-only prefill skips the
    encoder entirely).

    Returns (logits, KVCache). logits is [B, T, V] float32, or [B, V] when
    ``last_logit_only`` — generation needs only the last valid position, and
    the full [B, T, V] f32 tensor is ~10 GB at B=16, T=1k, V=152k.
    """
    x = vlm_embed(
        params,
        config,
        input_ids,
        patches=patches,
        rope_cos=rope_cos,
        rope_sin=rope_sin,
        segment_ids=segment_ids,
        scatter_batch=scatter_batch,
        scatter_pos=scatter_pos,
        window_ids=window_ids,
        attn_impl=attn_impl,
        mesh=mesh,
    )

    hidden, cache = decoder_prefill(
        params["decoder"], config.decoder, x, positions, seq_lens, attn_impl,
        remat=remat, mesh=mesh,
    )
    if last_logit_only:
        batch_idx = jnp.arange(hidden.shape[0])
        hidden = hidden[batch_idx, seq_lens - 1]  # [B, D]
    logits = logits_from_hidden(params["decoder"], config.decoder, hidden)
    return logits, cache


def vlm_decode_step(
    params: dict,
    config: DotsOCRConfig,
    token_ids: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    seq_lens: jnp.ndarray,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step. token_ids/positions/seq_lens: [B].

    Returns (logits [B, V] float32, updated cache)."""
    x = embed_tokens(params["decoder"], token_ids)
    hidden, cache = decoder_decode_step(
        params["decoder"], config.decoder, x, positions, cache, seq_lens
    )
    logits = logits_from_hidden(params["decoder"], config.decoder, hidden)
    return logits, cache
