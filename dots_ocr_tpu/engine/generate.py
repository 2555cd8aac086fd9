"""Jitted batch generation: bucketed prefill + fixed-shape decode loop.

This is the "minimum end-to-end slice" engine (SURVEY.md §7): a contiguous
KV cache and a ``lax.while_loop`` decode with early exit when every sequence
has emitted EOS. The continuous-batching paged engine
(``engine/scheduler.py``) supersedes it for serving; this path remains the
reference semantics and the simplest TPU benchmark harness.

Shape policy: one compilation per (prompt_bucket, max_new_tokens,
vision_bucket) triple; everything else is masked, never sliced.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dots_ocr_tpu.engine.sampling import sample_logits
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.decoder import KVCache
from dots_ocr_tpu.models.rope import vision_rope_device
from dots_ocr_tpu.models.vlm import vlm_decode_step, vlm_prefill


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray       # [B, max_new_tokens] int32 (pad after EOS)
    num_generated: jnp.ndarray  # [B] int32, includes the EOS token if hit


@partial(
    jax.jit,
    static_argnames=("config", "max_new_tokens", "attn_impl", "nucleus"),
    donate_argnames=(),
)
def generate(
    params: dict,
    config: DotsOCRConfig,
    input_ids: jnp.ndarray,
    seq_lens: jnp.ndarray,
    rng: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    max_new_tokens: int,
    patches: Optional[jnp.ndarray] = None,
    pos2d: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    scatter_batch: Optional[jnp.ndarray] = None,
    scatter_pos: Optional[jnp.ndarray] = None,
    window_ids: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    nucleus: bool = True,
) -> GenerateResult:
    """Generate up to ``max_new_tokens`` per sequence.

    input_ids: [B, T_bucket] (right-padded); seq_lens: [B] true prompt
    lengths; temperature/top_p: [B] per-request sampling params.

    Memory note: this path allocates a contiguous
    [L, B, T_bucket + max_new_tokens] cache — at flagship size that is
    ~430 MB per 1k tokens per sequence. Large max_new_tokens (the parser's
    16384 default) belongs on the paged continuous-batching engine; here it
    can exceed HBM next to the 5.6 GB of parameters.
    """
    batch, t_bucket = input_ids.shape
    eos = config.special.eos_token_id
    pad = config.special.pad_token_id
    rope_cos = rope_sin = None
    if pos2d is not None:
        # 2D-RoPE tables computed on device from compact positions (the
        # host upload is [T, 2] int32, not 2 x [T, head_dim] f32).
        rope_cos, rope_sin = vision_rope_device(
            pos2d, config.vision.head_dim, config.vision.rope_theta
        )
    positions = jnp.broadcast_to(jnp.arange(t_bucket), (batch, t_bucket))

    logits, prefill_cache = vlm_prefill(
        params,
        config,
        input_ids,
        positions,
        seq_lens,
        patches=patches,
        rope_cos=rope_cos,
        rope_sin=rope_sin,
        segment_ids=segment_ids,
        scatter_batch=scatter_batch,
        scatter_pos=scatter_pos,
        window_ids=window_ids,
        attn_impl=attn_impl,
        last_logit_only=True,
    )

    # Widen the cache for the decode phase.
    total_len = t_bucket + max_new_tokens
    cache = KVCache.create(
        config.decoder, batch, total_len, dtype=prefill_cache.k.dtype
    )
    cache = KVCache(
        cache.k.at[:, :, :t_bucket].set(prefill_cache.k),
        cache.v.at[:, :, :t_bucket].set(prefill_cache.v),
    )

    batch_idx = jnp.arange(batch)
    rng, step_rng = jax.random.split(rng)
    current = sample_logits(step_rng, logits, temperature, top_p, nucleus=nucleus)

    tokens0 = jnp.full((batch, max_new_tokens), pad, jnp.int32)
    done0 = jnp.zeros((batch,), bool)
    count0 = jnp.zeros((batch,), jnp.int32)

    def cond(state):
        step, _, _, done, _, _, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, current, cache, done, tokens, count, rng = state
        # Record the token sampled for this step (frozen rows keep pad).
        tokens = tokens.at[batch_idx, step].set(jnp.where(done, pad, current))
        count = count + jnp.where(done, 0, 1).astype(jnp.int32)
        newly_done = current == eos
        # Feed the token through the decoder (harmless for finished rows).
        pos = seq_lens + step
        logits, cache = vlm_decode_step(
            params, config, current, pos, cache, pos + 1
        )
        rng, step_rng = jax.random.split(rng)
        nxt = sample_logits(step_rng, logits, temperature, top_p, nucleus=nucleus)
        done = done | newly_done
        return (step + 1, nxt, cache, done, tokens, count, rng)

    state = (jnp.int32(0), current, cache, done0, tokens0, count0, rng)
    _, _, _, _, tokens, count, _ = jax.lax.while_loop(cond, body, state)
    return GenerateResult(tokens=tokens, num_generated=count)


def bucket_length(n: int, step: int = 128, minimum: int = 128) -> int:
    """Round a length up to the compilation bucket grid."""
    return max(minimum, ((n + step - 1) // step) * step)
