"""Device-side token sampling: greedy / temperature / top-p.

Matches the reference's sampling surface (vLLM via OpenAI params —
``temperature``, ``top_p``, defaults 0.1/1.0 at ``dots_ocr/parser.py:27-28``,
0.9 temperature for SVG at ``demo/demo_vllm_svg.py:35``). Everything is
branch-free and fixed-shape so it lives inside the jitted decode loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_logits(
    rng: jax.Array,
    logits: jnp.ndarray,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    nucleus: bool = True,
) -> jnp.ndarray:
    """Sample next tokens. logits: [B, V] float32; temperature/top_p: [B]
    (scalars broadcast). temperature <= 0 means greedy. Returns [B] int32.

    ``nucleus`` is a STATIC flag: the full-vocab sort behind top-p costs
    real decode throughput at V=152k, so callers whose whole batch runs
    top_p >= 1 (the layout/OCR default, ``parser.py:28``) compile the
    sort-free variant. With nucleus=False the top_p argument is ignored.

    Implementation notes (all per-row, vectorized):
      * greedy rows are selected with where(), not control flow,
      * top-p masks the tail of the sorted distribution; the most-probable
        token always survives (nucleus definition),
      * categorical (Gumbel-max) sampling avoids building a CDF.
    """
    logits = logits.astype(jnp.float32)
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    if temperature.ndim == 0:
        temperature = jnp.broadcast_to(temperature, logits.shape[:1])
    if top_p.ndim == 0:
        top_p = jnp.broadcast_to(top_p, logits.shape[:1])

    greedy_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # Scaled logits (guard temperature 0 for the greedy rows).
    safe_t = jnp.where(temperature > 0, temperature, 1.0)
    scaled = logits / safe_t[:, None]

    if nucleus:
        # Top-p filtering in sorted space, scattered back via argsort inverse.
        sort_idx = jnp.argsort(-scaled, axis=-1)
        sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cumprobs = jnp.cumsum(sorted_probs, axis=-1)
        # Keep tokens while the cumulative mass *before* them is < top_p;
        # the first token is always kept.
        keep_sorted = (cumprobs - sorted_probs) < top_p[:, None]
        keep = jnp.zeros_like(keep_sorted).at[
            jnp.arange(logits.shape[0])[:, None], sort_idx
        ].set(keep_sorted)
        scaled = jnp.where(keep, scaled, -jnp.inf)

    sampled = jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled, greedy_tokens)
