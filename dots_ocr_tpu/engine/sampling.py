"""Device-side token sampling: greedy / temperature / top-p.

Matches the reference's sampling surface (vLLM via OpenAI params —
``temperature``, ``top_p``, defaults 0.1/1.0 at ``dots_ocr/parser.py:27-28``,
0.9 temperature for SVG at ``demo/demo_vllm_svg.py:35``). Everything is
branch-free and fixed-shape so it lives inside the jitted decode loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Top-p candidate pool. A full-vocab sort at V≈152k costs tens of ms per
# decode step on TPU; instead the nucleus is built over the top-K logits,
# with probabilities normalized by the TRUE full-vocab logsumexp so the
# cumulative masses are exact. Only distributions whose top-p mass needs
# >K tokens differ (the tail beyond K is unreachable); at serving
# temperatures (<=1) the 0.9 nucleus is covered by a few dozen tokens.
# Rows with top_p >= 1 bypass the pool entirely (full-vocab Gumbel-max).
NUCLEUS_TOP_K = 256


def fold_positions(slot_keys: jax.Array, positions: jax.Array) -> jax.Array:
    """Per-row sampling keys: fold each slot's base key with the absolute
    position of the token being emitted.

    This makes sampling STATELESS per request: the draw for position q is
    ``fold_in(slot_key, q)`` regardless of co-batched requests, chunk
    boundaries, speculation iterations, or preemption/replay — so a seeded
    request's sampled stream is bit-reproducible under continuous batching
    (the OpenAI ``seed`` param; vLLM offers per-request seeds, this design
    additionally makes them scheduling-invariant on device).

    slot_keys: [B, 2] uint32 raw PRNG keys; positions: [B] int32.
    """
    return jax.vmap(jax.random.fold_in)(slot_keys, positions)


def _subkeys(rng: jax.Array, tag: int) -> jax.Array:
    """Derive a tagged child key; works for one key [2] or rows [B, 2]."""
    if rng.ndim == 2:
        return jax.vmap(jax.random.fold_in, in_axes=(0, None))(rng, tag)
    return jax.random.fold_in(rng, tag)


def _categorical(rng: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """Gumbel-max draw over the last axis; rng is one key [2] shared by
    all rows (legacy) or per-row keys [B, 2] (scheduling-invariant)."""
    if rng.ndim == 2:
        return jax.vmap(jax.random.categorical)(rng, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def nucleus_top_k(scaled: jnp.ndarray, k: int):
    """Descending top-k candidate pool over the last axis.

    Uses TPU's PartialReduce (``lax.approx_max_k``): 4.5 ms vs lax.top_k's
    36 ms for 256 rows of V=151,936 at k=256 (measured r3, one chip). The
    pool was ALREADY documented as an approximation of true top-p (see
    NUCLEUS_TOP_K); approx recall (>=0.95 in expectation, misses only
    tail-probability candidates) stays inside that envelope. Every nucleus
    consumer — plain sampling here and the speculative verify
    (``engine/scheduler.spec_decode_program``) — must build the pool with
    THIS function so spec on/off keeps an identical kept set."""
    return jax.lax.approx_max_k(scaled, k)


def sample_logits(
    rng: jax.Array,
    logits: jnp.ndarray,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    nucleus: bool = True,
) -> jnp.ndarray:
    """Sample next tokens. logits: [B, V] float32; temperature/top_p: [B]
    (scalars broadcast). temperature <= 0 means greedy. Returns [B] int32.

    ``rng`` is either ONE key [2] (legacy batch-shared draw — the
    monolithic engine) or per-row keys [B, 2] (from
    :func:`fold_positions`; the serving engine's per-request chains).

    ``nucleus`` is a STATIC flag: even the top-K path costs a lax.top_k
    over the vocab, so callers whose whole batch runs top_p >= 1 (the
    layout/OCR default, ``parser.py:28``) compile the filter-free variant.
    With nucleus=False the top_p argument is ignored.

    Implementation notes (all per-row, vectorized):
      * greedy rows are selected with where(), not control flow,
      * top-p keeps the smallest prefix of the top-K (by true probability)
        whose mass reaches top_p; the most-probable token always survives
        (nucleus definition); see NUCLEUS_TOP_K on exactness,
      * rows with top_p >= 1 sample the full vocab (no truncation),
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

    # All-greedy batches (temperature 0 everywhere — the layout/OCR
    # serving default) skip the stochastic draw entirely: a full-vocab
    # Gumbel-max costs several passes over the [B, V] logits per decode
    # step for a result the final where() would discard. lax.cond keeps
    # the skip data-dependent (one compiled program either way); when any
    # row samples, the computation is bit-identical to the unconditional
    # path.
    any_sampled = jnp.any(temperature > 0)

    if nucleus:
        def _draw_nucleus(_):
            k = min(NUCLEUS_TOP_K, logits.shape[-1])
            top_vals, top_idx = nucleus_top_k(scaled, k)  # [B,k] descending
            # True (full-vocab) probabilities of the top-k candidates.
            lse = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)
            top_probs = jnp.exp(top_vals - lse)
            cumprobs = jnp.cumsum(top_probs, axis=-1)
            # Keep tokens while the cumulative mass *before* them is
            # < top_p; the first token is always kept.
            keep = (cumprobs - top_probs) < top_p[:, None]
            rng_k, rng_full = _subkeys(rng, 0), _subkeys(rng, 1)
            pick_k = _categorical(rng_k, jnp.where(keep, top_vals, -jnp.inf))
            token_k = jnp.take_along_axis(
                top_idx, pick_k[:, None], axis=-1
            )[:, 0]
            token_full = _categorical(rng_full, scaled)
            return jnp.where(
                top_p < 1.0, token_k, token_full
            ).astype(jnp.int32)

        sampled = jax.lax.cond(
            any_sampled, _draw_nucleus, lambda _: greedy_tokens, None
        )
    else:
        sampled = jax.lax.cond(
            any_sampled,
            lambda _: _categorical(rng, scaled).astype(jnp.int32),
            lambda _: greedy_tokens,
            None,
        )
    return jnp.where(temperature > 0, sampled, greedy_tokens)
