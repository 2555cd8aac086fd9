"""Continuous-batching scheduler over the paged KV cache.

The TPU-native replacement for vLLM's scheduler + engine core (SURVEY.md
§2.2): a single-threaded host loop drives two jitted fixed-shape programs —

  * **prefill**: one admitted request (prompt bucketed) runs the full VLM
    forward, its K/V scattered straight into the paged cache via a
    precomputed slot mapping; the first token is sampled from the last
    valid logit;
  * **decode**: ONE token for EVERY live slot per call — [S] tokens,
    [S, max_pages] page tables — with the Pallas paged-attention kernel
    reading scattered pages and sampling fused in.

Admission is page-aware (allocator watermark); running out of pages during
decode preempts the youngest request back to the waiting queue (its prompt
+ generated tokens become the new prompt — vLLM's recompute-style
preemption). All state transitions happen on host between steps; device
arrays are donated so cache updates are in-place.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from collections import deque
from functools import partial
from typing import Any, Deque, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from dots_ocr_tpu.engine.kv_cache import OutOfPages, PageAllocator, PagedKV, write_prefill_kv
from dots_ocr_tpu.engine.request import prepare_request
from dots_ocr_tpu.engine.sampling import (
    NUCLEUS_TOP_K,
    fold_positions,
    nucleus_top_k,
    sample_logits,
)
from dots_ocr_tpu.engine.tokenizer import TokenizerLike
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.decoder import (
    decoder_decode_step_paged,
    decoder_prefill_extend_batched,
    decoder_spec_step_paged,
    embed_tokens,
    logits_from_hidden,
)
from dots_ocr_tpu.models.rope import vision_rope_device
from dots_ocr_tpu.models.vlm import build_scatter_indices, vlm_embed, vlm_prefill

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Jitted step programs
# ---------------------------------------------------------------------------


def _pack_first_with_logprob(first, logits):
    """[B] sampled first tokens -> [B, 2] int32 (token, raw-model
    logprob bits): the OpenAI `logprobs` surface needs the prefill-sampled
    token's logprob too, and packing keeps the prefill fetch at ONE
    array. The extra [B, V] logsumexp is noise next to prefill compute."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    lp = jnp.take_along_axis(logits, first[:, None], axis=-1)[:, 0] - lse
    return jnp.stack(
        [first, jax.lax.bitcast_convert_type(lp.astype(jnp.float32),
                                             jnp.int32)],
        axis=1,
    )


@partial(
    jax.jit,
    static_argnames=("config", "attn_impl", "nucleus", "mesh"),
    donate_argnames=("paged",),
)
def prefill_program(
    params,
    config: DotsOCRConfig,
    paged: PagedKV,
    input_ids,
    seq_lens,
    slot_mapping,
    sample_keys,
    temperature,
    top_p,
    bias_ids=None,
    bias_vals=None,
    patches=None,
    pos2d=None,
    segment_ids=None,
    scatter_batch=None,
    scatter_pos=None,
    window_ids=None,
    attn_impl: str = "xla",
    nucleus: bool = False,
    mesh=None,
):
    """Prefill one (bucketed) request batch into the paged cache.

    ``pos2d``: [T_vis, 2] int32 vision patch positions — the 2D-RoPE
    cos/sin tables are computed ON DEVICE (64x less upload than shipping
    the f32 tables; see rope.vision_rope_device)."""
    b, t = input_ids.shape
    rope_cos = rope_sin = None
    if pos2d is not None:
        rope_cos, rope_sin = vision_rope_device(
            pos2d, config.vision.head_dim, config.vision.rope_theta
        )
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    logits, cache = vlm_prefill(
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
        mesh=mesh,
    )
    paged = write_prefill_kv(paged, cache.k, cache.v, slot_mapping)
    if bias_ids is not None:  # OpenAI logit_bias on the first token too
        logits = logits.at[
            jnp.arange(b)[:, None], bias_ids
        ].add(bias_vals, mode="drop")
    # First generated token lands at position seq_lens: fold the request
    # key there so decode continues the same per-request chain.
    first = sample_logits(
        fold_positions(sample_keys, seq_lens), logits, temperature, top_p,
        nucleus=nucleus,
    )
    return _pack_first_with_logprob(first, logits), paged


@partial(jax.jit, static_argnames=("config", "attn_impl", "mesh"))
def embed_program(
    params,
    config: DotsOCRConfig,
    input_ids,
    patches=None,
    pos2d=None,
    segment_ids=None,
    scatter_batch=None,
    scatter_pos=None,
    window_ids=None,
    attn_impl: str = "xla",
    mesh=None,
):
    """Embedding stage of a chunked prefill: run the vision encoder ONCE for
    the request and splice its tokens into the prompt embeddings. The result
    stays on device; decoder chunks slice it (see prefill_extend_program).

    input_ids: [B, T] (B padded to max_prefill_batch, T a multiple of
    prefill_chunk_tokens so every chunk slice is exact). Batching the
    admission runs the encoder ONCE for every long request queued together
    — the wave scenario's prefill bottleneck. Returns [B, T, D].
    2D-RoPE tables are computed on device from ``pos2d`` (see
    prefill_program).
    """
    rope_cos = rope_sin = None
    if pos2d is not None:
        rope_cos, rope_sin = vision_rope_device(
            pos2d, config.vision.head_dim, config.vision.rope_theta
        )
    return vlm_embed(
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


@partial(jax.jit, static_argnames=("config", "attn_impl", "mesh"))
def encode_program(
    params,
    config: DotsOCRConfig,
    patches,
    pos2d,
    segment_ids,
    window_ids=None,
    attn_impl: str = "xla",
    mesh=None,
):
    """Vision encoder for ONE request's packed images -> merged tokens
    [T_pad / merge^2, D_llm].

    The PIPELINED admission path (vs. embed_program's merged batch): one
    dispatch per request lets request j+1's patch UPLOAD overlap request
    j's encoder COMPUTE — with a merged batch nothing computes until every
    page's patches have crossed the host link, which on a tunneled host is
    the single largest serialized slice of a cold wave (PERF.md round-2
    wave decomposition: ~3.5 s of uploads for 8 pages)."""
    from dots_ocr_tpu.models.vision import encode_images

    rope_cos, rope_sin = vision_rope_device(
        pos2d, config.vision.head_dim, config.vision.rope_theta
    )
    return encode_images(
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


@partial(jax.jit, static_argnames=("config",))
def token_embed_program(params, config: DotsOCRConfig, input_ids):
    """Token embeddings only ([B, T] -> [B, T, D]); vision tokens are
    spliced in per request by splice_program."""
    return embed_tokens(params["decoder"], input_ids)


@partial(jax.jit, donate_argnames=("embeds",))
def splice_program(embeds, vision_tokens, scatter_batch, scatter_pos):
    """Scatter one request's merged vision tokens into the (donated)
    [B, T, D] embedding buffer at its imgpad positions."""
    from dots_ocr_tpu.models.vlm import splice_vision_embeddings

    return splice_vision_embeddings(
        embeds, vision_tokens, scatter_batch, scatter_pos
    )


@partial(
    jax.jit,
    static_argnames=("page_size", "kv_hi", "q_offset", "config", "attn_impl",
                     "nucleus", "mesh"),
    donate_argnames=("paged",),
)
def prefill_extend_program(
    params,
    config: DotsOCRConfig,
    paged: PagedKV,
    embeds_chunk,
    prompt_len,
    page_table,
    slots,
    sample_keys,
    temperature,
    top_p,
    page_size: int,
    kv_hi: int,
    q_offset: int,
    bias_ids=None,
    bias_vals=None,
    attn_impl: str = "flash",
    nucleus: bool = False,
    mesh=None,
):
    """ONE LOCKSTEP chunk of a chunked prefill for a BATCH of requests
    (vLLM-parity scheduling: long prefills no longer monopolize the chip —
    decode chunks for running sequences schedule between these, and
    requests admitted together share one dispatch per chunk).

    embeds_chunk: [B, C, D] (stacked slices of embed_program's output; rows
    past each prompt are padding); prompt_len: [B] total prompt tokens
    (0 = inert pad row); page_table: [B, kv_hi / page_size] per-row tables
    (null-page padded); slots: [B, C] physical write slots (padding rows ->
    the reserved null page). Static (kv_hi, q_offset) are both multiples of
    the chunk size, so the program compiles once per (chunk INDEX, batch
    bucket), not per request.

    Always samples a candidate first token from each row's last valid
    position — on a row's final chunk that is the prompt's last position
    and the host uses the sample; earlier chunks ignore it (the [B, V]
    logit matmul is noise next to the chunk forward). Returns
    (first_tokens [B], paged).
    """
    b, c, _ = embeds_chunk.shape
    positions = q_offset + jnp.arange(c, dtype=jnp.int32)
    hidden, k, v, ks, vs = decoder_prefill_extend_batched(
        params["decoder"],
        config.decoder,
        embeds_chunk,
        positions,
        prompt_len,
        paged.k,
        paged.v,
        page_table,
        slots,
        page_size=page_size,
        kv_hi=kv_hi,
        q_offset=q_offset,
        attn_impl=attn_impl,
        k_scales=paged.k_scale,
        v_scales=paged.v_scale,
        mesh=mesh,
    )
    last_row = jnp.clip(prompt_len - 1 - q_offset, 0, c - 1)  # [B]
    logits = logits_from_hidden(
        params["decoder"], config.decoder, hidden[jnp.arange(b), last_row]
    )
    if bias_ids is not None:  # OpenAI logit_bias on the first token too
        logits = logits.at[
            jnp.arange(b)[:, None], bias_ids
        ].add(bias_vals, mode="drop")
    first = sample_logits(
        fold_positions(sample_keys, prompt_len), logits, temperature, top_p,
        nucleus=nucleus,
    )
    return _pack_first_with_logprob(first, logits), PagedKV(k, v, ks, vs)


@partial(
    jax.jit,
    static_argnames=("config", "page_size", "num_steps", "spec_k",
                     "attn_impl", "nucleus", "mesh"),
    donate_argnames=("paged", "tokens_buf"),
)
def spec_decode_program(
    params,
    config: DotsOCRConfig,
    paged: PagedKV,
    tokens_buf,
    tokens,
    positions,
    gen_start,
    page_tables,
    active,
    temperature,
    top_p,
    slot_keys,
    page_size: int,
    num_steps: int = 1,
    spec_k: int = 4,
    attn_impl: str = "paged",
    nucleus: bool = False,
    bias_ids=None,
    bias_vals=None,
    mesh=None,
):
    """Speculative multi-step decode: n-gram drafting + multi-token verify,
    all ON DEVICE (vLLM's ngram/prompt-lookup speculator, rebuilt for the
    chunked-dispatch TPU loop — host-side drafting would cap speculation at
    one verify per RTT).

    Per iteration, per live slot: (1) DRAFT — find the most recent position
    in the slot's own GENERATED token history whose bigram matches
    (prev, current) and propose the spec_k tokens that followed it (repeat
    `current` when no match — catches degenerate loops); (2) VERIFY — one
    decoder forward over the 1 + spec_k tokens through the multi-query
    paged-attention kernel (their K/V scattered first; rejected drafts
    leave dead slots that later writes overwrite, reads mask by length);
    (3) ACCEPT — greedy rows take the leading run where argmax reproduces
    the drafts; sampled rows use exact delta-proposal rejection (accept
    draft d with prob p_j(d); on reject sample from p_j with d masked —
    distribution-preserving). With ``nucleus=True`` (static), rows with
    top_p < 1 score acceptance against the SAME truncated-renormalized
    top-K nucleus the plain sampler uses (sampling.NUCLEUS_TOP_K; true
    probabilities via the full-vocab logsumexp), and the corrective token
    samples from that kept set with the rejected draft masked — so spec
    on/off is distribution-identical for nucleus rows too. top_p >= 1
    rows inside a nucleus program keep the full-vocab math.

    tokens_buf: [S, L] generated-token history by LOGICAL position (L =
    max_pages_per_seq * page_size rows of the page table's coverage);
    gen_start: [S] first generated position (= prompt length);
    slot_keys: [S, 2] uint32 per-request sampling keys (draws fold the
    iteration's first emitted position in — sampling.fold_positions).
    Emits BETWEEN 1 and spec_k + 1 tokens per live slot per iteration.
    Returns (packed [S, num_steps*(spec_k+1) + 1], (tokens, positions)
    carry, paged, tokens_buf).
    """
    eos = config.special.eos_token_id
    pad = config.special.pad_token_id
    s = tokens.shape[0]
    nq = spec_k + 1
    length_buf = tokens_buf.shape[1]
    cap = num_steps * nq
    rows = jnp.arange(s)
    offs = jnp.arange(nq)

    def slot_of(pos_mat):
        page = jnp.take_along_axis(page_tables, pos_mat // page_size, axis=1)
        return page * page_size + pos_mat % page_size

    out0 = jnp.full((s, cap), pad, jnp.int32)
    n0 = jnp.zeros((s,), jnp.int32)
    done0 = ~active

    def body(state):
        i, current, buf, caches, pos, done, out, n_out = state
        k_list, v_list, ks_list, vs_list = caches
        live = ~done
        # Record the current token at its position (idempotent for frozen
        # rows: same value rewritten).
        buf = buf.at[rows, jnp.clip(pos, 0, length_buf - 1)].set(current)

        # ---- draft: last bigram (prev, current) matched over generated
        # history; propose the spec_k tokens that followed the match.
        prev = buf[rows, jnp.clip(pos - 1, 0, length_buf - 1)]
        tpos = jnp.arange(length_buf)
        b_prev = jnp.pad(buf[:, :-1], ((0, 0), (1, 0)))  # b_prev[:, t] = buf[:, t-1]
        match = (
            (b_prev == prev[:, None])
            & (buf == current[:, None])
            & (tpos[None, :] >= gen_start[:, None] + 1)
            & (tpos[None, :] <= pos[:, None] - 1)
        )
        t_star = jnp.max(jnp.where(match, tpos[None, :], -1), axis=1)  # [S]
        has_match = t_star >= 0
        didx = t_star[:, None] + offs[None, 1:]  # [S, spec_k]
        draft = jnp.take_along_axis(
            buf, jnp.clip(didx, 0, length_buf - 1), axis=1
        )
        draft = jnp.where(
            has_match[:, None] & (didx <= pos[:, None]),
            draft,
            current[:, None],  # fallback: repeat (catches period-1 loops)
        )
        x_all = jnp.concatenate([current[:, None], draft], axis=1)  # [S, nq]

        pos_all = pos[:, None] + offs[None, :]
        write_pos = jnp.where(live[:, None], pos_all, 0)
        slots = jnp.where(live[:, None], slot_of(write_pos), 0)
        seq_lens = jnp.where(live, pos + 1, 0)

        x = embed_tokens(params["decoder"], x_all)  # [S, nq, D]
        hidden, k_list, v_list, ks_list, vs_list = decoder_spec_step_paged(
            params["decoder"],
            config.decoder,
            x,
            write_pos,
            k_list,
            v_list,
            page_tables,
            seq_lens,
            slots,
            page_size,
            attn_impl=attn_impl,
            k_scales=ks_list,
            v_scales=vs_list,
            mesh=mesh,
        )
        logits = logits_from_hidden(
            params["decoder"], config.decoder, hidden
        )  # [S, nq, V] f32
        if bias_ids is not None:
            # Position-independent per-request logit_bias: identical at
            # every verify column, so acceptance stays exact vs the plain
            # sampler (which applies the same bias). Scatter along the
            # vocab axis for every (row, verify column).
            logits = logits.at[
                rows[:, None, None], offs[None, :, None], bias_ids[:, None, :]
            ].add(bias_vals[:, None, :], mode="drop")

        # ---- acceptance
        greedy = temperature <= 0.0
        argmax = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [S, nq]
        t_safe = jnp.maximum(temperature, 1e-6)[:, None, None]
        logp = jax.nn.log_softmax(logits / t_safe, axis=-1)
        # Per-row keys folded at this iteration's first emitted position
        # (pos + 1): draws are reproducible per request and advance with
        # the variable number of tokens each iteration emits.
        it_keys = fold_positions(slot_keys, pos + 1)
        r_acc = jax.vmap(jax.random.fold_in, in_axes=(0, None))(it_keys, 0)
        r_cor = jax.vmap(jax.random.fold_in, in_axes=(0, None))(it_keys, 1)
        u = jax.vmap(
            lambda k: jax.random.uniform(k, (nq - 1,), minval=1e-20)
        )(r_acc)
        logp_draft = jnp.take_along_axis(
            logp[:, : nq - 1], x_all[:, 1:, None], axis=2
        )[..., 0]
        acc_sampled = jnp.log(u) < logp_draft
        if nucleus:
            # Truncated-renormalized nucleus per verify position, built
            # exactly like sampling.sample_logits: top-K candidates, kept
            # prefix by TRUE cumulative probability, renormalized over the
            # kept set. A draft outside the kept set has probability 0.
            kk = min(NUCLEUS_TOP_K, logits.shape[-1])
            scaled = logits / t_safe  # [S, nq, V]
            top_vals, top_idx = nucleus_top_k(scaled, kk)  # [S, nq, kk]
            lse = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)
            top_probs = jnp.exp(top_vals - lse)
            cum = jnp.cumsum(top_probs, axis=-1)
            keep = (cum - top_probs) < top_p[:, None, None]
            kept_vals = jnp.where(keep, top_vals, -jnp.inf)
            lse_kept = jax.nn.logsumexp(kept_vals, axis=-1)  # [S, nq]
            dmatch = (
                top_idx[:, : nq - 1] == x_all[:, 1:, None]
            ) & keep[:, : nq - 1]
            lv = jnp.max(
                jnp.where(dmatch, top_vals[:, : nq - 1], -jnp.inf), axis=-1
            )
            logp_nuc = lv - lse_kept[:, : nq - 1]
            acc_sampled = jnp.where(
                top_p[:, None] < 1.0, jnp.log(u) < logp_nuc, acc_sampled
            )
        acc_greedy = argmax[:, : nq - 1] == x_all[:, 1:]
        acc = jnp.where(greedy[:, None], acc_greedy, acc_sampled)
        a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)  # [S]

        # Corrective/bonus token at column a: rejection masks the draft
        # (for greedy the argmax already differs, so the mask is inert).
        la = jnp.take_along_axis(logits, a[:, None, None], axis=1)[:, 0]
        d_a = jnp.take_along_axis(x_all, jnp.minimum(a + 1, nq - 1)[:, None], axis=1)[:, 0]
        la = la.at[rows, d_a].add(jnp.where(a < nq - 1, -1e30, 0.0))
        corrective = sample_logits(
            r_cor, la, temperature, jnp.ones_like(temperature), nucleus=False
        )
        if nucleus:
            # Nucleus rows resample from the kept set at column a with the
            # rejected draft masked (a rejected draft always leaves kept
            # mass: a sole-kept draft has p'(d)=1 and is never rejected).
            kv_a = jnp.take_along_axis(kept_vals, a[:, None, None], axis=1)[:, 0]
            ti_a = jnp.take_along_axis(top_idx, a[:, None, None], axis=1)[:, 0]
            kv_a = kv_a + jnp.where(
                (ti_a == d_a[:, None]) & (a[:, None] < nq - 1), -1e30, 0.0
            )
            pick = jax.vmap(jax.random.categorical)(r_cor, kv_a)
            corr_nuc = jnp.take_along_axis(
                ti_a, pick[:, None], axis=-1
            )[:, 0].astype(jnp.int32)
            corrective = jnp.where(
                (top_p < 1.0) & ~greedy, corr_nuc, corrective
            )

        y = jnp.concatenate(
            [x_all[:, 1:], jnp.full((s, 1), pad, jnp.int32)], axis=1
        )
        y = y.at[rows, a].set(corrective)
        m = a + 1
        is_eos = (y == eos) & (offs[None, :] <= a[:, None])
        eos_idx = jnp.min(jnp.where(is_eos, offs[None, :], nq), axis=1)
        m = jnp.minimum(m, eos_idx + 1)
        m = jnp.where(live, m, 0)
        val = offs[None, :] < m[:, None]

        # Append emitted tokens to the output buffer and the history
        # (masked writes via OOB drop).
        cols = jnp.where(val, n_out[:, None] + offs[None, :], cap)
        out = out.at[rows[:, None], cols].set(y, mode="drop")
        bpos = jnp.where(
            val & live[:, None], pos[:, None] + 1 + offs[None, :], length_buf
        )
        buf = buf.at[rows[:, None], bpos].set(y, mode="drop")

        n_out = n_out + m
        row_done = eos_idx < nq
        new_current = jnp.take_along_axis(
            y, jnp.clip(m - 1, 0, nq - 1)[:, None], axis=1
        )[:, 0]
        current = jnp.where(live & (m > 0), new_current, current)
        pos = pos + m
        done = done | (live & row_done)
        return (i + 1, current, buf,
                (k_list, v_list, ks_list, vs_list), pos, done, out, n_out)

    def cond(state):
        return (state[0] < num_steps) & ~jnp.all(state[5])

    state = (
        jnp.int32(0), tokens, tokens_buf,
        (paged.k, paged.v, paged.k_scale, paged.v_scale),
        positions, done0, out0, n0,
    )
    (_, current, buf, (k_list, v_list, ks_list, vs_list),
     pos, _, out, n_out) = jax.lax.while_loop(cond, body, state)
    packed = jnp.concatenate([out, n_out[:, None]], axis=1)
    return (
        packed,
        (current, pos),
        PagedKV(k_list, v_list, ks_list, vs_list),
        buf,
    )


@partial(
    jax.jit,
    static_argnames=("config", "page_size", "num_steps", "attn_impl",
                     "nucleus", "with_logprobs", "with_penalties", "mesh"),
    donate_argnames=("paged", "counts"),
)
def decode_program(
    params,
    config: DotsOCRConfig,
    paged: PagedKV,
    tokens,
    positions,
    page_tables,
    active,
    temperature,
    top_p,
    slot_keys,
    page_size: int,
    num_steps: int = 1,
    attn_impl: str = "paged",
    nucleus: bool = False,
    with_logprobs: bool = False,
    with_penalties: bool = False,
    presence=None,
    frequency=None,
    counts=None,
    bias_ids=None,
    bias_vals=None,
    mesh=None,
):
    """Up to ``num_steps`` decode iterations for every slot in ONE dispatch.

    Multi-step scheduling amortizes the host->device round trip (vital when
    the host link has ~10s-of-ms latency, e.g. the axon tunnel; also a
    throughput win colocated). Page tables must already cover
    positions + num_steps; cache-write slots are computed on device from the
    page table. Rows stop writing once they emit EOS (early global exit when
    every row is done).

    tokens/positions: [S] current token + its cache write position;
    active: [S] bool; slot_keys: [S, 2] uint32 per-request sampling keys
    (each step's draw folds the emitted position in — see
    sampling.fold_positions — so sampled streams are reproducible per
    request and invariant to co-batching/chunking). Returns (packed
    [S, num_steps+1] — sampled tokens (pad after EOS) with the per-slot
    cache-write count as the last column, fetched by the host in ONE
    transfer; (next_tokens, next_positions) — the device-resident carry
    for the next chunk; paged cache).
    """
    eos = config.special.eos_token_id
    pad = config.special.pad_token_id
    s = tokens.shape[0]

    def slot_of(pos):
        page = jnp.take_along_axis(
            page_tables, (pos // page_size)[:, None], axis=1
        )[:, 0]
        return page * page_size + pos % page_size

    tokens_out0 = jnp.full((s, num_steps), pad, jnp.int32)
    num_decoded0 = jnp.zeros((s,), jnp.int32)
    done0 = ~active
    # OpenAI `logprobs`: the chosen token's RAW-model log-probability
    # (temperature-independent — well-defined for greedy rows too),
    # bitcast into the same single packed fetch. Static variant: the
    # extra [S, V] logsumexp only costs requests that asked for it.
    lp_out0 = jnp.zeros((s, num_steps), jnp.float32) if with_logprobs else None

    def cond(state):
        return (state[0] < num_steps) & ~jnp.all(state[3])

    def body(state):
        state = list(state)
        if with_penalties:
            cnts = state.pop()
        if with_logprobs:
            lp_out = state.pop()
        i, current, caches, done, tokens_out, num_decoded, pos = state
        k_list, v_list, ks_list, vs_list = caches
        live = ~done
        write_pos = jnp.where(live, pos, 0)
        slots = jnp.where(live, slot_of(write_pos), 0)
        seq_lens = jnp.where(live, pos + 1, 0)

        x = embed_tokens(params["decoder"], current)
        hidden, k_list, v_list, ks_list, vs_list = decoder_decode_step_paged(
            params["decoder"],
            config.decoder,
            x,
            write_pos,
            k_list,
            v_list,
            page_tables,
            seq_lens,
            slots,
            page_size,
            attn_impl=attn_impl,
            k_scales=ks_list,
            v_scales=vs_list,
            mesh=mesh,
        )
        logits = logits_from_hidden(params["decoder"], config.decoder, hidden)
        if bias_ids is not None:
            # OpenAI `logit_bias`: per-request sparse (token id, bias)
            # pairs, inert rows padded with id = vocab (dropped). Constant
            # per request, so — unlike penalties — it composes with the
            # speculative verify.
            logits = logits.at[
                jnp.arange(s)[:, None], bias_ids
            ].add(bias_vals, mode="drop")
        if with_penalties:
            # OpenAI presence/frequency penalties, vLLM semantics (counts
            # over GENERATED tokens only): subtracted before sampling, so
            # greedy rows and the nucleus pool both see penalized logits.
            logits = (
                logits
                - presence[:, None] * (cnts > 0)
                - frequency[:, None] * cnts.astype(jnp.float32)
            )
        # The sampled token lands at position pos + 1: its draw key is
        # fold_in(slot_key, pos + 1) — stateless, so no RNG carry.
        step_keys = fold_positions(slot_keys, pos + 1)
        nxt = sample_logits(step_keys, logits, temperature, top_p, nucleus=nucleus)

        tokens_out = tokens_out.at[:, i].set(jnp.where(live, nxt, pad))
        num_decoded = num_decoded + live.astype(jnp.int32)
        done = done | (live & (nxt == eos))
        pos = pos + live.astype(jnp.int32)
        out_state = (i + 1, jnp.where(live, nxt, current),
                     (k_list, v_list, ks_list, vs_list), done,
                     tokens_out, num_decoded, pos)
        if with_logprobs:
            lse = jax.nn.logsumexp(logits, axis=-1)
            lp = jnp.take_along_axis(logits, nxt[:, None], axis=-1)[:, 0] - lse
            lp_out = lp_out.at[:, i].set(jnp.where(live, lp, 0.0))
            out_state = out_state + (lp_out,)
        if with_penalties:
            cnts = cnts.at[jnp.arange(s), nxt].add(
                live.astype(cnts.dtype), mode="drop"
            )
            out_state = out_state + (cnts,)
        return out_state

    # The cache is ALREADY per-layer tuples (PagedKV): each layer's scatter
    # updates its own while_loop carry leaf in place, and the donated input
    # leaves alias the outputs — no whole-cache copy anywhere in the chunk.
    # (A stacked [L, ...] carry would rewrite the whole cache per layer;
    # per-layer scan xs would copy every touched slice; and stacking on
    # entry/exit — round 1's layout — cost a full-cache HBM round trip per
    # chunk.)
    state = (
        jnp.int32(0), tokens, (paged.k, paged.v, paged.k_scale, paged.v_scale),
        done0, tokens_out0, num_decoded0, positions,
    )
    if with_logprobs:
        state = state + (lp_out0,)
    if with_penalties:
        state = state + (counts,)
    final = jax.lax.while_loop(cond, body, state)
    (_, current, (k_list, v_list, ks_list, vs_list), _,
     tokens_out, num_decoded, pos) = final[:7]
    lp_out = final[7] if with_logprobs else None
    counts_out = final[-1] if with_penalties else None
    out_paged = PagedKV(k_list, v_list, ks_list, vs_list)
    # ONE fetched array per chunk (tokens_out || num_decoded column): every
    # extra device->host read costs a full RTT on a tunneled host. The
    # (current, pos) carry is returned ON DEVICE so event-free chunks
    # can chain with zero host->device uploads (see step()).
    cols = [tokens_out]
    if with_logprobs:
        cols.append(jax.lax.bitcast_convert_type(lp_out, jnp.int32))
    packed = jnp.concatenate(cols + [num_decoded[:, None]], axis=1)
    if with_penalties:
        return packed, (current, pos), out_paged, counts_out
    return packed, (current, pos), out_paged


# ---------------------------------------------------------------------------
# Host-side request state
# ---------------------------------------------------------------------------

WAITING, PREFILLING, RUNNING, FINISHED = (
    "waiting", "prefilling", "running", "finished"
)


@dataclasses.dataclass
class SchedulerConfig:
    num_pages: int = 512
    page_size: int = 64
    max_slots: int = 16
    max_pages_per_seq: int = 128
    prompt_bucket_step: int = 128
    vision_bucket_step: int = 512
    # Admission watermark: keep this fraction of pages free for decode growth.
    admit_free_page_fraction: float = 0.05
    # OpenAI logit_bias: fixed per-request (token id, bias) slots; requests
    # with more entries are rejected at submit.
    logit_bias_slots: int = 32
    # Decode iterations per device dispatch (multi-step scheduling): larger
    # amortizes host-link latency; smaller reacts to finishes/admissions
    # faster. Finished rows idle at most steps_per_sync - 1 iterations.
    steps_per_sync: int = 8
    # Requests prefilled per dispatch. The batch is always padded to this
    # size (inert rows) so each (t_bucket, v_bucket) compiles once.
    max_prefill_batch: int = 4
    # Adaptive chunk deepening: when EVERY live request still has at least
    # this many tokens of budget left and none needs per-chunk host checks
    # (stream callbacks / stop strings), decode dispatches use this chunk
    # depth instead of steps_per_sync. Per-dispatch cost (host RTT — ~50 to
    # 150 ms through a tunneled host — plus XLA dispatch) is the dominant
    # cost of LOW-OCCUPANCY long decodes: the 1,024-token single-stream SVG
    # run spends ~3/4 of its wall clock on it at depth 8. Set equal to
    # steps_per_sync to disable. Rows that hit EOS mid-chunk exit the
    # on-device loop early, so deep chunks waste no device work.
    max_steps_per_sync: int = 64
    # Pipelined decode (lookahead-1): during pure steady-state decode
    # (no admissions, prefills, stop strings/ids, streaming, logprobs,
    # penalties, bias or speculation pending) dispatch chunk N+1 off the
    # DEVICE-RESIDENT carry before fetching chunk N's results, so the
    # host-link round trip (~50-150 ms tunneled) and host bookkeeping hide
    # behind device execution instead of serializing with it. Rows that
    # hit EOS inside chunk N decode one extra chunk of discarded tokens
    # (their pages are freed only once the pipeline drains, so the writes
    # are harmless); any scheduling event drains the pipeline first.
    pipeline_decode: bool = True
    # Decode-degeneration guard: stop a sequence whose tail is a periodic
    # token loop (period <= repetition_max_period repeating >=
    # repetition_min_repeats times). 0 disables.
    repetition_max_period: int = 64
    repetition_min_repeats: int = 8
    # Chunked prefill: prompts longer than this many tokens are admitted as
    # PREFILLING requests whose decoder forward runs in fixed-size chunks of
    # this many tokens, ONE chunk per scheduler step, so decode chunks for
    # running sequences schedule between them (vLLM-parity continuous
    # batching; the 8-concurrent-pages scenario is prefill-bound without
    # it). 0 = monolithic prefill only. Rounded up to a page multiple.
    prefill_chunk_tokens: int = 0
    # n-gram speculative decoding: >0 verifies this many device-drafted
    # tokens per decode iteration (see spec_decode_program) — the parameter
    # HBM read amortizes over accepted tokens, which beats the
    # weight-bandwidth bound on repetitive outputs (HTML tables, layout
    # JSON scaffolding). Greedy rows are exactly greedy; sampled rows use
    # exact delta-proposal rejection (top_p < 1 rows against the same
    # truncated top-K nucleus the plain sampler draws from), so every
    # sampling mix engages. 0 = off.
    speculate_k: int = 0
    # Adaptive speculation cut-off: a verify iteration costs ~1.33x a plain
    # decode iteration (r3 acceptance sweep: 15.6 vs 11.7 ms at 64 slots,
    # BENCH_SPEC_CURVE_r3.json), so spec only pays while it emits more than
    # ~1.33 tokens per slot-iteration; 1.5 keeps a deliberate margin. The
    # engine tracks an EWMA of emitted tokens/slot-iteration over spec
    # chunks and disables speculation for the rest of the current load when
    # the EWMA sits below this for 3 consecutive chunks (re-enabled when
    # the engine drains idle — the next workload gets a fresh probe).
    # <= 0 disables the auto-cutoff.
    spec_min_tokens_per_iter: float = 1.5
    # "bf16" or "int8". int8 halves cache HBM — the capacity lever for the
    # full workload envelope (14.4k-vision + 24k-decode sequences at high
    # slot counts exceed HBM in bf16). At SHORT contexts the per-page
    # dequantize costs more than the bandwidth it saves (~1.5x slower
    # decode chunks measured at ctx 2k), so bf16 stays the default.
    kv_cache_dtype: str = "bf16"


@dataclasses.dataclass
class ScheduledRequest:
    req_id: int
    prompt_ids: List[int]
    packed: Any  # PackedVisionInput or None
    max_new_tokens: int
    temperature: float
    top_p: float
    state: str = WAITING
    slot: int = -1
    output_ids: List[int] = dataclasses.field(default_factory=list)
    # Tokens generated before a preemption: they become part of the replayed
    # prompt for cache purposes but remain part of the USER-VISIBLE output.
    prior_output: List[int] = dataclasses.field(default_factory=list)
    preempted: int = 0
    submitted_at: float = dataclasses.field(default_factory=time.monotonic)
    finished_reason: Optional[str] = None
    # Per-request latency markers (time.monotonic): queue time =
    # admitted_at - submitted_at; TTFT = first_token_at - submitted_at;
    # decode time = finished_at - first_token_at (SURVEY §5.5 rebuild note:
    # per-request TTFT/queue/prefill/decode split surfaced in /metrics and
    # response usage).
    admitted_at: Optional[float] = None
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None

    def timing(self) -> Dict[str, float]:
        """Millisecond latency split (0.0 for markers never reached)."""
        sub = self.submitted_at
        adm = self.admitted_at or sub
        ft = self.first_token_at
        fin = self.finished_at
        return {
            "queue_ms": max(0.0, (adm - sub) * 1e3),
            "ttft_ms": max(0.0, (ft - sub) * 1e3) if ft else 0.0,
            "prefill_ms": max(0.0, (ft - adm) * 1e3) if ft else 0.0,
            "decode_ms": max(0.0, (fin - ft) * 1e3) if ft and fin else 0.0,
            "total_ms": max(0.0, (fin - sub) * 1e3) if fin else 0.0,
        }
    # vLLM-parity stop conditions + SSE streaming (the reference's serving
    # contract: /root/reference/dots_ocr/model/inference.py:38-43 via
    # vLLM's OpenAI surface).
    stop: List[str] = dataclasses.field(default_factory=list)
    stop_token_ids: frozenset = frozenset()
    # Per-request sampling key (uint32[2]): PRNGKey(seed) for seeded
    # requests (OpenAI `seed` param), else a split of the engine key.
    # Fixed at submit so a preempted request REPLAYS its sampled stream.
    sample_key: Any = None
    # OpenAI `logprobs`: collect the chosen token's raw-model logprob per
    # generated token (aligned with prior_output + output_ids).
    logprobs: bool = False
    output_logprobs: List[float] = dataclasses.field(default_factory=list)
    # OpenAI presence/frequency penalties (vLLM semantics: counts over
    # generated tokens only; applied before sampling incl. greedy rows).
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # OpenAI logit_bias: {token_id: bias} applied to every sampling step
    # (first token included); None/{} = unused.
    logit_bias: Optional[Dict[int, float]] = None
    # Called from the engine thread with (text_delta, finish_reason|None);
    # finish_reason is non-None exactly once, on the final call.
    stream_cb: Optional[Any] = None
    # Incremental detokenizer state (only requests with stop strings or a
    # stream_cb pay host-side detokenization in the hot loop).
    detok: Any = None
    text: str = ""
    emitted_len: int = 0
    detok_count: int = 0  # generated tokens consumed by detok
    final_text: Optional[str] = None  # set when stop-string truncation applies
    # Chunked-prefill state (PREFILLING only): the full prompt's embeddings
    # on device ([t_bucket, D], vision already spliced) and how many prompt
    # tokens have been extended into the paged cache so far.
    embeds: Any = None
    prefill_pos: int = 0

    @property
    def cache_len(self) -> int:
        """Tokens currently materialized in the KV cache."""
        # prompt + all generated-and-decoded tokens (the newest sampled token
        # is not yet written; it is written by the next decode step).
        return len(self.prompt_ids) + max(0, len(self.output_ids) - 1)


class ContinuousBatchingEngine:
    """Paged continuous-batching engine with an InferenceEngine-compatible
    ``generate_batch`` convenience API."""

    def __init__(
        self,
        params,
        config: DotsOCRConfig,
        tokenizer: Optional[TokenizerLike] = None,
        sched: Optional[SchedulerConfig] = None,
        default_max_new_tokens: int = 16384,
        attn_impl: str = "auto",
        kv_dtype=None,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh for tensor-parallel SERVING.
        Pass params already sharded (parallel.sharding.shard_params); the
        paged cache is placed per paged_kv_specs (KV heads over the model
        axis) and all small step inputs are replicated onto the mesh. The
        jitted step programs are unchanged — GSPMD inserts the collectives."""
        from dots_ocr_tpu.engine.engine import InferenceEngine

        self.params = params
        self.mesh = mesh
        self._replicated = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._replicated = NamedSharding(mesh, PartitionSpec())
        self.config = config
        self.tokenizer = tokenizer or InferenceEngine._default_tokenizer(config)
        self.sched = sched or SchedulerConfig()
        if self.sched.prefill_chunk_tokens > 0:
            ps = self.sched.page_size
            rounded = -(-self.sched.prefill_chunk_tokens // ps) * ps
            if rounded != self.sched.prefill_chunk_tokens:
                self.sched = dataclasses.replace(
                    self.sched, prefill_chunk_tokens=rounded
                )
        if self.sched.kv_cache_dtype == "int8" and self.sched.page_size % 128:
            logger.warning(
                "int8 KV with page_size %d: the multi-page decode kernel "
                "needs 128-aligned pages for the f32 scale DMAs and will "
                "fall back to the slower v1 kernel — prefer page_size 128+",
                self.sched.page_size,
            )
        self.default_max_new_tokens = default_max_new_tokens
        from dots_ocr_tpu.ops.tp import kernel_tp_degree

        model_parallel = (
            mesh is not None
            and "model" in getattr(mesh, "shape", {})
            and mesh.shape["model"] > 1
        )
        # Megatron-style GQA replication: when the model axis is WIDER
        # than the KV head count (2 KV heads on model=4) but still divides
        # the Q/vision heads, pad the KV pools to one replica per
        # axis-slice (kv_cache.PagedKV.create) — per-chip KV memory equals
        # the largest divisible mesh's, and the Pallas kernels shard
        # cleanly instead of falling back to XLA attention.
        tp = mesh.shape["model"] if model_parallel else 1
        d = config.decoder
        self._kv_rep = 1
        if (
            model_parallel
            and d.num_kv_heads % tp != 0
            and tp % d.num_kv_heads == 0
            and d.num_heads % tp == 0
        ):
            self._kv_rep = tp // d.num_kv_heads
            logger.info(
                "TP=%d exceeds %d KV heads: replicating each KV head %dx "
                "(pool pads to %d heads, one per mesh slice)",
                tp, d.num_kv_heads, self._kv_rep, tp,
            )
        # TP fast path: the Pallas kernels run per-chip on their head shard
        # via jax.shard_map (ops.tp) when every head count divides the model
        # axis — decoder Q + (replication-padded) KV heads for decode/extend
        # attention, vision heads for the encoder. Still-indivisible meshes
        # (e.g. Q heads not a multiple of the axis) stay on the XLA paths,
        # which GSPMD partitions correctly.
        kernels_shardable = (
            kernel_tp_degree(
                mesh,
                "model",
                config.decoder.num_heads,
                config.decoder.num_kv_heads * self._kv_rep,
                config.vision.num_heads,
            )
            > 1
            if model_parallel
            else False
        )
        if attn_impl == "auto":
            on_tpu = jax.default_backend() == "tpu"
            if on_tpu and model_parallel and not kernels_shardable:
                logger.warning(
                    "TP>1 mesh with head counts not divisible by the model "
                    "axis (%d): using XLA attention paths; choose a model "
                    "axis that divides Q/KV/vision heads for the Pallas "
                    "fast path",
                    mesh.shape["model"],
                )
                self.prefill_impl = "xla"
                self.decode_impl = "reference"
            else:
                self.prefill_impl = "flash" if on_tpu else "xla"
                self.decode_impl = "paged" if on_tpu else "reference"
        else:
            self.prefill_impl = attn_impl
            self.decode_impl = {
                "xla": "reference",
                "flash": "paged",
                "flash_interpret": "paged_interpret",
            }.get(attn_impl, attn_impl)
        # The mesh handed to the jitted programs (a static arg): set only
        # when a Pallas impl is active under a shardable TP mesh, so the
        # XLA paths keep their pure-GSPMD traces.
        uses_pallas = self.prefill_impl.startswith("flash") or (
            self.decode_impl.startswith("paged")
        )
        self._kernel_mesh = (
            mesh if (kernels_shardable and uses_pallas) else None
        )

        # Static page-table width: the v2 multi-page kernel grids over
        # sequences only and bounds its page loop by each row's LIVE length,
        # so a max-width (padded) table costs nothing at runtime — while
        # width BUCKETING costs a full XLA compile per power-of-two bucket
        # (minutes each through a remote-compile tunnel) plus mid-serving
        # recompiles when a long decode crosses a bucket. Only the v1
        # fallback kernel (head_dim not 128-aligned, or int8 with unaligned
        # pages) has a grid that scales with table width; keep bucketing
        # there and on the CPU reference path.
        self._static_width = (
            self.decode_impl == "paged"
            and config.decoder.head_dim % 128 == 0
            and not (
                self.sched.kv_cache_dtype == "int8"
                and self.sched.page_size % 128 != 0
            )
        )
        kv_dtype = kv_dtype or config.jax_dtype
        self.paged = PagedKV.create(
            config.decoder,
            self.sched.num_pages,
            self.sched.page_size,
            dtype=kv_dtype,
            quantized=self.sched.kv_cache_dtype == "int8",
            kv_replication=self._kv_rep,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding

            from dots_ocr_tpu.parallel.sharding import paged_kv_specs

            specs = paged_kv_specs(
                config, mesh, quantized=self.sched.kv_cache_dtype == "int8",
                kv_replication=self._kv_rep,
            )
            self.paged = jax.tree.map(
                lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                self.paged,
                specs,
            )
        self.allocator = PageAllocator(
            num_pages=self.sched.num_pages,
            page_size=self.sched.page_size,
            max_pages_per_seq=self.sched.max_pages_per_seq,
        )

        s = self.sched.max_slots
        self._slot_req: List[Optional[ScheduledRequest]] = [None] * s
        self._tokens = np.zeros(s, np.int32)
        self._lengths = np.zeros(s, np.int32)  # tokens in cache per slot
        self._temps = np.zeros(s, np.float32)
        self._top_ps = np.ones(s, np.float32)
        self._pres = np.zeros(s, np.float32)
        self._freq = np.zeros(s, np.float32)
        vocab = config.decoder.vocab_size
        kb = self.sched.logit_bias_slots
        self._bias_ids = np.full((s, kb), vocab, np.int32)  # vocab = inert
        self._bias_vals = np.zeros((s, kb), np.float32)
        # Per-slot sampling keys: PRNGKey(seed) for seeded requests, a
        # split of the engine key otherwise. Draws fold the emitted
        # position in (sampling.fold_positions) — stateless, so sampled
        # streams are per-request reproducible under continuous batching.
        self._slot_keys = np.zeros((s, 2), np.uint32)

        self._waiting: Deque[ScheduledRequest] = deque()
        self._finished: Dict[int, ScheduledRequest] = {}
        self._next_id = 0
        self._rng = jax.random.PRNGKey(0)
        # Device-resident decode-chunk inputs. Valid while no admission /
        # finish / preemption / page-table growth occurred since the last
        # chunk: then the next chunk needs ZERO host->device uploads (the
        # token/position/rng carry comes back from decode_program on
        # device). Any event sets this to None and the next chunk rebuilds
        # from host state.
        self._dev: Optional[dict] = None
        # Pipelined decode (SchedulerConfig.pipeline_decode): the dispatched
        # -but-unfetched chunk {"packed", "active", "chunk", "use_lp",
        # "tokens" (assumed emissions)} plus req ids whose pages must not be
        # reused until the in-flight chunk (which still writes them) lands.
        self._inflight: Optional[dict] = None
        self._deferred_free: List[int] = []
        # Adaptive speculation state (see SchedulerConfig.
        # spec_min_tokens_per_iter): EWMA of emitted tokens per verify
        # slot-iteration, consecutive below-threshold chunks, and the gate.
        self._spec_ewma: Optional[float] = None
        self._spec_low_streak = 0
        self._spec_enabled = True
        # Pending incremental-warmup thunks (queue_warmup / warm_tick).
        self._warm_queue: List[Any] = []
        # Last-N finished-request latency splits (queue/ttft/prefill/
        # decode/total ms) — the serving layer derives p50/p95 on scrape.
        self.recent_timings: Deque[Dict[str, float]] = deque(maxlen=512)
        self.metrics = {
            "steps": 0,
            "prefills": 0,
            "prefill_chunks": 0,
            "generated_tokens": 0,
            "preemptions": 0,
            "chunk_input_rebuilds": 0,  # host->device upload chunks
            # Wall-clock attribution (host-side; async dispatches charge
            # their section when it blocks on the fetch). For perf triage:
            # where does a wave's wall actually go?
            "t_submit_s": 0.0,   # tokenize + image preprocessing
            "t_admit_s": 0.0,    # admission incl. batched embed dispatch
            "t_prefill_s": 0.0,  # lockstep prefill chunk dispatches
            "t_decode_s": 0.0,   # decode chunk dispatch + packed fetch
            # step() interior not covered by the three regions above
            # (active-row bookkeeping, spec-gate math, finish accounting) —
            # if a wave's wall-clock exceeds the phase sum, this says
            # whether the gap is inside step() or in the caller.
            "t_step_other_s": 0.0,
        }

    # -- submission ----------------------------------------------------

    def submit(
        self,
        prompt: str,
        images: Sequence = (),
        max_new_tokens: Optional[int] = None,
        temperature: float = 0.1,
        top_p: float = 1.0,
        system_prompt: Optional[str] = None,
        min_pixels: Optional[int] = None,
        max_pixels: Optional[int] = None,
        stop: Optional[Sequence[str]] = None,
        stop_token_ids: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
        logprobs: bool = False,
        presence_penalty: float = 0.0,
        frequency_penalty: float = 0.0,
        logit_bias: Optional[Dict[int, float]] = None,
        stream_cb=None,
        prepared=None,
    ) -> int:
        """``prepared``: a ``prepare_request`` result built ahead of time
        (e.g. on a preprocessing thread pool via :meth:`prepare`) — submit
        itself must stay on the single engine thread, but tokenization +
        image preprocessing are pure host work that shouldn't serialize
        with device stepping."""
        from dots_ocr_tpu.engine.tokenizer import IncrementalDetokenizer

        if prepared is None:
            t_sub = time.perf_counter()
            prepared = self.prepare(
                prompt,
                images,
                system_prompt=system_prompt,
                min_pixels=min_pixels,
                max_pixels=max_pixels,
            )
            self.metrics["t_submit_s"] += time.perf_counter() - t_sub
        stop = [s for s in (stop or []) if s]
        if logit_bias:
            if len(logit_bias) > self.sched.logit_bias_slots:
                raise ValueError(
                    f"logit_bias supports at most "
                    f"{self.sched.logit_bias_slots} entries"
                )
            vocab = self.config.decoder.vocab_size
            logit_bias = {
                int(k): float(v) for k, v in logit_bias.items()
                if 0 <= int(k) < vocab
            }
        req = ScheduledRequest(
            req_id=self._next_id,
            prompt_ids=prepared.prompt_ids,
            packed=prepared.packed,
            max_new_tokens=max_new_tokens or self.default_max_new_tokens,
            temperature=temperature,
            top_p=top_p,
            stop=stop,
            stop_token_ids=frozenset(int(t) for t in (stop_token_ids or [])),
            sample_key=np.asarray(
                jax.random.PRNGKey(int(seed)) if seed is not None
                else self._next_rng(),
                np.uint32,
            ),
            logprobs=bool(logprobs),
            presence_penalty=float(presence_penalty),
            frequency_penalty=float(frequency_penalty),
            logit_bias=(
                {int(k): float(v) for k, v in logit_bias.items()}
                if logit_bias else None
            ),
            stream_cb=stream_cb,
            detok=(
                IncrementalDetokenizer(self.tokenizer)
                if (stop or stream_cb is not None)
                else None
            ),
        )
        self._next_id += 1
        # A prompt that can NEVER fit (per-sequence page table or the whole
        # pool) must fail fast, not deadlock the admission queue.
        need = self.allocator.pages_needed(len(req.prompt_ids) + 1)
        if need > self.sched.max_pages_per_seq or need > self.sched.num_pages - 1:
            req.state = FINISHED
            req.finished_reason = "prompt_too_long"
            logger.error(
                "request %d rejected: prompt needs %d pages (max_pages_per_seq"
                " %d, pool %d)", req.req_id, need, self.sched.max_pages_per_seq,
                self.sched.num_pages - 1,
            )
            self._finished[req.req_id] = req
            if req.stream_cb is not None:
                req.stream_cb("", "prompt_too_long")
            return req.req_id
        # Clamp the token budget to the per-sequence table capacity (one
        # slack slot for the decode write-ahead): otherwise a long decode
        # marches into its per-seq page cap mid-chunk, where the reservation
        # OutOfPages is indistinguishable from pool pressure — the old
        # behavior preempted unrelated requests and then livelocked
        # re-prefilling the victim (vLLM's max-model-len clamp role).
        cap_tokens = self.sched.max_pages_per_seq * self.sched.page_size - 1
        budget = cap_tokens - len(req.prompt_ids)
        if budget < 1:  # room for the prompt but not one generated token
            req.state = FINISHED
            req.finished_reason = "prompt_too_long"
            logger.error(
                "request %d rejected: prompt %d tokens leaves no generation "
                "budget within the %d-token per-sequence capacity",
                req.req_id, len(req.prompt_ids), cap_tokens,
            )
            self._finished[req.req_id] = req
            if req.stream_cb is not None:
                req.stream_cb("", "prompt_too_long")
            return req.req_id
        if req.max_new_tokens > budget:
            logger.info(
                "request %d: max_new_tokens %d clamped to %d (per-sequence "
                "capacity %d tokens, prompt %d)", req.req_id,
                req.max_new_tokens, budget, cap_tokens, len(req.prompt_ids),
            )
            req.max_new_tokens = budget
        self._waiting.append(req)
        return req.req_id

    def prepare(
        self,
        prompt: str,
        images: Sequence = (),
        system_prompt: Optional[str] = None,
        min_pixels: Optional[int] = None,
        max_pixels: Optional[int] = None,
    ):
        """Tokenize + preprocess a request OFF the engine thread (pure host
        work, thread-safe). Pass the result to ``submit(prepared=...)``."""
        return prepare_request(
            self.tokenizer,
            self.config,
            prompt,
            images,
            system_prompt=system_prompt,
            min_pixels=min_pixels,
            max_pixels=max_pixels,
            vision_bucket_step=self.sched.vision_bucket_step,
        )

    # -- stop strings / streaming ------------------------------------------

    def _detok_limit(self, req: ScheduledRequest) -> int:
        """Client-visible token count: a trailing EOS / stop-token id is
        excluded (OpenAI semantics — matches the no-detok request_text
        path, which strips it; streaming requests must not leak it)."""
        total = len(req.prior_output) + len(req.output_ids)
        if req.output_ids:
            last = req.output_ids[-1]
            if (
                last == self.config.special.eos_token_id
                or last in req.stop_token_ids
            ):
                return total - 1
        return total

    def _push_detok(self, req: ScheduledRequest) -> str:
        """Advance the detokenizer to the client-visible limit WITHOUT
        rebuilding prior_output + output_ids (that concatenation made
        host-side accounting quadratic in output length)."""
        upto = self._detok_limit(req)
        if upto <= req.detok_count:
            return ""
        plen = len(req.prior_output)
        if req.detok_count >= plen:
            chunk = req.output_ids[req.detok_count - plen : upto - plen]
        else:  # only right after a preemption replay
            chunk = (
                req.prior_output[req.detok_count :]
                + req.output_ids[: max(0, upto - plen)]
            )
        req.detok_count = upto
        return req.detok.push(chunk)

    def _update_text(self, slot: int) -> None:
        """Feed new tokens to the request's detokenizer, check stop strings
        (truncating + finishing on a match), and emit stream deltas.

        Only requests with stop strings or a stream_cb have a detok — all
        others skip host-side detokenization in the hot loop.
        """
        req = self._slot_req[slot]
        if req is None or req.detok is None:
            return
        new = self._push_detok(req)
        if new:
            req.text += new
            if req.stop:
                # Search only the window a new match could appear in.
                longest = max(len(s) for s in req.stop)
                start = max(0, len(req.text) - len(new) - longest + 1)
                best = -1
                for s in req.stop:
                    i = req.text.find(s, start)
                    if i >= 0 and (best < 0 or i < best):
                        best = i
                if best >= 0:
                    # OpenAI semantics: the stop string is NOT included.
                    req.text = req.text[:best]
                    req.final_text = req.text
                    self._finish(slot, "stop")  # emits the final delta
                    return
        self._emit_stream(req)

    def _emit_stream(self, req: ScheduledRequest, final: bool = False) -> None:
        if req.stream_cb is None:
            return
        if final:
            delta = req.text[req.emitted_len :]
            req.emitted_len = len(req.text)
            req.stream_cb(delta, req.finished_reason or "stop")
            return
        # Hold back any tail that could still become a stop-string match.
        from dots_ocr_tpu.engine.tokenizer import longest_stop_prefix_at_tail

        hold = longest_stop_prefix_at_tail(req.text, req.stop) if req.stop else 0
        upto = len(req.text) - hold
        if upto > req.emitted_len:
            delta = req.text[req.emitted_len : upto]
            req.emitted_len = upto
            req.stream_cb(delta, None)

    # -- helpers ---------------------------------------------------------

    def _put(self, x):
        """Device placement for small step inputs: replicated onto the mesh
        when serving tensor-parallel, plain asarray otherwise."""
        x = jnp.asarray(x)
        if self._replicated is not None:
            return jax.device_put(x, self._replicated)
        return x

    def _batch_bias(self, reqs, b_fixed: int):
        """[B, K] (ids, vals) for a prefill batch, or (None, None) when no
        request biases (the bias-free program variant)."""
        if not any(r.logit_bias for r in reqs):
            return None, None
        vocab = self.config.decoder.vocab_size
        kb = self.sched.logit_bias_slots
        ids = np.full((b_fixed, kb), vocab, np.int32)
        vals = np.zeros((b_fixed, kb), np.float32)
        for j, r in enumerate(reqs):
            if r.logit_bias:
                for jj, (tid, bv) in enumerate(sorted(r.logit_bias.items())):
                    ids[j, jj] = tid
                    vals[j, jj] = bv
        return self._put(ids), self._put(vals)

    def _set_slot_bias(self, slot: int, req) -> None:
        vocab = self.config.decoder.vocab_size
        self._bias_ids[slot] = vocab  # inert
        self._bias_vals[slot] = 0.0
        if req.logit_bias:
            for j, (tid, bv) in enumerate(sorted(req.logit_bias.items())):
                self._bias_ids[slot, j] = tid
                self._bias_vals[slot, j] = bv

    def _next_rng(self):
        self._rng, out = jax.random.split(self._rng)
        return self._put(out) if self._replicated is not None else out

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self._slot_req) if r is None]

    def has_work(self) -> bool:
        return bool(self._waiting) or any(r is not None for r in self._slot_req)

    def _bucket(self, n: int) -> int:
        step = self.sched.prompt_bucket_step
        return max(step, -(-n // step) * step)

    def warmup_plan(
        self,
        max_len: Optional[int] = None,
        nucleus_variants: Sequence[bool] = (False, True),
    ) -> List[Any]:
        """Build the list of warm thunks covering every decode program
        ``step()`` can dispatch — each thunk compiles + executes ONE
        program on an all-inactive batch (zero iterations, no KV pages
        touched). Ordered most-likely-first-dispatched first: non-nucleus
        variants (the layout/OCR default) before nucleus, shallow chunk
        depths before deep, speculative before plain when speculation is
        on. Thunks must run on the engine thread while the engine is idle
        (they donate + rebind the paged pool).
        """
        cap = self.sched.max_pages_per_seq
        if self._static_width:
            widths = [cap]
        else:
            if max_len is None:
                top = cap
            else:
                top = min(self.allocator.pages_needed(max_len), cap)
            widths = []
            w = 1
            while True:
                widths.append(min(w, cap))
                if w >= top:
                    break
                w *= 2
        s = self.sched.max_slots
        # All-inactive mask: identical compiled program, zero-iteration
        # execution, and no KV pages are touched.
        idle = self._put(jnp.zeros(s, bool))
        tokens = self._put(jnp.zeros(s, jnp.int32))
        positions = self._put(jnp.zeros(s, jnp.int32))
        temps = self._put(self._temps)
        top_ps = self._put(self._top_ps)
        warm_keys = self._put(jnp.zeros((s, 2), jnp.uint32))
        depths = [self.sched.steps_per_sync]
        if self.sched.max_steps_per_sync > self.sched.steps_per_sync:
            depths.append(self.sched.max_steps_per_sync)
        spec_k = self.sched.speculate_k
        spec_depths = []
        if spec_k > 0:
            # step() scales the deep depth by tokens-per-iteration in
            # spec mode; warm the depths it will actually dispatch.
            spec_deep = max(
                self.sched.steps_per_sync,
                self.sched.max_steps_per_sync // (spec_k + 1),
            )
            spec_depths = [self.sched.steps_per_sync]
            if spec_deep != self.sched.steps_per_sync:
                spec_depths.append(spec_deep)

        def decode_thunk(tables, depth, nucleus):
            def run():
                packed, _, self.paged = decode_program(
                    self.params,
                    self.config,
                    self.paged,
                    tokens,
                    positions,
                    tables,
                    idle,
                    temps,
                    top_ps,
                    warm_keys,
                    page_size=self.sched.page_size,
                    num_steps=depth,
                    attn_impl=self.decode_impl,
                    nucleus=nucleus,
                    mesh=self._kernel_mesh,
                )
                np.asarray(packed)  # force compile + execute now
            return run

        def spec_thunk(tables, depth, nucleus):
            def run():
                buf = self._put(jnp.zeros(
                    (s, self.sched.max_pages_per_seq * self.sched.page_size),
                    jnp.int32,
                ))
                packed, _, self.paged, _ = spec_decode_program(
                    self.params,
                    self.config,
                    self.paged,
                    buf,
                    tokens,
                    positions,
                    self._put(jnp.zeros(s, jnp.int32)),
                    tables,
                    idle,
                    temps,
                    top_ps,
                    warm_keys,
                    page_size=self.sched.page_size,
                    num_steps=depth,
                    spec_k=spec_k,
                    attn_impl=self.decode_impl,
                    nucleus=nucleus,
                    mesh=self._kernel_mesh,
                )
                np.asarray(packed)
            return run

        plan: List[Any] = []
        for w in widths:
            tables = self._put(jnp.zeros((s, w), jnp.int32))
            for nucleus in nucleus_variants:
                for depth in spec_depths:
                    plan.append(spec_thunk(tables, depth, bool(nucleus)))
                for depth in depths:
                    plan.append(decode_thunk(tables, depth, bool(nucleus)))
        return plan

    def warmup_decode(
        self,
        max_len: Optional[int] = None,
        nucleus_variants: Sequence[bool] = (False, True),
    ) -> int:
        """Precompile every decode program ``step()`` can dispatch.

        On the production path (v2 multi-page kernel) the page-table width
        is STATIC at max_pages_per_seq, so this compiles one program per
        (depth, nucleus, spec) combination. On fallback paths ``step()``
        buckets the table width to the live maximum (one compiled program
        per power-of-two width) and every bucket is warmed — a long decode
        crossing a bucket boundary mid-flight would otherwise pay an XLA
        compile inside the hot path (minutes through a remote-compile
        tunnel). Run once on an idle engine (server startup / before
        timing). ``max_len`` bounds the longest sequence to warm for on
        the bucketed path. Returns the number of programs compiled.
        """
        assert not any(r is not None for r in self._slot_req), (
            "warmup_decode must run on an idle engine"
        )
        plan = self.warmup_plan(max_len, nucleus_variants)
        for thunk in plan:
            thunk()
        return len(plan)

    def queue_warmup(
        self,
        max_len: Optional[int] = None,
        nucleus_variants: Sequence[bool] = (False, True),
        vision_sizes: Sequence[Tuple[int, int]] = ((560, 420),),
    ) -> int:
        """Queue the warmup plan for INCREMENTAL execution via
        :meth:`warm_tick` (the serving loop calls it on idle ticks) —
        the server binds immediately and programs compile between
        requests instead of as one multi-minute startup outage. A request
        arriving mid-compile waits for at most one program. Returns the
        number of queued programs.

        The first thunk warms the VISION + prompt-bucket programs (the
        multi-minute encoder compiles) by SUBMITTING tiny warm requests
        into the engine itself — they drain through the normal step loop
        at chunk granularity, so real traffic arriving mid-warm simply
        joins the batch instead of waiting behind a monolithic compile.
        Decode-program thunks follow once the engine is idle again.
        ``vision_sizes`` picks the page classes to warm — each distinct
        vision BUCKET compiles its own encoder program, so include the
        production page size (the server passes its ``--warmup-pages``);
        a size the traffic never uses still leaves the first real page
        paying its own bucket's compile.
        """

        def warm_requests():
            import numpy as _np
            from PIL import Image as _Image

            for h, w in vision_sizes:
                dummy = _Image.fromarray(_np.zeros((h, w, 3), _np.uint8))
                self.submit(
                    "warmup", images=[dummy], temperature=0.0,
                    max_new_tokens=8,
                )
            self.submit("warmup text", temperature=0.0, max_new_tokens=8)

        self._warm_queue = [warm_requests] + list(
            self.warmup_plan(max_len, nucleus_variants)
        )
        return len(self._warm_queue)

    @property
    def warm_pending(self) -> int:
        return len(getattr(self, "_warm_queue", ()))

    def warm_tick(self) -> bool:
        """Run ONE pending warm thunk if the engine is idle. Returns True
        if a program was compiled (callers loop while it returns True and
        there is still no request traffic)."""
        queue = getattr(self, "_warm_queue", None)
        if not queue:
            return False
        if any(r is not None for r in self._slot_req) or self._waiting:
            return False  # never contend with live traffic
        thunk = queue.pop(0)
        thunk()
        return True

    # -- admission -------------------------------------------------------

    def _chunked(self, req: ScheduledRequest) -> bool:
        ct = self.sched.prefill_chunk_tokens
        return ct > 0 and len(req.prompt_ids) > ct

    def _try_admit(self) -> None:
        watermark = int(self.sched.num_pages * self.sched.admit_free_page_fraction)
        while self._waiting and self._free_slots():
            free_slots = len(self._free_slots())
            budget = self.allocator.free_pages - watermark
            head = self._waiting[0]
            if self._chunked(head):
                # Long prompts: admit a contiguous run of them TOGETHER as
                # PREFILLING requests — their embedding stage (vision
                # encoder included) batches into one dispatch; the decoder
                # then runs chunk by chunk across steps (see step()).
                batch: List[ScheduledRequest] = []
                while (
                    self._waiting
                    and self._chunked(self._waiting[0])
                    and len(batch) < min(self.sched.max_prefill_batch, free_slots)
                ):
                    req = self._waiting[0]
                    need = self.allocator.pages_needed(len(req.prompt_ids) + 1)
                    if need > budget:
                        break
                    budget -= need
                    batch.append(self._waiting.popleft())
                if not batch:
                    return
                self._admit_chunked(batch)
                continue
            batch: List[ScheduledRequest] = []
            while (
                self._waiting
                and len(batch) < min(self.sched.max_prefill_batch, free_slots)
            ):
                req = self._waiting[0]
                if self._chunked(req):
                    break  # handled at the head of the next outer iteration
                need = self.allocator.pages_needed(len(req.prompt_ids) + 1)
                if need > budget:
                    break
                budget -= need
                batch.append(self._waiting.popleft())
            if not batch:
                return
            self._admit_batch(batch)

    def _admit_chunked(self, reqs: List[ScheduledRequest]) -> None:
        """Park a batch of long requests in slots as PREFILLING, with the
        vision encoder PIPELINED per request: token embeddings for the
        whole group first (tiny), then per request upload -> encode ->
        splice, each its own async dispatch. Request j+1's patch upload
        rides the host link while request j's encoder runs on the MXU —
        the merged-batch design this replaces serialized ALL uploads
        before ANY compute (the largest cold-wave slice on a tunneled
        host). The prompt bucket is a multiple of the chunk size so every
        decoder chunk is an exact static slice; encoder programs compile
        per PER-REQUEST vision bucket (a smaller, reusable set than the
        merged-group buckets)."""
        ct = self.sched.prefill_chunk_tokens
        b_fixed = self.sched.max_prefill_batch
        pad_id = self.config.special.pad_token_id
        t_bucket = max(
            -(-len(r.prompt_ids) // ct) * ct for r in reqs
        )
        input_ids = np.full((b_fixed, t_bucket), pad_id, np.int32)
        now = time.monotonic()
        for j, req in enumerate(reqs):
            input_ids[j, : len(req.prompt_ids)] = req.prompt_ids
            self.allocator.allocate(req.req_id, len(req.prompt_ids) + 1)
            req.admitted_at = req.admitted_at or now

        embeds = token_embed_program(
            self.params, self.config, self._put(input_ids)
        )
        merge = self.config.vision.spatial_merge_size**2
        for j, req in enumerate(reqs):
            packed = req.packed
            if packed is None:
                continue
            # Row-j scatter coords: build against the single row, then remap
            # its batch index (0 -> j, sentinel 1 -> b_fixed for drop).
            sb, sp = build_scatter_indices(
                input_ids[j : j + 1],
                self.config.special.imgpad_id,
                packed.patches.shape[0] // merge,
                valid_rows=packed.merged_valid_rows(merge),
            )
            sb = np.where(sb == 0, j, b_fixed).astype(np.int32)
            vision_tokens = encode_program(
                self.params,
                self.config,
                self._put(packed.patches),
                self._put(packed.pos2d),
                self._put(packed.segment_ids),
                window_ids=(
                    self._put(packed.window_ids)
                    if packed.window_ids is not None
                    else None
                ),
                attn_impl=self.prefill_impl,
                mesh=self._kernel_mesh,
            )
            embeds = splice_program(
                embeds, vision_tokens, self._put(sb), self._put(sp)
            )
            self.metrics["chunk_embeds"] = (
                self.metrics.get("chunk_embeds", 0) + 1
            )

        slots = self._free_slots()[: len(reqs)]
        for j, req in enumerate(reqs):
            slot = slots[j]
            req.embeds = embeds[j]  # [t_bucket, D] row (own buffer: the
            # full batch array must not outlive the longest request)
            req.state = PREFILLING
            req.slot = slot
            req.prefill_pos = 0
            self._slot_req[slot] = req
            self._lengths[slot] = 0
            self._temps[slot] = req.temperature
            self._top_ps[slot] = req.top_p
            self._pres[slot] = req.presence_penalty
            self._freq[slot] = req.frequency_penalty
            self._set_slot_bias(slot, req)
            self._slot_keys[slot] = req.sample_key
        # NOTE: self._dev stays valid — the decode active set (RUNNING slots)
        # is unchanged until each request's last chunk completes.

    def _run_prefill_chunk(self) -> None:
        """One decoder chunk for the LOCKSTEP GROUP of PREFILLING requests
        at the smallest chunk offset (requests admitted together stay in
        step, so one dispatch advances all of them). On each row's final
        chunk, sample its first token and promote it to RUNNING."""
        prefilling = [
            (i, r)
            for i, r in enumerate(self._slot_req)
            if r is not None and r.state == PREFILLING
        ]
        if not prefilling:
            return
        start = min(r.prefill_pos for _, r in prefilling)
        group = [(i, r) for i, r in prefilling if r.prefill_pos == start]
        group = group[: self.sched.max_prefill_batch]
        # Batch bucket: one compiled program per (chunk index, power-of-two
        # batch) — padding straight to max_prefill_batch would make a lone
        # long request pay the whole batch's dense chunk compute.
        b_bucket = 1
        while b_bucket < len(group):
            b_bucket *= 2
        b_bucket = min(b_bucket, self.sched.max_prefill_batch)

        ct = self.sched.prefill_chunk_tokens
        ps = self.sched.page_size
        kv_hi = start + ct  # both multiples of page_size
        width = kv_hi // ps
        tables = np.zeros((b_bucket, width), np.int32)
        slots = np.zeros((b_bucket, ct), np.int32)  # pad -> null page slot 0
        plens = np.zeros(b_bucket, np.int32)
        temps = np.zeros(b_bucket, np.float32)
        tps = np.ones(b_bucket, np.float32)
        keys = np.zeros((b_bucket, 2), np.uint32)
        chunks = []
        for j, (slot, req) in enumerate(group):
            plen = len(req.prompt_ids)
            plens[j] = plen
            full = self.allocator.padded_table(req.req_id)
            n = min(width, len(full))
            tables[j, :n] = full[:n]
            n_valid = min(ct, plen - start)
            slots[j, :n_valid] = self.allocator.slot_mapping(
                req.req_id, start, n_valid
            )
            temps[j] = req.temperature
            tps[j] = req.top_p
            keys[j] = req.sample_key
            # Static slice (python ints): tiny device op, no host round trip.
            chunks.append(req.embeds[start : start + ct])
        while len(chunks) < b_bucket:  # inert pad rows (prompt_len 0)
            chunks.append(jnp.zeros_like(chunks[0]))
        embeds_chunk = jnp.stack(chunks)
        bias_group_ids, bias_group_vals = self._batch_bias(
            [r for _, r in group], b_bucket
        )

        first, self.paged = prefill_extend_program(
            self.params,
            self.config,
            self.paged,
            embeds_chunk,
            self._put(plens),
            self._put(tables),
            self._put(slots),
            self._put(keys),
            self._put(temps),
            self._put(tps),
            page_size=ps,
            kv_hi=kv_hi,
            q_offset=start,
            bias_ids=bias_group_ids,
            bias_vals=bias_group_vals,
            attn_impl=self.prefill_impl,
            mesh=self._kernel_mesh,
            # ALWAYS the nucleus sampler: prefill samples one token per
            # request, so the top-k cost is noise — while a nucleus STATIC
            # here would mean the first top_p<1 vision request compiles a
            # whole fresh prefill program mid-serving (measured: ~100 s
            # through a remote-compile tunnel on the SVG scenario).
            nucleus=True,
        )
        self.metrics["prefill_chunks"] += 1
        first_host = None
        for j, (slot, req) in enumerate(group):
            req.prefill_pos += ct
            if req.prefill_pos >= len(req.prompt_ids):
                if first_host is None:
                    first_host = np.asarray(first)  # one fetch per chunk
                token = int(first_host[j, 0])
                req.embeds = None
                req.state = RUNNING
                req.output_ids = [token]
                if req.logprobs:
                    req.output_logprobs.append(
                        float(first_host[j, 1:2].view(np.float32)[0])
                    )
                req.first_token_at = req.first_token_at or time.monotonic()
                self._tokens[slot] = token
                self._lengths[slot] = len(req.prompt_ids)
                self.metrics["prefills"] += 1
                self._dev = None  # active set grows; re-upload next chunk
                self._update_text(slot)
                self._maybe_finish(slot)

    def _admit_batch(self, reqs: List[ScheduledRequest]) -> None:
        """Prefill up to max_prefill_batch requests in one dispatch. The
        batch dim is padded to a fixed size with inert rows so every
        (t_bucket, v_bucket) pair compiles exactly once."""
        from dots_ocr_tpu.models.preprocess import merge_packed

        self._dev = None  # new active slots; re-upload next decode chunk

        b_fixed = self.sched.max_prefill_batch
        pad_id = self.config.special.pad_token_id
        n = len(reqs)
        slots = self._free_slots()[:n]
        t_bucket = self._bucket(max(len(r.prompt_ids) for r in reqs))

        input_ids = np.full((b_fixed, t_bucket), pad_id, np.int32)
        seq_lens = np.zeros(b_fixed, np.int32)
        slot_mapping = np.full((b_fixed, t_bucket), -1, np.int32)
        temps = np.zeros(b_fixed, np.float32)
        tps = np.ones(b_fixed, np.float32)
        keys = np.zeros((b_fixed, 2), np.uint32)
        now = time.monotonic()
        for j, req in enumerate(reqs):
            req.admitted_at = req.admitted_at or now
            plen = len(req.prompt_ids)
            input_ids[j, :plen] = req.prompt_ids
            seq_lens[j] = plen
            self.allocator.allocate(req.req_id, plen + 1)
            slot_mapping[j, :plen] = self.allocator.slot_mapping(req.req_id, 0, plen)
            temps[j] = req.temperature
            tps[j] = req.top_p
            keys[j] = req.sample_key

        kwargs = {}
        packs = [r.packed for r in reqs if r.packed is not None]
        if packs:
            merged = merge_packed(
                packs, self.config.vision, bucket_step=self.sched.vision_bucket_step
            )
            merge = self.config.vision.spatial_merge_size**2
            sb, sp = build_scatter_indices(
                input_ids, self.config.special.imgpad_id,
                merged.patches.shape[0] // merge,
                valid_rows=merged.merged_valid_rows(merge),
            )
            kwargs = dict(
                patches=self._put(merged.patches),
                pos2d=self._put(merged.pos2d),
                segment_ids=self._put(merged.segment_ids),
                scatter_batch=self._put(sb),
                scatter_pos=self._put(sp),
            )
            if merged.window_ids is not None:
                kwargs["window_ids"] = self._put(merged.window_ids)

        bias_ids_dev, bias_vals_dev = self._batch_bias(reqs, b_fixed)
        first, self.paged = prefill_program(
            self.params,
            self.config,
            self.paged,
            self._put(input_ids),
            self._put(seq_lens),
            self._put(slot_mapping.reshape(-1)),
            self._put(keys),
            self._put(temps),
            self._put(tps),
            bias_ids=bias_ids_dev,
            bias_vals=bias_vals_dev,
            attn_impl=self.prefill_impl,
            nucleus=True,  # see _run_prefill_chunk — never a static trap
            mesh=self._kernel_mesh,
            **kwargs,
        )
        first = np.asarray(first)

        for j, req in enumerate(reqs):
            slot = slots[j]
            token = int(first[j, 0])
            req.state = RUNNING
            req.slot = slot
            req.output_ids = [token]
            if req.logprobs:
                req.output_logprobs.append(
                    float(first[j, 1:2].view(np.float32)[0])
                )
            req.first_token_at = req.first_token_at or time.monotonic()
            self._slot_req[slot] = req
            self._tokens[slot] = token
            self._lengths[slot] = len(req.prompt_ids)
            self._temps[slot] = req.temperature
            self._top_ps[slot] = req.top_p
            self._pres[slot] = req.presence_penalty
            self._freq[slot] = req.frequency_penalty
            self._set_slot_bias(slot, req)
            self._slot_keys[slot] = req.sample_key
            self.metrics["prefills"] += 1
            self._update_text(slot)  # may finish on a stop-string match
            self._maybe_finish(slot)

    # -- finishing / preemption -------------------------------------------

    def _maybe_finish(self, slot: int) -> None:
        req = self._slot_req[slot]
        if req is None:
            return
        last = req.output_ids[-1] if req.output_ids else None
        if last == self.config.special.eos_token_id:
            self._finish(slot, "stop")
        elif last is not None and last in req.stop_token_ids:
            self._finish(slot, "stop")
        elif len(req.output_ids) >= req.max_new_tokens:
            self._finish(slot, "length")
        elif self.sched.repetition_min_repeats > 0:
            from dots_ocr_tpu.engine.repetition import detect_repetition

            period = detect_repetition(
                req.output_ids,
                max_period=self.sched.repetition_max_period,
                min_repeats=self.sched.repetition_min_repeats,
            )
            if period is not None:
                logger.warning(
                    "request %d stuck in a period-%d token loop after %d "
                    "tokens; stopping", req.req_id, period, len(req.output_ids),
                )
                self.metrics["repetition_stops"] = (
                    self.metrics.get("repetition_stops", 0) + 1
                )
                self._finish(slot, "repetition")

    def _finish(self, slot: int, reason: str) -> None:
        req = self._slot_req[slot]
        req.state = FINISHED
        req.finished_reason = reason
        req.finished_at = time.monotonic()
        # Rolling window for /metrics latency percentiles (bounded).
        self.recent_timings.append(req.timing())
        req.embeds = None  # release chunked-prefill device memory, if any
        if req.detok is not None and req.final_text is None:
            # Consume any tokens not yet detokenized (trailing EOS / stop
            # token excluded) + flush pending bytes.
            req.text += self._push_detok(req)
            req.text += req.detok.flush()
            req.final_text = req.text
        if req.detok is not None:
            self._emit_stream(req, final=True)
        if self._inflight is not None:
            # An in-flight pipelined chunk may still write this request's
            # pages (post-EOS discard tokens); freeing them now could hand
            # them to another sequence mid-write. Defer until the pipeline
            # drains (_drain_inflight flushes).
            self._deferred_free.append(req.req_id)
        else:
            self.allocator.free(req.req_id)
        self._finished[req.req_id] = req
        self._slot_req[slot] = None
        self._lengths[slot] = 0
        self._dev = None  # active set changed; re-upload next chunk

    def cancel(self, req_id: int) -> bool:
        """Abort a waiting or running request (client disconnect). Frees its
        pages/slot immediately; the request finishes with reason
        'cancelled'. Returns False if the id is unknown or already done."""
        for req in list(self._waiting):
            if req.req_id == req_id:
                self._waiting.remove(req)
                req.state = FINISHED
                req.finished_reason = "cancelled"
                self._finished[req_id] = req
                if req.stream_cb is not None:
                    self._emit_stream(req, final=True)
                return True
        for slot, req in enumerate(self._slot_req):
            if req is not None and req.req_id == req_id:
                if self._inflight is not None:
                    # Land the pipelined chunk first so _finish frees the
                    # pages NOW instead of deferring them to a step that a
                    # disconnecting client will never drive. Cancel is a
                    # rare host event; the drain is bit-identical to what
                    # the next step would have applied anyway.
                    self._drain_inflight()
                    if req.state == FINISHED:
                        return False  # drained chunk finished it naturally
                self._finish(req.slot, "cancelled")
                self.metrics["cancelled"] = self.metrics.get("cancelled", 0) + 1
                return True
        return False

    def _preempt_youngest(self) -> None:
        """Recompute-style preemption: youngest running request goes back to
        the waiting queue with prompt := prompt + generated-so-far."""
        candidates = [r for r in self._slot_req if r is not None]
        if not candidates:
            raise OutOfPages("no pages free and nothing to preempt")
        victim = max(candidates, key=lambda r: r.submitted_at)
        slot = victim.slot
        self.allocator.free(victim.req_id)
        self._slot_req[slot] = None
        self._lengths[slot] = 0
        # A PREFILLING victim just restarts its (chunked) prefill later: drop
        # the on-device embeddings and chunk progress; nothing was generated.
        victim.embeds = None
        victim.prefill_pos = 0
        victim.prompt_ids = victim.prompt_ids + victim.output_ids
        victim.max_new_tokens = max(1, victim.max_new_tokens - len(victim.output_ids))
        victim.prior_output = victim.prior_output + victim.output_ids
        victim.output_ids = []
        victim.state = WAITING
        victim.slot = -1
        victim.preempted += 1
        self.metrics["preemptions"] += 1
        self._waiting.appendleft(victim)
        self._dev = None  # active set + tables changed; re-upload

    def _update_spec_gate(self, emitted: int, chunk: int, n_active: int) -> None:
        """Adaptive speculation cut-off (unit-tested against the measured
        cost curve): a verify iteration costs ~1.64x a plain decode
        iteration (tools/bench_spec.py --acceptance-sweep measures the
        ratio; PERF.md publishes the curve), so speculation only pays while
        emitted tokens/slot-iteration stays above that break-even. EWMA
        over spec chunks; 3 consecutive below-threshold chunks disable
        speculation for the current load (re-probes on drain)."""
        floor = self.sched.spec_min_tokens_per_iter
        if floor <= 0 or not self._spec_enabled:
            return
        per_iter = emitted / max(1, chunk * n_active)
        self._spec_ewma = (
            per_iter if self._spec_ewma is None
            else 0.7 * self._spec_ewma + 0.3 * per_iter
        )
        if self._spec_ewma < floor:
            self._spec_low_streak += 1
            if self._spec_low_streak >= 3:
                self._spec_enabled = False
                self.metrics["spec_auto_disabled"] = (
                    self.metrics.get("spec_auto_disabled", 0) + 1
                )
                logger.info(
                    "speculation auto-disabled: %.2f tokens/slot-iter below "
                    "the %.2f break-even (re-probes when the engine drains)",
                    self._spec_ewma, floor,
                )
        else:
            self._spec_low_streak = 0

    # -- the step --------------------------------------------------------

    def _apply_chunk_results(
        self,
        packed,
        active: List[int],
        chunk: int,
        use_lp: bool,
        use_spec: bool,
    ) -> None:
        """Fetch one decode chunk's packed result and fold it into host
        state (token append, EOS/stop/budget finishes, spec gate). Shared
        by the synchronous path and the pipelined drain."""
        packed = np.asarray(packed)  # the chunk's single fetch
        tokens_out, num_decoded = packed[:, :-1], packed[:, -1]
        lps = None
        if use_lp and not use_spec:
            w = (packed.shape[1] - 1) // 2
            tokens_out = packed[:, :w]
            lps = np.ascontiguousarray(
                packed[:, w : 2 * w]
            ).view(np.float32)
        if use_spec:
            self.metrics["spec_emitted"] = (
                self.metrics.get("spec_emitted", 0) + int(num_decoded.sum())
            )
            # Gate the EWMA on rows still live at apply time only: slots
            # whose requests finished while this chunk was pipelined are
            # discard-only, and counting them (in numerator or denominator)
            # would skew the acceptance estimate and could disable
            # speculation marginally early (ADVICE r4).
            live_rows = [i for i in active if self._slot_req[i] is not None]
            if live_rows:
                emitted_live = int(sum(num_decoded[i] for i in live_rows))
                self._update_spec_gate(emitted_live, chunk, len(live_rows))
        self.metrics["steps"] += 1
        for i in active:
            req = self._slot_req[i]
            if req is None:
                # Slot finished while this chunk was in flight (pipelined
                # drain): its post-EOS tokens are discard-only.
                continue
            n = int(num_decoded[i])
            self._lengths[i] += n
            for t_idx, token in enumerate(tokens_out[i, :n].tolist()):
                req.output_ids.append(int(token))
                if req.logprobs and lps is not None:
                    req.output_logprobs.append(float(lps[i, t_idx]))
                self.metrics["generated_tokens"] += 1
                if (
                    token == self.config.special.eos_token_id
                    or token in req.stop_token_ids
                    or len(req.output_ids) >= req.max_new_tokens
                ):
                    break
            if self._slot_req[i] is not None:
                self._tokens[i] = req.output_ids[-1]
                self._update_text(i)  # may finish on stop string
                self._maybe_finish(i)

    def _drain_inflight(self) -> None:
        """Land the pipelined chunk (if any) and flush deferred page frees.
        Must run before any admission, preemption-capable reservation, or
        host-state-derived device-input rebuild."""
        inflight, self._inflight = self._inflight, None
        if inflight is not None:
            self._apply_chunk_results(
                inflight["packed"], inflight["active"], inflight["chunk"],
                inflight["use_lp"], inflight["use_spec"],
            )
        if self._inflight is None and self._deferred_free:
            for rid in self._deferred_free:
                self.allocator.free(rid)
            self._deferred_free.clear()

    def step(self) -> List[ScheduledRequest]:
        """Admit + at most one prefill chunk + one multi-step decode chunk.
        Returns newly finished requests."""
        before = set(self._finished)
        t0 = time.perf_counter()
        if self._inflight is not None and self._waiting:
            # Admission reuses freed slots/pages; the in-flight chunk still
            # writes them. Land it first.
            self._drain_inflight()
        self._try_admit()
        t1 = time.perf_counter()
        self.metrics["t_admit_s"] += t1 - t0
        # ONE chunk of ONE chunked prefill per step: decode latency during a
        # long prefill is bounded by a chunk's forward, not the whole prompt.
        self._run_prefill_chunk()
        t2 = time.perf_counter()
        self.metrics["t_prefill_s"] += t2 - t1

        active = [
            i for i, r in enumerate(self._slot_req)
            if r is not None and r.state == RUNNING
        ]
        if active:
            s = self.sched.max_slots
            chunk = self.sched.steps_per_sync
            # Speculation: greedy rows stay exactly greedy; sampled rows
            # (incl. top_p < 1 via the nucleus-exact verify) are
            # distribution-preserving, so it engages for every mix.
            spec_k = self.sched.speculate_k
            # logprobs requests run plain decode chunks (the spec verify
            # emits a variable number of tokens per iteration and does not
            # surface per-token logprobs); one such request gates the
            # whole chunk — acceptable for an observability feature.
            use_lp = any(
                self._slot_req[i] is not None and self._slot_req[i].logprobs
                for i in active
            )
            # Penalties mutate the sampling distribution per emitted token
            # (token j changes token j+1's logits), which the multi-token
            # spec verify cannot honor — plain chunks while active.
            use_pen = any(
                self._slot_req[i] is not None
                and (self._slot_req[i].presence_penalty != 0.0
                     or self._slot_req[i].frequency_penalty != 0.0)
                for i in active
            )
            # logit_bias is position-independent, so it composes with
            # speculation (the verify applies the same bias per column).
            use_bias = any(
                self._slot_req[i] is not None
                and self._slot_req[i].logit_bias
                for i in active
            )
            use_spec = (spec_k > 0 and self._spec_enabled
                        and not use_lp and not use_pen)
            tokens_per_iter = (spec_k + 1) if use_spec else 1
            # Deep chunks are counted in ITERATIONS; with speculation each
            # iteration emits up to tokens_per_iter tokens, so scale the
            # depth down — otherwise a request's final chunk runs up to
            # (spec_k+1)x past its budget (harmless but wasted verifies).
            deep = max(
                self.sched.steps_per_sync,
                self.sched.max_steps_per_sync // tokens_per_iter,
            )
            live = [self._slot_req[i] for i in active]
            # remaining is in TOKENS; a chunk can emit up to
            # chunk * tokens_per_iter of them. With a pipelined chunk in
            # flight, host lengths lag by up to `ahead` assumed emissions.
            remaining = min(
                r.max_new_tokens - len(r.output_ids) for r in live
            )
            ahead = (
                self._inflight["tokens"] if self._inflight is not None else 0
            )
            prefilling = any(
                r is not None and r.state == PREFILLING
                for r in self._slot_req
            )
            event_free = (
                not self._waiting
                and not prefilling  # don't starve an in-flight prefill
                and not any(
                    # Anything needing per-chunk host checks caps the
                    # depth: streaming deltas, stop STRINGS, and stop
                    # TOKEN ids (the device loop only early-exits on
                    # the config EOS — a deep chunk would keep
                    # decoding ~deep iterations past a fired stop id).
                    r.stream_cb is not None or r.stop or r.stop_token_ids
                    for r in live
                )
            )
            if (
                deep > chunk
                and event_free
                and remaining - ahead >= deep * tokens_per_iter
            ):
                # Deep chunk: nothing needs a host sync for `deep`
                # tokens — amortize the dispatch RTT further. The budget
                # gate guarantees no request can overshoot
                # max_new_tokens inside the chunk.
                chunk = deep
            # Lookahead-1 pipelining (SchedulerConfig.pipeline_decode):
            # plain event-free decode dispatches the next chunk off the
            # device carry BEFORE fetching the in-flight one. The modes
            # that fold per-chunk host state back into the next dispatch
            # (speculation buffers, penalties counts, logprobs unpacking)
            # stay synchronous.
            # Speculation composes with the pipeline: the n-gram buffer is
            # part of the device carry (chained at dispatch) and `ahead`
            # already assumes the (spec_k+1)-per-iteration worst case for
            # budgets/reservations; an adaptive-gate flip after processing
            # shows up as a decode-mode change on self._dev, which drains.
            pipeline_now = (
                self.sched.pipeline_decode
                and event_free
                and not (use_lp or use_pen or use_bias)
                and remaining - ahead >= chunk * tokens_per_iter
            )
            mode_flip = self._dev is not None and (
                self._dev.get("spec") != use_spec
                or self._dev.get("pen") != use_pen
                or self._dev.get("bias") != use_bias
            )
            if self._inflight is not None and (
                not pipeline_now or self._dev is None or mode_flip
            ):
                # Pipeline must break (event pending, mode flip, or the
                # device carry was invalidated): land the in-flight chunk,
                # then continue this step against true host state.
                self._drain_inflight()
                ahead = 0
                active = [
                    i for i in active if self._slot_req[i] is not None
                ]
            # Pass 1: reserve chunk pages per slot; preemption may clear any
            # slot (including ones already reserved), so state is re-read in
            # pass 2. Any page allocation changes a table row, so the cached
            # device inputs are invalidated via the free-page delta.
            free_before = self.allocator.free_pages
            for i in active:
                req = self._slot_req[i]
                if req is None:  # preempted by an earlier iteration
                    continue
                # Write position of the current token; while a pipelined
                # chunk is in flight the device is up to `ahead` tokens
                # past the host view, so reserve for the worst case.
                pos = int(self._lengths[i]) + ahead
                # Reservation looks one chunk ahead; clamp it to the
                # per-sequence capacity so the cap NEVER raises here (the
                # submit-time budget clamp guarantees the request finishes
                # at max_new_tokens before real writes pass the cap —
                # chunk-tail overshoot tokens are discarded by the host).
                # An OutOfPages below therefore always means POOL pressure,
                # where preemption is the right answer.
                target = min(
                    pos + chunk * tokens_per_iter,
                    self.sched.max_pages_per_seq * self.sched.page_size,
                )
                while True:
                    try:
                        self.allocator.extend(req.req_id, target)
                        break
                    except OutOfPages:
                        if self._inflight is not None:
                            # Preempting a victim would free pages the
                            # in-flight chunk still writes; land it first
                            # (also flushes deferred frees) and retry with
                            # the true position before reaching for
                            # preemption.
                            self._drain_inflight()
                            ahead = 0
                            pipeline_now = False
                            # Rows reserved earlier in this pass used the
                            # stale `ahead` lookahead; shrink them to the
                            # true-position target so the pool pressure
                            # that forced this drain isn't amplified by
                            # over-held reservations (ADVICE r4). The
                            # drain also invalidated the pipeline, so a
                            # full device-input rebuild below is correct.
                            cap = (self.sched.max_pages_per_seq
                                   * self.sched.page_size)
                            for j in active:
                                if j == i:
                                    break  # i and later re-reserve below
                                rj = self._slot_req[j]
                                if rj is None:
                                    continue
                                self.allocator.trim(
                                    rj.req_id,
                                    min(int(self._lengths[j])
                                        + chunk * tokens_per_iter, cap),
                                )
                            self._dev = None  # tables may have shrunk
                            if self._slot_req[i] is None:
                                break  # this row finished in the drain
                            target = min(
                                int(self._lengths[i])
                                + chunk * tokens_per_iter,
                                self.sched.max_pages_per_seq
                                * self.sched.page_size,
                            )
                            continue
                        self._preempt_youngest()
                        if self._slot_req[i] is None:
                            break  # we preempted ourselves
            if self.allocator.free_pages != free_before:
                if self._inflight is not None and self._dev is not None:
                    # Mid-pipeline page growth: only the table CONTENTS
                    # changed (host-knowable from the allocator); the
                    # tokens/positions carry lives on device and must not
                    # be rebuilt from the lagging host state. Refresh the
                    # tables upload alone.
                    live_now = [
                        i for i in active if self._slot_req[i] is not None
                    ]
                    max_pages_now = 1
                    for i in live_now:
                        max_pages_now = max(
                            max_pages_now,
                            self.allocator.pages_needed(
                                int(self._lengths[i]) + ahead
                                + chunk * tokens_per_iter
                            ),
                        )
                    if self._static_width:
                        mp_bucket = self.sched.max_pages_per_seq
                    else:
                        mp_bucket = 1
                        while mp_bucket < max_pages_now:
                            mp_bucket *= 2
                        mp_bucket = min(
                            mp_bucket, self.sched.max_pages_per_seq
                        )
                    tables = np.zeros((s, mp_bucket), np.int32)
                    for i in live_now:
                        full = self.allocator.padded_table(
                            self._slot_req[i].req_id
                        )
                        tables[i] = full[:mp_bucket]
                    self._dev["tables"] = self._put(tables)
                else:
                    self._dev = None

            # Pass 2: device inputs. On an event-free chunk the previous
            # chunk's device-side carry (tokens/positions/rng) is still
            # valid and NOTHING is uploaded — on a tunneled host every
            # upload costs a full RTT, and steady-state long decodes are
            # mostly event-free. Otherwise rebuild from host state: the
            # page-table width is bucketed to the CURRENT longest sequence
            # (power-of-two pages, capped at max_pages_per_seq) so the
            # paged kernel's S x table_width grid shrinks at short
            # contexts (one compile per width bucket, see warmup_decode).
            active = [i for i in active if self._slot_req[i] is not None]
            if self._dev is not None and (
                self._dev.get("spec") != use_spec
                or self._dev.get("pen") != use_pen
                or self._dev.get("bias") != use_bias
            ):
                self._dev = None  # decode mode flipped; rebuild inputs
            if active and self._dev is None:
                positions = np.zeros(s, np.int32)
                active_mask = np.zeros(s, bool)
                max_pages_now = 1
                for i in active:
                    positions[i] = int(self._lengths[i])
                    active_mask[i] = True
                    max_pages_now = max(
                        max_pages_now,
                        self.allocator.pages_needed(
                            int(self._lengths[i]) + chunk * tokens_per_iter
                        ),
                    )
                if self._static_width:
                    mp_bucket = self.sched.max_pages_per_seq
                else:
                    mp_bucket = 1
                    while mp_bucket < max_pages_now:
                        mp_bucket *= 2
                    mp_bucket = min(mp_bucket, self.sched.max_pages_per_seq)
                tables = np.zeros((s, mp_bucket), np.int32)
                for i in active:
                    full = self.allocator.padded_table(self._slot_req[i].req_id)
                    tables[i] = full[:mp_bucket]
                self._dev = {
                    "tokens": self._put(self._tokens),
                    "positions": self._put(positions),
                    "tables": self._put(tables),
                    "active": self._put(active_mask),
                    "temps": self._put(self._temps),
                    "top_ps": self._put(self._top_ps),
                    "keys": self._put(self._slot_keys),
                    "nucleus": bool(np.any(self._top_ps[active] < 1.0)),
                    "spec": use_spec,
                    "pen": use_pen,
                    "bias": use_bias,
                }
                if use_bias:
                    self._dev["bias_ids"] = self._put(self._bias_ids)
                    self._dev["bias_vals"] = self._put(self._bias_vals)
                if use_pen:
                    vocab = self.config.decoder.vocab_size
                    cnts = np.zeros((s, vocab), np.int32)
                    for i in active:
                        toks = self._slot_req[i].output_ids
                        if toks:
                            np.add.at(cnts[i], np.asarray(toks, np.int64), 1)
                    self._dev["counts"] = self._put(cnts)
                    self._dev["pres"] = self._put(self._pres)
                    self._dev["freq"] = self._put(self._freq)
                if use_spec:
                    # Generated-token history by logical position + each
                    # row's first generated position (the n-gram draft
                    # source). Rebuilt from host state on events only.
                    length_buf = (
                        self.sched.max_pages_per_seq * self.sched.page_size
                    )
                    buf = np.zeros((s, length_buf), np.int32)
                    gen_start = np.zeros(s, np.int32)
                    for i in active:
                        req = self._slot_req[i]
                        plen = len(req.prompt_ids)
                        gen_start[i] = plen
                        toks = req.output_ids
                        end = min(plen + len(toks), length_buf)
                        buf[i, plen:end] = toks[: end - plen]
                    self._dev["buf"] = self._put(buf)
                    self._dev["gen_start"] = self._put(gen_start)
                self.metrics["chunk_input_rebuilds"] += 1
            if active:
                dev = self._dev
                if use_spec:
                    packed, carry, self.paged, dev["buf"] = spec_decode_program(
                        self.params,
                        self.config,
                        self.paged,
                        dev["buf"],
                        dev["tokens"],
                        dev["positions"],
                        dev["gen_start"],
                        dev["tables"],
                        dev["active"],
                        dev["temps"],
                        dev["top_ps"],
                        dev["keys"],
                        page_size=self.sched.page_size,
                        num_steps=chunk,
                        spec_k=spec_k,
                        attn_impl=self.decode_impl,
                        nucleus=dev["nucleus"],
                        bias_ids=dev.get("bias_ids"),
                        bias_vals=dev.get("bias_vals"),
                        mesh=self._kernel_mesh,
                    )
                    self.metrics["spec_chunks"] = (
                        self.metrics.get("spec_chunks", 0) + 1
                    )
                    # Acceptance observability: tokens emitted per verify
                    # slot-iteration vs the (spec_k + 1) ceiling. Exposed
                    # on /metrics as spec_emitted / spec_slot_iters —
                    # acceptance = emitted / (iters * (k+1)).
                    self.metrics["spec_slot_iters"] = (
                        self.metrics.get("spec_slot_iters", 0)
                        + chunk * len(active)
                    )
                else:
                    ret = decode_program(
                        self.params,
                        self.config,
                        self.paged,
                        dev["tokens"],
                        dev["positions"],
                        dev["tables"],
                        dev["active"],
                        dev["temps"],
                        dev["top_ps"],
                        dev["keys"],
                        page_size=self.sched.page_size,
                        num_steps=chunk,
                        attn_impl=self.decode_impl,
                        nucleus=dev["nucleus"],
                        with_logprobs=use_lp,
                        with_penalties=use_pen,
                        presence=dev.get("pres"),
                        frequency=dev.get("freq"),
                        counts=dev.get("counts"),
                        bias_ids=dev.get("bias_ids"),
                        bias_vals=dev.get("bias_vals"),
                        mesh=self._kernel_mesh,
                    )
                    if use_pen:
                        packed, carry, self.paged, dev["counts"] = ret
                    else:
                        packed, carry, self.paged = ret
                # Chain the device-side carry BEFORE host accounting: a
                # finish/preempt below just resets self._dev to None.
                dev["tokens"], dev["positions"] = carry
                if pipeline_now:
                    # Lookahead-1: stash this chunk's (device-side) results
                    # and process the PREVIOUS chunk's while this one runs —
                    # the fetch RTT + host accounting hide behind device
                    # execution.
                    prev = self._inflight
                    self._inflight = {
                        "packed": packed,
                        "active": list(active),
                        "chunk": chunk,
                        "use_lp": use_lp,
                        "use_spec": use_spec,
                        "tokens": chunk * tokens_per_iter,
                    }
                    self.metrics["pipelined_chunks"] = (
                        self.metrics.get("pipelined_chunks", 0) + 1
                    )
                    if prev is not None:
                        self._apply_chunk_results(
                            prev["packed"], prev["active"], prev["chunk"],
                            prev["use_lp"], prev["use_spec"],
                        )
                else:
                    self._apply_chunk_results(
                        packed, active, chunk, use_lp, use_spec
                    )
            t_mark = time.perf_counter()
            self.metrics["t_decode_s"] += t_mark - t2
        else:
            t_mark = t2

        if not self._spec_enabled and not self.has_work():
            # Drained idle: the workload that measured below break-even is
            # gone; give the next one a fresh speculation probe.
            self._spec_enabled = True
            self._spec_ewma = None
            self._spec_low_streak = 0

        out = [self._finished[rid] for rid in set(self._finished) - before]
        self.metrics["t_step_other_s"] += time.perf_counter() - t_mark
        return out

    def run(self, max_steps: int = 10_000_000) -> None:
        steps = 0
        while self.has_work() and steps < max_steps:
            self.step()
            steps += 1

    # -- convenience (InferenceEngine-compatible surface) -----------------

    @property
    def last_stats(self):
        from dots_ocr_tpu.engine.engine import RequestStats

        return RequestStats(
            prompt_tokens=0,
            completion_tokens=self.metrics["generated_tokens"],
        )

    def generate_batch(
        self,
        prompts: Sequence[str],
        images_per_prompt: Sequence[Sequence] = (),
        temperature: Union[float, Sequence[float]] = 0.1,
        top_p: Union[float, Sequence[float]] = 1.0,
        max_new_tokens: Optional[int] = None,
        system_prompt: Optional[str] = None,
        min_pixels: Optional[int] = None,
        max_pixels: Optional[int] = None,
        seed: Optional[Union[int, Sequence[Optional[int]]]] = None,
        stop: Optional[Sequence[str]] = None,
    ) -> List[str]:
        # Scalar seed: reseed the engine chain once (historic behavior).
        # Sequence: per-request — request i samples exactly as
        # generate_one(..., seed=seed[i]) would (chain reseeded before its
        # submit), so a batched multi-page parse reproduces the serial
        # per-page parse bit-for-bit (parser.parse_pdf seed=base+page_no).
        seeds: Optional[List[Optional[int]]] = None
        if seed is not None and not isinstance(seed, (int, np.integer)):
            seeds = [None if s is None else int(s) for s in seed]
            if len(seeds) != len(prompts):
                raise ValueError(
                    f"seed sequence length {len(seeds)} != {len(prompts)} prompts"
                )
        elif seed is not None:
            self._rng = jax.random.PRNGKey(int(seed))
        n = len(prompts)
        images_per_prompt = images_per_prompt or [[] for _ in range(n)]
        temps = np.broadcast_to(np.asarray(temperature, np.float32), (n,))
        tps = np.broadcast_to(np.asarray(top_p, np.float32), (n,))
        group = max(1, self.sched.max_prefill_batch)
        ids = []
        for i in range(n):
            if seeds is not None and seeds[i] is not None:
                self._rng = jax.random.PRNGKey(seeds[i])
            ids.append(
                self.submit(
                    prompts[i],
                    images=images_per_prompt[i],
                    max_new_tokens=max_new_tokens,
                    temperature=float(temps[i]),
                    top_p=float(tps[i]),
                    system_prompt=system_prompt,
                    min_pixels=min_pixels,
                    max_pixels=max_pixels,
                    stop=stop,
                )
            )
            if i + 1 == group and n > group:
                # First admission group is complete: dispatch its device
                # work (uploads -> encoders -> first prefill chunk) NOW so
                # the remaining requests' host-side preprocessing overlaps
                # chip compute instead of leaving the chip idle (on a
                # 1-core host, submit() prep is the serialized prologue of
                # a cold wave — PERF.md wave decomposition).
                self.step()
        self.run()
        return [self.request_text(rid) for rid in ids]

    def finished_request(self, req_id: int):
        """The finished ScheduledRequest for req_id, or None (public
        accessor — the serving layer must not reach into _finished)."""
        return self._finished.get(req_id)

    def take_finished(self, req_id: int) -> Optional[str]:
        """Final text of a finished request, REMOVING it from the engine's
        finished map. Long-lived callers (the serving worker) must use this
        instead of request_text: every completed request's token lists and
        text otherwise accumulate forever — an unbounded memory leak on a
        production server. Returns None for unknown ids."""
        if req_id not in self._finished:
            return None
        text = self.request_text(req_id)
        del self._finished[req_id]
        return text

    def request_text(self, req_id: int) -> str:
        """Final text of a finished request (stop-string truncation applied)."""
        req = self._finished[req_id]
        if req.final_text is not None:
            return req.final_text
        eos = self.config.special.eos_token_id
        toks = req.prior_output + req.output_ids
        if toks and (toks[-1] == eos or toks[-1] in req.stop_token_ids):
            toks = toks[:-1]
        return self.tokenizer.decode(toks, skip_special_tokens=True)

    def generate_one(self, prompt: str, images: Sequence = (), **kwargs) -> str:
        return self.generate_batch([prompt], [list(images)], **kwargs)[0]
