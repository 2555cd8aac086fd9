"""Qwen2.5-style causal decoder with GQA, scan-stacked layers, KV cache.

TPU-first design (vs. the reference's HF-transformers/vLLM CUDA decoder):

  * **Two jitted entry points, fixed shapes**: ``prefill`` (batched, padded
    to a token bucket) and ``decode_step`` (one token per live sequence).
    The serving engine re-buckets work so XLA compiles each shape once.
  * **lax.scan over 28 stacked layers** with the KV cache threaded through
    as scan xs/ys — O(1) compile size, cache updates stay on device.
  * **Contiguous cache here** ([L, B, S, KV, D]); the paged-cache variant
    used by continuous batching lives in ``engine/kv_cache.py`` and reuses
    these block functions.
  * GQA (12 query / 2 KV heads) computed grouped — KV is never materialized
    per-query-head.

Spec: hidden 1536, 28 layers, GQA 12/2, head_dim 128, intermediate 8960,
RMSNorm + SwiGLU, RoPE theta 1e6, qkv bias, tied embeddings (SURVEY.md §2.4,
[EXTERNAL — verified against checkpoint config at load time]).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dots_ocr_tpu.models.config import DecoderConfig
from dots_ocr_tpu.models.layers import embed, linear, rms_norm, swiglu, unembed
from dots_ocr_tpu.models.rope import apply_rope, rope_table
from dots_ocr_tpu.ops.attention import (
    attention,
    make_causal_mask,
    make_length_mask,
    mha_reference,
)


class KVCache(NamedTuple):
    """Contiguous per-layer KV cache: k/v [num_layers, B, max_len, KV, D]."""

    k: jnp.ndarray
    v: jnp.ndarray

    @staticmethod
    def create(
        cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16
    ) -> "KVCache":
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _project_qkv(x: jnp.ndarray, attn_p: dict, cfg: DecoderConfig):
    """x: [..., D] -> q [..., H, hd], k/v [..., KV, hd]."""
    lead = x.shape[:-1]
    q = linear(x, attn_p["wq"], attn_p.get("bq")).reshape(
        *lead, cfg.num_heads, cfg.head_dim
    )
    k = linear(x, attn_p["wk"], attn_p.get("bk")).reshape(
        *lead, cfg.num_kv_heads, cfg.head_dim
    )
    v = linear(x, attn_p["wv"], attn_p.get("bv")).reshape(
        *lead, cfg.num_kv_heads, cfg.head_dim
    )
    return q, k, v


def scatter_kv_rows(pool: jnp.ndarray, slots: jnp.ndarray,
                    updates: jnp.ndarray) -> jnp.ndarray:
    """Write per-token K/V rows into a [KV, N, D] pool leaf, in place.

    The scatter runs on a flat [KV*N, D] row view, NOT on the 3-D pool.
    A middle-axis scatter (``pool.at[:, slots].set``) makes XLA:TPU pick a
    scatter-friendly {2,0,1:T(2,128)} layout for the result while the
    Pallas paged-attention custom call constrains its operand to the
    default {2,1,0} tiling — so every decode iteration inserted TWO 16.8 MB
    layout-conversion copies per pool leaf (~2.7 ms/iter across 28 layers
    at 64 slots, the single largest line in the r4 decode profile). A row
    scatter on the 2-D view has only one sensible layout ({1,0}), the
    reshapes are bitcasts, and the while-loop carry stays copy-free.

    pool: [KV, N, D]; slots: [T] flat slot ids; updates: [T, KV, D].
    """
    kv, n, d = pool.shape
    rows = (
        jnp.arange(kv, dtype=slots.dtype)[:, None] * n + slots[None, :]
    ).reshape(-1)
    upd = updates.transpose(1, 0, 2).reshape(-1, d).astype(pool.dtype)
    return pool.reshape(kv * n, d).at[rows].set(upd).reshape(kv, n, d)


def decoder_layer_prefill(
    x: jnp.ndarray,
    block_params: dict,
    cfg: DecoderConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,
    segment_ids: jnp.ndarray,
    attn_impl: str = "xla",
    mesh=None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One layer over x: [B, T, D]. Returns (x, (k, v)) for cache capture."""
    attn_p = block_params["attn"]
    h = rms_norm(x, block_params["input_norm"], cfg.rms_norm_eps)
    q, k, v = _project_qkv(h, attn_p, cfg)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    out = attention(
        q,
        k,
        v,
        mask=mask,
        q_segment_ids=segment_ids,
        kv_segment_ids=segment_ids,
        causal=True,
        impl=attn_impl,
        mesh=mesh,
    )
    b, t = x.shape[:2]
    x = x + linear(out.reshape(b, t, cfg.q_dim), attn_p["wo"])

    h = rms_norm(x, block_params["post_attn_norm"], cfg.rms_norm_eps)
    m = block_params["mlp"]
    x = x + swiglu(h, m["gate"], m["up"], m["down"])
    return x, (k, v)


def decoder_layer_decode(
    x: jnp.ndarray,
    block_params: dict,
    cfg: DecoderConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    write_pos: jnp.ndarray,
    seq_lens: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One layer, one new token per sequence.

    x: [B, D]; k_cache/v_cache: [B, S, KV, hd]; write_pos: [B] cache slot for
    the new token; seq_lens: [B] valid length AFTER this write.
    """
    attn_p = block_params["attn"]
    h = rms_norm(x, block_params["input_norm"], cfg.rms_norm_eps)
    q, k, v = _project_qkv(h, attn_p, cfg)  # q [B,H,hd], k/v [B,KV,hd]
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    batch = x.shape[0]
    batch_idx = jnp.arange(batch)
    k_cache = k_cache.at[batch_idx, write_pos].set(k.astype(k_cache.dtype))
    v_cache = v_cache.at[batch_idx, write_pos].set(v.astype(v_cache.dtype))

    mask = make_length_mask(seq_lens, k_cache.shape[1])  # [B, S]
    out = mha_reference(q[:, None], k_cache, v_cache, mask=mask[:, None, :])[:, 0]
    x = x + linear(out.reshape(batch, cfg.q_dim), attn_p["wo"])

    h = rms_norm(x, block_params["post_attn_norm"], cfg.rms_norm_eps)
    m = block_params["mlp"]
    x = x + swiglu(h, m["gate"], m["up"], m["down"])
    return x, k_cache, v_cache


def decoder_prefill(
    params: dict,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    seq_lens: jnp.ndarray,
    attn_impl: str = "xla",
    remat: bool = False,
    mesh=None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Full-sequence forward. inputs_embeds: [B, T, D]; positions: [B, T];
    seq_lens: [B] valid lengths (padding masked out of attention).

    remat=True rematerializes each layer in the backward pass
    (jax.checkpoint) — trades recompute FLOPs for activation memory when
    training long packed sequences.

    Returns (hidden [B, T, D], KVCache with the prefill K/V)."""
    b, t, _ = inputs_embeds.shape
    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta)
    # Valid-length masking doubles as segment ids for the flash path:
    # padding tokens get segment -1 and attend to nothing.
    segment_ids = jnp.where(
        jnp.arange(t)[None, :] < seq_lens[:, None], 0, -1
    ).astype(jnp.int32)
    if attn_impl == "xla":
        causal = make_causal_mask(positions, t)
        valid = make_length_mask(seq_lens, t)  # [B, T] keys
        mask = causal & valid[:, None, :]
    else:
        mask = None

    def layer_fn(x, block_params, cos, sin, mask, segment_ids):
        return decoder_layer_prefill(
            x, block_params, cfg, cos, sin, mask, segment_ids, attn_impl,
            mesh=mesh,
        )

    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    def scan_body(x, block_params):
        x, kv = layer_fn(x, block_params, cos, sin, mask, segment_ids)
        return x, kv

    x, (k_all, v_all) = jax.lax.scan(scan_body, inputs_embeds, params["blocks"])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, KVCache(k_all, v_all)


def decoder_decode_step(
    params: dict,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    seq_lens: jnp.ndarray,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step for a batch of live sequences.

    inputs_embeds: [B, D] embedding of the latest token per sequence;
    positions: [B] its absolute position (== cache write slot);
    seq_lens: [B] valid length after this token.
    Returns (hidden [B, D], updated cache)."""
    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta)

    def scan_body(x, layer_in):
        block_params, k_cache, v_cache = layer_in
        x, k_cache, v_cache = decoder_layer_decode(
            x, block_params, cfg, cos, sin, k_cache, v_cache, positions, seq_lens
        )
        return x, (k_cache, v_cache)

    x, (k_all, v_all) = jax.lax.scan(
        scan_body, inputs_embeds, (params["blocks"], cache.k, cache.v)
    )
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, KVCache(k_all, v_all)


def decoder_decode_step_paged(
    params: dict,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    k_pages,
    v_pages,
    page_tables: jnp.ndarray,
    seq_lens: jnp.ndarray,
    slots: jnp.ndarray,
    page_size: int,
    attn_impl: str = "paged",
    k_scales=None,
    v_scales=None,
    mesh=None,
):
    """One decode step over the PAGED cache (continuous batching path).

    inputs_embeds: [S, D] (one token per slot); positions: [S]; k_pages/
    v_pages: [L, KV, N_slots, D]; page_tables: [S, max_pages]; seq_lens: [S]
    valid length AFTER this token (0 = inactive slot); slots: [S] physical
    flat slot of the new token (inactive slots point at the null page).

    Returns (hidden [S, D], k_pages, v_pages) with caches as TUPLES of
    per-layer arrays.

    Memory discipline: k_pages/v_pages are tuples of [KV, N_slots, D]
    arrays — one loop-carry leaf per layer — and the layer loop is unrolled
    in Python. Each layer's scatter then updates exactly its own leaf, which
    XLA elides in place through the surrounding while_loop carry. Both
    alternatives copy gigabytes per iteration: per-layer scan xs force a
    33 MB slice copy per scatter, and a single stacked [L, ...] carry makes
    every layer's scatter rewrite the whole 1 GB cache.
    """
    from dots_ocr_tpu.engine.kv_cache import quantize_kv
    from dots_ocr_tpu.ops.paged_attention import (
        paged_attention,
        paged_attention_multipage,
        paged_attention_reference,
    )
    from dots_ocr_tpu.ops.tp import paged_attention_multipage_tp

    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta)
    s = inputs_embeds.shape[0]
    head_dim = cfg.head_dim
    # Pool KV width may exceed config KV heads (Megatron-style replication
    # for TP meshes wider than the KV head count — kv_cache.PagedKV.create);
    # repeat fresh K/V to match and use the POOL width everywhere below.
    kv_heads = k_pages[0].shape[0]
    kv_rep = kv_heads // cfg.num_kv_heads
    quantized = k_scales is not None

    x = inputs_embeds
    k_out, v_out, ks_out, vs_out = [], [], [], []
    for layer in range(cfg.num_layers):
        block_params = jax.tree.map(lambda a: a[layer], params["blocks"])
        k_layer, v_layer = k_pages[layer], v_pages[layer]
        attn_p = block_params["attn"]
        h = rms_norm(x, block_params["input_norm"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(h, attn_p, cfg)  # q [S,H,hd], k/v [S,KV,hd]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if kv_rep > 1:
            k = jnp.repeat(k, kv_rep, axis=-2)
            v = jnp.repeat(v, kv_rep, axis=-2)
        # Single advanced index stays in place: update is [KV, S, hd].
        if quantized:
            qk, sk = quantize_kv(k)  # [S, KV, hd], [S, KV]
            qv, sv = quantize_kv(v)
            k_layer = scatter_kv_rows(k_layer, slots, qk)
            v_layer = scatter_kv_rows(v_layer, slots, qv)
            # Scale leaves are flat [KV * N]: head * N + slot indexing.
            n_slots = k_layer.shape[1]
            flat_idx = (
                jnp.arange(kv_heads)[:, None] * n_slots + slots[None, :]
            ).reshape(-1)
            ks_layer = k_scales[layer].at[flat_idx].set(sk.T.reshape(-1))
            vs_layer = v_scales[layer].at[flat_idx].set(sv.T.reshape(-1))
            scale_kwargs = dict(
                k_scales=ks_layer.reshape(kv_heads, -1, page_size),
                v_scales=vs_layer.reshape(kv_heads, -1, page_size),
            )
            ks_out.append(ks_layer)
            vs_out.append(vs_layer)
        else:
            k_layer = scatter_kv_rows(k_layer, slots, k)
            v_layer = scatter_kv_rows(v_layer, slots, v)
            scale_kwargs = {}

        paged_k = k_layer.reshape(kv_heads, -1, page_size, head_dim)
        paged_v = v_layer.reshape(kv_heads, -1, page_size, head_dim)
        if attn_impl == "paged":
            # Multi-page manual-DMA kernel: fastest at every measured size
            # (beats both the (batch, page)-grid v1 kernel and the jax
            # library paged kernel — tools/bench_paged.py, PERF.md). Under a
            # TP mesh the kernel runs per-chip on its head shard (ops.tp).
            if mesh is not None:
                out = paged_attention_multipage_tp(
                    q, paged_k, paged_v, seq_lens, page_tables, mesh=mesh,
                    **scale_kwargs,
                )
            else:
                out = paged_attention_multipage(
                    q, paged_k, paged_v, seq_lens, page_tables, **scale_kwargs
                )
        elif attn_impl == "paged_v1":
            out = paged_attention(
                q, paged_k, paged_v, seq_lens, page_tables, **scale_kwargs
            )
        elif attn_impl == "paged_interpret":
            if mesh is not None:
                out = paged_attention_multipage_tp(
                    q, paged_k, paged_v, seq_lens, page_tables, mesh=mesh,
                    interpret=True, **scale_kwargs,
                )
            else:
                out = paged_attention_multipage(
                    q, paged_k, paged_v, seq_lens, page_tables, interpret=True,
                    **scale_kwargs,
                )
        elif attn_impl == "skip":
            # Profiling knob (tools/bench_decode_anatomy): zero attention
            # output isolates the non-attention per-iteration cost.
            out = jnp.zeros_like(q)
        else:  # reference (XLA gather; CPU test path)
            out = paged_attention_reference(
                q, paged_k, paged_v, seq_lens, page_tables, **scale_kwargs
            )
        x = x + linear(out.reshape(s, cfg.q_dim), attn_p["wo"])
        h = rms_norm(x, block_params["post_attn_norm"], cfg.rms_norm_eps)
        m = block_params["mlp"]
        x = x + swiglu(h, m["gate"], m["up"], m["down"])
        k_out.append(k_layer)
        v_out.append(v_layer)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if quantized:
        return x, tuple(k_out), tuple(v_out), tuple(ks_out), tuple(vs_out)
    return x, tuple(k_out), tuple(v_out), None, None


def decoder_spec_step_paged(
    params: dict,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    k_pages,
    v_pages,
    page_tables: jnp.ndarray,
    seq_lens: jnp.ndarray,
    slots: jnp.ndarray,
    page_size: int,
    attn_impl: str = "paged",
    k_scales=None,
    v_scales=None,
    mesh=None,
):
    """One SPECULATIVE-VERIFY decode step over the paged cache: nq tokens
    per slot (the current token + nq-1 n-gram draft tokens) forwarded in
    ONE pass — the parameter HBM read (the per-iteration floor) amortizes
    over every accepted token, which is how decode beats the
    weight-bandwidth bound on repetitive outputs (vLLM's ngram speculator
    role, SURVEY §2.2).

    inputs_embeds: [S, nq, D]; positions: [S, nq] (= base_pos + j);
    k_pages/v_pages: per-layer tuples [KV, N_slots, D]; page_tables:
    [S, max_pages]; seq_lens: [S] BASE lengths (pos+1; 0 = inactive);
    slots: [S, nq] physical write slots (inactive -> null page). Draft
    K/V are scattered before attention, so query j sees tokens < len + j
    including the earlier drafts; rejected drafts' K/V become dead slots
    that later writes overwrite (reads always mask by length).

    Returns (hidden [S, nq, D], k, v, ks, vs).
    """
    from dots_ocr_tpu.engine.kv_cache import quantize_kv
    from dots_ocr_tpu.ops.paged_attention import (
        paged_attention_multiquery,
        paged_attention_multiquery_reference,
    )
    from dots_ocr_tpu.ops.tp import paged_attention_multiquery_tp

    s, nq, _ = inputs_embeds.shape
    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta)  # [S,nq,hd]
    head_dim = cfg.head_dim
    kv_heads = k_pages[0].shape[0]  # pool width (>= config: TP replication)
    kv_rep = kv_heads // cfg.num_kv_heads
    quantized = k_scales is not None
    flat_slots = slots.reshape(-1)  # [S*nq]

    x = inputs_embeds
    k_out, v_out, ks_out, vs_out = [], [], [], []
    for layer in range(cfg.num_layers):
        block_params = jax.tree.map(lambda a: a[layer], params["blocks"])
        k_layer, v_layer = k_pages[layer], v_pages[layer]
        attn_p = block_params["attn"]
        h = rms_norm(x, block_params["input_norm"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(h, attn_p, cfg)  # q [S,nq,H,hd]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if kv_rep > 1:
            k = jnp.repeat(k, kv_rep, axis=-2)
            v = jnp.repeat(v, kv_rep, axis=-2)
        k_flat = k.reshape(s * nq, kv_heads, head_dim)
        v_flat = v.reshape(s * nq, kv_heads, head_dim)
        if quantized:
            qk, sk = quantize_kv(k_flat)
            qv, sv = quantize_kv(v_flat)
            k_layer = scatter_kv_rows(k_layer, flat_slots, qk)
            v_layer = scatter_kv_rows(v_layer, flat_slots, qv)
            n_slots = k_layer.shape[1]
            flat_idx = (
                jnp.arange(kv_heads)[:, None] * n_slots + flat_slots[None, :]
            ).reshape(-1)
            ks_layer = k_scales[layer].at[flat_idx].set(sk.T.reshape(-1))
            vs_layer = v_scales[layer].at[flat_idx].set(sv.T.reshape(-1))
            ks_out.append(ks_layer)
            vs_out.append(vs_layer)
            scale_kwargs = dict(
                k_scales=ks_layer.reshape(kv_heads, -1, page_size),
                v_scales=vs_layer.reshape(kv_heads, -1, page_size),
            )
        else:
            k_layer = scatter_kv_rows(k_layer, flat_slots, k_flat)
            v_layer = scatter_kv_rows(v_layer, flat_slots, v_flat)
            scale_kwargs = {}
        k_out.append(k_layer)
        v_out.append(v_layer)

        paged_k = k_layer.reshape(kv_heads, -1, page_size, head_dim)
        paged_v = v_layer.reshape(kv_heads, -1, page_size, head_dim)
        if attn_impl == "paged":
            if mesh is not None:
                out = paged_attention_multiquery_tp(
                    q, paged_k, paged_v, seq_lens, page_tables, mesh=mesh,
                    **scale_kwargs,
                )
            else:
                out = paged_attention_multiquery(
                    q, paged_k, paged_v, seq_lens, page_tables, **scale_kwargs
                )
        elif attn_impl == "paged_interpret":
            if mesh is not None:
                out = paged_attention_multiquery_tp(
                    q, paged_k, paged_v, seq_lens, page_tables, mesh=mesh,
                    interpret=True, **scale_kwargs,
                )
            else:
                out = paged_attention_multiquery(
                    q, paged_k, paged_v, seq_lens, page_tables, interpret=True,
                    **scale_kwargs,
                )
        else:  # reference (XLA gather; CPU test path)
            out = paged_attention_multiquery_reference(
                q, paged_k, paged_v, seq_lens, page_tables, **scale_kwargs
            )
        x = x + linear(out.reshape(s, nq, cfg.q_dim), attn_p["wo"])
        h = rms_norm(x, block_params["post_attn_norm"], cfg.rms_norm_eps)
        m = block_params["mlp"]
        x = x + swiglu(h, m["gate"], m["up"], m["down"])

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if quantized:
        return x, tuple(k_out), tuple(v_out), tuple(ks_out), tuple(vs_out)
    return x, tuple(k_out), tuple(v_out), None, None


def decoder_prefill_extend(
    params: dict,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    prompt_len: jnp.ndarray,
    k_pages,
    v_pages,
    page_table: jnp.ndarray,
    slots: jnp.ndarray,
    page_size: int,
    kv_hi: int,
    q_offset: int,
    attn_impl: str = "flash",
    k_scales=None,
    v_scales=None,
    mesh=None,
):
    """One CHUNK of a chunked prefill for ONE sequence (see the batched
    variant below — this wraps it with a unit batch dim).

    inputs_embeds: [C, D]; positions: [C]; prompt_len: scalar;
    page_table: [W]; slots: [C]. Returns (hidden [C, D], k, v, ks, vs).
    """
    out = decoder_prefill_extend_batched(
        params,
        cfg,
        inputs_embeds[None],
        positions,
        prompt_len[None] if jnp.ndim(prompt_len) == 0 else prompt_len,
        k_pages,
        v_pages,
        page_table[None],
        slots[None],
        page_size=page_size,
        kv_hi=kv_hi,
        q_offset=q_offset,
        attn_impl=attn_impl,
        k_scales=k_scales,
        v_scales=v_scales,
        mesh=mesh,
    )
    hidden, k, v, ks, vs = out
    return hidden[0], k, v, ks, vs


def decoder_prefill_extend_batched(
    params: dict,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    prompt_len: jnp.ndarray,
    k_pages,
    v_pages,
    page_table: jnp.ndarray,
    slots: jnp.ndarray,
    page_size: int,
    kv_hi: int,
    q_offset: int,
    attn_impl: str = "flash",
    k_scales=None,
    v_scales=None,
    mesh=None,
):
    """One LOCKSTEP chunk of a chunked prefill for a BATCH of sequences,
    writing straight into the paged cache.

    The vLLM-parity scheduling move (SURVEY §2.2: continuous batching):
    long vision+prompt prefills are split into fixed-size token chunks so
    decode steps for running sequences schedule between them instead of
    stalling for the whole multi-second prefill. Requests admitted together
    advance their chunks in LOCKSTEP, so one dispatch carries all of them —
    the same (kv_hi, q_offset) statics apply to every row.

    inputs_embeds: [B, C, D] chunk embeddings (rows past each prompt are
    padding); positions: [C] absolute positions (= q_offset + arange(C),
    shared); prompt_len: [B] total prompt tokens per row (0 = inert pad
    row); k_pages/v_pages: per-layer tuples [KV, N_slots, D]; page_table:
    [B, W] per-row padded tables with W * page_size >= kv_hi; slots:
    [B, C] physical flat slots (padding rows -> the reserved null page);
    kv_hi: static gather bound (>= q_offset + C, a multiple of page_size).

    Attention per chunk: each row's [0, kv_hi) prefix is GATHERED from
    pages into contiguous KV (one take per layer — the same bytes flash
    reads anyway), the chunk's fresh K/V are scattered in first so the
    gather sees them, and flash attention runs causally with q_offset
    (queries at absolute positions attend keys <= their position; keys
    beyond each row's prompt_len are segment-masked).

    Returns (hidden [B, C, D] post-final-norm, k_pages, v_pages, ks, vs).
    """
    from dots_ocr_tpu.engine.kv_cache import quantize_kv
    from dots_ocr_tpu.ops.flash_attention import flash_attention
    from dots_ocr_tpu.ops.tp import flash_attention_tp

    b, c, _ = inputs_embeds.shape
    pos2d = jnp.broadcast_to(positions, (b, c))
    cos, sin = rope_table(pos2d, cfg.head_dim, cfg.rope_theta)  # [B, C, hd]
    head_dim = cfg.head_dim
    kv_heads = k_pages[0].shape[0]  # pool width (>= config: TP replication)
    kv_rep = kv_heads // cfg.num_kv_heads
    quantized = k_scales is not None

    # Gather slots for each row's [0, kv_hi) prefix — shared by every layer.
    gather_pos = jnp.arange(kv_hi)
    gather_slots = (
        page_table[:, gather_pos // page_size] * page_size
        + gather_pos % page_size
    )  # [B, kv_hi]
    flat_gather = gather_slots.reshape(-1)
    q_seg = jnp.where(
        positions[None, :] < prompt_len[:, None], 0, -1
    ).astype(jnp.int32)  # [B, C]
    kv_seg = jnp.where(
        gather_pos[None, :] < prompt_len[:, None], 0, -1
    ).astype(jnp.int32)  # [B, kv_hi]
    flat_slots = slots.reshape(-1)  # [B*C]

    x = inputs_embeds
    k_out, v_out, ks_out, vs_out = [], [], [], []
    for layer in range(cfg.num_layers):
        block_params = jax.tree.map(lambda a: a[layer], params["blocks"])
        k_layer, v_layer = k_pages[layer], v_pages[layer]
        attn_p = block_params["attn"]
        h = rms_norm(x, block_params["input_norm"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(h, attn_p, cfg)  # q [B,C,H,hd], k/v [B,C,KV,hd]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if kv_rep > 1:
            k = jnp.repeat(k, kv_rep, axis=-2)
            v = jnp.repeat(v, kv_rep, axis=-2)
        k_flat = k.reshape(b * c, kv_heads, head_dim)
        v_flat = v.reshape(b * c, kv_heads, head_dim)

        if quantized:
            qk, sk = quantize_kv(k_flat)  # [B*C, KV, hd], [B*C, KV]
            qv, sv = quantize_kv(v_flat)
            k_layer = scatter_kv_rows(k_layer, flat_slots, qk)
            v_layer = scatter_kv_rows(v_layer, flat_slots, qv)
            n_slots = k_layer.shape[1]
            flat_idx = (
                jnp.arange(kv_heads)[:, None] * n_slots + flat_slots[None, :]
            ).reshape(-1)
            ks_layer = k_scales[layer].at[flat_idx].set(sk.T.reshape(-1))
            vs_layer = v_scales[layer].at[flat_idx].set(sv.T.reshape(-1))
            ks_out.append(ks_layer)
            vs_out.append(vs_layer)
            scale_idx = (
                jnp.arange(kv_heads)[:, None] * n_slots + flat_gather[None, :]
            )  # [KV, B*kv_hi]
            # Dequantize straight to bf16 (int8 -> bf16 convert, bf16 scale
            # multiply): an f32 intermediate here doubles the gather
            # traffic for no accuracy gain — the int8 cache's own
            # quantization noise dominates the bf16 rounding.
            k_full = jnp.take(k_layer, flat_gather, axis=1).astype(
                jnp.bfloat16
            ) * jnp.take(ks_layer, scale_idx).astype(jnp.bfloat16)[..., None]
            v_full = jnp.take(v_layer, flat_gather, axis=1).astype(
                jnp.bfloat16
            ) * jnp.take(vs_layer, scale_idx).astype(jnp.bfloat16)[..., None]
        else:
            k_layer = scatter_kv_rows(k_layer, flat_slots, k_flat)
            v_layer = scatter_kv_rows(v_layer, flat_slots, v_flat)
            k_full = jnp.take(k_layer, flat_gather, axis=1)  # [KV, B*kv_hi, D]
            v_full = jnp.take(v_layer, flat_gather, axis=1)
        k_out.append(k_layer)
        v_out.append(v_layer)

        # [KV, B*kv_hi, D] -> [B, kv_hi, KV, D]
        kc = k_full.reshape(kv_heads, b, kv_hi, head_dim).transpose(1, 2, 0, 3)
        vc = v_full.reshape(kv_heads, b, kv_hi, head_dim).transpose(1, 2, 0, 3)
        if attn_impl in ("flash", "flash_interpret"):
            if mesh is not None:
                out = flash_attention_tp(
                    q.astype(kc.dtype),
                    kc,
                    vc,
                    q_segment_ids=q_seg,
                    kv_segment_ids=kv_seg,
                    mesh=mesh,
                    causal=True,
                    q_offset=q_offset,
                    interpret=attn_impl == "flash_interpret",
                )
            else:
                out = flash_attention(
                    q.astype(kc.dtype),
                    kc,
                    vc,
                    q_segment_ids=q_seg,
                    kv_segment_ids=kv_seg,
                    causal=True,
                    q_offset=q_offset,
                    interpret=attn_impl == "flash_interpret",
                )
        else:  # XLA fallback (CPU tests / tiny chunks)
            causal = gather_pos[None, :] <= positions[:, None]  # [C, kv_hi]
            valid = (gather_pos[None, None, :] < prompt_len[:, None, None]) & (
                positions[None, :, None] < prompt_len[:, None, None]
            )  # [B, C, kv_hi]
            out = mha_reference(q, kc, vc, mask=causal[None] & valid)
        x = x + linear(out.reshape(b, c, cfg.q_dim), attn_p["wo"])
        h = rms_norm(x, block_params["post_attn_norm"], cfg.rms_norm_eps)
        m = block_params["mlp"]
        x = x + swiglu(h, m["gate"], m["up"], m["down"])

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if quantized:
        return x, tuple(k_out), tuple(v_out), tuple(ks_out), tuple(vs_out)
    return x, tuple(k_out), tuple(v_out), None, None


def logits_from_hidden(params: dict, cfg: DecoderConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project hidden states to vocab logits (tied or separate head), f32."""
    if cfg.tie_word_embeddings or "lm_head" not in params:
        return unembed(hidden, params["embed"])
    head = params["lm_head"]
    if isinstance(head, dict):  # weight-only int8 (models/quantize.py)
        return jnp.einsum(
            "...d,dv->...v", hidden, head["qint8"].astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        ) * head["scale"]
    return jnp.einsum(
        "...d,dv->...v", hidden, head, preferred_element_type=jnp.float32
    )


def embed_tokens(params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
    return embed(input_ids, params["embed"])
