"""Paged decode attention (Pallas/TPU) + XLA reference.

TPU-native replacement for vLLM's PagedAttention CUDA kernels
(SURVEY.md §2.2). The KV cache lives in fixed-size pages scattered across
HBM; each sequence owns a page table. One decode step computes attention of
each sequence's single new query token against its paged history.

Kernel strategy: instead of hand-rolled double-buffered DMA, the page table
is a **scalar-prefetch argument used inside the BlockSpec index_map** — the
grid walks (batch, kv_head, page) and the index_map redirects each K/V
block fetch to the physical page, so Pallas's automatic pipeline
double-buffers the discontiguous page loads for free. Online softmax (m, l,
acc in VMEM scratch) accumulates across the page axis; pages past the
sequence length are skipped (index_map clamps to the last valid page so the
pipeline never touches unmapped pages).

Layouts:
  q:            [B, H, head_dim]           (one token per sequence)
  k_pages:      [KV, num_pages, page_size, head_dim]
  page_indices: [B, max_pages_per_seq] int32 (physical page per logical)
  lengths:      [B] int32, tokens valid in the cache (incl. current token)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------------------
# XLA reference (CPU tests / fallback)
# ---------------------------------------------------------------------------


def paged_attention_reference(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,
    page_indices: jnp.ndarray,
    sm_scale: Optional[float] = None,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Gather pages into contiguous KV, then masked attention. Materializes
    [B, S_max, KV, D] — fine for tests, not for production. Optional int8
    payloads with [KV, pages, page_size] scales are dequantized after the
    gather."""
    kv_heads, _, page_size, head_dim = k_pages.shape
    batch, num_heads, _ = q.shape
    max_pages = page_indices.shape[1]
    s_max = max_pages * page_size
    sm_scale = sm_scale if sm_scale is not None else head_dim**-0.5

    flat_k = k_pages.reshape(kv_heads, -1, head_dim)
    flat_v = v_pages.reshape(kv_heads, -1, head_dim)
    pos = jnp.arange(s_max)
    slots = page_indices[:, pos // page_size] * page_size + pos % page_size  # [B, S]
    k = jnp.take(flat_k, slots, axis=1)  # [KV, B, S, D]
    v = jnp.take(flat_v, slots, axis=1)
    if k_scales is not None:
        ks = jnp.take(k_scales.reshape(kv_heads, -1), slots, axis=1)
        vs = jnp.take(v_scales.reshape(kv_heads, -1), slots, axis=1)
        k = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)

    group = num_heads // kv_heads
    qg = q.reshape(batch, kv_heads, group, head_dim)
    scores = jnp.einsum(
        "bkgd,kbsd->bkgs", qg, k, preferred_element_type=jnp.float32
    ) * sm_scale
    mask = pos[None, :] < lengths[:, None]  # [B, S]
    # Finite mask value (not -inf): zero-length rows must yield finite
    # output, and exact-0 probabilities on masked columns must zero out
    # whatever garbage lives in unreferenced page slots (0 * NaN = NaN).
    scores = jnp.where(mask[:, None, None, :], scores, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bkgs,kbsd->bkgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    # Inactive rows (length 0) are defined to output exact zeros — the
    # finite mask turns a fully-masked softmax into uniform attention over
    # garbage, so zero them explicitly (matches the kernels' semantics).
    out = jnp.where(lengths[:, None, None, None] > 0, out, 0.0)
    return out.reshape(batch, num_heads, head_dim).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _paged_kernel(
    layer_ref,        # scalar prefetch [1] — layer index into stacked pages
    lengths_ref,      # scalar prefetch [B]
    page_idx_ref,     # scalar prefetch [B * max_pages]
    *refs,            # q, k, v, [k_scale, v_scale], o, m, l, acc
    page_size: int,
    mask_value: float,
    sm_scale: float,
    kv_heads: int,
    group: int,
    quantized: bool,
):
    if quantized:
        (q_ref, k_ref, v_ref, ks_ref, vs_ref,
         o_ref, m_scratch, l_scratch, acc_scratch) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch = refs
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    length = lengths_ref[b]

    @pl.when(i * page_size < length)
    def _run():
        token_pos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (group, page_size), 1
        )
        valid = token_pos < length
        # All KV heads processed in one grid step (one page fetch serves
        # every head): fewer grid iterations = less per-step overhead when
        # KV count is small (GQA).
        for h in range(kv_heads):
            rows = slice(h * group, (h + 1) * group)
            q = q_ref[0, h].astype(jnp.float32)  # [G, head_dim]
            k = k_ref[0, h, 0]  # [page_size, head_dim]
            v = v_ref[0, h, 0]
            if quantized:
                # int8 payload * per-slot f32 scale (scales block is
                # [1, KV, 1, page_size, 1])
                k = k.astype(jnp.float32) * ks_ref[0, h, 0, :, 0][:, None]
                v = (v.astype(jnp.float32) * vs_ref[0, h, 0, :, 0][:, None]).astype(
                    jnp.bfloat16
                )

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [G, page_size]
            s = jnp.where(valid, s, mask_value)

            m_prev = m_scratch[rows]
            l_prev = l_scratch[rows]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            p = jnp.exp(s - m_next[:, :1])
            p = jnp.where(valid, p, 0.0)
            alpha = jnp.exp(m_prev - m_next)
            alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)
            l_scratch[rows] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m_scratch[rows] = m_next
            acc_scratch[rows] = acc_scratch[rows] * alpha[:, :1] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

    # Write the running normalized output every step; the last executed page
    # leaves the final value (later skipped pages don't touch acc).
    l = l_scratch[...][:, :1]
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    o_ref[0] = (
        (acc_scratch[...] * l_inv)
        .reshape(kv_heads, group, acc_scratch.shape[-1])
        .astype(o_ref.dtype)
    )


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret", "page_size")
)
def paged_attention_stacked(
    q: jnp.ndarray,
    k_pages_all: jnp.ndarray,
    v_pages_all: jnp.ndarray,
    layer: jnp.ndarray,
    lengths: jnp.ndarray,
    page_indices: jnp.ndarray,
    page_size: int,
    k_scales_all: Optional[jnp.ndarray] = None,
    v_scales_all: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paged decode attention reading ONE layer of a layer-stacked cache.

    k_pages_all/v_pages_all: [L, KV, N_slots, head_dim] (the whole cache —
    passing it unsliced lets the caller keep it as an unsliced loop carry so
    XLA updates it in place; slicing a layer on the outside would copy it);
    layer: scalar int32 selecting the layer via the kernel's index_map.
    """
    batch, num_heads, head_dim = q.shape
    num_layers, kv_heads = k_pages_all.shape[0], k_pages_all.shape[1]
    max_pages = page_indices.shape[1]
    group = num_heads // kv_heads
    scale = sm_scale if sm_scale is not None else head_dim**-0.5

    qg = q.reshape(batch, kv_heads, group, head_dim)

    def q_index(b, i, layer_ref, lengths_ref, page_idx_ref):
        return (b, 0, 0, 0)

    def kv_index(b, i, layer_ref, lengths_ref, page_idx_ref):
        # Clamp to the last valid page so skipped iterations re-fetch a
        # mapped page instead of touching garbage.
        length = lengths_ref[b]
        last_valid_block = jnp.maximum(0, (length - 1) // page_size)
        block = jnp.minimum(i, last_valid_block)
        return (layer_ref[0], 0, page_idx_ref[b * max_pages + block], 0, 0)

    quantized = k_scales_all is not None
    in_specs = [
        pl.BlockSpec((1, kv_heads, group, head_dim), q_index),
        pl.BlockSpec((1, kv_heads, 1, page_size, head_dim), kv_index),
        pl.BlockSpec((1, kv_heads, 1, page_size, head_dim), kv_index),
    ]
    inputs = [
        jnp.asarray(layer, jnp.int32).reshape(1),
        lengths.astype(jnp.int32),
        page_indices.reshape(-1).astype(jnp.int32),
        qg,
        k_pages_all.reshape(num_layers, kv_heads, -1, page_size, head_dim),
        v_pages_all.reshape(num_layers, kv_heads, -1, page_size, head_dim),
    ]
    if quantized:
        # Scales blocked as [..., page_size, 1]: a trailing unit axis keeps
        # the (sublane, lane) tiling rules satisfied.
        scale_spec = pl.BlockSpec((1, kv_heads, 1, page_size, 1), kv_index)
        in_specs += [scale_spec, scale_spec]
        inputs += [
            k_scales_all.reshape(num_layers, kv_heads, -1, page_size, 1),
            v_scales_all.reshape(num_layers, kv_heads, -1, page_size, 1),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kv_heads, group, head_dim), q_index),
        scratch_shapes=[
            pltpu.VMEM((kv_heads * group, NUM_LANES), jnp.float32),
            pltpu.VMEM((kv_heads * group, NUM_LANES), jnp.float32),
            pltpu.VMEM((kv_heads * group, head_dim), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _paged_kernel,
        page_size=page_size,
        mask_value=DEFAULT_MASK_VALUE,
        sm_scale=scale,
        kv_heads=kv_heads,
        group=group,
        quantized=quantized,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(batch, num_heads, head_dim)


# ---------------------------------------------------------------------------
# Multi-page manual-DMA kernel (v2)
# ---------------------------------------------------------------------------
#
# The v1 kernel above walks a (batch, page) grid: each grid step carries a
# fixed pipeline cost (~1 us), which dominates at decode sizes — one page is
# only 64 KB of KV. v2 collapses the page axis into an IN-KERNEL dynamic
# loop with double-buffered manual DMA: the grid is (batch,) alone, each
# slot's pages stream HBM->VMEM in blocks of ``pages_per_block`` overlapped
# with the previous block's compute, and pages past the sequence length are
# never touched (a dynamic fori bound, unlike the auto-pipeline whose dead
# tiles still fetch). Blocking several pages per wait round amortizes the
# per-DMA sync cost AND turns the score dot into a [G, F*ps] MXU op.


def _multipage_kernel(
    lengths_ref,      # scalar prefetch [B]
    page_idx_ref,     # scalar prefetch [B * max_pages]
    cum_ref,          # scalar prefetch [B + 1]: DMA blocks of sequences < b
    *refs,            # q, k_hbm, v_hbm, [ks_hbm, vs_hbm], o, bufs..., sems
    page_size: int,
    max_pages: int,
    pages_per_block: int,
    mask_value: float,
    sm_scale: float,
    kv_heads: int,
    group: int,
    quantized: bool,
    nq: int = 1,
    batch: int = 0,
):
    if quantized:
        (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
         k_buf, v_buf, ks_buf, vs_buf, sem) = refs
    else:
        q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf, sem = refs
        ks_buf = vs_buf = None
    b = pl.program_id(0)
    length = lengths_ref[b]

    def pages_of(seq_len):
        # Multi-query (speculative verify): nq tokens per sequence at
        # positions [length-1, length-1+nq); query j attends tokens
        # < length + j. Pages must cover the furthest query's keys.
        return jnp.where(
            seq_len > 0,
            jax.lax.div(seq_len + (nq - 1) + page_size - 1, page_size),
            0,
        )

    n_pages = pages_of(length)
    fpb = pages_per_block
    n_blocks = jax.lax.div(n_pages + fpb - 1, fpb)
    blk = fpb * page_size
    # Cross-sequence double buffering in GLOBAL block order: block number
    # G (counting across sequences, cum_ref[b] + i within sequence b)
    # lives in buffer slot G % 2, and whoever computes block G prefetches
    # block G+1 — whether that is this sequence's next block or the next
    # active sequence's first. Without the cross-sequence handoff every
    # grid step serializes issue -> DMA latency -> compute, ~1.5 us x
    # 28 layers x 64 seqs = ~2.7 ms/iter of the r4 decode profile; the
    # r4 fix only applied when the whole table fit one DMA block, which
    # the r5 40k-token envelope (static width 320 > fpb 4) broke — a
    # measured 20% decode tax (12,791 -> 10,282 tok/s).
    base = cum_ref[b]

    def copies(seq, slot, block, seq_pages):
        # Logical pages past the end are clamped to the last valid page
        # (their tokens are masked out below) so every block issues exactly
        # the same number of DMAs — the waits stay static.
        out = []
        for f in range(fpb):
            logical = jnp.minimum(block * fpb + f, seq_pages - 1)
            page = page_idx_ref[seq * max_pages + logical]
            dst = slice(f * page_size, (f + 1) * page_size)
            out.append(
                pltpu.make_async_copy(
                    k_hbm.at[:, page], k_buf.at[slot, :, dst], sem.at[slot, 0]
                )
            )
            out.append(
                pltpu.make_async_copy(
                    v_hbm.at[:, page], v_buf.at[slot, :, dst], sem.at[slot, 1]
                )
            )
            if quantized:
                out.append(
                    pltpu.make_async_copy(
                        ks_hbm.at[:, page], ks_buf.at[slot, :, dst],
                        sem.at[slot, 2],
                    )
                )
                out.append(
                    pltpu.make_async_copy(
                        vs_hbm.at[:, page], vs_buf.at[slot, :, dst],
                        sem.at[slot, 3],
                    )
                )
        return out

    # Issue our own block 0 only when the previous grid step could not
    # have handed it to us: first sequence, or an inactive predecessor
    # broke the prefetch chain (costs one serialized DMA at the gap —
    # rare in saturated decode).
    prev_len = lengths_ref[jnp.maximum(b - 1, 0)]
    chain_broken = (b == 0) | (prev_len == 0)

    @pl.when(chain_broken & (n_blocks > 0))
    def _self_issue():
        for c in copies(b, jax.lax.rem(base, 2), 0, n_pages):
            c.start()

    nxt = jnp.minimum(b + 1, batch - 1)
    nxt_pages = pages_of(lengths_ref[nxt])

    rows = kv_heads * group * nq
    m0 = jnp.full((rows, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, q_ref.shape[-1]), jnp.float32)

    # int8 path: quantize Q per query row ONCE (tiny [G, D] work) so the
    # score dots run int8 x int8 on the MXU and the K tiles are never
    # dequantized — the round-1 int8 throughput tax was exactly the
    # [blk, D] dequant passes (cast + scale mul over every fetched byte).
    q_i8, q_qscale = [], []
    if quantized:
        for h in range(kv_heads):
            qh = q_ref[0, h].astype(jnp.float32)  # [G * nq, D]
            amax = jnp.max(jnp.abs(qh), axis=1, keepdims=True)
            qs = jnp.where(amax > 0, amax / 127.0, 1.0)
            q_i8.append(jnp.round(qh / qs).astype(jnp.int8))
            q_qscale.append(qs)  # [G, 1] f32

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(base + i, 2)

        # Prefetch the next block in GLOBAL order into the other slot:
        # our block i+1, or — at our last block — the next active
        # sequence's block 0 (slot parity cum_ref[b+1] == 1 - slot).
        @pl.when(i + 1 < n_blocks)
        def _prefetch_own():
            for c in copies(b, 1 - slot, i + 1, n_pages):
                c.start()

        @pl.when((i + 1 == n_blocks) & (b + 1 < batch) & (nxt_pages > 0))
        def _prefetch_next_seq():
            for c in copies(nxt, jax.lax.rem(cum_ref[b + 1], 2), 0,
                            nxt_pages):
                c.start()

        for c in copies(b, slot, i, n_pages):
            c.wait()

        token_pos = i * blk + jax.lax.broadcasted_iota(
            jnp.int32, (1, blk), 1
        )
        if nq == 1:
            valid = token_pos < length  # [1, blk]
        else:
            # Row r within a head is (g, j) with j = r % nq: query j sees
            # tokens < length + j (its own position is length - 1 + j).
            j_col = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0), nq
            )
            valid = (token_pos < length + j_col) & (length > 0)

        s_parts = []
        for h in range(kv_heads):
            k = k_buf[slot, h]  # [blk, D]
            if quantized:
                # int8 x int8 -> int32 MXU dot; scales applied on the
                # [G, blk] result (D-fold smaller than dequantizing K).
                s_i32 = jax.lax.dot_general(
                    q_i8[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                s_parts.append(
                    s_i32.astype(jnp.float32)
                    * q_qscale[h]
                    * ks_buf[slot, h][None, :]
                )
            else:
                qh = q_ref[0, h].astype(jnp.float32)  # [G, D]
                s_parts.append(
                    jax.lax.dot_general(
                        qh, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
        s = jnp.concatenate(s_parts, axis=0) * sm_scale  # [rows, blk]
        s = jnp.where(valid, s, mask_value)

        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp(s - m_next)
        p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp(m_prev - m_next)
        alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        accs = []
        for h in range(kv_heads):
            v = v_buf[slot, h]  # [blk, D]
            if quantized:
                # Fold the per-token V scales into the [G, blk] probability
                # rows, re-quantize those rows to int8, and run the PV dot
                # int8 x int8 too — V bytes also go straight from DMA to
                # MXU. The 1/127 weight granularity sits below the int8
                # cache's own quantization noise.
                pp = (
                    p[h * group * nq : (h + 1) * group * nq]
                    * vs_buf[slot, h][None, :]
                )
                amax = jnp.max(jnp.abs(pp), axis=1, keepdims=True)
                pscale = jnp.where(amax > 0, amax / 127.0, 1.0)
                p_i8 = jnp.round(pp / pscale).astype(jnp.int8)
                pv_i32 = jax.lax.dot_general(
                    p_i8, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                accs.append(pv_i32.astype(jnp.float32) * pscale)
            else:
                ph = p[h * group * nq : (h + 1) * group * nq].astype(v.dtype)
                accs.append(
                    jax.lax.dot(ph, v, preferred_element_type=jnp.float32)
                )
        pv = jnp.concatenate(accs, axis=0)
        acc = acc * alpha + pv
        return m_next, l_next, acc

    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    o_ref[0] = (
        (acc * l_inv)
        .reshape(kv_heads, group * nq, acc.shape[-1])
        .astype(o_ref.dtype)
    )


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret", "pages_per_block")
)
def paged_attention_multipage(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,
    page_indices: jnp.ndarray,
    sm_scale: Optional[float] = None,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
    pages_per_block: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paged decode attention, one grid step per sequence (see module notes).

    q: [B, H, D]; k_pages/v_pages: [KV, num_pages, page_size, D];
    lengths: [B]; page_indices: [B, max_pages]. Optional int8 payloads with
    [KV, num_pages, page_size] f32 scales. ``pages_per_block`` pages stream
    per DMA-wait round (default: enough pages for a 512-token block, capped
    by the table width).
    """
    batch, num_heads, head_dim = q.shape
    out = paged_attention_multiquery(
        q[:, None],
        k_pages,
        v_pages,
        lengths,
        page_indices,
        sm_scale=sm_scale,
        k_scales=k_scales,
        v_scales=v_scales,
        pages_per_block=pages_per_block,
        interpret=interpret,
    )
    return out.reshape(batch, num_heads, head_dim)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret", "pages_per_block")
)
def paged_attention_multiquery(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,
    page_indices: jnp.ndarray,
    sm_scale: Optional[float] = None,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
    pages_per_block: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-query paged decode attention (speculative-verify step).

    q: [B, nq, H, D] — nq tokens per sequence at positions
    [length-1, length-1+nq); query j attends tokens < length + j (its draft
    predecessors' K/V must already be scattered into the pages). nq=1 is
    exactly classic paged decode. lengths: [B] BASE lengths (tokens valid
    for query 0, i.e. up to and including the current real token).
    Returns [B, nq, H, D].
    """
    batch, nq, num_heads, head_dim = q.shape
    kv_heads, _, page_size, _ = k_pages.shape
    max_pages = page_indices.shape[1]
    group = num_heads // kv_heads
    scale = sm_scale if sm_scale is not None else head_dim**-0.5
    quantized = k_scales is not None
    if not interpret and (
        head_dim % 128 != 0 or (quantized and page_size % 128 != 0)
    ):
        # The manual HBM->VMEM DMAs slice 128-lane tiled minor axes:
        # the K/V payload along head_dim, and (when quantized) the f32
        # SCALE buffers along page_size — Mosaic requires those slices
        # 128-aligned. Real checkpoints have head_dim 128; int8 mode wants
        # page_size a multiple of 128 (the engine should allocate such).
        # Fall back to the v1 kernel (nq=1) / XLA reference (multi-query).
        if nq == 1:
            return paged_attention(
                q[:, 0], k_pages, v_pages, lengths, page_indices,
                sm_scale=scale, k_scales=k_scales, v_scales=v_scales,
            )[:, None]
        return paged_attention_multiquery_reference(
            q, k_pages, v_pages, lengths, page_indices,
            sm_scale=scale, k_scales=k_scales, v_scales=v_scales,
        )
    if pages_per_block is None:
        pages_per_block = max(1, min(max_pages, 512 // page_size))
    fpb = min(pages_per_block, max_pages)
    blk = fpb * page_size

    # Row order per KV head: (g, j) — j = row % nq (the kernel's validity
    # pattern depends on it).
    qg = (
        q.reshape(batch, nq, kv_heads, group, head_dim)
        .transpose(0, 2, 3, 1, 4)
        .reshape(batch, kv_heads, group * nq, head_dim)
    )

    def q_index(b, *_):
        return (b, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, kv_heads, group * nq, head_dim), q_index),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    # Global-block-order prefix (scalar prefetch): cum[b] = DMA blocks of
    # sequences < b. Slot parity follows the global order, so the
    # cross-sequence DMA handoff survives any per-sequence block count
    # (see _multipage_kernel notes).
    lengths32 = lengths.astype(jnp.int32)
    pages_per_seq = jnp.where(
        lengths32 > 0,
        jax.lax.div(lengths32 + (nq - 1) + page_size - 1, page_size),
        0,
    )
    nblk = jax.lax.div(pages_per_seq + fpb - 1, fpb)
    cum_blocks = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nblk).astype(jnp.int32)]
    )
    inputs = [
        lengths32,
        page_indices.reshape(-1).astype(jnp.int32),
        cum_blocks,
        qg,
        k_pages,
        v_pages,
    ]
    n_bufs = 2  # k, v
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        inputs += [k_scales.astype(jnp.float32), v_scales.astype(jnp.float32)]
        n_bufs = 4
    scratch_shapes = [
        pltpu.VMEM((2, kv_heads, blk, head_dim), k_pages.dtype),
        pltpu.VMEM((2, kv_heads, blk, head_dim), v_pages.dtype),
    ]
    if quantized:
        scratch_shapes += [
            pltpu.VMEM((2, kv_heads, blk), jnp.float32),
            pltpu.VMEM((2, kv_heads, blk), jnp.float32),
        ]
    scratch_shapes.append(pltpu.SemaphoreType.DMA((2, n_bufs)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kv_heads, group * nq, head_dim), q_index),
        scratch_shapes=scratch_shapes,
    )
    kernel = functools.partial(
        _multipage_kernel,
        page_size=page_size,
        max_pages=max_pages,
        pages_per_block=fpb,
        mask_value=DEFAULT_MASK_VALUE,
        sm_scale=scale,
        kv_heads=kv_heads,
        group=group,
        quantized=quantized,
        nq=nq,
        batch=batch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)
    return (
        out.reshape(batch, kv_heads, group, nq, head_dim)
        .transpose(0, 3, 1, 2, 4)
        .reshape(batch, nq, num_heads, head_dim)
    )


def paged_attention_multiquery_reference(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,
    page_indices: jnp.ndarray,
    sm_scale: Optional[float] = None,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """XLA reference for the multi-query (speculative verify) decode step.

    q: [B, nq, H, D]; query j of row b attends tokens < lengths[b] + j
    (rows with lengths 0 output zeros). Returns [B, nq, H, D].
    """
    kv_heads, _, page_size, head_dim = k_pages.shape
    batch, nq, num_heads, _ = q.shape
    max_pages = page_indices.shape[1]
    s_max = max_pages * page_size
    sm_scale = sm_scale if sm_scale is not None else head_dim**-0.5

    flat_k = k_pages.reshape(kv_heads, -1, head_dim)
    flat_v = v_pages.reshape(kv_heads, -1, head_dim)
    pos = jnp.arange(s_max)
    slots = page_indices[:, pos // page_size] * page_size + pos % page_size
    k = jnp.take(flat_k, slots, axis=1)  # [KV, B, S, D]
    v = jnp.take(flat_v, slots, axis=1)
    if k_scales is not None:
        ks = jnp.take(k_scales.reshape(kv_heads, -1), slots, axis=1)
        vs = jnp.take(v_scales.reshape(kv_heads, -1), slots, axis=1)
        k = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)

    group = num_heads // kv_heads
    qg = q.reshape(batch, nq, kv_heads, group, head_dim)
    scores = jnp.einsum(
        "bjkgd,kbsd->bjkgs", qg, k, preferred_element_type=jnp.float32
    ) * sm_scale
    j = jnp.arange(nq)
    mask = (pos[None, None, :] < lengths[:, None, None] + j[None, :, None]) & (
        lengths[:, None, None] > 0
    )  # [B, nq, S]
    scores = jnp.where(mask[:, :, None, None, :], scores, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = jnp.where(mask[:, :, None, None, :], probs, 0.0)
    out = jnp.einsum(
        "bjkgs,kbsd->bjkgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(batch, nq, num_heads, head_dim).astype(q.dtype)


def paged_attention(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,
    page_indices: jnp.ndarray,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single-layer convenience wrapper (adds a unit layer axis)."""
    kv_heads, _, page_size, head_dim = k_pages.shape
    return paged_attention_stacked(
        q,
        k_pages.reshape(1, kv_heads, -1, head_dim),
        v_pages.reshape(1, kv_heads, -1, head_dim),
        jnp.zeros((), jnp.int32),
        lengths,
        page_indices,
        page_size=page_size,
        k_scales_all=(
            k_scales.reshape(1, kv_heads, -1) if k_scales is not None else None
        ),
        v_scales_all=(
            v_scales.reshape(1, kv_heads, -1) if v_scales is not None else None
        ),
        sm_scale=sm_scale,
        interpret=interpret,
    )
