"""Fused flash attention (Pallas/TPU): online-softmax tiled attention.

TPU-native replacement for the reference's flash-attn 2.8 CUDA dependency
(``docker/Dockerfile:5``, ``parser.py:71``). One kernel serves both uses:

  * **NaViT packed vision attention** — segment ids give block-diagonal
    masking over images packed into one token axis (what flash-attn varlen
    + cu_seqlens provides on GPU),
  * **causal decoder prefill** — causal flag + segment-encoded length
    masking (padding tokens carry segment -1 and attend to nothing).

Why it matters functionally, not just for speed: at the 11.3 MP resolution
cap the ViT sees ~14.4k packed tokens; an XLA-materialized score tensor is
12 heads x 14.4k^2 x 4 B ~= 10 GB — it cannot exist on a 16 GB chip. The
kernel streams K/V tiles through VMEM with online softmax (running max m,
running sum l, accumulator acc in f32 scratch) and never materializes
scores.

Grid: (batch*q_heads, Tq/block_q, S/block_k) with the KV axis sequential
("arbitrary") and the rest parallel across megacores. GQA is handled in the
K/V index_map: query head h reads KV head h // (H/KV).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
# -inf would produce NaN via exp(-inf - (-inf)); large-negative is exact
# enough (exp underflows to 0).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(
    q_seg_ref,
    kv_seg_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    causal: bool,
    q_offset: int,
    sm_scale: float,
    num_k_blocks: int,
    block_q: int,
    block_k: int,
    k_splits: int,
    num_heads: int,
):
    # Segment-id blocks carry all B rows (TPU tiling forbids (1, T) blocks
    # of a (B, T) array for B > 1); select this program's row here.
    b = pl.program_id(0) // num_heads
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    # Two-level K tiling: block_k is the DMA block (what the pipeline
    # fetches per grid step); compute runs over k_splits sub-tiles of
    # sub_k tokens so the f32 score tile stays [block_q, sub_k] in VMEM.
    # Fewer grid steps = less per-step fixed cost (the measured flash
    # ceiling) at unchanged score-tile memory.
    sub_k = block_k // k_splits

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q_seg_blk = q_seg_ref[b]  # [block_q]
    kv_seg_row = kv_seg_ref[b]  # [block_k] — one whole-row dynamic load;
    # per-sub-tile slices happen on the VALUE (Mosaic rejects a dynamic row
    # index combined with a column slice as a ref load).
    q_lo, q_hi = jnp.min(q_seg_blk), jnp.max(q_seg_blk)

    def _update(s, mask, sub):
        m_prev = m_scratch[...]  # [block_q, NUM_LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1)[:, None]  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # lane-broadcasted

        p = jnp.exp2(s - m_next[:, :1])  # [block_q, sub_k]
        if mask is not None:
            # Zero masked entries explicitly: a fully-masked row (all at
            # DEFAULT_MASK_VALUE) would otherwise get uniform weights. With
            # p=0 its l stays 0 and the final store zeroes the output row.
            p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp2(m_prev - m_next)  # [block_q, NUM_LANES]
        alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)  # -inf - -inf case

        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, sub * sub_k : (sub + 1) * sub_k]  # [sub_k, head_dim]
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    # Scores live in a BASE-2 exponent domain: sm_scale * log2(e) is folded
    # into the [block_q, head_dim] q tile (128x smaller than the score
    # tile) and the softmax uses exp2 — this removes the full
    # [block_q, sub_k] scale pass per tile, one of the VPU passes that
    # bound the kernel (the MXU dots are only ~half the runtime).
    qs = (q_ref[0] * (sm_scale * 1.4426950408889634)).astype(q_ref.dtype)

    def _scores(sub):
        return jax.lax.dot_general(
            qs,
            k_ref[0, sub * sub_k : (sub + 1) * sub_k],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, sub_k]

    for sub in range(k_splits):
        # Sub-tile base position along the KV axis (static per unrolled sub).
        kv_seg_sub = kv_seg_row[sub * sub_k : (sub + 1) * sub_k]
        k_lo, k_hi = jnp.min(kv_seg_sub), jnp.max(kv_seg_sub)

        # Tile-level skips:
        #  * causal: whole KV sub-tile above the diagonal contributes
        #    nothing,
        #  * segments: segment ids are nondecreasing in token order
        #    (packing order), so a tile is dead when the q block's id range
        #    and the kv tile's id range don't overlap. With window-major
        #    packed vision tokens this turns block-diagonal window
        #    attention near-linear. Padding id -1 is conservative (runs).
        segments_overlap = (
            (q_lo <= k_hi) & (k_lo <= q_hi) & (q_hi >= 0) & (k_hi >= 0)
        )
        if causal:
            should_run = (
                (qi + 1) * block_q - 1 + q_offset
                >= ki * block_k + sub * sub_k
            ) & segments_overlap
        else:
            should_run = segments_overlap

        # Fast path: a tile fully inside ONE segment (and, for causal,
        # strictly below the diagonal) needs no mask at all — skips the
        # iota/compare/select VPU passes over the scores tile. Most tiles
        # of window-major packed vision and long causal prefills qualify.
        uniform_segment = (
            (q_lo == q_hi) & (k_lo == k_hi) & (q_lo == k_lo) & (q_lo >= 0)
        )
        if causal:
            no_mask_needed = uniform_segment & (
                qi * block_q + q_offset
                >= ki * block_k + (sub + 1) * sub_k
            )
        else:
            no_mask_needed = uniform_segment

        @pl.when(should_run & no_mask_needed)
        def _run_unmasked(sub=sub):
            _update(_scores(sub), None, sub)

        @pl.when(should_run & ~no_mask_needed)
        def _run_masked(sub=sub, kv_seg_sub=kv_seg_sub):
            s = _scores(sub)
            # Segment mask (padding = -1 never matches, and -1 q rows match
            # nothing — their l stays 0; the output row is zeroed at the
            # end).
            mask = (q_seg_blk[:, None] == kv_seg_sub[None, :]) & (
                q_seg_blk[:, None] >= 0
            )
            if causal:
                row_ids = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, sub_k), 0)
                    + qi * block_q
                    + q_offset
                )
                col_ids = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, sub_k), 1)
                    + ki * block_k
                    + sub * sub_k
                )
                mask = mask & (col_ids <= row_ids)
            _update(jnp.where(mask, s, DEFAULT_MASK_VALUE), mask, sub)

    @pl.when(ki == num_k_blocks - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)  # masked rows -> zeros
        o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "q_offset", "sm_scale", "block_q", "block_k", "k_splits",
        "interpret",
    ),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    q_offset: int = 0,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 2048,
    k_splits: int = 2,
    interpret: bool = False,
    mask: Optional[jnp.ndarray] = None,  # unsupported; use segment ids
) -> jnp.ndarray:
    """Flash attention over model-layout tensors.

    q: [B, Tq, H, D]; k, v: [B, S, KV, D] with H % KV == 0 (GQA).
    q_segment_ids: [B, Tq]; kv_segment_ids: [B, S] (int32; -1 = padding;
    None = all tokens in one segment). causal adds position masking
    (absolute positions = indices, matching engine prefill). q_offset
    shifts the queries' absolute positions by a static amount — the
    chunked-prefill "extend" pattern where a [Tq] query chunk continues a
    sequence whose first q_offset tokens are already cached (kv covers
    positions [0, S)).

    Block defaults (block_q 1024, block_k 2048 DMA with k_splits=2 compute
    sub-tiles) are tuned on v5e at the flagship shapes: 101 TFLOP/s
    image-wide at 14.3k tokens (vs 10 at the original 128x128 tiles and 96
    at 1024x1024 single-level), causal prefill 9.2 ms (3 stacked wins:
    big tiles, the dead-tile DMA clamp in kv_index, and the exp2/base-2
    score domain that deletes the per-tile scale pass). The f32 score
    tile stays [block_q, block_k / k_splits] so VMEM holds. Shorter
    sequences clamp blocks to the padded length automatically.

    Returns [B, Tq, H, D] in q.dtype.
    """
    if mask is not None:
        raise NotImplementedError(
            "flash_attention masks via segment ids / causal flag, not dense masks"
        )
    batch, q_len, num_heads, head_dim = q.shape
    _, kv_len, kv_heads, _ = k.shape
    assert num_heads % kv_heads == 0, (num_heads, kv_heads)
    group = num_heads // kv_heads
    sm_scale = sm_scale if sm_scale is not None else head_dim**-0.5

    if q_segment_ids is None:
        q_segment_ids = jnp.zeros((batch, q_len), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.zeros((batch, kv_len), jnp.int32)

    # Pad sequence axes up to the block grid (padding segment -1 attends to
    # and from nothing; padded q rows are sliced off below). Keeps callers
    # free to use any bucket size.
    orig_q_len = q_len
    q_pad = (-q_len) % min(block_q, max(q_len, 1))
    kv_pad = (-kv_len) % min(block_k, max(kv_len, 1))
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
        q_segment_ids = jnp.pad(
            q_segment_ids, ((0, 0), (0, q_pad)), constant_values=-1
        )
        q_len += q_pad
    if kv_pad:
        k = jnp.pad(k, ((0, 0), (0, kv_pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kv_pad), (0, 0), (0, 0)))
        kv_segment_ids = jnp.pad(
            kv_segment_ids, ((0, 0), (0, kv_pad)), constant_values=-1
        )
        kv_len += kv_pad

    block_q = min(block_q, q_len)
    block_k = min(block_k, kv_len)
    # Two-level K tiling: block_k is the DMA block; compute runs in
    # block_k / k_splits sub-tiles (see _flash_kernel). Degrade gracefully
    # when the clamped block no longer splits evenly.
    if k_splits > 1 and block_k % k_splits != 0:
        k_splits = 1
    num_q_blocks = q_len // block_q
    num_k_blocks = kv_len // block_k

    # [B*H, T, D] query-head-major layout.
    qr = q.transpose(0, 2, 1, 3).reshape(batch * num_heads, q_len, head_dim)
    kr = k.transpose(0, 2, 1, 3).reshape(batch * kv_heads, kv_len, head_dim)
    vr = v.transpose(0, 2, 1, 3).reshape(batch * kv_heads, kv_len, head_dim)

    def _clamp_dead(ki, qi):
        # Causal DMA skip: every KV tile fully above the diagonal is clamped
        # to the row's LAST LIVE block index. The Pallas pipeline only issues
        # a copy when a block's mapped index changes between grid steps, so
        # the dead tiles' K/V (and segment) fetches vanish — the kernel body
        # still runs (and skips compute via should_run). At 14k-token causal
        # prefill this halves HBM traffic for K/V.
        last_live = ((qi + 1) * block_q - 1 + q_offset) // block_k
        return jnp.minimum(ki, last_live)

    def q_index(bh, qi, ki):
        return (bh, qi, 0)

    def kv_index(bh, qi, ki):
        b = bh // num_heads
        h = bh % num_heads
        if causal:
            ki = _clamp_dead(ki, qi)
        return (b * kv_heads + h // group, ki, 0)

    def q_seg_index(bh, qi, ki):
        return (0, qi)

    def kv_seg_index(bh, qi, ki):
        if causal:
            ki = _clamp_dead(ki, qi)
        return (0, ki)

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        q_offset=q_offset,
        sm_scale=sm_scale,
        num_k_blocks=num_k_blocks,
        block_q=block_q,
        block_k=block_k,
        k_splits=k_splits,
        num_heads=num_heads,
    )

    out = pl.pallas_call(
        kernel,
        grid=(batch * num_heads, num_q_blocks, num_k_blocks),
        in_specs=[
            pl.BlockSpec((batch, block_q), q_seg_index),
            pl.BlockSpec((batch, block_k), kv_seg_index),
            pl.BlockSpec((1, block_q, head_dim), q_index),
            pl.BlockSpec((1, block_k, head_dim), kv_index),
            pl.BlockSpec((1, block_k, head_dim), kv_index),
        ],
        out_specs=pl.BlockSpec((1, block_q, head_dim), q_index),
        out_shape=jax.ShapeDtypeStruct(qr.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_segment_ids, kv_segment_ids, qr, kr, vr)

    out = out.reshape(batch, num_heads, q_len, head_dim).transpose(0, 2, 1, 3)
    return out[:, :orig_q_len]
