"""shard_map partitioning of the Pallas attention kernels for TP serving.

The reference's multi-chip serving knob is vLLM's ``--tensor-parallel-size``
(``demo/launch_model_vllm.sh:1``, ``docker/docker-compose.yml:36``), which
shards attention heads over GPUs with NCCL. Here the same head split rides
a ``jax.sharding.Mesh`` model axis: attention heads are embarrassingly
parallel, so each chip runs the *unmodified* Pallas kernel over its own
head shard — ``jax.shard_map`` makes that explicit (GSPMD cannot infer a
partitioning rule for a ``pallas_call``, so without these wrappers a TP>1
mesh either fails to lower or all-gathers the paged KV cache per step).

Sharding contract (matches ``parallel/sharding.py``):
  * q (and flash k/v) shard the HEAD axis over ``model`` — the same split
    the column-parallel wq/wk/wv matmuls already produce, so entering the
    shard_map moves no data;
  * the paged KV pools shard their leading KV-head axis (paged_kv_specs);
  * page tables / lengths / segment ids are small and replicated;
  * outputs leave head-sharded and flow into the row-parallel wo matmul,
    where GSPMD inserts the one psum per layer — the kernels themselves
    need no collectives.

Divisibility: every wrapped call requires num_heads % tp == 0 and
kv_heads % tp == 0 (checked by :func:`kernel_tp_degree`). A mesh WIDER
than the KV head count (2 KV heads on model=4) is handled upstream by
Megatron-style GQA replication — the engine pads the KV pools to one
contiguous replica per axis slice (``kv_cache.PagedKV.create``) so the
padded axis divides; only meshes that don't divide the Q/vision heads
fall back to the XLA paths.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def kernel_tp_degree(mesh: Optional[Mesh], axis: str, *head_counts: int) -> int:
    """TP degree over ``axis`` if every head count divides it, else 0.

    Returns 1 for no mesh / unit axis (kernels run unwrapped), the axis
    size when the head split works, and 0 when it does not (caller should
    use an XLA path that GSPMD can partition, or replicate)."""
    if mesh is None:
        return 1
    tp = dict(mesh.shape).get(axis, 1)
    if tp == 1:
        return 1
    if all(h % tp == 0 for h in head_counts):
        return tp
    return 0


def flash_attention_tp(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    axis: str = "model",
    **kwargs,
) -> jnp.ndarray:
    """Head-sharded flash attention: q [B, T, H, D], k/v [B, S, KV, D] with
    H and KV sharded over ``mesh``'s ``axis``. Segment ids replicated.
    kwargs pass through to :func:`ops.flash_attention.flash_attention`
    (causal, q_offset, interpret, ...)."""
    from dots_ocr_tpu.ops.flash_attention import flash_attention

    tp = kernel_tp_degree(mesh, axis, q.shape[2], k.shape[2])
    if tp == 1:
        return flash_attention(
            q, k, v, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, **kwargs,
        )
    assert tp > 1, (
        f"flash_attention_tp: heads {q.shape[2]}/{k.shape[2]} do not divide "
        f"mesh axis '{axis}'"
    )
    if q_segment_ids is None:
        q_segment_ids = jnp.zeros(q.shape[:2], jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.zeros(k.shape[:2], jnp.int32)

    head_spec = P(None, None, axis, None)
    seg_spec = P(None, None)

    def inner(q_, k_, v_, qs_, ks_):
        return flash_attention(
            q_, k_, v_, q_segment_ids=qs_, kv_segment_ids=ks_, **kwargs
        )

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(head_spec, head_spec, head_spec, seg_spec, seg_spec),
        out_specs=head_spec,
        check_vma=False,
    )(q, k, v, q_segment_ids, kv_segment_ids)


def paged_attention_multiquery_tp(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,
    page_indices: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "model",
    sm_scale: Optional[float] = None,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
    pages_per_block: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Head-sharded multi-query paged decode attention.

    q: [B, nq, H, D] head-sharded; k_pages/v_pages: [KV, pages, ps, D] with
    the KV-head axis sharded (paged_kv_specs); optional int8 scales
    [KV, pages, ps] sharded the same way; lengths/page tables replicated.
    Each chip's kernel streams only its own heads' pages — no cache
    collectives (the per-layer psum happens at the wo matmul outside)."""
    from dots_ocr_tpu.ops.paged_attention import paged_attention_multiquery

    tp = kernel_tp_degree(mesh, axis, q.shape[2], k_pages.shape[0])
    if tp == 1:
        return paged_attention_multiquery(
            q, k_pages, v_pages, lengths, page_indices, sm_scale=sm_scale,
            k_scales=k_scales, v_scales=v_scales,
            pages_per_block=pages_per_block, interpret=interpret,
        )
    assert tp > 1, (
        f"paged_attention_multiquery_tp: heads {q.shape[2]}/"
        f"{k_pages.shape[0]} do not divide mesh axis '{axis}'"
    )
    q_spec = P(None, None, axis, None)
    kv_spec = P(axis, None, None, None)
    scale_spec = P(axis, None, None)
    quantized = k_scales is not None

    if quantized:

        def inner(q_, kp_, vp_, ks_, vs_, ln_, pt_):
            return paged_attention_multiquery(
                q_, kp_, vp_, ln_, pt_, sm_scale=sm_scale, k_scales=ks_,
                v_scales=vs_, pages_per_block=pages_per_block,
                interpret=interpret,
            )

        return jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec, scale_spec, scale_spec,
                      P(None), P(None, None)),
            out_specs=q_spec,
            check_vma=False,
        )(q, k_pages, v_pages, k_scales, v_scales, lengths, page_indices)

    def inner(q_, kp_, vp_, ln_, pt_):
        return paged_attention_multiquery(
            q_, kp_, vp_, ln_, pt_, sm_scale=sm_scale,
            pages_per_block=pages_per_block, interpret=interpret,
        )

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, P(None), P(None, None)),
        out_specs=q_spec,
        check_vma=False,
    )(q, k_pages, v_pages, lengths, page_indices)


def paged_attention_multipage_tp(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,
    page_indices: jnp.ndarray,
    **kwargs,
) -> jnp.ndarray:
    """nq=1 convenience over :func:`paged_attention_multiquery_tp`
    (q: [B, H, D] head-sharded)."""
    out = paged_attention_multiquery_tp(
        q[:, None], k_pages, v_pages, lengths, page_indices, **kwargs
    )
    return out.reshape(q.shape)
