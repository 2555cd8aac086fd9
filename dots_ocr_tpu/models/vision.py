"""NaViT-style variable-resolution vision encoder (the reference's 1.2B ViT).

TPU-first design decisions (vs. the reference's flash-attn varlen CUDA path):

  * **Packing, not batching**: all images in a request pack into one token
    axis ``[T, patch_dim]`` with per-token segment ids; attention is masked
    block-diagonal (``make_segment_mask``). T is bucket-padded so jit sees a
    few static shapes instead of one per resolution.
  * **Conv patch embed as a matmul**: patches are extracted host-side (numpy
    im2col in ``preprocess.py``) into ``[T, 3*14*14]``; the 14x14 conv then
    IS a ``[T, 588] x [588, D]`` matmul that lands on the MXU — no NCHW conv,
    no layout transposes on device.
  * **2D RoPE tables precomputed** per (h, w) grid on host and passed in as
    arrays: no integer math inside the kernel, fusable with attention.
  * **Merge as a static gather**: patch order is chosen so each 2x2 merge
    group is contiguous (``rope.vision_grid_positions``); the merger is a
    reshape + MLP, no scatter.
  * ``lax.scan`` over the 42 stacked blocks: O(1) compile size.

Weight layout matches the published dots.ocr vision tower (42 blocks, width
1536, 12 heads, SwiGLU, RMSNorm post-norm, bias on qkv) —
[EXTERNAL — verified against the HF checkpoint at load time].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dots_ocr_tpu.models.config import VisionConfig
from dots_ocr_tpu.models.layers import linear, rms_norm, swiglu
from dots_ocr_tpu.models.rope import apply_rope
from dots_ocr_tpu.ops.attention import attention, make_segment_mask


def vision_block(
    x: jnp.ndarray,
    block_params: dict,
    cfg: VisionConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,
    segment_ids: jnp.ndarray,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """One transformer block over packed tokens x: [T, D]."""
    attn_p = block_params["attn"]
    num_heads, head_dim = cfg.num_heads, cfg.head_dim

    def attend(h: jnp.ndarray) -> jnp.ndarray:
        t = h.shape[0]
        q = linear(h, attn_p["wq"], attn_p.get("bq")).reshape(t, num_heads, head_dim)
        k = linear(h, attn_p["wk"], attn_p.get("bk")).reshape(t, num_heads, head_dim)
        v = linear(h, attn_p["wv"], attn_p.get("bv")).reshape(t, num_heads, head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = attention(
            q[None],
            k[None],
            v[None],
            mask=mask,
            q_segment_ids=segment_ids[None],
            kv_segment_ids=segment_ids[None],
            impl=attn_impl,
        )[0]
        return linear(out.reshape(t, num_heads * head_dim), attn_p["wo"])

    def mlp(h: jnp.ndarray) -> jnp.ndarray:
        m = block_params["mlp"]
        return swiglu(h, m["gate"], m["up"], m["down"])

    if cfg.post_norm:
        # NaViT post-norm: norm applied to the residual sum.
        x = rms_norm(x + attend(x), block_params["norm1"], cfg.rms_norm_eps)
        x = rms_norm(x + mlp(x), block_params["norm2"], cfg.rms_norm_eps)
    else:
        x = x + attend(rms_norm(x, block_params["norm1"], cfg.rms_norm_eps))
        x = x + mlp(rms_norm(x, block_params["norm2"], cfg.rms_norm_eps))
    return x


def vision_forward(
    params: dict,
    cfg: VisionConfig,
    patches: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    segment_ids: jnp.ndarray,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """Run the encoder over packed patches.

    Args:
      patches: [T, patch_dim] float (T bucket-padded; padding segment = -1).
      rope_cos/rope_sin: [T, head_dim] 2D-RoPE tables (host-precomputed).
      segment_ids: [T] int32, image index per token, -1 for padding.

    Returns: pre-merge hidden states [T, D].
    """
    dtype = params["patch_embed"]["kernel"].dtype
    x = linear(
        patches.astype(dtype),
        params["patch_embed"]["kernel"],
        params["patch_embed"].get("bias"),
    )
    # Dense mask only exists on the XLA path; flash masks via segment ids.
    mask = (
        make_segment_mask(segment_ids, segment_ids)[None]
        if attn_impl == "xla"
        else None
    )
    cos = rope_cos.astype(jnp.float32)
    sin = rope_sin.astype(jnp.float32)

    def scan_body(carry, block_params):
        return (
            vision_block(
                carry, block_params, cfg, cos, sin, mask, segment_ids, attn_impl
            ),
            None,
        )

    x, _ = jax.lax.scan(scan_body, x, params["blocks"])
    return rms_norm(x, params["post_norm"], cfg.rms_norm_eps)


def merge_tokens(
    params: dict, cfg: VisionConfig, hidden: jnp.ndarray
) -> jnp.ndarray:
    """2x2 spatial merge + projector into decoder space.

    hidden: [T, D] in merge-contiguous order (see vision_grid_positions), so
    the merge is a pure reshape: [T/4, 4*D] -> MLP -> [T/4, llm_hidden].
    Padding tokens merge into padding rows (callers mask them downstream).
    """
    merge = cfg.spatial_merge_size**2
    t, d = hidden.shape
    grouped = hidden.reshape(t // merge, merge * d)
    m = params["merger"]
    h = rms_norm(grouped, m["norm"], cfg.rms_norm_eps)
    h = linear(h, m["fc1"], m.get("b1"))
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(hidden.dtype)
    return linear(h, m["fc2"], m.get("b2"))


def encode_images(
    params: dict,
    cfg: VisionConfig,
    patches: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    segment_ids: jnp.ndarray,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """Full vision path: packed patches -> merged decoder-space tokens
    [T / merge^2, llm_hidden]."""
    hidden = vision_forward(
        params, cfg, patches, rope_cos, rope_sin, segment_ids, attn_impl
    )
    return merge_tokens(params, cfg, hidden)
