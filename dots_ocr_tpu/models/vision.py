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
    group is contiguous (``rope.token_order``); the merger is a reshape +
    MLP, no scatter.
  * **Windowed attention as a reshape** (config-gated, cfg.window_size > 0):
    tokens are packed window-major with every window padded to exactly
    window^2 tokens, so windowed layers attend densely over a
    ``[num_windows, window^2]`` reshape — linear in sequence length, no
    masking waste; layers in cfg.full_attn_layers keep image-wide attention.
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
from dots_ocr_tpu.ops.window_attention import (
    window_attention as window_attention_kernel,
)

# Windowed-layer attention implementation when the encoder runs flash:
# "xla" = dense batched einsum over [nw, W] windows (DEFAULT — measured
# fastest: 342 ms/page vs 375 flash vs 402 Pallas window kernel, PERF.md
# round-4 encoder ablation), "kernel" = fused per-window Pallas kernel,
# False = the generic flash kernel. At window^2 = 256 tokens every
# kernel boundary costs more in unfusable [T,H,D]<->head-major relayout
# copies than its inner loop saves; the plain einsum lets XLA fuse the
# relayouts into the projections. See ops/window_attention.py.
USE_WINDOW_KERNEL = "xla"


def vision_block(
    x: jnp.ndarray,
    block_params: dict,
    cfg: VisionConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    segment_ids: jnp.ndarray,
    attn_impl: str = "xla",
    use_full: Optional[jnp.ndarray] = None,
    mesh=None,
) -> jnp.ndarray:
    """One transformer block over packed tokens x: [T, D].

    When cfg.window_size > 0 and ``use_full`` (a traced bool) is given, the
    attention branches at runtime between image-wide and per-window dense
    attention (uniform window^2 tokens per window).
    """
    attn_p = block_params["attn"]
    num_heads, head_dim = cfg.num_heads, cfg.head_dim
    window_tokens = cfg.window_size**2 if cfg.window_size > 0 else 0

    def attend(h: jnp.ndarray) -> jnp.ndarray:
        t = h.shape[0]
        q = linear(h, attn_p["wq"], attn_p.get("bq")).reshape(t, num_heads, head_dim)
        k = linear(h, attn_p["wk"], attn_p.get("bk")).reshape(t, num_heads, head_dim)
        v = linear(h, attn_p["wv"], attn_p.get("bv")).reshape(t, num_heads, head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        def full_attn(_):
            return attention(
                q[None],
                k[None],
                v[None],
                mask=mask,
                q_segment_ids=segment_ids[None],
                kv_segment_ids=segment_ids[None],
                impl=attn_impl,
                mesh=mesh,
            )[0]

        if window_tokens and use_full is not None and t % window_tokens == 0:
            def window_attn(_):
                nw = t // window_tokens
                segw = segment_ids.reshape(nw, window_tokens)
                if (
                    USE_WINDOW_KERNEL == "xla"
                    and attn_impl in ("flash", "flash_interpret")
                    and mesh is None
                ):
                    qw = q.reshape(nw, window_tokens, num_heads, head_dim)
                    kw = k.reshape(nw, window_tokens, num_heads, head_dim)
                    vw = v.reshape(nw, window_tokens, num_heads, head_dim)
                    ow = attention(
                        qw, kw, vw,
                        mask=make_segment_mask(segw, segw),
                        impl="xla",
                    )
                    return ow.reshape(t, num_heads, head_dim)
                if (
                    USE_WINDOW_KERNEL
                    and attn_impl in ("flash", "flash_interpret")
                    and mesh is None
                ):
                    # Fused single-tile dense kernel: at window^2 = 256
                    # tokens each (window, head) score matrix fits VMEM,
                    # and the [T, H, D] -> [nw, W, H, D] reshape splits
                    # the leading dim only (layout-free; see the layout
                    # post-mortem in ops/window_attention.py).
                    ow = window_attention_kernel(
                        q.reshape(nw, window_tokens, num_heads, head_dim),
                        k.reshape(nw, window_tokens, num_heads, head_dim),
                        v.reshape(nw, window_tokens, num_heads, head_dim),
                        segw,
                        interpret=(attn_impl == "flash_interpret"),
                    )
                    return ow.reshape(t, num_heads, head_dim)
                qw = q.reshape(nw, window_tokens, num_heads, head_dim)
                kw = k.reshape(nw, window_tokens, num_heads, head_dim)
                vw = v.reshape(nw, window_tokens, num_heads, head_dim)
                maskw = (
                    make_segment_mask(segw, segw) if attn_impl == "xla" else None
                )
                ow = attention(
                    qw,
                    kw,
                    vw,
                    mask=maskw,
                    q_segment_ids=segw,
                    kv_segment_ids=segw,
                    impl=attn_impl,
                    mesh=mesh,
                )
                return ow.reshape(t, num_heads, head_dim)

            out = jax.lax.cond(use_full, full_attn, window_attn, None)
        else:
            out = full_attn(None)
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
    window_ids: Optional[jnp.ndarray] = None,  # kept for API symmetry
    attn_impl: str = "xla",
    mesh=None,
) -> jnp.ndarray:
    """Run the encoder over packed patches.

    Args:
      patches: [T, patch_dim] float (T bucket-padded; padding segment = -1;
        with cfg.window_size > 0 the packing is window-major with uniform
        window^2 tokens per window, including padded edge-window slots).
      rope_cos/rope_sin: [T, head_dim] 2D-RoPE tables (host-precomputed).
      segment_ids: [T] int32, image index per token, -1 for any padding.

    Returns: pre-merge hidden states [T, D].
    """
    del window_ids  # windowing works off the uniform reshape + segment ids
    dtype = params["patch_embed"]["kernel"].dtype
    if patches.dtype == jnp.uint8:
        # Patches travel host->device as uint8 (4x less transfer than f32);
        # CLIP-style normalization happens here, fused by XLA into the
        # patch-embed matmul. Pixel layout inside a patch is (p*p, channel),
        # channel fastest — tile the per-channel stats across the patch dim.
        pixels = cfg.patch_dim // cfg.in_channels
        mean = jnp.tile(jnp.asarray(cfg.image_mean, jnp.float32), pixels)
        std = jnp.tile(jnp.asarray(cfg.image_std, jnp.float32), pixels)
        patches = ((patches.astype(jnp.float32) / 255.0 - mean) / std)
    x = linear(
        patches.astype(dtype),
        params["patch_embed"]["kernel"],
        params["patch_embed"].get("bias"),
    )
    cos = rope_cos.astype(jnp.float32)
    sin = rope_sin.astype(jnp.float32)

    windowed = cfg.window_size > 0
    if windowed:
        import numpy as np

        full_layer = jnp.asarray(
            np.array(
                [l in cfg.full_attn_layers for l in range(cfg.num_layers)], bool
            )
        )

    # Dense image-wide mask exists only on the XLA path (flash masks via
    # segment ids); windowed layers build their own small per-window masks.
    mask = make_segment_mask(segment_ids, segment_ids)[None] if attn_impl == "xla" else None

    def scan_body(carry, layer_in):
        if windowed:
            block_params, use_full = layer_in
        else:
            block_params, use_full = layer_in, None
        return (
            vision_block(
                carry, block_params, cfg, cos, sin, mask, segment_ids,
                attn_impl, use_full=use_full, mesh=mesh,
            ),
            None,
        )

    xs = (params["blocks"], full_layer) if windowed else params["blocks"]
    x, _ = jax.lax.scan(scan_body, x, xs)
    return rms_norm(x, params["post_norm"], cfg.rms_norm_eps)


def merge_tokens(
    params: dict, cfg: VisionConfig, hidden: jnp.ndarray
) -> jnp.ndarray:
    """2x2 spatial merge + projector into decoder space.

    hidden: [T, D] in merge-contiguous order (see rope.token_order), so
    the merge is a pure reshape: [T/4, 4*D] -> MLP -> [T/4, llm_hidden].
    Padding tokens merge into padding rows (callers route them nowhere via
    the valid-row scatter indices).
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
    window_ids: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    mesh=None,
) -> jnp.ndarray:
    """Full vision path: packed patches -> merged decoder-space tokens
    [T / merge^2, llm_hidden]."""
    hidden = vision_forward(
        params, cfg, patches, rope_cos, rope_sin, segment_ids,
        window_ids=window_ids, attn_impl=attn_impl, mesh=mesh,
    )
    return merge_tokens(params, cfg, hidden)
