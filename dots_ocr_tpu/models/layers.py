"""Primitive layers as pure functions over param pytrees.

No module framework: params are nested dicts of jnp arrays, layers are
functions. This keeps the model trivially compatible with pjit sharding
(PartitionSpec per pytree path), orbax checkpointing, and lax.scan layer
stacking.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm in float32, output cast back to x.dtype (Qwen convention)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def linear(
    x: jnp.ndarray, kernel, bias: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """x @ kernel (+ bias). kernel: [in, out] — row-major for MXU-friendly
    [tokens, in] x [in, out] matmuls.

    Accepts a weight-only int8 kernel ({"qint8", "scale"} from
    models/quantize.py): the dot consumes the int8 array through a fused
    unary convert (half the HBM read) and the per-output-channel dequant
    scale is applied to the output, where it commutes exactly.

    Accepts a W8A8 kernel ({"qint8_act", "scale"}): activations are
    dynamically quantized per token (symmetric, amax/127) and the dot runs
    int8 x int8 -> int32 on the MXU at ~2x the bf16 rate — the
    compute-bound-prefill variant (vision encoder). Both per-axis scales
    commute out of the contraction, so dequant is one fused elementwise
    multiply on the [tokens, out] output.
    """
    if isinstance(kernel, dict) and "qint4" in kernel:
        # Weight-only int4: nibble-packed bytes + group scales, consumed by
        # the Pallas grouped-dequant matmul (half the HBM stream of int8).
        from dots_ocr_tpu.ops.int4_matmul import int4_linear

        out = int4_linear(x, kernel).astype(jnp.float32)
    elif isinstance(kernel, dict) and "qint8_act" in kernel:
        q, s = kernel["qint8_act"], kernel["scale"]
        xf = x.astype(jnp.float32)
        a_scale = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-8
        )
        xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, q,
            (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * a_scale * s
    elif isinstance(kernel, dict):
        q, s = kernel["qint8"], kernel["scale"]
        out = jnp.einsum(
            "...i,io->...o", x, q.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ) * s
    else:
        out = jnp.einsum(
            "...i,io->...o", x, kernel, preferred_element_type=jnp.float32
        )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def swiglu(
    x: jnp.ndarray,
    gate_kernel: jnp.ndarray,
    up_kernel: jnp.ndarray,
    down_kernel: jnp.ndarray,
) -> jnp.ndarray:
    """SwiGLU MLP: down(silu(gate(x)) * up(x)). Used by both the Qwen decoder
    and the dots vision blocks."""
    gate = linear(x, gate_kernel)
    up = linear(x, up_kernel)
    hidden = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return linear(hidden, down_kernel)


def embed(input_ids: jnp.ndarray, embedding) -> jnp.ndarray:
    """Token embedding lookup. Accepts an int8 per-row-quantized table
    ({"qint8", "scale"} from models/quantize.quantize_embedding)."""
    if isinstance(embedding, dict):
        rows = jnp.take(embedding["qint8"], input_ids, axis=0)
        scale = jnp.take(embedding["scale"], input_ids, axis=0)
        return rows.astype(jnp.bfloat16) * scale[..., None].astype(jnp.bfloat16)
    return jnp.take(embedding, input_ids, axis=0)


def unembed(x: jnp.ndarray, embedding) -> jnp.ndarray:
    """Tied-embedding logits: x @ embedding.T in f32. For an int8 table the
    per-vocab-row scale is applied across the logits' vocab axis."""
    if isinstance(embedding, dict):
        return jnp.einsum(
            "...d,vd->...v", x, embedding["qint8"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ) * embedding["scale"]
    return jnp.einsum(
        "...d,vd->...v", x, embedding, preferred_element_type=jnp.float32
    )
