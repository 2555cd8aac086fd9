"""Weight-only int8 quantization for the decoder (serving-time).

Decode at serving batch sizes is HBM-bound on *parameter reads*: every
decode iteration streams the full decoder (~3.1 GB of the 5.6 GB bf16
flagship) from HBM. Storing linear kernels as int8 with per-output-channel
scales halves that traffic. The reference has no quantized-serving story
(vLLM's is external to the repo, SURVEY.md §2.2); this is a TPU-native
extra, opt-in via ``--quantize int8`` on the server / engine callers.

Design notes (TPU/XLA-first):
  * Symmetric per-output-channel scales: ``w ≈ q * s[None, :]`` with
    ``q ∈ int8``, ``s = max|w| / 127`` per column. Because the scale is
    per *output* channel it commutes with the contraction:
    ``x @ (q * s) == (x @ q) * s`` — so the matmul consumes the int8
    array through a unary convert (which XLA fuses into the dot's operand
    read; no bf16 copy of the kernel is ever materialized) and the
    dequant is a tiny [tokens, out] elementwise multiply on the output.
  * A quantized kernel is the sub-dict ``{"qint8": int8[in, out],
    "scale": f32[out]}`` — a plain pytree, so stacked [L, ...] decoder
    blocks, ``lax.scan``, per-layer ``tree.map`` slicing, and orbax all
    work unchanged. ``layers.linear``/``embed``/``unembed`` dispatch on it.
  * Tied embeddings quantize per vocab row (the unembed's output channel):
    ``embed`` gathers int8 rows and scales by ``s[ids]``; ``unembed``
    applies ``s`` across the vocab axis of the logits.
  * Scales are kept FLAT 1-D (f32[out]) — small-leading-dim 2-D arrays can
    pick up a transposed tiled layout on TPU with massive HBM padding.
  * Biases, norm weights, and the vision tower stay bf16: prefill is
    MXU/compute-bound, so vision quantization buys little and risks
    layout-parse quality.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_KEYS = ("qint8", "scale")
ACT_QUANT_KEYS = ("qint8_act", "scale")
INT4_KEYS = ("qint4", "scale4")


def is_quantized_kernel(obj: Any) -> bool:
    return isinstance(obj, dict) and set(obj.keys()) == set(QUANT_KEYS)


def is_int4_kernel(obj: Any) -> bool:
    """Weight-only int4 marker: nibble-packed int8 + [G, out] group scales,
    consumed by the Pallas grouped-dequant matmul (ops/int4_matmul.py)."""
    return isinstance(obj, dict) and set(obj.keys()) == set(INT4_KEYS)


def is_act_quantized_kernel(obj: Any) -> bool:
    """W8A8 kernel marker: consumed via dynamic per-token activation
    quantization + an int8 x int8 -> int32 MXU dot (layers.linear)."""
    return isinstance(obj, dict) and set(obj.keys()) == set(ACT_QUANT_KEYS)


def quantize_kernel(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[in, out] (or [vocab, d] for embeddings) -> {qint8, scale}.

    Per-output-channel symmetric: scale over axis 0 for 2-D kernels.
    For the embedding table the "output channel" of the tied unembed is the
    vocab row, so callers pass ``axis=1``-reduced tables via
    :func:`quantize_embedding`.
    """
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(wf / s[None, :]), -127, 127).astype(jnp.int8)
    return {"qint8": q, "scale": s}


def quantize_embedding(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[vocab, d] -> {qint8, scale[vocab]} (per-row scales)."""
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=1) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(wf / s[:, None]), -127, 127).astype(jnp.int8)
    return {"qint8": q, "scale": s}


def dequantize_kernel(qk: Dict[str, jnp.ndarray], axis: int = 0) -> jnp.ndarray:
    """Inverse of quantize_kernel (axis=0) / quantize_embedding (axis=1)."""
    q, s = qk["qint8"], qk["scale"]
    s = s[:, None] if axis == 1 else s[None, :]
    return q.astype(jnp.float32) * s


_BLOCK_KERNELS = (
    ("attn", "wq"),
    ("attn", "wk"),
    ("attn", "wv"),
    ("attn", "wo"),
    ("mlp", "gate"),
    ("mlp", "up"),
    ("mlp", "down"),
)


def quantize_kernel_act(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[in, out] -> {qint8_act, scale}: same per-output-channel symmetric
    weight quantization as :func:`quantize_kernel`, but tagged for the
    W8A8 path — ``layers.linear`` dynamically quantizes the ACTIVATIONS
    per token to int8 too and runs an int8 x int8 -> int32 dot, which the
    TPU MXU executes at ~2x the bf16 rate. Worth it only where the matmul
    is compute-bound (the vision encoder's prefill); decode stays
    weight-only (bandwidth-bound, the convert-in-dot path is optimal)."""
    qk = quantize_kernel(w)
    return {"qint8_act": qk["qint8"], "scale": qk["scale"]}


_VISION_BLOCK_KERNELS = (
    ("attn", "wq"),
    ("attn", "wk"),
    ("attn", "wv"),
    ("attn", "wo"),
    ("mlp", "gate"),
    ("mlp", "up"),
    ("mlp", "down"),
)


def quantize_vision_params(params: dict) -> dict:
    """Return a new param tree with the vision tower's block linears as W8A8.

    The encoder at a full 11-14k-token page is MXU-compute-bound (PERF.md:
    ~90 TFLOP of which ~36 are the block matmuls); int8 x int8 dots double
    the MXU rate on those. Patch embed, merger, norms, and qkv biases stay
    bf16: they are <1% of the FLOPs and precision-sensitive (first-layer
    normalization / final projection into decoder space).

    Opt-in (``--vision-quantize int8``); accuracy vs the real checkpoint
    must be validated weights-day (tools/weights_day.py) — dynamic
    per-token activation quantization is robust on ViTs in the literature
    but unverifiable on synthetic weights.
    """
    if "vision" in params:
        out = dict(params)
        out["vision"] = quantize_vision_params(params["vision"])
        return out

    vis = dict(params)
    blocks = {k: v for k, v in vis["blocks"].items()}
    for group, name in _VISION_BLOCK_KERNELS:
        if group not in blocks or name not in blocks[group]:
            continue
        grp = dict(blocks[group])
        w = grp[name]
        if is_quantized_kernel(w) or is_act_quantized_kernel(w):
            continue
        if w.ndim == 3:  # stacked [L, in, out]
            qs = jax.vmap(quantize_kernel)(w)
            grp[name] = {"qint8_act": qs["qint8"], "scale": qs["scale"]}
        else:
            grp[name] = quantize_kernel_act(w)
        blocks[group] = grp
    vis["blocks"] = blocks
    return vis


def quantize_kernel_int4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[in, out] -> {qint4: int8[in/2, out] nibble-packed, scale4: f32[G, out]}.

    Group-wise symmetric (128 input rows per group, q ∈ [-7, 7]): at 4 bits
    a single per-output-channel scale is too coarse, and a group of 128
    matches the MXU contraction tile so the consuming kernel
    (ops/int4_matmul.py) runs one dot per group with the scale applied to
    the accumulator. Packing puts input rows [0, in/2) in low nibbles and
    [in/2, in) in high nibbles — unpack is two arithmetic shifts, no
    shuffle. Requires in % 256 == 0 and out % 128 == 0 (all flagship
    decoder linears qualify); callers fall back to int8 otherwise.
    """
    from dots_ocr_tpu.ops.int4_matmul import GROUP, pack_int4

    wf = jnp.asarray(w, jnp.float32)
    in_dim, out_dim = wf.shape
    g = in_dim // GROUP
    wg = wf.reshape(g, GROUP, out_dim)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / s[:, None, :]), -7, 7).astype(jnp.int8)
    return {"qint4": pack_int4(q.reshape(in_dim, out_dim)), "scale4": s}


def int4_compatible(w) -> bool:
    return (
        hasattr(w, "ndim") and w.ndim in (2, 3)
        and w.shape[-2] % 256 == 0 and w.shape[-1] % 128 == 0
    )


def quantize_decoder_params_int4(params: dict, include_embed: bool = True) -> dict:
    """Full-VLM tree with decoder block linears as int4 (embed/lm_head stay
    int8 — the embedding gather wants per-row int8, and the unembed's huge
    vocab axis amortizes per-channel int8 well). Kernels whose shapes don't
    meet the int4 alignment fall back to int8 per-kernel.

    Single-chip only for now: the nibble packing interleaves input-row
    halves, which a row-parallel TP shard would split incoherently —
    the server rejects --quantize int4 with --tensor-parallel-size > 1.
    """
    if "decoder" in params:
        out = dict(params)
        out["decoder"] = quantize_decoder_params_int4(
            params["decoder"], include_embed=include_embed
        )
        return out

    dec = jax.tree.map(lambda x: x, params)
    blocks = {k: v for k, v in dec["blocks"].items()}
    for group, name in _BLOCK_KERNELS:
        if group not in blocks or name not in blocks[group]:
            continue
        grp = dict(blocks[group])
        w = grp[name]
        if isinstance(w, dict):
            continue  # already quantized
        if not int4_compatible(w):
            grp[name] = (
                jax.vmap(quantize_kernel)(w) if w.ndim == 3
                else quantize_kernel(w)
            )
        elif w.ndim == 3:  # stacked [L, in, out]
            qs = jax.vmap(quantize_kernel_int4)(w)
            grp[name] = {"qint4": qs["qint4"], "scale4": qs["scale4"]}
        else:
            grp[name] = quantize_kernel_int4(w)
        blocks[group] = grp
    dec = dict(dec)
    dec["blocks"] = blocks
    if include_embed and "embed" in dec and not is_quantized_kernel(dec["embed"]):
        dec["embed"] = quantize_embedding(dec["embed"])
        if "lm_head" in dec:
            dec["lm_head"] = quantize_kernel(dec["lm_head"])
    return dec


def quantize_decoder_params(params: dict, include_embed: bool = True) -> dict:
    """Return a new full-VLM param tree with decoder linears as int8.

    ``params`` is the loaded tree ({"vision": ..., "decoder": ...} or a bare
    decoder tree). Vision, norms, and biases are untouched. Works on both
    stacked [L, ...] block leaves (vmapped per-layer scales) and unstacked.
    """
    if "decoder" in params:
        out = dict(params)
        out["decoder"] = quantize_decoder_params(
            params["decoder"], include_embed=include_embed
        )
        return out

    dec = jax.tree.map(lambda x: x, params)  # shallow-ish copy of the tree
    blocks = {k: v for k, v in dec["blocks"].items()}
    for group, name in _BLOCK_KERNELS:
        if group not in blocks or name not in blocks[group]:
            continue
        grp = dict(blocks[group])
        w = grp[name]
        if w.ndim == 3:  # stacked [L, in, out]
            qs = jax.vmap(quantize_kernel)(w)
            grp[name] = {"qint8": qs["qint8"], "scale": qs["scale"]}
        else:
            grp[name] = quantize_kernel(w)
        blocks[group] = grp
    dec = dict(dec)
    dec["blocks"] = blocks
    if include_embed and "embed" in dec and not is_quantized_kernel(dec["embed"]):
        dec["embed"] = quantize_embedding(dec["embed"])
        if "lm_head" in dec:
            dec["lm_head"] = quantize_kernel(dec["lm_head"])
    return dec


def quantized_bytes(params: dict) -> int:
    """Total parameter bytes (for logging the HBM saving)."""
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
