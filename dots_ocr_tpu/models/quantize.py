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


def is_quantized_kernel(obj: Any) -> bool:
    return isinstance(obj, dict) and set(obj.keys()) == set(QUANT_KEYS)


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
