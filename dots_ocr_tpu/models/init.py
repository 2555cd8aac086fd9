"""Parameter pytree construction: shapes, random init, fast zeros init.

The single source of truth for the parameter tree layout used by the model
functions, the safetensors loader, and the sharding rules.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dots_ocr_tpu.models.config import DecoderConfig, DotsOCRConfig, VisionConfig


def vision_param_specs(cfg: VisionConfig, dtype) -> Dict[str, Any]:
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    A = cfg.num_heads * cfg.head_dim
    spec = lambda *shape: jax.ShapeDtypeStruct(shape, dtype)  # noqa: E731
    attn = {
        "wq": spec(L, D, A),
        "wk": spec(L, D, A),
        "wv": spec(L, D, A),
        "wo": spec(L, A, D),
    }
    if cfg.qkv_bias:
        attn.update({"bq": spec(L, A), "bk": spec(L, A), "bv": spec(L, A)})
    md = cfg.merge_dim
    return {
        "patch_embed": {"kernel": spec(cfg.patch_dim, D), "bias": spec(D)},
        "blocks": {
            "norm1": spec(L, D),
            "norm2": spec(L, D),
            "attn": attn,
            "mlp": {"gate": spec(L, D, I), "up": spec(L, D, I), "down": spec(L, I, D)},
        },
        "post_norm": spec(D),
        "merger": {
            "norm": spec(md),
            "fc1": spec(md, md),
            "b1": spec(md),
            "fc2": spec(md, 0),  # out dim patched by caller (needs llm hidden)
            "b2": spec(0),
        },
    }


def decoder_param_specs(cfg: DecoderConfig, dtype) -> Dict[str, Any]:
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    Q, KV = cfg.q_dim, cfg.kv_dim
    spec = lambda *shape: jax.ShapeDtypeStruct(shape, dtype)  # noqa: E731
    attn = {
        "wq": spec(L, D, Q),
        "wk": spec(L, D, KV),
        "wv": spec(L, D, KV),
        "wo": spec(L, Q, D),
    }
    if cfg.qkv_bias:
        attn.update({"bq": spec(L, Q), "bk": spec(L, KV), "bv": spec(L, KV)})
    out = {
        "embed": spec(cfg.vocab_size, D),
        "blocks": {
            "input_norm": spec(L, D),
            "post_attn_norm": spec(L, D),
            "attn": attn,
            "mlp": {"gate": spec(L, D, I), "up": spec(L, D, I), "down": spec(L, I, D)},
        },
        "final_norm": spec(D),
    }
    if not cfg.tie_word_embeddings:
        out["lm_head"] = spec(D, cfg.vocab_size)
    return out


def param_specs(config: DotsOCRConfig) -> Dict[str, Any]:
    dtype = config.jax_dtype
    vision = vision_param_specs(config.vision, dtype)
    md = config.vision.merge_dim
    llm_d = config.decoder.hidden_size
    vision["merger"]["fc2"] = jax.ShapeDtypeStruct((md, llm_d), dtype)
    vision["merger"]["b2"] = jax.ShapeDtypeStruct((llm_d,), dtype)
    return {
        "vision": vision,
        "decoder": decoder_param_specs(config.decoder, dtype),
    }


def _is_norm_path(path: tuple) -> bool:
    last = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
    return "norm" in last


def init_params(rng: jax.Array, config: DotsOCRConfig, scale: float = 0.02):
    """Random-normal init (norm weights = 1, biases = 0)."""
    specs = param_specs(config)
    flat, treedef = jax.tree_util.tree_flatten_with_path(specs)
    keys = jax.random.split(rng, len(flat))
    leaves = []
    for key, (path, spec) in zip(keys, flat):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        if _is_norm_path(path):
            leaves.append(jnp.ones(spec.shape, spec.dtype))
        elif name.startswith("b") and len(spec.shape) <= 2:
            leaves.append(jnp.zeros(spec.shape, spec.dtype))
        else:
            leaves.append(
                (scale * jax.random.normal(key, spec.shape, jnp.float32)).astype(
                    spec.dtype
                )
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def zeros_params(config: DotsOCRConfig):
    """Cheap deterministic params (for compile checks / shape tests).

    Norm weights are 1 so forward passes stay numerically sane.
    """
    specs = param_specs(config)

    def make(path, spec):
        if _is_norm_path(path):
            return jnp.ones(spec.shape, spec.dtype)
        return jnp.zeros(spec.shape, spec.dtype)

    flat, treedef = jax.tree_util.tree_flatten_with_path(specs)
    return jax.tree_util.tree_unflatten(treedef, [make(p, s) for p, s in flat])


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
