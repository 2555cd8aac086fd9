"""Mesh construction + parameter/activation partition specs.

The reference's distributed story is NCCL tensor-parallelism inside vLLM
(``demo/launch_model_vllm.sh:1``, TP=1 in practice). Here parallelism is
expressed the TPU way: a ``jax.sharding.Mesh`` with axes ``("data",
"model")``; parameters carry Megatron-style PartitionSpecs (column-parallel
first matmul, row-parallel second), activations shard the batch axis over
``data``, and GSPMD inserts the all-reduces over ICI.

Every spec is divisibility-checked: a dimension that does not divide by the
mesh axis is replicated instead (e.g. the 2 KV heads on a model axis of 4) —
the config stays valid at any mesh shape, matching "must work at TP=1"
(SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dots_ocr_tpu.models.config import DotsOCRConfig


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the first data*model devices."""
    devices = devices if devices is not None else jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def auto_mesh(model_parallel: Optional[int] = None, devices=None) -> Mesh:
    """All devices; model axis = given TP degree (default 1 = pure DP)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = model_parallel or 1
    assert n % mp == 0, f"{n} devices not divisible by model={mp}"
    return make_mesh(data=n // mp, model=mp, devices=devices)


def _axis(mesh: Mesh, name: str, dim_size: int) -> Optional[str]:
    """Shard dim over mesh axis `name` if it divides; else replicate."""
    size = mesh.shape.get(name, 1)
    if size > 1 and dim_size % size == 0:
        return name
    return None


def param_partition_specs(config: DotsOCRConfig, mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec pytree congruent with models.init.param_specs."""
    d = config.decoder
    v = config.vision
    m = lambda dim: _axis(mesh, "model", dim)  # noqa: E731

    def attn_specs(q_out: int, kv_out: int, hidden: int, has_bias: bool):
        specs = {
            "wq": P(None, None, m(q_out)),
            "wk": P(None, None, m(kv_out)),
            "wv": P(None, None, m(kv_out)),
            "wo": P(None, m(q_out), None),
        }
        if has_bias:
            specs.update(
                {"bq": P(None, m(q_out)), "bk": P(None, m(kv_out)), "bv": P(None, m(kv_out))}
            )
        return specs

    def mlp_specs(inter: int):
        return {
            "gate": P(None, None, m(inter)),
            "up": P(None, None, m(inter)),
            "down": P(None, m(inter), None),
        }

    decoder = {
        "embed": P(m(d.vocab_size), None),
        "blocks": {
            "input_norm": P(None, None),
            "post_attn_norm": P(None, None),
            "attn": attn_specs(d.q_dim, d.kv_dim, d.hidden_size, d.qkv_bias),
            "mlp": mlp_specs(d.intermediate_size),
        },
        "final_norm": P(None),
    }
    if not d.tie_word_embeddings:
        decoder["lm_head"] = P(None, m(d.vocab_size))

    a_v = v.num_heads * v.head_dim
    md = v.merge_dim
    vision = {
        "patch_embed": {"kernel": P(None, m(v.hidden_size)), "bias": P(m(v.hidden_size))},
        "blocks": {
            "norm1": P(None, None),
            "norm2": P(None, None),
            "attn": attn_specs(a_v, a_v, v.hidden_size, v.qkv_bias),
            "mlp": mlp_specs(v.intermediate_size),
        },
        "post_norm": P(None),
        "merger": {
            "norm": P(None),
            "fc1": P(None, m(md)),
            "b1": P(m(md)),
            "fc2": P(m(md), None),
            "b2": P(None),
        },
    }
    return {"vision": vision, "decoder": decoder}


def _expand_quant_specs(params, specs):
    """Mirror weight-only int8 kernels ({"qint8", "scale"} sub-dicts,
    models/quantize.py) in the spec tree: qint8 keeps the kernel's spec,
    the 1-D-per-layer scale keeps only the output-channel axis (the
    kernel's last spec entry)."""
    from dots_ocr_tpu.models.quantize import (
        is_act_quantized_kernel,
        is_quantized_kernel,
    )

    def walk(p, s):
        if is_quantized_kernel(p) or is_act_quantized_kernel(p):
            qkey = "qint8" if is_quantized_kernel(p) else "qint8_act"
            q, scale = p[qkey], p["scale"]
            if scale.ndim == 2:  # stacked [L, out] <- kernel [L, in, out]
                scale_spec = P(s[0], s[-1])
            elif scale.shape[0] == q.shape[0]:  # per-row (embedding table)
                scale_spec = P(s[0])
            else:  # per-output-column (lm_head)
                scale_spec = P(s[-1])
            return {qkey: s, "scale": scale_spec}
        if isinstance(p, dict):
            return {k: walk(p[k], s[k]) for k in p}
        return s

    return walk(params, specs)


def shard_params(params, config: DotsOCRConfig, mesh: Mesh):
    """Place a param pytree onto the mesh per param_partition_specs.
    Handles weight-only int8 trees (quantized kernel sub-dicts)."""
    specs = _expand_quant_specs(params, param_partition_specs(config, mesh))
    return jax.tree.map(
        lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_specs(mesh: Mesh) -> Tuple[P, P]:
    """(per-token batch spec, per-sequence spec) for activations."""
    data = "data" if mesh.shape.get("data", 1) > 1 else None
    return P(data, None), P(data)


def kv_cache_spec(config: DotsOCRConfig, mesh: Mesh) -> P:
    """[L, B, S, KV, hd]: batch over data, KV heads over model when divisible."""
    data = "data" if mesh.shape.get("data", 1) > 1 else None
    kv = _axis(mesh, "model", config.decoder.num_kv_heads)
    return P(None, data, None, kv, None)


def paged_kv_specs(config: DotsOCRConfig, mesh: Mesh, quantized: bool = False,
                   kv_replication: int = 1):
    """PartitionSpecs for the serving engine's ``PagedKV`` cache.

    Sharding decision (SURVEY §2.3 "make TP a config axis" for SERVING): the
    per-layer [KV, N_slots, D] page pools shard the KV-head axis over
    ``model`` when divisible — the same split the attention projections use,
    so each chip writes and reads only its own heads' pages and decode
    attention needs no cache collectives (the head-parallel outputs meet at
    the row-parallel wo matmul's reduce, exactly like the dense path). Page
    tables, tokens, and lengths are tiny and stay replicated. When the
    model axis is WIDER than the KV head count the engine pads the pool
    with ``kv_replication`` contiguous replicas per head (Megatron-style
    GQA replication — kv_cache.PagedKV.create) so the padded axis still
    shards; a mesh neither divisible nor replicable leaves the pool
    replicated (correct, just not memory-scaled). The flat [KV * N_slots]
    int8 scale leaves split contiguously, which IS the head split when
    divisible.
    """
    from dots_ocr_tpu.engine.kv_cache import PagedKV

    d = config.decoder
    kv = _axis(mesh, "model", d.num_kv_heads * kv_replication)
    pool = P(kv, None, None)
    scale = P(kv)
    layers = d.num_layers
    return PagedKV(
        tuple(pool for _ in range(layers)),
        tuple(pool for _ in range(layers)),
        tuple(scale for _ in range(layers)) if quantized else None,
        tuple(scale for _ in range(layers)) if quantized else None,
    )
