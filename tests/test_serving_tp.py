"""Tensor-parallel SERVING: the continuous-batching engine under a mesh.

Round-1 proved TP for training and the monolithic forward; this covers the
production path — paged KV cache + page tables + multi-step decode chunks +
chunked prefill — under a model-axis mesh on the virtual 8-device CPU
backend (conftest). Outputs must be token-identical to the single-device
engine; the paged cache must actually shard its KV-head axis.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from PIL import Image

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params
from dots_ocr_tpu.parallel.sharding import make_mesh, shard_params


@pytest.fixture(scope="module")
def setup():
    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def build(setup, mesh=None, attn_impl="auto", **overrides):
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )

    cfg, params = setup
    if mesh is not None:
        params = shard_params(params, cfg, mesh)
    kw = dict(
        num_pages=64,
        page_size=8,
        max_slots=4,
        max_pages_per_seq=32,
        prompt_bucket_step=32,
        vision_bucket_step=16,
        steps_per_sync=2,
    )
    kw.update(overrides)
    return ContinuousBatchingEngine(
        params, cfg, sched=SchedulerConfig(**kw),
        default_max_new_tokens=8, mesh=mesh, attn_impl=attn_impl,
    )


def test_tp2_decode_matches_single_device(setup):
    base = build(setup)
    mesh = make_mesh(data=1, model=2)
    eng = build(setup, mesh=mesh)

    # The cache genuinely shards: tiny config has 2 KV heads over model=2.
    assert eng.paged.k[0].sharding.spec == P("model", None, None)

    prompts = ["hello tensor parallel", "a second request"]
    a = base.generate_batch(prompts, temperature=0.0, max_new_tokens=8)
    b = eng.generate_batch(prompts, temperature=0.0, max_new_tokens=8)
    assert a == b


def test_tp2_vision_and_chunked_prefill(setup):
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    base = build(setup, prefill_chunk_tokens=16)
    mesh = make_mesh(data=1, model=2)
    eng = build(setup, mesh=mesh, prefill_chunk_tokens=16)

    a = base.generate_one("describe", images=[img], temperature=0.0,
                          max_new_tokens=6)
    b = eng.generate_one("describe", images=[img], temperature=0.0,
                         max_new_tokens=6)
    assert a == b
    assert eng.metrics["prefill_chunks"] >= 2  # chunked path really ran


def test_tp2_int8_kv_cache(setup):
    mesh = make_mesh(data=1, model=2)
    base = build(setup, kv_cache_dtype="int8")
    eng = build(setup, mesh=mesh, kv_cache_dtype="int8")
    assert eng.paged.k_scale[0].sharding.spec == P("model")
    a = base.generate_one("int8 tp", temperature=0.0, max_new_tokens=6)
    b = eng.generate_one("int8 tp", temperature=0.0, max_new_tokens=6)
    assert a == b


def test_tp4_kv_replication_pads_and_shards(setup):
    """2 KV heads on a model axis of 4: Megatron-style GQA replication —
    the pool pads to 4 contiguous replicas, SHARDS the padded axis (one
    replica per mesh slice), and decode stays token-identical."""
    mesh = make_mesh(data=1, model=4)
    base = build(setup)
    eng = build(setup, mesh=mesh)
    assert eng._kv_rep == 2
    assert eng.paged.k[0].shape[0] == 4  # 2 heads x 2 replicas
    assert eng.paged.k[0].sharding.spec == P("model", None, None)
    a = base.generate_one("four way", temperature=0.0, max_new_tokens=6)
    b = eng.generate_one("four way", temperature=0.0, max_new_tokens=6)
    assert a == b


def test_tp2_speculative_decode_matches_single_device(setup):
    """n-gram speculation under a model-axis mesh: the multi-query verify
    step + draft K/V scatters must be GSPMD-shardable and token-identical
    to the unsharded spec engine AND to the non-spec engine (greedy)."""
    base = build(setup)
    plain = base.generate_batch(
        ["spec tp alpha", "spec tp beta"], temperature=0.0, max_new_tokens=12
    )
    mesh = make_mesh(data=1, model=2)
    eng = build(setup, mesh=mesh, speculate_k=3)
    got = eng.generate_batch(
        ["spec tp alpha", "spec tp beta"], temperature=0.0, max_new_tokens=12
    )
    assert got == plain
    assert eng.metrics.get("spec_chunks", 0) >= 1


# ---------------------------------------------------------------------------
# Pallas-kernel TP path (ops.tp shard_map wrappers, interpret mode on the
# virtual CPU mesh): the engine must pick the kernel mesh and stay
# token-identical to the single-device kernel engine AND the XLA TP engine.
# ---------------------------------------------------------------------------


def test_tp2_pallas_kernel_path_matches(setup):
    base = build(setup, attn_impl="flash_interpret")
    mesh = make_mesh(data=1, model=2)
    eng = build(setup, mesh=mesh, attn_impl="flash_interpret")

    # The engine actually selected the shard_map kernel path.
    assert eng._kernel_mesh is mesh
    assert eng.decode_impl == "paged_interpret"
    assert eng.paged.k[0].sharding.spec == P("model", None, None)

    prompts = ["pallas tensor parallel", "second kernel request"]
    a = base.generate_batch(prompts, temperature=0.0, max_new_tokens=8)
    b = eng.generate_batch(prompts, temperature=0.0, max_new_tokens=8)
    assert a == b


def test_tp2_pallas_chunked_prefill_vision(setup):
    rng = np.random.RandomState(1)
    img = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    base = build(setup, prefill_chunk_tokens=16, attn_impl="flash_interpret")
    mesh = make_mesh(data=1, model=2)
    eng = build(
        setup, mesh=mesh, prefill_chunk_tokens=16, attn_impl="flash_interpret"
    )
    assert eng._kernel_mesh is mesh

    a = base.generate_one("describe", images=[img], temperature=0.0,
                          max_new_tokens=6)
    b = eng.generate_one("describe", images=[img], temperature=0.0,
                         max_new_tokens=6)
    assert a == b
    assert eng.metrics["prefill_chunks"] >= 2


def test_tp2_pallas_speculative(setup):
    base = build(setup, attn_impl="flash_interpret")
    plain = base.generate_batch(
        ["spec kernel alpha", "spec kernel beta"],
        temperature=0.0, max_new_tokens=12,
    )
    mesh = make_mesh(data=1, model=2)
    eng = build(
        setup, mesh=mesh, speculate_k=3, attn_impl="flash_interpret"
    )
    got = eng.generate_batch(
        ["spec kernel alpha", "spec kernel beta"],
        temperature=0.0, max_new_tokens=12,
    )
    assert got == plain
    assert eng.metrics.get("spec_chunks", 0) >= 1


def test_tp4_indivisible_heads_fall_back_to_xla(setup):
    """Head counts that neither divide nor replicate onto the axis (tiny
    config: 2 VISION heads on model=4) must NOT select the kernel mesh —
    and stay correct via GSPMD. (Decoder KV replicates fine; the vision
    tower is the indivisible component here.)"""
    mesh = make_mesh(data=1, model=4)
    eng = build(setup, mesh=mesh, attn_impl="flash_interpret")
    assert eng._kernel_mesh is None
    base = build(setup, attn_impl="flash_interpret")
    a = base.generate_one("four way kernel", temperature=0.0, max_new_tokens=6)
    b = eng.generate_one("four way kernel", temperature=0.0, max_new_tokens=6)
    assert a == b


def test_tp4_kv_replication_pallas_kernel_path(setup):
    """model=4 with 2 KV heads but 4-divisible Q/vision heads: the padded
    pool lets the shard_map Pallas kernels run (1 Q head + 1 KV replica
    per chip), token-identical to the single-device kernel engine —
    including speculation (multiquery verify) and chunked vision
    prefill."""
    import dataclasses

    cfg0, _ = setup
    cfg = dataclasses.replace(
        cfg0, vision=dataclasses.replace(cfg0.vision, num_heads=4, head_dim=8)
    )
    params = init_params(jax.random.PRNGKey(2), cfg)
    quad = (cfg, params)

    base = build(quad, attn_impl="flash_interpret", speculate_k=3,
                 prefill_chunk_tokens=16)
    mesh = make_mesh(data=1, model=4)
    eng = build(quad, mesh=mesh, attn_impl="flash_interpret", speculate_k=3,
                prefill_chunk_tokens=16)
    assert eng._kv_rep == 2
    assert eng._kernel_mesh is mesh  # kernels selected, not XLA fallback
    assert eng.paged.k[0].shape[0] == 4
    assert eng.paged.k[0].sharding.spec == P("model", None, None)

    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    a = base.generate_one("replicated kv kernels", images=[img],
                          temperature=0.0, max_new_tokens=10)
    b = eng.generate_one("replicated kv kernels", images=[img],
                         temperature=0.0, max_new_tokens=10)
    assert a == b
    assert eng.metrics.get("spec_chunks", 0) >= 1


def test_tp2_pallas_int8_kv(setup):
    """int8 paged KV under the shard_map kernel path: quantized pools AND
    their flat scale leaves shard the KV-head axis; the in-kernel int8
    dequant must stay token-identical to the single-device kernel engine."""
    base = build(setup, attn_impl="flash_interpret", kv_cache_dtype="int8")
    mesh = make_mesh(data=1, model=2)
    eng = build(setup, mesh=mesh, attn_impl="flash_interpret",
                kv_cache_dtype="int8")
    assert eng._kernel_mesh is mesh
    assert eng.paged.k_scale[0].sharding.spec == P("model")
    a = base.generate_one("int8 kernel tp", temperature=0.0, max_new_tokens=6)
    b = eng.generate_one("int8 kernel tp", temperature=0.0, max_new_tokens=6)
    assert a == b


def test_tp2_r3_sampling_surface_matches_single_device(setup):
    """Round-3 sampling features under a model-parallel mesh: seeded
    sampled streams, logprobs (wider packed fetch), penalties (donated
    [S, V] count plane — V shards over nothing, GSPMD replicates), and
    logit_bias (sparse scatter) must all be token-identical to the
    single-device engine."""
    mesh = make_mesh(data=1, model=2)

    def run(eng):
        rids = [
            eng.submit("seeded sampled", temperature=0.9, top_p=0.9,
                       seed=77, max_new_tokens=8),
            eng.submit("penalized row", temperature=0.0,
                       frequency_penalty=1.5, max_new_tokens=8),
            eng.submit("biased row", temperature=0.0,
                       logit_bias={10: -100.0}, max_new_tokens=8),
            eng.submit("logprob row", temperature=0.0, logprobs=True,
                       max_new_tokens=8),
        ]
        eng.run()
        out = []
        for rid in rids:
            req = eng.finished_request(rid)
            out.append((list(req.prior_output) + list(req.output_ids),
                        [round(x, 4) for x in req.output_logprobs]))
            eng.take_finished(rid)
        return out

    a = run(build(setup))
    b = run(build(setup, mesh=mesh))
    assert a == b
