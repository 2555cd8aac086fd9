"""Per-request `seed` + scheduling-invariant sampling.

The reference serves through vLLM, whose OpenAI surface honors a
per-request ``seed`` (the reference client could send it via
``inference_with_vllm``'s OpenAI call, /root/reference/dots_ocr/model/
inference.py:38-43). The TPU engine rebuilds it stronger: every request
carries its own PRNG key and each draw folds in the absolute position of
the emitted token (engine/sampling.fold_positions), so a seeded request's
sampled stream is bit-reproducible REGARDLESS of co-batched requests,
chunk boundaries, or preemption/replay — properties vLLM's per-request
CPU generators cannot give under recompute-preemption.
"""

import jax
import numpy as np
import pytest

from dots_ocr_tpu.engine.scheduler import (
    ContinuousBatchingEngine,
    SchedulerConfig,
)
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _engine(cfg, params, num_pages=96, **overrides):
    sched = SchedulerConfig(
        num_pages=num_pages,
        page_size=8,
        max_slots=4,
        max_pages_per_seq=8,
        prompt_bucket_step=32,
        vision_bucket_step=16,
        steps_per_sync=4,
        **overrides,
    )
    return ContinuousBatchingEngine(
        params, cfg, sched=sched, default_max_new_tokens=16
    )


def _drain(eng):
    while eng.has_work():
        eng.step()


def _tokens_of(eng, rid):
    req = eng.finished_request(rid)
    toks = list(req.prior_output) + list(req.output_ids)
    eng.take_finished(rid)  # drain the finished map (leak discipline)
    return toks, req


def _run_one(eng, prompt, seed, max_new=14):
    rid = eng.submit(prompt, temperature=0.9, top_p=0.9, seed=seed,
                     max_new_tokens=max_new)
    _drain(eng)
    return _tokens_of(eng, rid)[0]


def test_seeded_request_invariant_to_cobatching(setup):
    """Same seeded request: alone vs co-batched with three other sampled
    requests — identical token stream (the whole point of the design)."""
    cfg, params = setup
    eng = _engine(cfg, params)
    alone = _run_one(eng, "the quick brown fox", seed=42)

    rid = eng.submit("the quick brown fox", temperature=0.9, top_p=0.9,
                     seed=42, max_new_tokens=14)
    others = [
        eng.submit(f"other request {i}", temperature=0.9, top_p=0.9,
                   max_new_tokens=14)
        for i in range(3)
    ]
    _drain(eng)
    got = _tokens_of(eng, rid)[0]
    for o in others:
        eng.take_finished(o)
    assert got == alone


def test_same_seed_across_engine_instances(setup):
    cfg, params = setup
    a = _run_one(_engine(cfg, params), "reproducible stream", seed=7)
    b = _run_one(_engine(cfg, params), "reproducible stream", seed=7)
    c = _run_one(_engine(cfg, params), "reproducible stream", seed=8)
    assert a == b
    assert a != c  # astronomically unlikely to collide


def test_full_vocab_rows_also_reproducible(setup):
    """top_p = 1 rows (the layout/OCR default) use the full-vocab draw."""
    cfg, params = setup
    eng1, eng2 = _engine(cfg, params), _engine(cfg, params)

    def run(eng):
        rid = eng.submit("full vocab sampling", temperature=1.0, top_p=1.0,
                         seed=123, max_new_tokens=12)
        _drain(eng)
        return _tokens_of(eng, rid)[0]

    assert run(eng1) == run(eng2)


def test_preemption_replays_identical_stream(setup):
    """Recompute-preemption replays a seeded request BIT-IDENTICALLY:
    prompt := prompt + generated-so-far keeps absolute positions aligned,
    and draws key off fold_in(request_key, position)."""
    cfg, params = setup
    # Roomy pool: the undisturbed reference stream.
    ref = _run_one(_engine(cfg, params), "preempt me please", seed=99,
                   max_new=20)

    # Fault-inject the preemption mid-decode (deterministic — organic
    # pool pressure depends on admission pacing): run a few chunks, evict
    # the youngest (our seeded request), let the engine replay it.
    eng = _engine(cfg, params)
    rid = eng.submit("preempt me please", temperature=0.9, top_p=0.9,
                     seed=99, max_new_tokens=20)
    eng.step()  # prefill + first decode chunk
    eng.step()
    req_live = eng.finished_request(rid)
    assert req_live is None, "must still be mid-decode for the injection"
    eng._preempt_youngest()
    assert eng.metrics["preemptions"] == 1
    _drain(eng)
    got, req = _tokens_of(eng, rid)
    assert req.preempted == 1
    assert got == ref


def test_unseeded_requests_draw_distinct_streams(setup):
    """Two identical unseeded sampled requests in one wave must NOT be
    token-identical (per-slot keys split from the engine key)."""
    cfg, params = setup
    eng = _engine(cfg, params)
    r1 = eng.submit("identical prompt", temperature=1.0, top_p=1.0,
                    max_new_tokens=12)
    r2 = eng.submit("identical prompt", temperature=1.0, top_p=1.0,
                    max_new_tokens=12)
    _drain(eng)
    t1 = _tokens_of(eng, r1)[0]
    t2 = _tokens_of(eng, r2)[0]
    assert t1 != t2


def test_greedy_ignores_seed(setup):
    cfg, params = setup
    eng = _engine(cfg, params)
    a = eng.generate_one("greedy text", temperature=0.0, max_new_tokens=8)
    rid = eng.submit("greedy text", temperature=0.0, seed=5,
                     max_new_tokens=8)
    _drain(eng)
    b = eng.take_finished(rid)
    assert a == b


def test_http_seed_validation_and_reproducibility():
    """Server layer: 'seed' must be an integer; equal seeds give equal
    completions through the full HTTP submission path."""
    from dots_ocr_tpu.serve.server import OpenAIServer

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = _engine(cfg, params)
    server = OpenAIServer(eng, model_name="tiny")
    assert server._validate_params({"seed": "abc"}) is not None
    assert server._validate_params({"seed": True}) is not None
    assert server._validate_params({"seed": 42}) is None
    assert server._validate_params({}) is None


def test_seed_sequence_matches_serial_generate_one(setup):
    """generate_batch(seed=[s0, s1, ...]) must reproduce, bit-for-bit,
    what serial generate_one(seed=si) calls produce — the contract the
    parser's batched local-PDF path relies on (each page keeps its
    seed + page_no stream regardless of co-batching)."""
    cfg, params = setup
    serial = []
    for s in (100, 101, 102):
        eng = _engine(cfg, params)
        serial.append(
            eng.generate_one(
                "page text here", temperature=0.9, top_p=0.9, seed=s,
                max_new_tokens=12,
            )
        )
    eng = _engine(cfg, params)
    batched = eng.generate_batch(
        ["page text here"] * 3,
        [[], [], []],
        temperature=0.9,
        top_p=0.9,
        seed=[100, 101, 102],
        max_new_tokens=12,
    )
    assert batched == serial
    # distinct seeds -> distinct streams (sanity on the fixture)
    assert len(set(serial)) > 1
    with pytest.raises(ValueError, match="seed sequence length"):
        eng.generate_batch(["a", "b"], [[], []], seed=[1])
