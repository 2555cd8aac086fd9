"""Pipelined decode (lookahead-1): dispatch chunk N+1 before fetching N.

The pipeline must be output-invariant: decode is deterministic given the
carry, so overlapping the fetch with the next chunk's execution may change
WHEN the host learns a token, never WHICH token. These tests pin:

  * the pipeline actually engages on a clean multi-chunk workload
    (``pipelined_chunks`` metric),
  * greedy outputs are token-identical with pipelining on vs off,
  * rows finishing mid-pipeline (mixed budgets) drain correctly and the
    allocator ends leak-free (deferred page frees flushed),
  * a request arriving mid-decode drains the pipeline before admission
    (slot/page reuse safety) and still completes.
"""

import jax
import pytest

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def build(setup, pipeline: bool, **overrides):
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )

    cfg, params = setup
    kw = dict(
        num_pages=96,
        page_size=8,
        max_slots=4,
        max_pages_per_seq=16,
        prompt_bucket_step=32,
        vision_bucket_step=16,
        steps_per_sync=2,
        max_steps_per_sync=8,
        prefill_chunk_tokens=64,
        speculate_k=0,
        repetition_min_repeats=0,
        pipeline_decode=pipeline,
    )
    kw.update(overrides)
    return ContinuousBatchingEngine(
        params, cfg, sched=SchedulerConfig(**kw), default_max_new_tokens=48
    )


PROMPTS = ["alpha beta", "gamma delta epsilon", "zeta", "eta theta"]


def run_wave(eng, max_news):
    rids = [
        eng.submit(p, temperature=0.0, max_new_tokens=mn)
        for p, mn in zip(PROMPTS, max_news)
    ]
    done = []
    while eng.has_work():
        done.extend(eng.step())
    return rids, {r.req_id: r for r in done}


def test_pipeline_engages_and_matches(setup):
    eng_on = build(setup, pipeline=True)
    _, done_on = run_wave(eng_on, [48, 48, 48, 48])
    assert eng_on.metrics.get("pipelined_chunks", 0) > 0, (
        "clean equal-budget wave should pipeline"
    )
    eng_off = build(setup, pipeline=False)
    _, done_off = run_wave(eng_off, [48, 48, 48, 48])
    assert eng_off.metrics.get("pipelined_chunks", 0) == 0
    assert len(done_on) == len(done_off) == 4
    assert sorted(tuple(r.output_ids) for r in done_on.values()) == sorted(
        tuple(r.output_ids) for r in done_off.values()
    )


def test_mixed_budgets_finish_mid_pipeline(setup):
    eng = build(setup, pipeline=True)
    budgets = [6, 40, 40, 40]
    _, done = run_wave(eng, budgets)
    assert len(done) == 4
    # Greedy zero-weight decode is deterministic and no stop token can fire,
    # so each request must emit exactly its budget (the `or all(...)`
    # fallback that used to sit here was vacuously true — ADVICE r4).
    assert sorted(len(r.output_ids) for r in done.values()) == sorted(budgets)
    # allocator leak-free: deferred frees flushed once the pipeline drained
    assert eng._inflight is None
    assert not eng._deferred_free
    assert eng.allocator.free_pages == eng.sched.num_pages - 1  # null page
    # identical outputs vs non-pipelined run
    eng2 = build(setup, pipeline=False)
    _, done2 = run_wave(eng2, budgets)
    assert sorted(tuple(r.output_ids) for r in done.values()) == sorted(
        tuple(r.output_ids) for r in done2.values()
    )


def test_admission_mid_decode_drains_pipeline(setup):
    eng = build(setup, pipeline=True)
    done = []
    for p in PROMPTS[:3]:
        eng.submit(p, temperature=0.0, max_new_tokens=32)
    for _ in range(6):
        if eng.has_work():
            done.extend(eng.step())
    eng.submit("late arrival", temperature=0.0, max_new_tokens=16)
    while eng.has_work():
        done.extend(eng.step())
    assert len(done) == 4
    assert all(r.finished_reason in ("stop", "length") for r in done)
    assert eng._inflight is None and not eng._deferred_free
