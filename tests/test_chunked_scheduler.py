"""Chunked-prefill SCHEDULING: the engine-level integration of
decoder_prefill_extend (tests/test_chunked_prefill.py covers the primitive).

A prompt longer than prefill_chunk_tokens is admitted as a PREFILLING
request whose decoder forward runs one fixed-size chunk per scheduler step,
with decode chunks for running sequences scheduled between them — vLLM's
chunked-prefill semantics. Greedy outputs must be IDENTICAL to the
monolithic-prefill engine.
"""

import jax
import numpy as np
import pytest
from PIL import Image

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def build_engine(setup, chunk=0, **overrides):
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )

    cfg, params = setup
    kw = dict(
        num_pages=64,
        page_size=8,
        max_slots=4,
        max_pages_per_seq=32,
        prompt_bucket_step=32,
        vision_bucket_step=16,
        steps_per_sync=2,
        prefill_chunk_tokens=chunk,
    )
    kw.update(overrides)
    return ContinuousBatchingEngine(
        params, cfg, sched=SchedulerConfig(**kw), default_max_new_tokens=8
    )


LONG = "the quick brown fox jumps over the lazy dog again and again " * 2


def test_chunked_matches_monolithic_text(setup):
    mono = build_engine(setup, chunk=0)
    a = mono.generate_one(LONG, temperature=0.0, max_new_tokens=8)
    for chunk in (16, 24, 64):
        eng = build_engine(setup, chunk=chunk)
        b = eng.generate_one(LONG, temperature=0.0, max_new_tokens=8)
        assert b == a, f"chunk={chunk}"
        if len_prompt_gt(eng, LONG, chunk):
            assert eng.metrics["prefill_chunks"] >= 2, f"chunk={chunk}"
        # pages/slots fully returned
        assert eng.allocator.free_pages == 63
        assert all(r is None for r in eng._slot_req)


def len_prompt_gt(eng, prompt, chunk) -> bool:
    from dots_ocr_tpu.engine.request import prepare_request

    prepared = prepare_request(
        eng.tokenizer, eng.config, prompt, (),
        vision_bucket_step=eng.sched.vision_bucket_step,
    )
    return len(prepared.prompt_ids) > chunk


def test_chunk_size_rounds_to_page_multiple(setup):
    eng = build_engine(setup, chunk=13)  # page_size 8 -> rounds to 16
    assert eng.sched.prefill_chunk_tokens == 16


def test_chunked_matches_monolithic_vision(setup):
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    mono = build_engine(setup, chunk=0)
    a = mono.generate_one(
        "describe", images=[img], temperature=0.0, max_new_tokens=6
    )
    eng = build_engine(setup, chunk=16)
    b = eng.generate_one(
        "describe", images=[img], temperature=0.0, max_new_tokens=6
    )
    assert b == a
    assert eng.metrics["prefill_chunks"] >= 2


def test_decode_interleaves_with_prefill_chunks(setup):
    """While a long prefill is chunking, an already-running request must
    keep generating tokens BETWEEN chunks (the whole point)."""
    eng = build_engine(setup, chunk=16, steps_per_sync=1)
    short_id = eng.submit("hi", temperature=0.0, max_new_tokens=20)
    eng.step()  # admits + prefills the short request (monolithic: 2 tokens)
    assert eng._slot_req[0] is not None

    long_id = eng.submit(LONG, temperature=0.0, max_new_tokens=4)
    interleaved = 0
    for _ in range(200):
        prev = eng.metrics["generated_tokens"]
        prefilling = any(
            r is not None and r.state == "prefilling" for r in eng._slot_req
        )
        eng.step()
        if prefilling and eng.metrics["generated_tokens"] > prev:
            interleaved += 1
        if not eng.has_work():
            break
    assert interleaved >= 2, "no decode progress during the chunked prefill"

    # Both finish with the same text as a monolithic engine.
    mono = build_engine(setup, chunk=0)
    assert eng.request_text(short_id) == mono.generate_one(
        "hi", temperature=0.0, max_new_tokens=20
    )
    assert eng.request_text(long_id) == mono.generate_one(
        LONG, temperature=0.0, max_new_tokens=4
    )


def test_chunked_int8_cache(setup):
    """Chunked prefill through the int8-quantized paged cache: greedy path
    is stable for a tiny random model (logit gaps >> int8 error)."""
    a = build_engine(setup, chunk=0, kv_cache_dtype="int8").generate_one(
        LONG, temperature=0.0, max_new_tokens=6
    )
    b = build_engine(setup, chunk=16, kv_cache_dtype="int8").generate_one(
        LONG, temperature=0.0, max_new_tokens=6
    )
    assert b == a


def test_preempted_prefilling_request_recovers(setup):
    """A PREFILLING victim of page pressure restarts cleanly and still
    produces the monolithic greedy output."""
    from dots_ocr_tpu.engine.scheduler import PREFILLING

    # Tiny pool: the long request's pages force preemption pressure.
    eng = build_engine(
        setup, chunk=16, num_pages=24, max_pages_per_seq=20, steps_per_sync=4
    )
    req_id = eng.submit(LONG, temperature=0.0, max_new_tokens=4)
    # Force-preempt mid-prefill after the first chunk.
    eng.step()
    victim = next(r for r in eng._slot_req if r is not None)
    assert victim.state == PREFILLING
    eng._preempt_youngest()
    assert victim.embeds is None and victim.prefill_pos == 0
    eng.run()
    mono = build_engine(setup, chunk=0)
    assert eng.request_text(req_id) == mono.generate_one(
        LONG, temperature=0.0, max_new_tokens=4
    )


def test_batched_chunked_admission(setup):
    """Multiple queued long prompts admit in ONE embed dispatch and still
    match the monolithic engine's outputs."""
    rng = np.random.RandomState(3)
    imgs = [
        Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
        for _ in range(2)
    ]
    prompts = [LONG + " alpha", LONG + " beta"]
    mono = build_engine(setup, chunk=0)
    want = [
        mono.generate_one(prompts[i], images=[imgs[i]], temperature=0.0,
                          max_new_tokens=5)
        for i in range(2)
    ]
    eng = build_engine(setup, chunk=16)
    ids = [
        eng.submit(prompts[i], images=[imgs[i]], temperature=0.0,
                   max_new_tokens=5)
        for i in range(2)
    ]
    eng.run()
    assert [eng.request_text(r) for r in ids] == want
    # Pipelined per-request encoders: ONE admission still encodes both
    # requests (2 dispatches, one per request — request 2's upload rides
    # under request 1's encoder), in a single admission group.
    assert eng.metrics["chunk_embeds"] == 2
    # Lockstep extension: both requests advance per dispatch, so the chunk
    # count is per-GROUP, not per-request (prompts here are near-equal
    # length; a per-request loop would need ~2x the dispatches).
    from dots_ocr_tpu.engine.request import prepare_request

    plen = max(
        len(prepare_request(eng.tokenizer, eng.config, prompts[i],
                            [imgs[i]], vision_bucket_step=16).prompt_ids)
        for i in range(2)
    )
    ct = eng.sched.prefill_chunk_tokens
    assert eng.metrics["prefill_chunks"] <= -(-plen // ct) + 1
