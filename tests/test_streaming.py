"""SSE streaming + stop-sequence tests (vLLM-parity serving surface).

The reference serves through vLLM's OpenAI server, whose contract includes
`stop` sequences and `stream: true` SSE chunks
(/root/reference/dots_ocr/model/inference.py:38-43). These tests cover the
TPU rebuild's scheduler-level stop/stream machinery and the HTTP layer.
"""

import asyncio
import json

import jax
import pytest
from aiohttp.test_utils import TestClient, TestServer

from dots_ocr_tpu.engine.scheduler import ContinuousBatchingEngine, SchedulerConfig
from dots_ocr_tpu.engine.tokenizer import (
    ByteTokenizer,
    IncrementalDetokenizer,
    longest_stop_prefix_at_tail,
)
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params
from dots_ocr_tpu.serve.server import OpenAIServer, truncate_at_stop


# ---------------------------------------------------------------------------
# Incremental detokenizer
# ---------------------------------------------------------------------------


class TestIncrementalDetokenizer:
    def test_deltas_concatenate_to_full_decode(self):
        tok = ByteTokenizer()
        ids = tok.encode("hello wörld ünïcode €42")
        detok = IncrementalDetokenizer(tok)
        out = "".join(detok.push([i]) for i in ids) + detok.flush()
        assert out == tok.decode(ids)

    def test_holds_mid_utf8_character(self):
        tok = ByteTokenizer()
        ids = tok.encode("€")  # 3 UTF-8 bytes -> 3 byte tokens
        assert len(ids) == 3
        detok = IncrementalDetokenizer(tok)
        assert detok.push(ids[:1]) == ""
        assert detok.push(ids[1:2]) == ""
        assert detok.push(ids[2:]) == "€"

    def test_flush_emits_pending(self):
        tok = ByteTokenizer()
        detok = IncrementalDetokenizer(tok)
        detok.push(tok.encode("€")[:2])  # incomplete char held
        assert detok.flush() != "" or True  # flush never raises
        assert detok.flush() == ""  # second flush is empty

    def test_chunked_push_matches(self):
        tok = ByteTokenizer()
        text = "héllo — ça va? 中文 test"
        ids = tok.encode(text)
        detok = IncrementalDetokenizer(tok)
        out = ""
        for i in range(0, len(ids), 3):
            out += detok.push(ids[i : i + 3])
        out += detok.flush()
        assert out == text


def test_longest_stop_prefix_at_tail():
    assert longest_stop_prefix_at_tail("abc<|en", ["<|end|>"]) == 4
    assert longest_stop_prefix_at_tail("abc", ["<|end|>"]) == 0
    assert longest_stop_prefix_at_tail("xyz\n", ["\n\n"]) == 1
    # full match is not a *proper* prefix — the caller finds it via find()
    assert longest_stop_prefix_at_tail("ab<|end|>", ["<|end|>"]) == 0
    assert longest_stop_prefix_at_tail("a", ["ab", "a-b-c"]) == 1


def test_truncate_at_stop_earliest_match():
    assert truncate_at_stop("a STOP b HALT c", ["HALT", "STOP"]) == ("a ", True)
    assert truncate_at_stop("clean", ["STOP"]) == ("clean", False)
    assert truncate_at_stop("x", []) == ("x", False)


# ---------------------------------------------------------------------------
# Scheduler-level stop strings / stop tokens / streaming
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_engine(tiny_setup, max_new=24):
    cfg, params = tiny_setup
    return ContinuousBatchingEngine(
        params,
        cfg,
        sched=SchedulerConfig(
            num_pages=64, page_size=8, max_slots=4, max_pages_per_seq=16,
            prompt_bucket_step=32, vision_bucket_step=16, steps_per_sync=4,
        ),
        default_max_new_tokens=max_new,
    )


def test_stop_string_truncates_output(tiny_setup):
    eng = make_engine(tiny_setup)
    full = eng.generate_one("stop probe", temperature=0.0, max_new_tokens=24)
    assert len(full) >= 4, f"tiny model produced too little text: {full!r}"
    # Use a substring of the actual greedy output as the stop string.
    stop = full[2:4]
    expected = full[: full.find(stop)]
    eng2 = make_engine(tiny_setup)
    got = eng2.generate_batch(
        ["stop probe"], [[]], temperature=0.0, max_new_tokens=24, stop=[stop]
    )[0]
    assert got == expected
    assert not stop in got or full.find(stop) > 0  # stop string excluded
    req = next(iter(eng2._finished.values()))
    assert req.finished_reason == "stop"
    # The engine stopped decoding early (not at max_new_tokens) unless the
    # match landed in the final chunk.
    assert eng2.allocator.free_pages == 63


def test_stop_token_ids(tiny_setup):
    eng = make_engine(tiny_setup)
    eng.generate_one("token stop probe", temperature=0.0, max_new_tokens=12)
    req = next(iter(eng._finished.values()))
    toks = req.output_ids
    assert len(toks) >= 3
    stop_tok = toks[2]
    eng2 = make_engine(tiny_setup)
    rid = eng2.submit(
        "token stop probe", max_new_tokens=12, temperature=0.0,
        stop_token_ids=[stop_tok],
    )
    eng2.run()
    req2 = eng2._finished[rid]
    assert req2.finished_reason == "stop"
    assert req2.output_ids[-1] == stop_tok
    # Stopped at the FIRST occurrence of the stop token...
    first = toks.index(stop_tok)
    assert len(req2.output_ids) == first + 1
    # ...and the text excludes it.
    assert eng2.request_text(rid) == eng2.tokenizer.decode(
        toks[:first], skip_special_tokens=True
    )


def test_streaming_deltas_reassemble(tiny_setup):
    eng = make_engine(tiny_setup)
    expected = eng.generate_one("stream probe", temperature=0.0, max_new_tokens=16)

    events = []
    rid = eng.submit(
        "stream probe", max_new_tokens=16, temperature=0.0,
        stream_cb=lambda delta, fin: events.append((delta, fin)),
    )
    eng.run()
    finals = [f for _, f in events if f is not None]
    assert finals == [events[-1][1]]  # exactly one final, and it's last
    assert "".join(d for d, _ in events) == expected
    assert eng.request_text(rid) == expected
    # Streaming happened across multiple callbacks, not one blob.
    assert len(events) >= 2


def test_streaming_with_stop_holdback(tiny_setup):
    eng = make_engine(tiny_setup)
    full = eng.generate_one("holdback probe", temperature=0.0, max_new_tokens=24)
    assert len(full) >= 4
    stop = full[2:4]
    expected = full[: full.find(stop)]

    events = []
    eng2 = make_engine(tiny_setup)
    eng2.submit(
        "holdback probe", max_new_tokens=24, temperature=0.0, stop=[stop],
        stream_cb=lambda delta, fin: events.append((delta, fin)),
    )
    eng2.run()
    assert "".join(d for d, _ in events) == expected
    assert events[-1][1] == "stop"
    # No emitted prefix ever contained the stop string.
    acc = ""
    for d, _ in events:
        acc += d
        assert stop not in acc


def test_cancel_waiting_and_running(tiny_setup):
    eng = make_engine(tiny_setup)
    rid = eng.submit("cancel me", max_new_tokens=1000, temperature=0.0)
    eng.step()  # admit + first chunk
    assert eng.cancel(rid)
    req = eng._finished[rid]
    assert req.finished_reason == "cancelled"
    assert eng.allocator.free_pages == 63
    assert not eng.cancel(rid)  # already finished
    assert not eng.cancel(99999)


# ---------------------------------------------------------------------------
# HTTP layer: SSE + param conformance
# ---------------------------------------------------------------------------


async def _read_sse(resp):
    """Parse SSE body into (list of chunk dicts, saw_done)."""
    chunks, done = [], False
    async for line in resp.content:
        line = line.decode().strip()
        if not line.startswith("data: "):
            continue
        data = line[len("data: ") :]
        if data == "[DONE]":
            done = True
            break
        chunks.append(json.loads(data))
    return chunks, done


def test_sse_streaming_continuous_engine(tiny_setup):
    eng = make_engine(tiny_setup, max_new=8)
    expected = eng.generate_one("sse probe", temperature=0.0, max_new_tokens=8)

    async def run():
        server = OpenAIServer(eng, model_name="sse-model")
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            resp = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "sse probe"}],
                    "max_tokens": 8,
                    "temperature": 0,
                    "stream": True,
                    "stream_options": {"include_usage": True},
                },
            )
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/event-stream")
            chunks, done = await _read_sse(resp)
            assert done
            assert chunks[0]["object"] == "chat.completion.chunk"
            assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
            text = "".join(
                c["choices"][0]["delta"].get("content", "") for c in chunks
            )
            assert text == expected
            final = chunks[-1]
            assert final["choices"][0]["finish_reason"] in ("stop", "length")
            assert final["usage"]["completion_tokens"] >= 1
        finally:
            await client.close()

    asyncio.run(run())
    assert eng.allocator.free_pages == 63


def test_sse_streaming_batch_engine_fallback():
    from tests.test_server import FakeEngine

    async def run():
        server = OpenAIServer(FakeEngine(), batch_window_ms=0.0)
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            resp = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "stream": True,
                },
            )
            chunks, done = await _read_sse(resp)
            assert done
            text = "".join(
                c["choices"][0]["delta"].get("content", "") for c in chunks
            )
            assert text == "echo:hi|imgs:0"
        finally:
            await client.close()

    asyncio.run(run())


def test_stop_via_http(tiny_setup):
    eng = make_engine(tiny_setup)
    full = eng.generate_one("http stop probe", temperature=0.0, max_new_tokens=16)
    assert len(full) >= 4
    stop = full[2:4]
    expected = full[: full.find(stop)]

    async def run():
        server = OpenAIServer(eng)
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            resp = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "http stop probe"}],
                    "max_tokens": 16,
                    "temperature": 0,
                    "stop": stop,
                },
            )
            data = await resp.json()
            assert data["choices"][0]["message"]["content"] == expected
            assert data["choices"][0]["finish_reason"] == "stop"
        finally:
            await client.close()

    asyncio.run(run())


def test_unsupported_params_rejected():
    from tests.test_server import FakeEngine

    async def run():
        server = OpenAIServer(FakeEngine(), batch_window_ms=0.0)
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            base = {"messages": [{"role": "user", "content": "x"}]}
            for bad in (
                {"n": 99},
                {"n": 2, "stream": True},
                {"best_of": 4},
                {"top_logprobs": 2, "logprobs": True},
                {"tools": [{"type": "function"}]},
                {"presence_penalty": 5},
                {"frequency_penalty": "x"},
                {"seed": "abc"},
                {"logit_bias": {"x": 1}},
                {"stop": 42},
                {"stop": ["ok", 7]},
                # FakeEngine is a micro-batch engine (no continuous
                # worker): engine-gated params reject with a clear error.
                {"logprobs": True},
                {"presence_penalty": 0.5},
                {"frequency_penalty": -1},
            ):
                resp = await client.post(
                    "/v1/chat/completions", json={**base, **bad}
                )
                assert resp.status == 400, bad
                data = await resp.json()
                assert data["error"]["type"] == "invalid_request_error"
            # Supported spellings still pass (n fans out on any engine).
            for ok in ({"n": 1}, {"n": 2}, {"presence_penalty": 0},
                       {"seed": 7}, {"stop": "s"}, {"stop": ["a", "b"]}):
                resp = await client.post(
                    "/v1/chat/completions", json={**base, **ok}
                )
                assert resp.status == 200, ok
        finally:
            await client.close()

    asyncio.run(run())


def test_stop_token_text_parity_streaming_vs_plain(tiny_setup):
    """A stop TOKEN's text must be excluded consistently: the detok/stream
    path (stream_cb) and the plain request_text path must produce the same
    final text, and no streamed delta may leak the stop token."""
    eng = make_engine(tiny_setup)
    eng.generate_one("parity stop probe", temperature=0.0, max_new_tokens=12)
    toks = next(iter(eng._finished.values())).output_ids
    assert len(toks) >= 3
    stop_tok = toks[2]
    stop_text = eng.tokenizer.decode([stop_tok], skip_special_tokens=True)

    plain = make_engine(tiny_setup)
    rid_a = plain.submit("parity stop probe", max_new_tokens=12,
                         temperature=0.0, stop_token_ids=[stop_tok])
    plain.run()
    want = plain.request_text(rid_a)

    streamed = make_engine(tiny_setup)
    events = []
    rid_b = streamed.submit(
        "parity stop probe", max_new_tokens=12, temperature=0.0,
        stop_token_ids=[stop_tok],
        stream_cb=lambda delta, fin: events.append((delta, fin)),
    )
    streamed.run()
    got = streamed.request_text(rid_b)
    assert got == want
    assert "".join(d for d, _ in events) == want
    if stop_text:
        assert not "".join(d for d, _ in events).endswith(stop_text)


def test_worker_prunes_finished_requests(tiny_setup):
    """EngineWorker resolution must remove completed requests from the
    engine's finished map — retention there is an unbounded server leak."""
    from dots_ocr_tpu.serve.async_engine import EngineWorker, Submission

    eng = make_engine(tiny_setup)
    worker = EngineWorker(eng, prep_workers=0)
    try:
        for i in range(3):
            fut = worker.submit(Submission(
                prompt=f"prune probe {i}", images=(), max_new_tokens=4,
                temperature=0.0, top_p=1.0, system_prompt=None,
            ))
            assert isinstance(fut.result(timeout=120)["text"], str)
        assert len(eng._finished) == 0
    finally:
        worker.shutdown()
