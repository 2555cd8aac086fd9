"""OpenAI-compatible server tests (aiohttp test client + fake engine)."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer
from PIL import Image

from dots_ocr_tpu.engine.engine import RequestStats
from dots_ocr_tpu.serve.server import OpenAIServer, parse_chat_messages
from dots_ocr_tpu.utils.image_io import pil_to_base64


class FakeEngine:
    default_max_new_tokens = 64

    def __init__(self):
        self.last_stats = RequestStats(prompt_tokens=5, completion_tokens=7)
        self.batches = []

    def generate_batch(self, prompts, images_per_prompt, **kwargs):
        self.batches.append(len(prompts))
        return [f"echo:{p}|imgs:{len(imgs)}" for p, imgs in zip(prompts, images_per_prompt)]


def test_parse_chat_messages_extracts_parts():
    img_url = pil_to_base64(Image.new("RGB", (8, 8)))
    messages = [
        {"role": "system", "content": "be helpful"},
        {
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": img_url}},
                {"type": "text", "text": "<|img|><|imgpad|><|endofimg|>do ocr"},
            ],
        },
    ]
    prompt, images, system = parse_chat_messages(messages)
    assert prompt == "do ocr"
    assert len(images) == 1 and images[0].size == (8, 8)
    assert system == "be helpful"


def test_parse_chat_messages_plain_string():
    prompt, images, system = parse_chat_messages(
        [{"role": "user", "content": "hello"}]
    )
    assert prompt == "hello" and images == [] and system is None


@pytest.fixture
def server_client(event_loop=None):
    return None  # placeholder; real fixture below


async def _with_client(fn):
    engine = FakeEngine()
    server = OpenAIServer(engine, model_name="test-model", batch_window_ms=1.0)
    app = server.build_app()
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        await fn(client, engine)
    finally:
        await client.close()


def test_chat_completions_roundtrip():
    async def scenario(client, engine):
        img_url = pil_to_base64(Image.new("RGB", (8, 8)))
        payload = {
            "model": "test-model",
            "temperature": 0.1,
            "top_p": 1.0,
            "max_completion_tokens": 32,
            "messages": [
                {
                    "role": "user",
                    "content": [
                        {"type": "image_url", "image_url": {"url": img_url}},
                        {"type": "text", "text": "<|img|><|imgpad|><|endofimg|>parse"},
                    ],
                }
            ],
        }
        resp = await client.post("/v1/chat/completions", json=payload)
        assert resp.status == 200
        data = await resp.json()
        assert data["object"] == "chat.completion"
        assert data["choices"][0]["message"]["content"] == "echo:parse|imgs:1"
        assert data["usage"]["prompt_tokens"] == 5
        assert data["choices"][0]["finish_reason"] == "stop"

    asyncio.run(_with_client(scenario))


def test_health_models_metrics():
    async def scenario(client, engine):
        resp = await client.get("/health")
        assert (await resp.json())["status"] == "ok"
        resp = await client.get("/v1/models")
        data = await resp.json()
        assert data["data"][0]["id"] == "test-model"
        resp = await client.get("/metrics")
        text = await resp.text()
        assert "dots_ocr_requests_total" in text

    asyncio.run(_with_client(scenario))


def test_concurrent_requests_batched():
    async def scenario(client, engine):
        async def one(i):
            payload = {
                "messages": [{"role": "user", "content": f"q{i}"}],
                "max_tokens": 16,
            }
            resp = await client.post("/v1/chat/completions", json=payload)
            return (await resp.json())["choices"][0]["message"]["content"]

        results = await asyncio.gather(*[one(i) for i in range(6)])
        assert sorted(results) == sorted(f"echo:q{i}|imgs:0" for i in range(6))
        # at least one multi-request batch was formed
        assert max(engine.batches) >= 2

    asyncio.run(_with_client(scenario))


def test_bad_requests_return_400():
    async def scenario(client, engine):
        # missing messages
        resp = await client.post("/v1/chat/completions", json={"bogus": True})
        assert resp.status == 400
        # malformed JSON
        resp = await client.post(
            "/v1/chat/completions",
            data=b"not json",
            headers={"Content-Type": "application/json"},
        )
        assert resp.status == 400
        # no user content
        resp = await client.post(
            "/v1/chat/completions",
            json={"messages": [{"role": "system", "content": "x"}]},
        )
        assert resp.status == 400
        data = await resp.json()
        assert data["error"]["type"] == "invalid_request_error"

    asyncio.run(_with_client(scenario))


def test_continuous_engine_path():
    """Server over the continuous-batching scheduler (tiny real model)."""
    import jax

    from dots_ocr_tpu.engine.scheduler import ContinuousBatchingEngine, SchedulerConfig
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import init_params

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    engine = ContinuousBatchingEngine(
        params,
        cfg,
        sched=SchedulerConfig(
            num_pages=64, page_size=8, max_slots=4, max_pages_per_seq=16,
            prompt_bucket_step=32, vision_bucket_step=16, steps_per_sync=4,
        ),
        default_max_new_tokens=6,
    )

    async def run():
        server = OpenAIServer(engine, model_name="cb-model")
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            async def one(i):
                resp = await client.post(
                    "/v1/chat/completions",
                    json={
                        "messages": [{"role": "user", "content": f"req {i}"}],
                        "max_tokens": 5,
                        "temperature": 0,
                    },
                )
                assert resp.status == 200
                data = await resp.json()
                assert data["choices"][0]["finish_reason"] in ("stop", "length")
                return data["usage"]["completion_tokens"]

            results = await asyncio.gather(*[one(i) for i in range(5)])
            assert all(c >= 1 for c in results)
        finally:
            await client.close()

    asyncio.run(run())
    # requests drained fully and pages returned
    assert engine.allocator.free_pages == 63


def test_rejected_request_resolves_fast():
    """Regression (found live): submit-time rejections (prompt_too_long)
    never passed through step(), so their HTTP futures hung forever."""
    import jax

    from dots_ocr_tpu.engine.scheduler import ContinuousBatchingEngine, SchedulerConfig
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import init_params

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    engine = ContinuousBatchingEngine(
        params, cfg,
        sched=SchedulerConfig(
            num_pages=16, page_size=8, max_slots=2, max_pages_per_seq=4,
            prompt_bucket_step=32, vision_bucket_step=16, steps_per_sync=4,
        ),
        default_max_new_tokens=4,
    )

    async def run():
        server = OpenAIServer(engine)
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            resp = await asyncio.wait_for(
                client.post(
                    "/v1/chat/completions",
                    json={"messages": [{"role": "user", "content": "y" * 2000}],
                          "max_tokens": 4},
                ),
                timeout=10,
            )
            data = await resp.json()
            assert data["choices"][0]["finish_reason"] == "prompt_too_long"
        finally:
            await client.close()

    asyncio.run(run())


def test_error_returns_500():
    class BoomEngine(FakeEngine):
        def generate_batch(self, *a, **k):
            raise RuntimeError("boom")

    async def scenario(client, engine):
        resp = await client.post(
            "/v1/chat/completions",
            json={"messages": [{"role": "user", "content": "x"}]},
        )
        assert resp.status == 500
        data = await resp.json()
        assert "boom" in data["error"]["message"]

    async def run():
        engine = BoomEngine()
        server = OpenAIServer(engine, batch_window_ms=0.0)
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            await scenario(client, engine)
        finally:
            await client.close()

    asyncio.run(run())


def test_empty_stop_string_is_ignored():
    """''.find('') == 0 — an empty stop must not blank the completion."""
    async def scenario(client, engine):
        base = {
            "model": "m",
            "messages": [{"role": "user", "content": "empty stop probe"}],
            "max_tokens": 6, "temperature": 0,
        }
        resp = await client.post("/v1/chat/completions",
                                 json={**base, "stop": ""})
        assert resp.status == 200
        with_stop = (await resp.json())["choices"][0]["message"]["content"]
        resp2 = await client.post("/v1/chat/completions", json=base)
        without = (await resp2.json())["choices"][0]["message"]["content"]
        assert with_stop == without

    asyncio.run(_with_client(scenario))


def test_malformed_stop_token_ids_is_400():
    async def scenario(client, engine):
        for bad in (7, ["a"], [1.5], [True]):
            resp = await client.post("/v1/chat/completions", json={
                "model": "m",
                "messages": [{"role": "user", "content": "x"}],
                "max_tokens": 4, "stop_token_ids": bad,
            })
            assert resp.status == 400, bad
            data = await resp.json()
            assert data["error"]["type"] == "invalid_request_error"

    asyncio.run(_with_client(scenario))


def test_background_warmup_drains_while_serving():
    """--warmup background: the worker loop runs warm ticks on idle, the
    queue drains to zero, and a request served mid-warm still succeeds
    (the first thunk's engine-submitted warm requests drain through the
    normal step loop)."""
    import time

    import jax

    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import init_params

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    engine = ContinuousBatchingEngine(
        params,
        cfg,
        sched=SchedulerConfig(
            num_pages=64, page_size=8, max_slots=4, max_pages_per_seq=16,
            prompt_bucket_step=32, vision_bucket_step=16, steps_per_sync=4,
        ),
        default_max_new_tokens=6,
    )
    n = engine.queue_warmup(nucleus_variants=(False,))
    assert n > 1

    async def run():
        server = OpenAIServer(engine, model_name="cb-model")
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            resp = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "mid warm"}],
                    "max_tokens": 4,
                    "temperature": 0,
                },
            )
            assert resp.status == 200
            # Idle loop ticks drain the queue (tiny programs, CPU).
            deadline = time.time() + 120
            while engine.warm_pending and time.time() < deadline:
                await asyncio.sleep(0.5)
            assert engine.warm_pending == 0
            m = await (await client.get("/metrics")).text()
            assert "dots_ocr_engine_warm_pending 0" in m
        finally:
            await client.close()

    asyncio.run(run())
    # Warm requests and the real one all drained; allocator leak-free.
    assert engine.allocator.free_pages == 63


def test_n_choices_continuous_engine():
    """OpenAI `n`: n co-batched choices in one response; seeded requests
    derive choice i's seed as seed + i (distinct but reproducible)."""
    import jax

    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import init_params

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    engine = ContinuousBatchingEngine(
        params,
        cfg,
        sched=SchedulerConfig(
            num_pages=64, page_size=8, max_slots=4, max_pages_per_seq=16,
            prompt_bucket_step=32, vision_bucket_step=16, steps_per_sync=4,
        ),
        default_max_new_tokens=8,
    )

    async def run():
        server = OpenAIServer(engine, model_name="cb-model")
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            async def chat(**extra):
                resp = await client.post(
                    "/v1/chat/completions",
                    json={
                        "messages": [{"role": "user", "content": "vary me"}],
                        "max_tokens": 8, "temperature": 0.9, "top_p": 0.9,
                        **extra,
                    },
                )
                assert resp.status == 200
                return await resp.json()

            data = await chat(n=3, seed=11)
            assert [c["index"] for c in data["choices"]] == [0, 1, 2]
            texts = [c["message"]["content"] for c in data["choices"]]
            assert len(set(texts)) > 1  # sampled choices differ
            # reproducible: same seed -> same 3 choices
            again = await chat(n=3, seed=11)
            assert [c["message"]["content"] for c in again["choices"]] == texts
            # usage sums completions across choices
            assert data["usage"]["completion_tokens"] >= 3

            # invalid shapes
            resp = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "x"}],
                      "n": 99},
            )
            assert resp.status == 400
            resp = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "x"}],
                      "n": 2, "stream": True},
            )
            assert resp.status == 400
        finally:
            await client.close()

    asyncio.run(run())
    assert engine.allocator.free_pages == 63
