"""OpenAI-compatible HTTP serving front end over the TPU engine.

The reference serves through vLLM's OpenAI server
(``docker/docker-compose.yml:35-40``); this module is its TPU-native
replacement, preserving the wire shape the reference client sends
(``dots_ocr/model/inference.py:20-44``): POST ``/v1/chat/completions`` with
an ``image_url`` data-URL part and a text part that starts with the literal
``<|img|><|imgpad|><|endofimg|>`` placeholder.

Serving model (round 1): an asyncio micro-batcher — requests land in a
queue; a worker drains up to ``max_batch`` of them per step and executes one
batched ``engine.generate_batch`` in a thread executor. The paged-KV
continuous-batching scheduler (``engine/scheduler.py``) replaces the inner
execution as it lands; the HTTP surface stays identical.

Endpoints: /v1/chat/completions, /v1/models, /health, /metrics.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from aiohttp import web

from dots_ocr_tpu.engine.chat_template import IMAGE_PLACEHOLDER
from dots_ocr_tpu.utils.image_io import base64_to_pil, fetch_image

logger = logging.getLogger(__name__)


@dataclass
class ServerMetrics:
    requests_total: int = 0
    requests_failed: int = 0
    prompt_tokens_total: int = 0
    completion_tokens_total: int = 0
    batches_total: int = 0
    batch_size_sum: int = 0
    started_at: float = field(default_factory=time.time)

    def render(self, engine=None) -> str:
        lines = [
            f"dots_ocr_requests_total {self.requests_total}",
            f"dots_ocr_requests_failed {self.requests_failed}",
            f"dots_ocr_prompt_tokens_total {self.prompt_tokens_total}",
            f"dots_ocr_completion_tokens_total {self.completion_tokens_total}",
            f"dots_ocr_batches_total {self.batches_total}",
            f"dots_ocr_batch_size_sum {self.batch_size_sum}",
            f"dots_ocr_uptime_seconds {time.time() - self.started_at:.1f}",
        ]
        # Continuous-batching scheduler gauges (KV occupancy, preemptions...).
        if engine is not None and hasattr(engine, "allocator"):
            alloc = engine.allocator
            used = alloc.num_pages - 1 - alloc.free_pages
            lines += [
                f"dots_ocr_kv_pages_used {used}",
                f"dots_ocr_kv_pages_total {alloc.num_pages - 1}",
                f"dots_ocr_kv_occupancy {used / max(1, alloc.num_pages - 1):.4f}",
            ]
            for key, value in getattr(engine, "metrics", {}).items():
                lines.append(f"dots_ocr_engine_{key} {value}")
        return "\n".join(lines) + "\n"


@dataclass
class _PendingRequest:
    prompt: str
    images: list
    temperature: float
    top_p: float
    max_new_tokens: int
    system_prompt: Optional[str]
    future: asyncio.Future


def parse_chat_messages(messages: List[Dict[str, Any]]):
    """Extract (prompt_text, images, system_prompt) from OpenAI messages.

    The literal image placeholder in the text is removed — the engine
    re-inserts the expanded span per image (chat_template.build_prompt_ids).
    """
    system_prompt = None
    prompt_parts: List[str] = []
    images = []
    for message in messages:
        role = message.get("role")
        content = message.get("content")
        if role == "system":
            system_prompt = content if isinstance(content, str) else str(content)
            continue
        if role != "user":
            continue
        if isinstance(content, str):
            prompt_parts.append(content)
            continue
        for part in content or []:
            ptype = part.get("type")
            if ptype == "text":
                prompt_parts.append(part.get("text", ""))
            elif ptype == "image_url":
                url = (part.get("image_url") or {}).get("url", "")
                if url.startswith("data:image"):
                    images.append(base64_to_pil(url))
                else:
                    images.append(fetch_image(url))
    prompt = "".join(prompt_parts).replace(IMAGE_PLACEHOLDER, "")
    return prompt, images, system_prompt


class OpenAIServer:
    def __init__(
        self,
        engine,
        model_name: str = "model",
        max_batch: int = 8,
        batch_window_ms: float = 5.0,
    ):
        self.engine = engine
        self.model_name = model_name
        self.max_batch = max_batch
        self.batch_window_ms = batch_window_ms
        self.metrics = ServerMetrics()
        self._queue: asyncio.Queue = asyncio.Queue()
        self._worker_task = None
        # Continuous-batching engines get a dedicated engine thread; the
        # sync engine uses the asyncio micro-batcher below.
        self._cb_worker = None
        if hasattr(engine, "step") and hasattr(engine, "submit"):
            from dots_ocr_tpu.serve.async_engine import EngineWorker

            self._cb_worker = EngineWorker(engine)

    # -- batching worker ----------------------------------------------------

    async def _worker(self):
        while True:
            first: _PendingRequest = await self._queue.get()
            batch = [first]
            if self.batch_window_ms > 0:
                await asyncio.sleep(self.batch_window_ms / 1000.0)
            while len(batch) < self.max_batch:
                try:
                    batch.append(self._queue.get_nowait())
                except asyncio.QueueEmpty:
                    break
            await self._run_batch(batch)

    async def _run_batch(self, batch: List[_PendingRequest]):
        loop = asyncio.get_running_loop()
        self.metrics.batches_total += 1
        self.metrics.batch_size_sum += len(batch)
        max_new = max(r.max_new_tokens for r in batch)
        # System prompts must match to batch; split otherwise.
        sys_prompts = {r.system_prompt for r in batch}
        if len(sys_prompts) > 1:
            for r in batch:
                await self._run_batch([r])
            return
        try:
            texts = await loop.run_in_executor(
                None,
                lambda: self.engine.generate_batch(
                    [r.prompt for r in batch],
                    [r.images for r in batch],
                    temperature=[r.temperature for r in batch],
                    top_p=[r.top_p for r in batch],
                    max_new_tokens=max_new,
                    system_prompt=batch[0].system_prompt,
                ),
            )
            for r, text in zip(batch, texts):
                if not r.future.done():
                    r.future.set_result(text)
        except Exception as e:  # noqa: BLE001
            logger.exception("batch execution failed")
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)

    # -- handlers -----------------------------------------------------------

    async def handle_chat_completions(self, request: web.Request) -> web.Response:
        self.metrics.requests_total += 1
        try:
            try:
                body = await request.json()
            except (json.JSONDecodeError, ValueError) as e:
                self.metrics.requests_failed += 1
                return web.json_response(
                    {"error": {"message": f"invalid JSON body: {e}",
                               "type": "invalid_request_error"}},
                    status=400,
                )
            messages = body.get("messages")
            if not isinstance(messages, list) or not messages:
                self.metrics.requests_failed += 1
                return web.json_response(
                    {"error": {"message": "'messages' must be a non-empty list",
                               "type": "invalid_request_error"}},
                    status=400,
                )
            prompt, images, system_prompt = parse_chat_messages(messages)
            if not prompt and not images:
                self.metrics.requests_failed += 1
                return web.json_response(
                    {"error": {"message": "no user content in 'messages'",
                               "type": "invalid_request_error"}},
                    status=400,
                )
            max_new = int(
                body.get("max_completion_tokens")
                or body.get("max_tokens")
                or self.engine.default_max_new_tokens
            )
            temperature = float(body.get("temperature", 0.1))
            top_p = float(body.get("top_p", 1.0))

            if self._cb_worker is not None:
                from dots_ocr_tpu.serve.async_engine import Submission

                sub = Submission(
                    prompt=prompt,
                    images=images,
                    max_new_tokens=max_new,
                    temperature=temperature,
                    top_p=top_p,
                    system_prompt=system_prompt,
                )
                result = await asyncio.wrap_future(self._cb_worker.submit(sub))
                text = result["text"]
                prompt_tokens = result["prompt_tokens"]
                completion_tokens = result["completion_tokens"]
                finish_reason = result["finish_reason"]
            else:
                pending = _PendingRequest(
                    prompt=prompt,
                    images=images,
                    temperature=temperature,
                    top_p=top_p,
                    max_new_tokens=max_new,
                    system_prompt=system_prompt,
                    future=asyncio.get_running_loop().create_future(),
                )
                await self._queue.put(pending)
                text = await pending.future
                stats = self.engine.last_stats
                prompt_tokens = stats.prompt_tokens
                completion_tokens = stats.completion_tokens
                finish_reason = "stop"

            self.metrics.prompt_tokens_total += prompt_tokens
            self.metrics.completion_tokens_total += completion_tokens
            response = {
                "id": f"chatcmpl-{uuid.uuid4().hex[:24]}",
                "object": "chat.completion",
                "created": int(time.time()),
                "model": body.get("model", self.model_name),
                "choices": [
                    {
                        "index": 0,
                        "message": {"role": "assistant", "content": text},
                        "finish_reason": finish_reason,
                    }
                ],
                "usage": {
                    "prompt_tokens": prompt_tokens,
                    "completion_tokens": completion_tokens,
                    "total_tokens": prompt_tokens + completion_tokens,
                },
            }
            return web.json_response(response)
        except Exception as e:  # noqa: BLE001
            self.metrics.requests_failed += 1
            logger.exception("chat completion failed")
            return web.json_response(
                {"error": {"message": str(e), "type": type(e).__name__}}, status=500
            )

    async def handle_models(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": self.model_name,
                        "object": "model",
                        "owned_by": "dots_ocr_tpu",
                    }
                ],
            }
        )

    async def handle_health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def handle_metrics(self, request: web.Request) -> web.Response:
        return web.Response(
            text=self.metrics.render(self.engine), content_type="text/plain"
        )

    # -- app ----------------------------------------------------------------

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=256 * 1024 * 1024)
        app.router.add_post("/v1/chat/completions", self.handle_chat_completions)
        app.router.add_get("/v1/models", self.handle_models)
        app.router.add_get("/health", self.handle_health)
        app.router.add_get("/metrics", self.handle_metrics)

        async def on_startup(app):
            if self._cb_worker is None:
                self._worker_task = asyncio.create_task(self._worker())

        async def on_cleanup(app):
            if self._worker_task:
                self._worker_task.cancel()
            if self._cb_worker is not None:
                self._cb_worker.shutdown()

        app.on_startup.append(on_startup)
        app.on_cleanup.append(on_cleanup)
        return app

    def run(self, host: str = "0.0.0.0", port: int = 8000):
        web.run_app(self.build_app(), host=host, port=port)


def main(argv=None):
    import argparse

    if not logging.getLogger().handlers:
        logging.basicConfig(
            level=logging.INFO,
            format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        )

    parser = argparse.ArgumentParser(description="dots_ocr_tpu OpenAI-compatible server")
    parser.add_argument("--weights", type=str, default=None, help="checkpoint dir")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model-name", type=str, default="model")
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument(
        "--engine", choices=["continuous", "batch"], default="continuous",
        help="continuous = paged KV + continuous batching (production); "
        "batch = simple micro-batched generate loop",
    )
    parser.add_argument("--num-pages", type=int, default=1024)
    parser.add_argument("--page-size", type=int, default=256)
    parser.add_argument("--max-slots", type=int, default=32)
    parser.add_argument("--steps-per-sync", type=int, default=16)
    parser.add_argument(
        "--random-tiny", action="store_true",
        help="serve a tiny random-weight model (smoke tests without weights)",
    )
    parser.add_argument(
        "--warmup", action="store_true",
        help="precompile the common prompt/vision buckets before binding",
    )
    parser.add_argument(
        "--compile-cache", type=str, default=None,
        help="persistent XLA compilation cache dir (fast restarts)",
    )
    parser.add_argument(
        "--kv-cache-dtype", choices=["bf16", "int8"], default="bf16",
        help="paged KV cache storage dtype (int8 = ~2x context capacity, "
        "continuous engine only)",
    )
    parser.add_argument(
        "--quantize", choices=["none", "int8"], default="none",
        help="weight-only quantization of the decoder (int8 per-channel "
        "scales; halves decode-time parameter HBM reads)",
    )
    args = parser.parse_args(argv)

    if args.compile_cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dots_ocr_tpu.engine.engine import InferenceEngine
    from dots_ocr_tpu.engine.tokenizer import load_tokenizer
    from dots_ocr_tpu.models.config import DotsOCRConfig

    if args.random_tiny:
        config = DotsOCRConfig.tiny()
        from dots_ocr_tpu.models.init import init_params

        import jax

        params = init_params(jax.random.PRNGKey(0), config)
        tokenizer = None
    else:
        if not args.weights:
            raise SystemExit("--weights is required (or use --random-tiny)")
        from dots_ocr_tpu.models.loader import load_checkpoint

        config, params = load_checkpoint(args.weights)
        tokenizer = load_tokenizer(args.weights)

    if args.quantize == "int8":
        from dots_ocr_tpu.models.quantize import (
            quantize_decoder_params,
            quantized_bytes,
        )

        before = quantized_bytes(params)
        params = quantize_decoder_params(params)
        logging.getLogger(__name__).info(
            "int8 weight quantization: %.2f GB -> %.2f GB",
            before / 1e9, quantized_bytes(params) / 1e9,
        )

    if args.engine == "continuous":
        from dots_ocr_tpu.engine.scheduler import (
            ContinuousBatchingEngine,
            SchedulerConfig,
        )

        engine = ContinuousBatchingEngine(
            params,
            config,
            tokenizer=tokenizer,
            sched=SchedulerConfig(
                num_pages=args.num_pages,
                page_size=args.page_size,
                max_slots=args.max_slots,
                steps_per_sync=args.steps_per_sync,
                max_pages_per_seq=max(
                    1, (args.num_pages // 2) // max(args.max_slots // 4, 1)
                ),
                kv_cache_dtype=args.kv_cache_dtype,
            ),
        )
    else:
        engine = InferenceEngine(params, config, tokenizer=tokenizer)

    if args.warmup:
        import numpy as _np
        from PIL import Image as _Image

        logging.getLogger(__name__).info("warmup: compiling common buckets...")
        dummy = _Image.fromarray(
            _np.zeros((560, 420, 3), _np.uint8)
        )
        engine.generate_batch(
            ["warmup", "warmup"], [[dummy], []],
            temperature=0.0, max_new_tokens=8,
        )
        if hasattr(engine, "warmup_decode"):
            # precompile every page-table width bucket so no request ever
            # hits an XLA compile mid-decode (see scheduler.warmup_decode)
            n = engine.warmup_decode()
            logging.getLogger(__name__).info(
                "warmup: %d decode width buckets compiled", n
            )
        logging.getLogger(__name__).info("warmup complete")

    OpenAIServer(
        engine, model_name=args.model_name, max_batch=args.max_batch
    ).run(host=args.host, port=args.port)


if __name__ == "__main__":
    main()
