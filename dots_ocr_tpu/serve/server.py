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
import os
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
            lines.append(
                "dots_ocr_engine_warm_pending "
                f"{getattr(engine, 'warm_pending', 0)}"
            )
            # Per-request latency percentiles over the last-N finished
            # requests (queue/TTFT/prefill/decode split — SURVEY §5.5;
            # proves the p50 page-parse claim continuously).
            timings = list(getattr(engine, "recent_timings", ()))
            if timings:
                import numpy as _np

                for key in ("queue_ms", "ttft_ms", "prefill_ms",
                            "decode_ms", "total_ms"):
                    vals = _np.array([t[key] for t in timings])
                    for q, tag in ((50, "p50"), (95, "p95"), (99, "p99")):
                        lines.append(
                            f"dots_ocr_request_{key}_{tag} "
                            f"{float(_np.percentile(vals, q)):.1f}"
                        )
                lines.append(f"dots_ocr_request_timing_window {len(timings)}")
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


def truncate_at_stop(text: str, stops) -> tuple:
    """Cut ``text`` at the earliest stop-string match (OpenAI semantics: the
    stop string itself is excluded). Returns (text, matched: bool)."""
    best = -1
    for s in stops or []:
        i = text.find(s)
        if i >= 0 and (best < 0 or i < best):
            best = i
    return (text[:best], True) if best >= 0 else (text, False)


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

    @staticmethod
    def _bad_request(message: str) -> web.Response:
        return web.json_response(
            {"error": {"message": message, "type": "invalid_request_error"}},
            status=400,
        )

    @staticmethod
    def _validate_params(body: Dict[str, Any]) -> Optional[str]:
        """Explicit conformance: unsupported OpenAI params are REJECTED, not
        silently ignored (vLLM-parity behavior for the knobs we don't serve).
        Returns an error message or None."""
        n = body.get("n")
        if n is not None and (
            isinstance(n, bool) or not isinstance(n, int) or not 1 <= n <= 8
        ):
            return "'n' must be an integer in [1, 8]"
        if n not in (None, 1) and body.get("stream"):
            return "'n' > 1 is not supported with streaming"
        if body.get("best_of") not in (None, 1):
            return "'best_of' != 1 is not supported"
        lp = body.get("logprobs")
        if lp is not None and not isinstance(lp, bool):
            return "'logprobs' must be a boolean"
        if body.get("top_logprobs") not in (None, 0):
            return "'top_logprobs' > 0 is not supported"
        if lp and body.get("stream"):
            return "'logprobs' is not supported with streaming"
        if body.get("tools") or body.get("functions") or body.get("tool_choice"):
            return "tool / function calling is not supported"
        for knob in ("presence_penalty", "frequency_penalty"):
            v = body.get(knob)
            if v is None:
                continue
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                return f"'{knob}' must be a number"
            if not -2.0 <= float(v) <= 2.0:
                return f"'{knob}' must be in [-2, 2]"
        stop = body.get("stop")
        if stop is not None and not (
            isinstance(stop, str)
            or (isinstance(stop, list) and all(isinstance(s, str) for s in stop))
        ):
            return "'stop' must be a string or a list of strings"
        lb = body.get("logit_bias")
        if lb is not None:
            if not isinstance(lb, dict):
                return "'logit_bias' must be an object"
            if len(lb) > 32:
                return "'logit_bias' supports at most 32 entries"
            for k, v in lb.items():
                try:
                    int(k)
                except (TypeError, ValueError):
                    return "'logit_bias' keys must be token ids"
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    return "'logit_bias' values must be numbers"
                if not -100.0 <= float(v) <= 100.0:
                    return "'logit_bias' values must be in [-100, 100]"
        sd = body.get("seed")
        if sd is not None and (isinstance(sd, bool) or not isinstance(sd, int)):
            return "'seed' must be an integer"
        sti = body.get("stop_token_ids")
        if sti is not None and not (
            isinstance(sti, list)
            and all(isinstance(t, int) and not isinstance(t, bool) for t in sti)
        ):
            return "'stop_token_ids' must be a list of integers"
        return None

    def _format_logprobs(self, entries) -> Dict[str, Any]:
        """OpenAI chat logprobs shape: choices[].logprobs.content =
        [{token, logprob, bytes}]. Logprobs are the RAW model distribution
        (temperature-independent; well-defined for greedy requests)."""
        tok = getattr(self.engine, "tokenizer", None)
        content = []
        for tid, lp in entries:
            text = tok.decode([tid], skip_special_tokens=False) if tok else ""
            content.append(
                {
                    "token": text,
                    "logprob": round(float(lp), 6),
                    "bytes": list(text.encode("utf-8")),
                }
            )
        return {"content": content}

    async def handle_chat_completions(self, request: web.Request) -> web.Response:
        self.metrics.requests_total += 1
        try:
            try:
                body = await request.json()
            except (json.JSONDecodeError, ValueError) as e:
                self.metrics.requests_failed += 1
                return self._bad_request(f"invalid JSON body: {e}")
            messages = body.get("messages")
            if not isinstance(messages, list) or not messages:
                self.metrics.requests_failed += 1
                return self._bad_request("'messages' must be a non-empty list")
            err = self._validate_params(body)
            if err is not None:
                self.metrics.requests_failed += 1
                return self._bad_request(err)
            if self._cb_worker is None and (
                body.get("logprobs")
                or body.get("presence_penalty")
                or body.get("frequency_penalty")
                or body.get("logit_bias")
            ):
                self.metrics.requests_failed += 1
                return self._bad_request(
                    "'logprobs' / penalties need the continuous engine "
                    "(--engine continuous)"
                )
            prompt, images, system_prompt = parse_chat_messages(messages)
            if not prompt and not images:
                self.metrics.requests_failed += 1
                return self._bad_request("no user content in 'messages'")
            max_new = int(
                body.get("max_completion_tokens")
                or body.get("max_tokens")
                or self.engine.default_max_new_tokens
            )
            temperature = float(body.get("temperature", 0.1))
            top_p = float(body.get("top_p", 1.0))
            stop = body.get("stop")
            # Drop empty stop strings: ''.find('') == 0, so an empty stop
            # would truncate every completion to "" on the batch path.
            stop = [stop] if isinstance(stop, str) else list(stop or [])
            stop = [s for s in stop if s]
            stop_token_ids = [int(t) for t in body.get("stop_token_ids") or []]

            if body.get("stream"):
                return await self._stream_chat(
                    request, body, prompt, images, system_prompt,
                    max_new, temperature, top_p, stop, stop_token_ids,
                )

            # OpenAI `n`: fan out n submissions — the continuous engine
            # co-batches them, so n choices cost ~one request's wall time.
            # Seeded requests derive choice i's seed as seed + i (equal
            # seeds would return n identical completions).
            n_choices = int(body.get("n") or 1)
            seed = body.get("seed")
            if self._cb_worker is not None:
                from dots_ocr_tpu.serve.async_engine import Submission

                subs = [
                    Submission(
                        prompt=prompt,
                        images=images,
                        max_new_tokens=max_new,
                        temperature=temperature,
                        top_p=top_p,
                        system_prompt=system_prompt,
                        stop=stop,
                        stop_token_ids=stop_token_ids,
                        seed=(seed + ci) if seed is not None else None,
                        logprobs=bool(body.get("logprobs")),
                        presence_penalty=float(
                            body.get("presence_penalty") or 0.0
                        ),
                        frequency_penalty=float(
                            body.get("frequency_penalty") or 0.0
                        ),
                        logit_bias=(
                            {int(k): float(v)
                             for k, v in body["logit_bias"].items()}
                            if body.get("logit_bias") else None
                        ),
                    )
                    for ci in range(n_choices)
                ]
                futs = [self._cb_worker.submit(s) for s in subs]
                results = [await asyncio.wrap_future(f) for f in futs]
                choice_texts = [
                    (r["text"], r["finish_reason"]) for r in results
                ]
                choice_logprobs = [r.get("logprobs") for r in results]
                prompt_tokens = results[0]["prompt_tokens"]
                completion_tokens = sum(
                    r["completion_tokens"] for r in results
                )
                timing = results[0].get("timing") or None
            else:
                loop = asyncio.get_running_loop()
                pendings = [
                    _PendingRequest(
                        prompt=prompt,
                        images=images,
                        temperature=temperature,
                        top_p=top_p,
                        max_new_tokens=max_new,
                        system_prompt=system_prompt,
                        future=loop.create_future(),
                    )
                    for _ in range(n_choices)
                ]
                for pending in pendings:
                    await self._queue.put(pending)
                texts = [await p.future for p in pendings]
                stats = self.engine.last_stats
                prompt_tokens = stats.prompt_tokens
                completion_tokens = stats.completion_tokens
                # The micro-batch engine decodes to max_new; stop strings
                # are applied post hoc (the continuous engine stops early).
                choice_texts = [
                    (truncate_at_stop(t, stop)[0], "stop") for t in texts
                ]
                choice_logprobs = [None] * n_choices
                timing = None

            self.metrics.prompt_tokens_total += prompt_tokens
            self.metrics.completion_tokens_total += completion_tokens
            response = {
                "id": f"chatcmpl-{uuid.uuid4().hex[:24]}",
                "object": "chat.completion",
                "created": int(time.time()),
                "model": body.get("model", self.model_name),
                "choices": [
                    {
                        "index": ci,
                        "message": {"role": "assistant", "content": t},
                        "finish_reason": fr,
                        **(
                            {"logprobs": self._format_logprobs(
                                choice_logprobs[ci]
                            )}
                            if choice_logprobs[ci] is not None
                            else {}
                        ),
                    }
                    for ci, (t, fr) in enumerate(choice_texts)
                ],
                "usage": {
                    "prompt_tokens": prompt_tokens,
                    "completion_tokens": completion_tokens,
                    "total_tokens": prompt_tokens + completion_tokens,
                },
            }
            if timing:
                # Extension (OpenAI clients ignore unknown usage keys):
                # per-request queue/TTFT/prefill/decode latency split, ms.
                response["usage"]["latency"] = {
                    k: round(v, 1) for k, v in timing.items()
                }
            return web.json_response(response)
        except Exception as e:  # noqa: BLE001
            self.metrics.requests_failed += 1
            logger.exception("chat completion failed")
            return web.json_response(
                {"error": {"message": str(e), "type": type(e).__name__}}, status=500
            )

    # -- SSE streaming --------------------------------------------------------

    async def _stream_chat(
        self,
        request: web.Request,
        body: Dict[str, Any],
        prompt: str,
        images: list,
        system_prompt: Optional[str],
        max_new: int,
        temperature: float,
        top_p: float,
        stop: list,
        stop_token_ids: list,
    ) -> web.StreamResponse:
        """OpenAI `stream: true` — chat.completion.chunk SSE events.

        The continuous engine streams true per-chunk deltas (its engine
        thread fires the request's stream_cb as tokens land); the
        micro-batch engine falls back to one whole-text delta. Client
        disconnect mid-stream cancels the request (frees its KV pages).
        """
        rid = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        created = int(time.time())
        model = body.get("model", self.model_name)

        def sse(delta: Dict[str, Any], finish_reason=None, usage=None) -> bytes:
            payload: Dict[str, Any] = {
                "id": rid,
                "object": "chat.completion.chunk",
                "created": created,
                "model": model,
                "choices": [
                    {"index": 0, "delta": delta, "finish_reason": finish_reason}
                ],
            }
            if usage is not None:
                payload["usage"] = usage
            return f"data: {json.dumps(payload)}\n\n".encode()

        resp = web.StreamResponse(
            status=200,
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "X-Accel-Buffering": "no",
            },
        )
        await resp.prepare(request)
        # From here on the response is COMMITTED: any failure must be
        # reported IN-STREAM (an SSE error event + [DONE]) — letting an
        # exception escape to the outer JSON handler would write a second
        # HTTP response into the already-started chunked body, corrupting
        # the stream for the client.
        try:
            return await self._stream_chat_body(
                request, resp, sse, body, prompt, images, system_prompt,
                max_new, temperature, top_p, stop, stop_token_ids,
            )
        except (ConnectionResetError, asyncio.CancelledError):
            raise  # client went away; nothing more to write
        except Exception as e:  # noqa: BLE001
            self.metrics.requests_failed += 1
            logger.exception("streaming chat failed mid-stream")
            try:
                await resp.write(
                    b"data: "
                    + json.dumps(
                        {"error": {"message": str(e), "type": type(e).__name__}}
                    ).encode()
                    + b"\n\n"
                )
                await resp.write(b"data: [DONE]\n\n")
                await resp.write_eof()
            except Exception:  # noqa: BLE001 - stream already broken
                pass
            return resp

    async def _stream_chat_body(
        self,
        request: web.Request,
        resp: web.StreamResponse,
        sse,
        body: Dict[str, Any],
        prompt: str,
        images: list,
        system_prompt: Optional[str],
        max_new: int,
        temperature: float,
        top_p: float,
        stop: list,
        stop_token_ids: list,
    ) -> web.StreamResponse:
        include_usage = bool(
            (body.get("stream_options") or {}).get("include_usage")
        )
        await resp.write(sse({"role": "assistant", "content": ""}))

        usage = None
        if self._cb_worker is not None:
            from dots_ocr_tpu.serve.async_engine import Submission

            loop = asyncio.get_running_loop()
            deltas: asyncio.Queue = asyncio.Queue()

            def stream_cb(delta: str, finish: Optional[str]) -> None:
                # Engine thread -> event loop trampoline.
                loop.call_soon_threadsafe(deltas.put_nowait, (delta, finish))

            sub = Submission(
                prompt=prompt,
                images=images,
                max_new_tokens=max_new,
                temperature=temperature,
                top_p=top_p,
                system_prompt=system_prompt,
                stop=stop,
                stop_token_ids=stop_token_ids,
                seed=body.get("seed"),
                presence_penalty=float(body.get("presence_penalty") or 0.0),
                frequency_penalty=float(body.get("frequency_penalty") or 0.0),
                logit_bias=(
                    {int(k): float(v)
                     for k, v in body["logit_bias"].items()}
                    if body.get("logit_bias") else None
                ),
                stream_cb=stream_cb,
            )
            fut = self._cb_worker.submit(sub)
            finish_reason = "stop"
            try:
                while True:
                    delta, finish = await deltas.get()
                    if delta:
                        await resp.write(sse({"content": delta}))
                    if finish is not None:
                        finish_reason = finish
                        break
            except (ConnectionResetError, asyncio.CancelledError):
                # Client went away: stop decoding, free the slot/pages.
                self._cb_worker.cancel(sub)
                raise
            # Token accounting happens for EVERY stream (a deployment of
            # mostly-streaming clients must not report near-zero token
            # totals); the usage payload is attached only when requested.
            try:
                result = await asyncio.wrap_future(fut)
                self.metrics.prompt_tokens_total += result["prompt_tokens"]
                self.metrics.completion_tokens_total += result[
                    "completion_tokens"
                ]
                if include_usage:
                    usage = {
                        "prompt_tokens": result["prompt_tokens"],
                        "completion_tokens": result["completion_tokens"],
                        "total_tokens": result["prompt_tokens"]
                        + result["completion_tokens"],
                    }
            except Exception:  # noqa: BLE001 - error already streamed as
                self.metrics.requests_failed += 1  # the 'error' finish
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
            text, _ = truncate_at_stop(text, stop)
            if text:
                await resp.write(sse({"content": text}))
            finish_reason = "stop"
            stats = self.engine.last_stats
            self.metrics.prompt_tokens_total += stats.prompt_tokens
            self.metrics.completion_tokens_total += stats.completion_tokens
            if include_usage:
                usage = {
                    "prompt_tokens": stats.prompt_tokens,
                    "completion_tokens": stats.completion_tokens,
                    "total_tokens": stats.prompt_tokens + stats.completion_tokens,
                }

        await resp.write(sse({}, finish_reason=finish_reason, usage=usage))
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

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
    parser.add_argument(
        "--platform", type=str, default=os.environ.get("DOTS_OCR_PLATFORM"),
        help="force a JAX platform (e.g. 'cpu' for a dev server on a host "
        "whose site config force-registers a TPU plugin and overrides "
        "JAX_PLATFORMS). Must be set before the first device use.",
    )
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
    parser.add_argument(
        "--tensor-parallel-size", type=int, default=1,
        help="shard the model over this many chips (jax.sharding "
        "model-axis mesh; attention heads + paged KV pools shard per chip "
        "and the Pallas kernels run on their shard via shard_map — "
        "reference analog: vLLM --tensor-parallel-size in "
        "demo/launch_model_vllm.sh). Any remaining chips form the data "
        "axis. continuous engine only",
    )
    parser.add_argument("--num-pages", type=int, default=2048)
    parser.add_argument(
        "--page-size", type=int, default=128,
        help="KV page size in tokens. 128 measured best end-to-end on v5e "
        "(vs 64: bigger paged-attention tiles; vs 256: less dead-token "
        "DMA at short contexts) and is the alignment the int8-KV kernel "
        "needs for its f32 scale DMAs",
    )
    parser.add_argument("--max-slots", type=int, default=32)
    parser.add_argument(
        "--max-seq-tokens", type=int, default=40960,
        help="per-sequence token envelope (prompt + decode; shipping "
        "default covers the 14.4k vision prefill + 24k decode of "
        "SURVEY §5.7). Sets the paged page-table width, a compile-time "
        "shape: max_pages_per_seq = ceil(max_seq_tokens / page_size). "
        "The static-width v2 kernel bounds its page loop by each row's "
        "live length, so a wide table costs nothing at runtime",
    )
    parser.add_argument("--steps-per-sync", type=int, default=16)
    parser.add_argument(
        "--prefill-chunk-tokens", type=int, default=2048,
        help="prompts longer than this prefill in chunks interleaved with "
        "decode steps (bounds decode stalls during long vision prefills); "
        "0 = monolithic prefill",
    )
    parser.add_argument(
        "--random-tiny", action="store_true",
        help="serve a tiny random-weight model (smoke tests without weights)",
    )
    parser.add_argument(
        "--warmup", nargs="?", const="full", default=None,
        choices=("full", "background"),
        help="precompile decode/vision programs: 'full' (bare --warmup) "
        "blocks until every bucket is compiled before binding; "
        "'background' binds IMMEDIATELY and compiles decode programs on "
        "idle engine ticks (a request arriving mid-compile waits at most "
        "one program) — cuts the startup outage window to ~0",
    )
    parser.add_argument(
        "--warmup-pages", type=str, default="560x420,1540x2044",
        help="comma-separated HxW page classes the BACKGROUND warmup's "
        "engine-submitted warm requests cover (each distinct vision "
        "bucket compiles its own encoder program - include the "
        "production page size)",
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
        "--quantize", choices=["none", "int8", "int4"], default="none",
        help="weight-only quantization of the decoder. int8: per-channel "
        "scales, halves decode-time parameter HBM reads. int4: 128-group "
        "scales + Pallas grouped-dequant matmuls, halves them again "
        "(block linears only; embed/lm_head stay int8; single-chip only "
        "for now)",
    )
    parser.add_argument(
        "--vision-quantize", choices=["none", "int8"], default="none",
        help="W8A8 quantization of the vision tower's block matmuls "
        "(dynamic per-token activation int8 + int8 MXU dots at ~2x the "
        "bf16 rate; the encoder prefill is compute-bound). Opt-in: "
        "validate output quality vs the real checkpoint before enabling "
        "in production (tools/weights_day.py)",
    )
    parser.add_argument(
        "--speculate-k", type=int, default=0,
        help="n-gram speculative decoding: verify this many device-drafted "
        "tokens per decode iteration (big win on repetitive outputs like "
        "HTML tables / layout JSON; exact for greedy and "
        "distribution-preserving for sampled requests incl. top_p<1); "
        "0 = off",
    )
    parser.add_argument(
        "--spec-min-tokens-per-iter", type=float, default=1.5,
        help="adaptive speculation cut-off: disable speculation for the "
        "current load when the measured emitted-tokens-per-verify-iteration "
        "EWMA stays below this break-even (a verify iteration costs ~1.6x "
        "a plain one); re-probes when the engine drains. <= 0 disables "
        "the cut-off",
    )
    parser.add_argument(
        "--vision-attn", choices=["config", "full", "windowed"],
        default="config",
        help="vision-encoder attention policy: 'config' honors the "
        "checkpoint's config.json (window_size / fullatt_block_indexes, "
        "auto-detected); 'full' forces image-wide attention everywhere "
        "(safe, ~2x slower encoder); 'windowed' forces windowed layers on "
        "(--vision-window-patches / --vision-full-layers) — flip it only "
        "after the docs/windowed_vision.md checklist passes",
    )
    parser.add_argument(
        "--vision-window-patches", type=int, default=16,
        help="window side in RAW patches for --vision-attn windowed "
        "(16 patches = 224 px; must be a multiple of spatial_merge_size)",
    )
    parser.add_argument(
        "--vision-full-layers", type=str, default="",
        help="comma-separated layer indices that stay image-wide under "
        "--vision-attn windowed (e.g. '7,15,23,31'); empty = all windowed",
    )
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

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

    if args.vision_attn != "config":
        import dataclasses as _dc

        if args.vision_attn == "full":
            vision = _dc.replace(
                config.vision, window_size=0, full_attn_layers=()
            )
        else:  # windowed
            full = tuple(
                int(i) for i in args.vision_full_layers.split(",") if i.strip()
            )
            vision = _dc.replace(
                config.vision,
                window_size=args.vision_window_patches,
                full_attn_layers=full,
            )
        config = config.replace(vision=vision)
        logging.getLogger(__name__).info(
            "vision attention override: %s (window_size=%d patches, "
            "full layers=%s)", args.vision_attn, vision.window_size,
            vision.full_attn_layers,
        )

    if args.quantize in ("int8", "int4"):
        from dots_ocr_tpu.models.quantize import (
            quantize_decoder_params,
            quantize_decoder_params_int4,
            quantized_bytes,
        )

        if args.quantize == "int4" and args.tensor_parallel_size > 1:
            # The nibble packing interleaves input-row halves, which a
            # row-parallel shard would split incoherently.
            raise SystemExit("--quantize int4 is single-chip only for now")
        before = quantized_bytes(params)
        params = (
            quantize_decoder_params_int4(params)
            if args.quantize == "int4"
            else quantize_decoder_params(params)
        )
        logging.getLogger(__name__).info(
            "%s weight quantization: %.2f GB -> %.2f GB", args.quantize,
            before / 1e9, quantized_bytes(params) / 1e9,
        )

    if args.vision_quantize == "int8":
        from dots_ocr_tpu.models.quantize import quantize_vision_params

        params = quantize_vision_params(params)
        logging.getLogger(__name__).info(
            "vision tower quantized W8A8 (block matmuls int8 x int8; "
            "patch embed / merger stay bf16)"
        )

    mesh = None
    if args.tensor_parallel_size > 1:
        if args.engine != "continuous":
            raise SystemExit(
                "--tensor-parallel-size needs --engine continuous"
            )
        from dots_ocr_tpu.parallel.sharding import auto_mesh, shard_params

        mesh = auto_mesh(model_parallel=args.tensor_parallel_size)
        params = shard_params(params, config, mesh)
        logging.getLogger(__name__).info(
            "tensor parallel: mesh %s (params + paged KV sharded over "
            "'model')", dict(mesh.shape),
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
            mesh=mesh,
            sched=SchedulerConfig(
                num_pages=args.num_pages,
                page_size=args.page_size,
                max_slots=args.max_slots,
                steps_per_sync=args.steps_per_sync,
                max_pages_per_seq=max(
                    2, -(-args.max_seq_tokens // args.page_size)
                ),
                kv_cache_dtype=args.kv_cache_dtype,
                prefill_chunk_tokens=args.prefill_chunk_tokens,
                speculate_k=args.speculate_k,
                spec_min_tokens_per_iter=args.spec_min_tokens_per_iter,
            ),
        )
    else:
        engine = InferenceEngine(params, config, tokenizer=tokenizer)

    if args.warmup == "full":
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
    elif args.warmup == "background" and hasattr(engine, "queue_warmup"):
        sizes = []
        for part in (args.warmup_pages or "").split(","):
            part = part.strip().lower()
            if "x" in part:
                h, w = part.split("x", 1)
                sizes.append((int(h), int(w)))
        n = engine.queue_warmup(vision_sizes=tuple(sizes) or ((560, 420),))
        logging.getLogger(__name__).info(
            "background warmup: %d decode programs queued — serving now, "
            "compiling on idle engine ticks", n
        )

    OpenAIServer(
        engine, model_name=args.model_name, max_batch=args.max_batch
    ).run(host=args.host, port=args.port)


if __name__ == "__main__":
    main()
