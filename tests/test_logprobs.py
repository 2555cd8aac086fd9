"""OpenAI `logprobs` support (chosen-token raw-model logprobs).

The reference serves through vLLM, whose OpenAI surface returns per-token
logprobs (`/root/reference/README.md:572-595` positions vLLM as the
serving layer). The TPU engine packs the chosen token's raw-model
log-probability into the decode chunk's single fetch (bitcast int32
plane) via a static program variant, so requests that never ask for
logprobs pay nothing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params
from tests.test_seed import _drain, _engine


@pytest.fixture(scope="module")
def setup():
    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_logprobs_match_teacher_forced_recompute(setup):
    """Differential: the engine's per-token logprobs must match a
    teacher-forced dense re-run of the decoder over prompt + output."""
    from dots_ocr_tpu.models.decoder import (
        decoder_prefill,
        embed_tokens,
        logits_from_hidden,
    )

    cfg, params = setup
    eng = _engine(cfg, params)
    rid = eng.submit("check my logprobs", temperature=0.0,
                     max_new_tokens=8, logprobs=True)
    _drain(eng)
    req = eng.finished_request(rid)
    toks = list(req.prior_output) + list(req.output_ids)
    lps = list(req.output_logprobs)
    assert len(lps) == len(toks) >= 2
    eng.take_finished(rid)

    ids = np.asarray([req.prompt_ids + toks], np.int32)
    t = ids.shape[1]
    hidden, _ = decoder_prefill(
        params["decoder"], cfg.decoder,
        embed_tokens(params["decoder"], jnp.asarray(ids)).astype(jnp.float32),
        jnp.arange(t)[None, :], jnp.asarray([t]),
    )
    logits = np.asarray(
        logits_from_hidden(params["decoder"], cfg.decoder, hidden)
    )[0]
    plen = len(req.prompt_ids)
    want = []
    for k, tok in enumerate(toks):
        row = logits[plen - 1 + k].astype(np.float64)
        want.append(row[tok] - np.log(np.exp(row - row.max()).sum())
                    - row.max())
    # paged decode vs dense teacher-forcing: bf16-path noise only
    np.testing.assert_allclose(lps, want, rtol=0.02, atol=0.05)


def test_logprobs_do_not_perturb_neighbors(setup):
    """A logprobs request co-batched with a plain greedy request must not
    change the neighbor's output (same program semantics, wider fetch)."""
    cfg, params = setup
    solo = _engine(cfg, params).generate_one(
        "neighbor text", temperature=0.0, max_new_tokens=8
    )
    eng = _engine(cfg, params)
    rid_lp = eng.submit("check my logprobs", temperature=0.0,
                        max_new_tokens=8, logprobs=True)
    rid_plain = eng.submit("neighbor text", temperature=0.0,
                           max_new_tokens=8)
    _drain(eng)
    assert len(eng.finished_request(rid_lp).output_logprobs) >= 1
    assert eng.finished_request(rid_plain).output_logprobs == []
    eng.take_finished(rid_lp)
    assert eng.take_finished(rid_plain) == solo


def test_logprobs_disable_speculation_but_stay_exact(setup):
    """Speculative engines serve logprobs requests on plain chunks:
    spec_chunks stays 0 while the request is active, greedy text exact."""
    cfg, params = setup
    want = _engine(cfg, params).generate_one(
        "spec vs logprobs", temperature=0.0, max_new_tokens=10
    )
    eng = _engine(cfg, params, speculate_k=3, repetition_min_repeats=0)
    rid = eng.submit("spec vs logprobs", temperature=0.0,
                     max_new_tokens=10, logprobs=True)
    _drain(eng)
    req = eng.finished_request(rid)
    assert len(req.output_logprobs) == (
        len(req.prior_output) + len(req.output_ids)
    )
    assert eng.metrics.get("spec_chunks", 0) == 0
    assert eng.take_finished(rid) == want


def test_http_logprobs_surface(setup):
    """HTTP layer: logprobs content entries align with the completion;
    top_logprobs > 0 and stream+logprobs are rejected."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from dots_ocr_tpu.serve.server import OpenAIServer

    cfg, params = setup
    eng = _engine(cfg, params)
    server = OpenAIServer(eng, model_name="tiny")

    async def run():
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            resp = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "lp please"}],
                      "max_tokens": 6, "temperature": 0, "logprobs": True},
            )
            assert resp.status == 200
            data = await resp.json()
            choice = data["choices"][0]
            content = choice["logprobs"]["content"]
            assert len(content) >= 1
            for entry in content:
                assert entry["logprob"] <= 0.0
                assert isinstance(entry["bytes"], list)
            # tokens concatenate to the message text
            assert "".join(e["token"] for e in content) == (
                choice["message"]["content"]
            )

            resp = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "x"}],
                      "logprobs": True, "top_logprobs": 2},
            )
            assert resp.status == 400
            resp = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "x"}],
                      "logprobs": True, "stream": True},
            )
            assert resp.status == 400
        finally:
            await client.close()

    asyncio.run(run())
