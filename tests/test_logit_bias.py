"""OpenAI `logit_bias`: per-request sparse (token id, bias) pairs applied
at every sampling step, first token included.

Unlike the penalties, the bias is position-independent, so it composes
with n-gram speculation: the verify applies the same bias per column and
acceptance stays exact (pinned below).
"""

import jax
import pytest

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params
from tests.test_seed import _drain, _engine


@pytest.fixture(scope="module")
def setup():
    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _run(eng, prompt, **kw):
    rid = eng.submit(prompt, temperature=0.0, max_new_tokens=6, **kw)
    _drain(eng)
    toks = eng.finished_request(rid).output_ids
    eng.take_finished(rid)
    return toks


def test_ban_token_first_token_included(setup):
    """-100 on the greedy loop token: it must never appear — including as
    the FIRST token (prefill applies the bias too)."""
    cfg, params = setup
    eng = _engine(cfg, params)
    plain = _run(eng, "bias me")
    loop_tok = plain[0]
    assert all(t == loop_tok for t in plain)  # tiny model loops greedily
    biased = _run(eng, "bias me", logit_bias={loop_tok: -100.0})
    assert loop_tok not in biased


def test_boost_token_dominates(setup):
    cfg, params = setup
    eng = _engine(cfg, params)
    target = 42
    toks = _run(eng, "boost", logit_bias={target: 100.0})
    assert all(t == target for t in toks)


def test_bias_composes_with_speculation_exactly(setup):
    cfg, params = setup
    eng = _engine(cfg, params)
    plain = _run(eng, "bias me")
    want = _run(eng, "bias me", logit_bias={plain[0]: -100.0})
    eng_spec = _engine(cfg, params, speculate_k=3, repetition_min_repeats=0)
    got = _run(eng_spec, "bias me", logit_bias={plain[0]: -100.0})
    assert eng_spec.metrics.get("spec_chunks", 0) >= 1  # spec stayed ON
    assert got == want


def test_submit_rejects_oversized_bias(setup):
    cfg, params = setup
    eng = _engine(cfg, params)
    with pytest.raises(ValueError):
        eng.submit("too many", logit_bias={i: 1.0 for i in range(64)})


def test_out_of_vocab_ids_inert(setup):
    cfg, params = setup
    eng = _engine(cfg, params)
    plain = _run(eng, "oob bias")
    got = _run(eng, "oob bias", logit_bias={10**7: -100.0, -5: 50.0})
    assert got == plain


def test_http_logit_bias_surface(setup):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from dots_ocr_tpu.serve.server import OpenAIServer

    cfg, params = setup
    eng = _engine(cfg, params)
    server = OpenAIServer(eng, model_name="tiny")
    assert server._validate_params({"logit_bias": {"5": 1.0}}) is None
    assert server._validate_params({"logit_bias": {"x": 1.0}}) is not None
    assert server._validate_params({"logit_bias": {"5": 101}}) is not None
    assert server._validate_params(
        {"logit_bias": {str(i): 1 for i in range(40)}}
    ) is not None

    async def run():
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            resp = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "bias"}],
                      "max_tokens": 5, "temperature": 0,
                      "logit_bias": {"42": 100.0}},
            )
            assert resp.status == 200
            data = await resp.json()
            assert data["usage"]["completion_tokens"] >= 1
        finally:
            await client.close()

    asyncio.run(run())
