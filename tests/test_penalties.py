"""OpenAI presence/frequency penalties (vLLM semantics: counts over
generated tokens only, applied to the logits before sampling).

The decode program's ``with_penalties`` static variant carries a
[slots, vocab] generated-token count plane on device; host rebuilds it
from ``output_ids`` on scheduling events only. Speculative chunks gate
off while a penalized request is active (token j changes token j+1's
distribution — the multi-token verify cannot honor that).
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


def _dense_logits(cfg, params, ids):
    from dots_ocr_tpu.models.decoder import (
        decoder_prefill,
        embed_tokens,
        logits_from_hidden,
    )

    arr = jnp.asarray([ids], jnp.int32)
    t = arr.shape[1]
    hidden, _ = decoder_prefill(
        params["decoder"], cfg.decoder,
        embed_tokens(params["decoder"], arr).astype(jnp.float32),
        jnp.arange(t)[None, :], jnp.asarray([t]),
    )
    return np.asarray(
        logits_from_hidden(params["decoder"], cfg.decoder, hidden)
    )[0].astype(np.float64)


def test_penalized_greedy_matches_teacher_forced_recompute(setup):
    """Differential: every greedy choice must equal the dense-forward
    argmax of (logits - presence*(count>0) - frequency*count) with counts
    over the tokens generated before it."""
    cfg, params = setup
    pres, freq = 0.7, 0.4
    eng = _engine(cfg, params)
    rid = eng.submit("penalty differential", temperature=0.0,
                     max_new_tokens=8, presence_penalty=pres,
                     frequency_penalty=freq)
    _drain(eng)
    req = eng.finished_request(rid)
    toks = list(req.prior_output) + list(req.output_ids)
    eng.take_finished(rid)
    assert len(toks) >= 4

    logits = _dense_logits(cfg, params, req.prompt_ids + toks)
    plen = len(req.prompt_ids)
    counts = np.zeros(cfg.decoder.vocab_size, np.int64)
    for k, tok in enumerate(toks):
        row = logits[plen - 1 + k].copy()
        row -= pres * (counts > 0) + freq * counts
        assert int(row.argmax()) == tok, f"mismatch at generated pos {k}"
        counts[tok] += 1


def test_frequency_penalty_breaks_repetition_loops(setup):
    """The tiny random-weight model greedy-loops; a strong frequency
    penalty must strictly increase the distinct-token count."""
    cfg, params = setup
    eng = _engine(cfg, params)
    rid_plain = eng.submit("loop breaker", temperature=0.0,
                           max_new_tokens=12)
    rid_pen = eng.submit("loop breaker", temperature=0.0,
                         max_new_tokens=12, frequency_penalty=2.0)
    _drain(eng)
    plain = eng.finished_request(rid_plain).output_ids
    pen = eng.finished_request(rid_pen).output_ids
    eng.take_finished(rid_plain)
    eng.take_finished(rid_pen)
    assert len(set(pen)) > len(set(plain))


def test_penalties_gate_speculation_off(setup):
    cfg, params = setup
    eng = _engine(cfg, params, speculate_k=3, repetition_min_repeats=0)
    rid = eng.submit("spec gate", temperature=0.0, max_new_tokens=8,
                     presence_penalty=0.5)
    _drain(eng)
    assert eng.metrics.get("spec_chunks", 0) == 0
    assert len(eng.finished_request(rid).output_ids) >= 1
    eng.take_finished(rid)
    # and a later un-penalized request speculates again
    rid2 = eng.submit("spec back on", temperature=0.0, max_new_tokens=8)
    _drain(eng)
    assert eng.metrics.get("spec_chunks", 0) >= 1
    eng.take_finished(rid2)


def test_unpenalized_neighbor_unaffected(setup):
    cfg, params = setup
    solo = _engine(cfg, params).generate_one(
        "innocent neighbor", temperature=0.0, max_new_tokens=8
    )
    eng = _engine(cfg, params)
    rid_pen = eng.submit("penalty hog", temperature=0.0, max_new_tokens=8,
                         frequency_penalty=1.5)
    rid_plain = eng.submit("innocent neighbor", temperature=0.0,
                           max_new_tokens=8)
    _drain(eng)
    eng.take_finished(rid_pen)
    assert eng.take_finished(rid_plain) == solo


def test_http_penalties_surface(setup):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from dots_ocr_tpu.serve.server import OpenAIServer

    cfg, params = setup
    eng = _engine(cfg, params)
    server = OpenAIServer(eng, model_name="tiny")
    assert server._validate_params({"presence_penalty": 0.5}) is None
    assert server._validate_params({"frequency_penalty": -1}) is None
    assert server._validate_params({"presence_penalty": 3.0}) is not None
    assert server._validate_params({"frequency_penalty": "x"}) is not None

    async def run():
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            resp = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "pen"}],
                      "max_tokens": 6, "temperature": 0,
                      "frequency_penalty": 1.0},
            )
            assert resp.status == 200
            data = await resp.json()
            assert data["usage"]["completion_tokens"] >= 1
        finally:
            await client.close()

    asyncio.run(run())
