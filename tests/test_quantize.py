"""Weight-only int8 quantization (models/quantize.py).

The reference has no quantized serving (vLLM-external, SURVEY.md §2.2);
this is the TPU rebuild's opt-in decode-bandwidth feature, so the tests
gate numerics: kernel round-trip error, end-to-end logit closeness on the
tiny model, and that the paged continuous-batching engine runs quantized.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params
from dots_ocr_tpu.models.layers import embed, linear, unembed
from dots_ocr_tpu.models.quantize import (
    dequantize_kernel,
    is_quantized_kernel,
    quantize_decoder_params,
    quantize_embedding,
    quantize_kernel,
    quantized_bytes,
)


def test_kernel_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48), jnp.float32)
    qk = quantize_kernel(w)
    assert qk["qint8"].dtype == jnp.int8 and qk["scale"].shape == (48,)
    back = dequantize_kernel(qk)
    # symmetric 8-bit: max error <= scale/2 per element
    assert float(jnp.max(jnp.abs(back - w) / qk["scale"][None, :])) <= 0.5 + 1e-6


def test_linear_quantized_matches_dequantized():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    w = jax.random.normal(k1, (32, 40), jnp.float32) * 0.3
    x = jax.random.normal(k2, (5, 32), jnp.float32)
    qk = quantize_kernel(w)
    got = linear(x, qk)
    want = linear(x, dequantize_kernel(qk))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_embedding_roundtrip_and_unembed():
    w = jax.random.normal(jax.random.PRNGKey(2), (100, 16), jnp.float32) * 0.05
    qe = quantize_embedding(w)
    ids = jnp.array([0, 7, 99])
    got = embed(ids, qe)
    want = jnp.take(w, ids, axis=0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=2e-3
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16), jnp.float32)
    lg = unembed(x, qe)
    lw = unembed(x, w)
    assert np.corrcoef(
        np.asarray(lg).ravel(), np.asarray(lw).ravel()
    )[0, 1] > 0.999


@pytest.fixture(scope="module")
def tiny():
    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_quantize_decoder_params_structure(tiny):
    cfg, params = tiny
    qp = quantize_decoder_params(params)
    # vision untouched, decoder block kernels replaced, norms/biases kept
    assert jax.tree.structure(qp["vision"]) == jax.tree.structure(params["vision"])
    blocks = qp["decoder"]["blocks"]
    assert is_quantized_kernel(blocks["attn"]["wq"])
    assert blocks["attn"]["wq"]["qint8"].ndim == 3  # stacked [L, in, out]
    assert blocks["attn"]["wq"]["scale"].ndim == 2  # [L, out]
    assert not isinstance(blocks["input_norm"], dict)
    assert is_quantized_kernel(qp["decoder"]["embed"])
    assert quantized_bytes(qp["decoder"]) < 0.6 * quantized_bytes(params["decoder"])
    # original tree untouched
    assert not is_quantized_kernel(params["decoder"]["blocks"]["attn"]["wq"])


def test_quantized_logits_close_and_engine_runs(tiny):
    """End to end: prefill logits stay close; both the sync engine and the
    paged continuous-batching engine generate with int8 weights."""
    from dots_ocr_tpu.engine.engine import InferenceEngine
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )

    cfg, params = tiny
    qp = quantize_decoder_params(params)

    full = InferenceEngine(params, cfg, prompt_bucket_step=32, vision_bucket_step=16)
    quant = InferenceEngine(qp, cfg, prompt_bucket_step=32, vision_bucket_step=16)
    out_f = full.generate_one("hello quant world", temperature=0.0, max_new_tokens=6)
    out_q = quant.generate_one("hello quant world", temperature=0.0, max_new_tokens=6)
    assert isinstance(out_q, str) and len(out_q) > 0
    # tiny random weights are noise-sensitive; the contract is "runs and
    # produces tokens", logit closeness is asserted on the raw forward:
    ids = jnp.asarray([[1, 5, 9, 4]])
    from dots_ocr_tpu.models.decoder import (
        decoder_prefill,
        embed_tokens,
        logits_from_hidden,
    )

    lens = jnp.asarray([4])
    pos = jnp.arange(4)[None, :]
    hf, _ = decoder_prefill(
        params["decoder"], cfg.decoder,
        embed_tokens(params["decoder"], ids).astype(jnp.float32), pos, lens,
    )
    hq, _ = decoder_prefill(
        qp["decoder"], cfg.decoder,
        embed_tokens(qp["decoder"], ids).astype(jnp.float32), pos, lens,
    )
    lf = logits_from_hidden(params["decoder"], cfg.decoder, hf)
    lq = logits_from_hidden(qp["decoder"], cfg.decoder, hq)
    corr = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lq).ravel())[0, 1]
    assert corr > 0.99

    cb = ContinuousBatchingEngine(
        qp, cfg,
        sched=SchedulerConfig(
            num_pages=64, page_size=8, max_slots=2, max_pages_per_seq=16,
            prompt_bucket_step=32, vision_bucket_step=16,
        ),
        default_max_new_tokens=6,
    )
    out_cb = cb.generate_one("paged int8", temperature=0.0, max_new_tokens=5)
    assert isinstance(out_cb, str)
    assert cb.allocator.free_pages == 63
