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
    is_act_quantized_kernel,
    is_quantized_kernel,
    quantize_decoder_params,
    quantize_embedding,
    quantize_kernel,
    quantize_kernel_act,
    quantize_vision_params,
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


def test_linear_act_quantized_close_to_fp():
    """W8A8 (dynamic per-token activation int8 + int8 dot) stays within
    the combined two-sided 8-bit error envelope of the fp matmul."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    w = jax.random.normal(k1, (64, 48), jnp.float32) * 0.3
    x = jax.random.normal(k2, (17, 64), jnp.float32)
    qk = quantize_kernel_act(w)
    assert is_act_quantized_kernel(qk) and not is_quantized_kernel(qk)
    got = np.asarray(linear(x, qk))
    want = np.asarray(x @ w)
    # relative error of a length-64 int8 x int8 contraction: ~1% rms
    denom = np.maximum(np.abs(want), 1.0)
    assert float(np.max(np.abs(got - want) / denom)) < 0.08
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def test_linear_act_quantized_batched_rank3():
    """The int8 dot_general handles leading batch dims like einsum does."""
    w = jax.random.normal(jax.random.PRNGKey(5), (32, 24), jnp.float32) * 0.2
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 7, 32), jnp.float32)
    qk = quantize_kernel_act(w)
    got = np.asarray(linear(x, qk))
    assert got.shape == (3, 7, 24)
    want = np.asarray(linear(x.reshape(21, 32), qk)).reshape(3, 7, 24)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


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


def test_quantize_vision_params_structure(tiny):
    cfg, params = tiny
    qp = quantize_vision_params(params)
    # decoder untouched, vision block kernels W8A8, patch embed/merger bf16
    assert jax.tree.structure(qp["decoder"]) == jax.tree.structure(
        params["decoder"]
    )
    blocks = qp["vision"]["blocks"]
    for group, name in (("attn", "wq"), ("attn", "wo"), ("mlp", "down")):
        assert is_act_quantized_kernel(blocks[group][name])
        assert blocks[group][name]["qint8_act"].ndim == 3  # stacked [L,...]
        assert blocks[group][name]["scale"].ndim == 2  # [L, out]
    assert not isinstance(qp["vision"]["patch_embed"]["kernel"], dict)
    assert not isinstance(qp["vision"]["merger"]["fc1"], dict)
    assert not isinstance(blocks["norm1"], dict)
    # biases stay fp
    assert not isinstance(blocks["attn"]["bq"], dict)
    # original tree untouched
    assert not isinstance(params["vision"]["blocks"]["attn"]["wq"], dict)


def test_vision_quantized_encoder_close(tiny):
    """encode_images with the W8A8 tower tracks the bf16 tower closely on
    a real packed page (per-token dynamic activation quantization)."""
    from PIL import Image

    from dots_ocr_tpu.models import preprocess
    from dots_ocr_tpu.models.vision import encode_images

    cfg, params = tiny
    qp = quantize_vision_params(params)
    rng = np.random.RandomState(7)
    img = Image.fromarray(rng.randint(0, 255, (84, 56, 3), np.uint8))
    packed = preprocess.pack_images([img], cfg.vision, bucket_step=32)
    args = (
        jnp.asarray(packed.patches),
        jnp.asarray(packed.rope_cos),
        jnp.asarray(packed.rope_sin),
        jnp.asarray(packed.segment_ids),
    )
    full = np.asarray(
        encode_images(params["vision"], cfg.vision, *args)
    )[: packed.num_merged]
    quant = np.asarray(
        encode_images(qp["vision"], cfg.vision, *args)
    )[: packed.num_merged]
    assert np.corrcoef(full.ravel(), quant.ravel())[0, 1] > 0.99


def test_vision_quantized_shard_and_engine_runs(tiny):
    """shard_params handles the W8A8 vision tree, and the continuous
    engine parses an image request with the quantized tower."""
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.parallel.sharding import make_mesh, shard_params

    cfg, params = tiny
    qp = quantize_vision_params(quantize_decoder_params(params))
    sharded = shard_params(qp, cfg, make_mesh(1, 1))
    assert is_act_quantized_kernel(sharded["vision"]["blocks"]["attn"]["wq"])

    from PIL import Image

    rng = np.random.RandomState(8)
    img = Image.fromarray(rng.randint(0, 255, (56, 56, 3), np.uint8))
    cb = ContinuousBatchingEngine(
        qp, cfg,
        sched=SchedulerConfig(
            num_pages=64, page_size=8, max_slots=2, max_pages_per_seq=16,
            prompt_bucket_step=32, vision_bucket_step=16,
        ),
        default_max_new_tokens=5,
    )
    out = cb.generate_one("describe", images=[img], temperature=0.0,
                          max_new_tokens=5)
    assert isinstance(out, str)
    assert cb.allocator.free_pages == 63


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


def test_vision_quantized_windowed_path(tiny):
    """W8A8 tower under the windowed-attention packing (window-major
    reshape) still tracks bf16 — the r3 opt-in combo for fast prefill."""
    import dataclasses

    from PIL import Image

    from dots_ocr_tpu.models import preprocess
    from dots_ocr_tpu.models.vision import encode_images

    cfg, params = tiny
    vcfg = dataclasses.replace(
        cfg.vision, window_size=2, full_attn_layers=(1,)
    )
    qp = quantize_vision_params(params)
    rng = np.random.RandomState(11)
    img = Image.fromarray(rng.randint(0, 255, (112, 84, 3), np.uint8))
    packed = preprocess.pack_images([img], vcfg, bucket_step=32)
    args = (
        jnp.asarray(packed.patches),
        jnp.asarray(packed.rope_cos),
        jnp.asarray(packed.rope_sin),
        jnp.asarray(packed.segment_ids),
    )
    kw = dict(
        window_ids=(
            jnp.asarray(packed.window_ids)
            if packed.window_ids is not None else None
        ),
    )
    full = np.asarray(
        encode_images(params["vision"], vcfg, *args, **kw)
    )[: packed.num_merged]
    quant = np.asarray(
        encode_images(qp["vision"], vcfg, *args, **kw)
    )[: packed.num_merged]
    assert np.corrcoef(full.ravel(), quant.ravel())[0, 1] > 0.99
