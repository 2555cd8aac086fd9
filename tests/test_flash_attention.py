"""Pallas flash attention vs. the XLA reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dots_ocr_tpu.ops.attention import (
    make_causal_mask,
    make_length_mask,
    make_segment_mask,
    mha_reference,
)
from dots_ocr_tpu.ops.flash_attention import flash_attention

flash = functools.partial(flash_attention, interpret=True)


def _qkv(rng, b, tq, s, h, kv, d, dtype=jnp.float32):
    kq, kk, kv_ = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, tq, h, d), dtype)
    k = jax.random.normal(kk, (b, s, kv, d), dtype)
    v = jax.random.normal(kv_, (b, s, kv, d), dtype)
    return q, k, v


def test_full_attention_matches_reference():
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 128, 128, 4, 4, 32)
    out = flash(q, k, v, block_q=64, block_k=64)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gqa_matches_reference():
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 128, 128, 8, 2, 32)
    out = flash(q, k, v, block_q=64, block_k=64)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_causal_matches_reference():
    b, t = 2, 128
    q, k, v = _qkv(jax.random.PRNGKey(2), b, t, t, 4, 2, 32)
    out = flash(q, k, v, causal=True, block_q=64, block_k=64)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    ref = mha_reference(q, k, v, mask=make_causal_mask(positions, t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_segment_mask_matches_reference():
    b, t = 1, 256
    q, k, v = _qkv(jax.random.PRNGKey(3), b, t, t, 4, 4, 32)
    # three packed segments + padding tail
    seg = np.full((b, t), -1, np.int32)
    seg[0, :100] = 0
    seg[0, 100:160] = 1
    seg[0, 160:230] = 2
    seg = jnp.asarray(seg)
    out = flash(q, k, v, q_segment_ids=seg, kv_segment_ids=seg, block_q=64, block_k=64)
    ref = mha_reference(q, k, v, mask=make_segment_mask(seg, seg))
    valid = np.asarray(seg[0]) >= 0
    np.testing.assert_allclose(
        np.asarray(out)[0, valid], np.asarray(ref)[0, valid], rtol=2e-5, atol=2e-5
    )
    # padding rows are exact zeros (not NaN)
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_array_equal(np.asarray(out)[0, ~valid], 0.0)


def test_causal_with_length_padding():
    """Decoder-prefill configuration: causal + per-row valid lengths encoded
    as segment ids."""
    b, t = 2, 128
    q, k, v = _qkv(jax.random.PRNGKey(4), b, t, t, 4, 2, 32)
    seq_lens = jnp.array([100, 64])
    pos = jnp.arange(t)
    seg = jnp.where(pos[None, :] < seq_lens[:, None], 0, -1)
    out = flash(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
        block_q=64, block_k=64,
    )
    positions = jnp.broadcast_to(pos, (b, t))
    ref_mask = make_causal_mask(positions, t) & make_length_mask(seq_lens, t)[:, None, :]
    ref = mha_reference(q, k, v, mask=ref_mask)
    for i, n in enumerate([100, 64]):
        np.testing.assert_allclose(
            np.asarray(out)[i, :n], np.asarray(ref)[i, :n], rtol=2e-5, atol=2e-5
        )


def test_non_block_divisible_lengths():
    """Regression: lengths not divisible by the block size are padded
    internally (found by bench_suite: prompt bucket 32 with block 128)."""
    q, k, v = _qkv(jax.random.PRNGKey(9), 1, 96, 96, 4, 2, 32)
    out = flash(q, k, v, causal=True, block_q=64, block_k=64)
    positions = jnp.broadcast_to(jnp.arange(96), (1, 96))
    ref = mha_reference(q, k, v, mask=make_causal_mask(positions, 96))
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_default_blocks_with_padding():
    """The tuned 1024x1024 default tiles: a 1300-token causal+segmented
    input clamps block_q to 1024, pads to 2048 with -1 segments, and must
    still match the reference exactly (the shape class served on TPU)."""
    q, k, v = _qkv(jax.random.PRNGKey(11), 1, 1300, 1300, 2, 1, 64)
    seg = jnp.where(jnp.arange(1300) < 900, 0, -1)[None]
    out = flash(q, k, v, seg, seg, causal=True)  # default blocks
    positions = jnp.broadcast_to(jnp.arange(1300), (1, 1300))
    mask = make_causal_mask(positions, 1300) & make_segment_mask(seg, seg)
    ref = mha_reference(q, k, v, mask=mask)
    valid = np.asarray(out)[:, :900]
    np.testing.assert_allclose(
        valid, np.asarray(ref)[:, :900], rtol=2e-5, atol=2e-5
    )
    assert (np.asarray(out)[:, 900:] == 0).all()  # masked q rows zeroed


def test_bf16_inputs():
    q, k, v = _qkv(jax.random.PRNGKey(5), 1, 128, 128, 2, 2, 32, jnp.bfloat16)
    out = flash(q, k, v, block_q=64, block_k=64)
    assert out.dtype == jnp.bfloat16
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_block_size_invariance():
    q, k, v = _qkv(jax.random.PRNGKey(6), 1, 256, 256, 2, 2, 32)
    a = flash(q, k, v, causal=True, block_q=128, block_k=128)
    b_ = flash(q, k, v, causal=True, block_q=64, block_k=128)
    c = flash(q, k, v, causal=True, block_q=128, block_k=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-5)


def test_vision_path_with_flash(rng_seed):
    """The vision encoder produces identical outputs with flash vs xla."""
    from PIL import Image

    from dots_ocr_tpu.models import preprocess
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import init_params
    from dots_ocr_tpu.models.vision import encode_images

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (112, 112, 3), np.uint8))
    packed = preprocess.pack_images([img], cfg.vision, bucket_step=64)

    args = (
        params["vision"],
        cfg.vision,
        jnp.asarray(packed.patches),
        jnp.asarray(packed.rope_cos),
        jnp.asarray(packed.rope_sin),
        jnp.asarray(packed.segment_ids),
    )
    ref = encode_images(*args, attn_impl="xla")
    out = encode_images(*args, attn_impl="flash_interpret")
    np.testing.assert_allclose(
        np.asarray(out)[: packed.num_merged],
        np.asarray(ref)[: packed.num_merged],
        rtol=2e-4,
        atol=2e-4,
    )
