"""Model correctness tests on a tiny config (CPU).

The load-bearing checks:
  * prefill-vs-decode consistency: running T tokens through prefill gives
    the same last-token logits as prefilling T-1 then one decode_step,
  * packing invariance: a packed pair of images produces the same vision
    tokens as each image encoded alone (segment masking is airtight),
  * padding invariance: extra padding never changes valid outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dots_ocr_tpu.models import preprocess
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.decoder import (
    KVCache,
    decoder_decode_step,
    decoder_prefill,
    embed_tokens,
    logits_from_hidden,
)
from dots_ocr_tpu.models.init import count_params, init_params, param_specs
from dots_ocr_tpu.models.vision import encode_images
from dots_ocr_tpu.models.vlm import build_scatter_indices, vlm_decode_step, vlm_prefill


@pytest.fixture(scope="module")
def cfg():
    return DotsOCRConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(jax.random.PRNGKey(0), cfg)


def test_param_specs_match_init(cfg, params):
    specs = param_specs(cfg)
    flat_s = jax.tree_util.tree_leaves_with_path(specs)
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    assert len(flat_s) == len(flat_p)
    for (ps, s), (pp, p) in zip(flat_s, flat_p):
        assert ps == pp
        assert s.shape == p.shape, f"{ps}: {s.shape} != {p.shape}"
    assert count_params(params) > 0


def test_flagship_param_count():
    # The real model should land near 3B total (1.2B ViT + 1.5B decoder +
    # 0.23B embeddings). Check via specs without allocating.
    specs = param_specs(DotsOCRConfig.flagship())
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(specs))
    assert 2.5e9 < n < 3.5e9, f"{n/1e9:.2f}B params"


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _prefill_logits(params, cfg, ids, seq_lens):
    b, t = ids.shape
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    x = embed_tokens(params["decoder"], ids)
    hidden, cache = decoder_prefill(
        params["decoder"], cfg.decoder, x, positions, seq_lens
    )
    return logits_from_hidden(params["decoder"], cfg.decoder, hidden), cache


def test_prefill_shapes(cfg, params):
    ids = jnp.array([[1, 2, 3, 4, 0, 0], [5, 6, 7, 8, 9, 10]], dtype=jnp.int32)
    seq_lens = jnp.array([4, 6])
    logits, cache = _prefill_logits(params, cfg, ids, seq_lens)
    assert logits.shape == (2, 6, cfg.decoder.vocab_size)
    assert cache.k.shape == (
        cfg.decoder.num_layers, 2, 6, cfg.decoder.num_kv_heads, cfg.decoder.head_dim
    )


def test_prefill_decode_consistency(cfg, params):
    """logits[T-1] from full prefill == logits from prefill(T-1) + decode(1)."""
    t = 8
    ids = jnp.arange(1, t + 1, dtype=jnp.int32)[None]  # [1, T]
    full_logits, _ = _prefill_logits(params, cfg, ids, jnp.array([t]))

    # Prefill first T-1 tokens into a cache with room, then decode token T-1.
    max_len = t + 4
    prefix = ids[:, : t - 1]
    positions = jnp.arange(t - 1)[None]
    x = embed_tokens(params["decoder"], prefix)
    _, cache_small = decoder_prefill(
        params["decoder"], cfg.decoder, x, positions, jnp.array([t - 1])
    )
    # Move the prefill KV into a bigger cache buffer.
    cache = KVCache.create(cfg.decoder, 1, max_len, dtype=cache_small.k.dtype)
    cache = KVCache(
        cache.k.at[:, :, : t - 1].set(cache_small.k),
        cache.v.at[:, :, : t - 1].set(cache_small.v),
    )
    x_last = embed_tokens(params["decoder"], ids[:, t - 1])
    hidden, _ = decoder_decode_step(
        params["decoder"],
        cfg.decoder,
        x_last,
        jnp.array([t - 1]),
        cache,
        jnp.array([t]),
    )
    step_logits = logits_from_hidden(params["decoder"], cfg.decoder, hidden)

    np.testing.assert_allclose(
        np.asarray(full_logits[0, t - 1]), np.asarray(step_logits[0]),
        rtol=2e-4, atol=2e-4,
    )


def test_prefill_padding_invariance(cfg, params):
    ids4 = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    ids6 = jnp.array([[1, 2, 3, 4, 9, 9]], dtype=jnp.int32)  # junk padding
    l4, _ = _prefill_logits(params, cfg, ids4, jnp.array([4]))
    l6, _ = _prefill_logits(params, cfg, ids6, jnp.array([4]))
    np.testing.assert_allclose(
        np.asarray(l4[0, :4]), np.asarray(l6[0, :4]), rtol=2e-4, atol=2e-4
    )


def test_greedy_generation_deterministic(cfg, params):
    ids = jnp.array([[3, 1, 4, 1, 5]], dtype=jnp.int32)
    logits, _ = _prefill_logits(params, cfg, ids, jnp.array([5]))
    a = jnp.argmax(logits[0, -1])
    logits2, _ = _prefill_logits(params, cfg, ids, jnp.array([5]))
    assert int(a) == int(jnp.argmax(logits2[0, -1]))


# ---------------------------------------------------------------------------
# Vision
# ---------------------------------------------------------------------------


def _rand_image(w, h, seed):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


def test_extract_patches_shapes(cfg):
    img = _rand_image(56, 84, 0)  # 4x6 patch grid (via 28-multiple dims)
    patches, (gh, gw), _window_ids, _valid = preprocess.extract_patches(img, cfg.vision)
    assert (gh, gw) == (6, 4)
    assert patches.shape == (24, cfg.vision.patch_dim)


def test_pack_images_layout(cfg):
    imgs = [_rand_image(56, 56, 0), _rand_image(84, 56, 1)]
    packed = preprocess.pack_images(imgs, cfg.vision, bucket_step=64)
    assert packed.num_tokens == 16 + 24
    assert packed.patches.shape[0] % 64 == 0
    assert packed.segment_ids[0] == 0
    assert packed.segment_ids[16] == 1
    assert packed.segment_ids[-1] == -1  # padding
    assert packed.num_merged == 10


def test_vision_packing_invariance(cfg, params):
    """Packed [img_a, img_b] == encode(img_a) ++ encode(img_b)."""
    img_a = _rand_image(56, 56, 0)
    img_b = _rand_image(84, 56, 1)

    def encode(imgs):
        packed = preprocess.pack_images(imgs, cfg.vision, bucket_step=32)
        out = encode_images(
            params["vision"],
            cfg.vision,
            jnp.asarray(packed.patches),
            jnp.asarray(packed.rope_cos),
            jnp.asarray(packed.rope_sin),
            jnp.asarray(packed.segment_ids),
        )
        return np.asarray(out)[: packed.num_merged]

    both = encode([img_a, img_b])
    alone_a = encode([img_a])
    alone_b = encode([img_b])
    np.testing.assert_allclose(both[: len(alone_a)], alone_a, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(both[len(alone_a):], alone_b, rtol=2e-4, atol=2e-4)


def test_vision_rope_positions_distinguish_locations(cfg, params):
    """Two identical patches at different grid positions encode differently."""
    arr = np.zeros((56, 56, 3), np.uint8)
    arr[:28, :28] = 128
    arr[28:, 28:] = 128
    # Break the 180-degree rotational symmetry: RoPE encodes *relative*
    # positions, so a rotation-symmetric image would legitimately produce
    # identical embeddings for tokens 0 and 3.
    arr[:28, 28:] = 40
    img = Image.fromarray(arr)
    packed = preprocess.pack_images([img], cfg.vision, bucket_step=16)
    # patches 0..3 (merge block 0, top-left) and 12..15 (block 3,
    # bottom-right) carry identical pixels...
    assert np.allclose(packed.patches[0:4], packed.patches[12:16])
    # ...but different RoPE tables...
    assert np.abs(packed.rope_cos[0] - packed.rope_cos[12]).max() > 0.1
    from dots_ocr_tpu.models.vision import vision_forward

    hidden = np.asarray(
        vision_forward(
            params["vision"],
            cfg.vision,
            jnp.asarray(packed.patches),
            jnp.asarray(packed.rope_cos),
            jnp.asarray(packed.rope_sin),
            jnp.asarray(packed.segment_ids),
        )
    )
    # ...so the encoder output distinguishes the two locations.
    assert np.abs(hidden[0] - hidden[12]).max() > 1e-5


# ---------------------------------------------------------------------------
# Full VLM
# ---------------------------------------------------------------------------


def test_vlm_prefill_and_decode(cfg, params):
    img = _rand_image(56, 56, 2)
    packed = preprocess.pack_images([img], cfg.vision, bucket_step=16)
    n_vis = packed.num_merged  # 4 merged tokens

    sp = cfg.special
    ids = np.full((1, 16), sp.pad_token_id, np.int32)
    prompt = [sp.img_id] + [sp.imgpad_id] * n_vis + [sp.endofimg_id, 7, 8, 9]
    ids[0, : len(prompt)] = prompt
    seq_len = len(prompt)

    sb, sp_idx = build_scatter_indices(ids, sp.imgpad_id, packed.patches.shape[0] // 4)
    positions = jnp.broadcast_to(jnp.arange(16), (1, 16))

    logits, cache = vlm_prefill(
        params,
        cfg,
        jnp.asarray(ids),
        positions,
        jnp.array([seq_len]),
        patches=jnp.asarray(packed.patches),
        rope_cos=jnp.asarray(packed.rope_cos),
        rope_sin=jnp.asarray(packed.rope_sin),
        segment_ids=jnp.asarray(packed.segment_ids),
        scatter_batch=jnp.asarray(sb),
        scatter_pos=jnp.asarray(sp_idx),
    )
    assert logits.shape == (1, 16, cfg.decoder.vocab_size)

    # One decode step continues without error and changes with the token.
    next_tok = jnp.argmax(logits[:, seq_len - 1], axis=-1).astype(jnp.int32)
    step_logits, cache2 = vlm_decode_step(
        params, cfg, next_tok, jnp.array([seq_len]), cache, jnp.array([seq_len + 1])
    )
    assert step_logits.shape == (1, cfg.decoder.vocab_size)
    assert cache2.k.shape == cache.k.shape


def test_scatter_padding_rows_dropped(cfg, params):
    """Regression: when the prompt exactly fills its bucket, padded vision
    rows must be dropped, not clobber the last real token."""
    sp = cfg.special
    t = 8
    ids = np.full((1, t), 7, np.int32)
    ids[0, 1:5] = sp.imgpad_id  # 4 imgpad tokens
    # vision axis padded to 6 merged rows: 2 sentinel rows
    sb, spi = build_scatter_indices(ids, sp.imgpad_id, 6)
    assert list(sb[4:]) == [1, 1] and list(spi[4:]) == [t, t]  # out of bounds

    x = jnp.zeros((1, t, cfg.decoder.hidden_size))
    vis = jnp.ones((6, cfg.decoder.hidden_size))
    from dots_ocr_tpu.models.vlm import splice_vision_embeddings

    out = splice_vision_embeddings(x, vis, jnp.asarray(sb), jnp.asarray(spi))
    assert float(out[0, 5].max()) == 0.0  # position after span untouched
    assert float(out[0, t - 1].max()) == 0.0  # last token untouched
    assert float(out[0, 1].min()) == 1.0  # real imgpad positions filled


def test_vision_tokens_influence_logits(cfg, params):
    """The image content must actually reach the decoder."""
    sp = cfg.special

    def run(img_seed):
        img = _rand_image(56, 56, img_seed)
        packed = preprocess.pack_images([img], cfg.vision, bucket_step=16)
        ids = np.full((1, 12), sp.pad_token_id, np.int32)
        prompt = [sp.img_id] + [sp.imgpad_id] * 4 + [sp.endofimg_id, 5]
        ids[0, : len(prompt)] = prompt
        sb, spi = build_scatter_indices(ids, sp.imgpad_id, packed.patches.shape[0] // 4)
        logits, _ = vlm_prefill(
            params, cfg, jnp.asarray(ids),
            jnp.broadcast_to(jnp.arange(12), (1, 12)),
            jnp.array([len(prompt)]),
            patches=jnp.asarray(packed.patches),
            rope_cos=jnp.asarray(packed.rope_cos),
            rope_sin=jnp.asarray(packed.rope_sin),
            segment_ids=jnp.asarray(packed.segment_ids),
            scatter_batch=jnp.asarray(sb),
            scatter_pos=jnp.asarray(spi),
        )
        return np.asarray(logits[0, len(prompt) - 1])

    assert np.abs(run(1) - run(2)).max() > 1e-6
