"""Chunked prefill: decoder_prefill_extend == monolithic decoder_prefill.

The extend path writes each chunk's K/V straight into the paged cache and
attends over the gathered prefix with a causal q_offset — its hidden
states and cache contents must match a single full-sequence prefill
exactly (same math, different schedule).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dots_ocr_tpu.engine.kv_cache import PageAllocator, PagedKV
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.decoder import (
    decoder_prefill,
    decoder_prefill_extend,
    embed_tokens,
)
from dots_ocr_tpu.models.init import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = DotsOCRConfig.tiny().replace(dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _run_chunked(cfg, params, ids, chunk, page_size, quantized=False,
                 attn_impl="xla"):
    dcfg = cfg.decoder
    plen = len(ids)
    paged = PagedKV.create(dcfg, num_pages=32, page_size=page_size,
                           dtype=jnp.float32, quantized=quantized)
    alloc = PageAllocator(num_pages=32, page_size=page_size,
                          max_pages_per_seq=16)
    alloc.allocate(0, plen)
    n_chunks = -(-plen // chunk)
    hiddens = []
    k, v, ks, vs = paged.k, paged.v, paged.k_scale, paged.v_scale
    for ci in range(n_chunks):
        start = ci * chunk
        kv_hi = (ci + 1) * chunk
        # round kv_hi up to a page multiple (gather indexes whole pages)
        kv_hi = -(-kv_hi // page_size) * page_size
        width = kv_hi // page_size
        table = np.zeros(width, np.int32)
        full = alloc.padded_table(0)
        table[: min(width, len(full))] = full[:width]
        n_valid = min(chunk, plen - start)
        slots = np.zeros(chunk, np.int32)
        slots[:n_valid] = alloc.slot_mapping(0, start, n_valid)
        chunk_ids = np.zeros(chunk, np.int32)
        chunk_ids[:n_valid] = ids[start : start + n_valid]
        embeds = embed_tokens(params["decoder"], jnp.asarray(chunk_ids))
        positions = jnp.arange(start, start + chunk, dtype=jnp.int32)
        hidden, k, v, ks, vs = decoder_prefill_extend(
            params["decoder"], dcfg, embeds, positions,
            jnp.int32(plen), k, v,
            jnp.asarray(table), jnp.asarray(slots),
            page_size=page_size, kv_hi=kv_hi, q_offset=start,
            attn_impl=attn_impl, k_scales=ks, v_scales=vs,
        )
        hiddens.append(np.asarray(hidden)[:n_valid])
    return np.concatenate(hiddens, axis=0), (k, v, ks, vs), alloc


def test_chunked_matches_monolithic(setup):
    cfg, params = setup
    dcfg = cfg.decoder
    rng = np.random.RandomState(0)
    plen = 20
    ids = rng.randint(1, dcfg.vocab_size, plen)

    embeds = embed_tokens(params["decoder"], jnp.asarray(ids)[None])
    positions = jnp.arange(plen, dtype=jnp.int32)[None]
    hidden_full, cache = decoder_prefill(
        params["decoder"], dcfg, embeds, positions,
        jnp.asarray([plen], jnp.int32), attn_impl="xla",
    )
    hidden_full = np.asarray(hidden_full[0])

    for chunk in (8, 16, 32):
        hidden_chunked, (k, v, _, _), alloc = _run_chunked(
            cfg, params, ids, chunk=chunk, page_size=8
        )
        np.testing.assert_allclose(
            hidden_chunked, hidden_full, rtol=2e-4, atol=2e-4,
            err_msg=f"chunk={chunk}",
        )
        # Cache contents must match the monolithic prefill's K/V.
        slots = alloc.slot_mapping(0, 0, plen)
        for layer in range(dcfg.num_layers):
            got_k = np.asarray(k[layer])[:, slots]  # [KV, plen, D]
            want_k = np.asarray(cache.k[layer][0]).transpose(1, 0, 2)
            np.testing.assert_allclose(got_k, want_k, rtol=2e-4, atol=2e-4)


def test_chunked_prefill_quantized_close(setup):
    cfg, params = setup
    dcfg = cfg.decoder
    rng = np.random.RandomState(1)
    plen = 12
    ids = rng.randint(1, dcfg.vocab_size, plen)

    embeds = embed_tokens(params["decoder"], jnp.asarray(ids)[None])
    positions = jnp.arange(plen, dtype=jnp.int32)[None]
    hidden_full, _ = decoder_prefill(
        params["decoder"], dcfg, embeds, positions,
        jnp.asarray([plen], jnp.int32), attn_impl="xla",
    )
    hidden_chunked, _, _ = _run_chunked(
        cfg, params, ids, chunk=8, page_size=8, quantized=True
    )
    np.testing.assert_allclose(
        hidden_chunked, np.asarray(hidden_full[0]), rtol=0.08, atol=0.08
    )


def test_flash_q_offset_matches_reference():
    """flash_attention(q_offset=k) == full-causal attention's last rows."""
    from dots_ocr_tpu.ops.flash_attention import flash_attention
    from dots_ocr_tpu.ops.attention import mha_reference

    rng = np.random.RandomState(2)
    kv_len, chunk, heads, kv_heads, d = 48, 16, 4, 2, 32
    offset = kv_len - chunk
    q_full = jnp.asarray(rng.randn(1, kv_len, heads, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, kv_len, kv_heads, d), jnp.float32)
    v = jnp.asarray(rng.randn(1, kv_len, kv_heads, d), jnp.float32)

    pos = np.arange(kv_len)
    mask = (pos[None, :] <= pos[:, None])[None]  # [1, T, S]
    want = np.asarray(mha_reference(q_full, k, v, mask=mask))[0, offset:]

    got = flash_attention(
        q_full[:, offset:], k, v, causal=True, q_offset=offset,
        interpret=True, block_q=8, block_k=8,
    )
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=2e-5, atol=2e-5)
