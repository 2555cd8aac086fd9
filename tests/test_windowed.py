"""Windowed vision attention tests (window-major packing + per-layer policy)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dots_ocr_tpu.models import preprocess
from dots_ocr_tpu.models.config import DotsOCRConfig, VisionConfig
from dots_ocr_tpu.models.init import init_params
from dots_ocr_tpu.models.rope import token_order
from dots_ocr_tpu.models.vision import encode_images


def test_token_order_full_is_merge_contiguous():
    perm, win = token_order(4, 6, merge=2, window=0)
    assert len(perm) == 24
    assert (win == 0).all()
    # first merge block = patches (0,0),(0,1),(1,0),(1,1) in row-major grid
    assert perm[:4].tolist() == [0, 1, 6, 7]


def test_token_order_windowed():
    # 8x8 grid, 4x4 windows -> 4 windows of 16 patches
    perm, win = token_order(8, 8, merge=2, window=4)
    assert len(perm) == 64
    assert win.max() == 3
    counts = np.bincount(win)
    assert (counts == 16).all()
    # window 0 covers rows 0-3, cols 0-3
    w0 = perm[win == 0]
    rows, cols = w0 // 8, w0 % 8
    assert rows.max() < 4 and cols.max() < 4
    # merge blocks remain contiguous: every 4-run shares one 2x2 block
    for j in range(0, 64, 4):
        blk = perm[j : j + 4]
        r, c = blk // 8, blk % 8
        assert r.max() - r.min() == 1 and c.max() - c.min() == 1


def test_token_order_edge_windows():
    # 6x4 grid with window 4: windows of 4x4 and 2x4 (edge)
    perm, win = token_order(6, 4, merge=2, window=4)
    assert len(perm) == 24
    assert sorted(perm.tolist()) == list(range(24))
    assert win.max() == 1
    assert (np.bincount(win) == [16, 8]).all()


def _windowed_cfg(full_layers=()):
    base = DotsOCRConfig.tiny()
    return base.replace(
        vision=dataclasses.replace(
            base.vision, window_size=4, full_attn_layers=tuple(full_layers)
        )
    )


def _rand_image(w, h, seed):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


def _encode(cfg, params, img, impl="xla"):
    packed = preprocess.pack_images([img], cfg.vision, bucket_step=32)
    kwargs = {}
    if packed.window_ids is not None:
        kwargs["window_ids"] = jnp.asarray(packed.window_ids)
    out = encode_images(
        params["vision"],
        cfg.vision,
        jnp.asarray(packed.patches),
        jnp.asarray(packed.rope_cos),
        jnp.asarray(packed.rope_sin),
        jnp.asarray(packed.segment_ids),
        attn_impl=impl,
        **kwargs,
    )
    # valid merged rows only (window packing interleaves padded rows)
    return np.asarray(out)[packed.merged_valid_rows()]


def test_windowed_equals_full_when_window_covers_image():
    """A window >= the whole grid must reproduce full attention exactly."""
    full_cfg = DotsOCRConfig.tiny()
    win_cfg = full_cfg.replace(
        vision=dataclasses.replace(full_cfg.vision, window_size=8)
    )
    params = init_params(jax.random.PRNGKey(0), full_cfg)
    img = _rand_image(56, 56, 0)  # 4x4 grid < window 8
    a = _encode(full_cfg, params, img)
    b = _encode(win_cfg, params, img)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_windowed_differs_from_full():
    full_cfg = DotsOCRConfig.tiny()
    win_cfg = _windowed_cfg()
    params = init_params(jax.random.PRNGKey(0), full_cfg)
    img = _rand_image(112, 112, 1)  # 8x8 grid, 4 windows
    a = _encode(full_cfg, params, img)
    b = _encode(win_cfg, params, img)
    assert np.abs(a - b).max() > 1e-4


def test_full_attn_layers_policy():
    """With every layer in full_attn_layers, windowing is a no-op (up to
    token order, which both paths share)."""
    win_all_full = _windowed_cfg(full_layers=range(2))  # tiny has 2 layers
    win_cfg = _windowed_cfg()
    params = init_params(jax.random.PRNGKey(0), win_cfg)
    img = _rand_image(112, 112, 2)
    a = _encode(win_all_full, params, img)
    b = _encode(win_cfg, params, img)
    assert np.abs(a - b).max() > 1e-4  # windowed != image-wide
    # and the all-full policy matches a window that covers the image
    cover = DotsOCRConfig.tiny().replace(
        vision=dataclasses.replace(
            DotsOCRConfig.tiny().vision, window_size=8, full_attn_layers=(0, 1)
        )
    )
    c = _encode(cover, params, img)
    # same ids (window 8 = whole 8x8 image) + full policy -> identical
    d = _encode(
        DotsOCRConfig.tiny().replace(
            vision=dataclasses.replace(DotsOCRConfig.tiny().vision, window_size=8)
        ),
        params,
        img,
    )
    np.testing.assert_allclose(c, d, rtol=2e-4, atol=2e-4)


def test_windowed_flash_matches_xla():
    win_cfg = _windowed_cfg(full_layers=(1,))
    params = init_params(jax.random.PRNGKey(0), win_cfg)
    img = _rand_image(112, 84, 3)  # 6x8 grid, edge windows
    a = _encode(win_cfg, params, img, impl="xla")
    b = _encode(win_cfg, params, img, impl="flash_interpret")
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_windowed_engine_end_to_end():
    """Windowed config through the full engine: pack -> scatter(valid rows)
    -> encode -> prefill -> decode."""
    from dots_ocr_tpu.engine.engine import InferenceEngine

    cfg = _windowed_cfg(full_layers=(0,))
    params = init_params(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(
        params, cfg, prompt_bucket_step=32, vision_bucket_step=32,
        default_max_new_tokens=4,
    )
    img = _rand_image(112, 84, 7)  # edge windows -> interleaved padding
    out = engine.generate_one("parse", images=[img], temperature=0.0,
                              max_new_tokens=4)
    assert isinstance(out, str)
    assert engine.last_stats.vision_tokens == (112 // 28) * (84 // 28)


def test_windowed_scheduler_end_to_end():
    from dots_ocr_tpu.engine.scheduler import ContinuousBatchingEngine, SchedulerConfig

    cfg = _windowed_cfg(full_layers=(1,))
    params = init_params(jax.random.PRNGKey(0), cfg)
    engine = ContinuousBatchingEngine(
        params, cfg,
        sched=SchedulerConfig(
            num_pages=128, page_size=8, max_slots=2, max_pages_per_seq=32,
            prompt_bucket_step=32, vision_bucket_step=32, steps_per_sync=4,
        ),
        default_max_new_tokens=4,
    )
    img = _rand_image(112, 84, 8)
    out = engine.generate_one("parse", images=[img], temperature=0.0,
                              max_new_tokens=4)
    assert isinstance(out, str)
