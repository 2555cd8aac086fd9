"""Fused window-attention kernel vs the dense XLA reference.

The kernel (ops/window_attention.py) computes dense attention within
independent uniform windows with key-side validity masking only — the
exact contract of the window-major vision packing (every window belongs
to one image; padding has segment id -1). These tests pin it against
mha_reference with a full segment mask, including padded edge windows,
fully-padded bucket windows, and the wired-in encoder path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dots_ocr_tpu.ops.attention import make_segment_mask, mha_reference
from dots_ocr_tpu.ops.window_attention import window_attention

H, D = 4, 32
W = 64  # window tokens (small for interpret speed; shape-generic kernel)


def _case(nw, seg_fn, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(nw, W, H, D).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    k = jnp.asarray(rng.randn(nw, W, H, D).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    v = jnp.asarray(rng.randn(nw, W, H, D).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    seg = jnp.asarray(seg_fn(rng), jnp.int32)
    return q, k, v, seg


def _reference(q, k, v, seg):
    mask = make_segment_mask(seg, seg)  # [nw, W, W]
    return mha_reference(q, k, v, mask=mask)


def _check(q, k, v, seg):
    got = np.asarray(window_attention(q, k, v, seg, interpret=True),
                     np.float32)
    want = np.asarray(_reference(q, k, v, seg), np.float32)
    valid = np.asarray(seg) >= 0  # [nw, W] — padded query rows are
    # unspecified by the kernel's contract (dropped downstream)
    err = np.abs(got - want)[valid].max()
    assert err < 2e-2, err
    assert np.isfinite(got).all()


def test_all_valid_windows():
    _check(*_case(3, lambda r: np.zeros((3, W), np.int32)))


def test_padded_edge_window():
    def seg(r):
        s = np.zeros((3, W), np.int32)
        s[1, W // 3:] = -1  # edge window: tail padding
        return s
    _check(*_case(3, seg, seed=1))


def test_fully_padded_bucket_window():
    def seg(r):
        s = np.zeros((4, W), np.int32)
        s[3, :] = -1  # bucket-padding window: everything masked
        return s
    _check(*_case(4, seg, seed=2))


def test_single_window():
    _check(*_case(1, lambda r: np.zeros((1, W), np.int32), seed=3))


def test_distinct_images_per_window():
    # window-major packing: each window holds ONE image's tokens; distinct
    # ids across windows must not interact (they can't — windows are
    # independent grid steps — but pin it anyway).
    def seg(r):
        s = np.tile(np.arange(5, dtype=np.int32)[:, None], (1, W))
        s[2, W // 2:] = -1
        return s
    _check(*_case(5, seg, seed=4))


@pytest.mark.slow
@pytest.mark.parametrize("windowed_impl", ["xla", "kernel"])
def test_encoder_windowed_paths_agree(windowed_impl):
    """vision_forward windowed layers via the shipping einsum path AND via
    the fused kernel (flash_interpret) == the dense XLA reference path, on
    a packed two-image batch with edge padding."""
    import dataclasses

    from dots_ocr_tpu.models import preprocess, vision
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import init_params
    from dots_ocr_tpu.models.vision import vision_forward
    from PIL import Image

    cfg = DotsOCRConfig.tiny()
    vcfg = dataclasses.replace(cfg.vision, window_size=4, full_attn_layers=(1,))
    cfg = cfg.replace(vision=vcfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = [
        Image.fromarray(rng.randint(0, 255, (56, 84, 3), np.uint8)),
        Image.fromarray(rng.randint(0, 255, (28, 56, 3), np.uint8)),
    ]
    packed = preprocess.pack_images(imgs, vcfg, bucket_step=64)
    args = (
        jnp.asarray(packed.patches),
        jnp.asarray(packed.rope_cos),
        jnp.asarray(packed.rope_sin),
        jnp.asarray(packed.segment_ids),
    )
    prev = vision.USE_WINDOW_KERNEL
    try:
        vision.USE_WINDOW_KERNEL = windowed_impl
        got = vision_forward(params["vision"], vcfg, *args,
                             attn_impl="flash_interpret")
    finally:
        vision.USE_WINDOW_KERNEL = prev
    want = vision_forward(params["vision"], vcfg, *args, attn_impl="xla")
    valid = np.asarray(packed.segment_ids) >= 0
    err = np.abs(np.asarray(got, np.float32) -
                 np.asarray(want, np.float32))[valid].max()
    assert err < 5e-2, err
