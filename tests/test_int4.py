"""Weight-only int4 path: packing, quantizer, Pallas kernel vs XLA
reference, layers.linear dispatch, and the param-tree quantizer.

The Pallas kernel itself runs in interpreter mode here (CPU); on TPU the
same kernel compiles natively (tools/bench_int4.py measures it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dots_ocr_tpu.models import layers
from dots_ocr_tpu.models.quantize import (
    int4_compatible,
    is_int4_kernel,
    is_quantized_kernel,
    quantize_decoder_params_int4,
    quantize_kernel_int4,
)
from dots_ocr_tpu.ops.int4_matmul import (
    int4_linear,
    int4_matmul,
    int4_matmul_reference,
    pack_int4,
    quantize_int4_np,
    unpack_int4,
)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.randint(-7, 8, (512, 256)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (256, 256) and packed.dtype == jnp.int8
    out = np.asarray(unpack_int4(packed))
    np.testing.assert_array_equal(out, q)


def test_numpy_and_jax_quantizers_agree():
    rng = np.random.RandomState(1)
    w = rng.randn(512, 256).astype(np.float32)
    packed_np, s_np, _ = quantize_int4_np(w)
    qk = quantize_kernel_int4(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(qk["qint4"]), packed_np)
    np.testing.assert_allclose(np.asarray(qk["scale4"]), s_np, rtol=1e-6)


def test_reference_matmul_accuracy():
    """Grouped int4 dequant matmul tracks the f32 matmul within the
    expected 4-bit quantization noise."""
    rng = np.random.RandomState(2)
    w = rng.randn(512, 256).astype(np.float32) * 0.05
    x = rng.randn(8, 512).astype(np.float32)
    qk = quantize_kernel_int4(jnp.asarray(w))
    ref = x @ w
    got = np.asarray(
        int4_matmul_reference(jnp.asarray(x), qk["qint4"], qk["scale4"])
    )
    rel_max = np.abs(got - ref).max() / np.abs(ref).max()
    rel_mean = np.abs(got - ref).mean() / np.abs(ref).mean()
    # Expected 4-bit noise on iid Gaussians: quant step s ~= 3sigma/7, so
    # the error std over a 512-deep contraction is
    # sqrt(512) * s/sqrt(12) ~= 0.12 of the output std. Real checkpoints
    # do better (outlier-light groups); this pins the analytic floor.
    assert rel_max < 0.3, rel_max
    assert rel_mean < 0.18, rel_mean


def test_pallas_interpret_matches_reference():
    rng = np.random.RandomState(3)
    w = rng.randn(512, 384).astype(np.float32) * 0.1
    x = (rng.randn(4, 512) * 0.5).astype(np.float32)
    qk = quantize_kernel_int4(jnp.asarray(w))
    xb = jnp.asarray(x, jnp.bfloat16)
    ref = int4_matmul_reference(xb, qk["qint4"], qk["scale4"]).astype(
        jnp.bfloat16
    )
    got = int4_matmul(xb, qk["qint4"], qk["scale4"], interpret=True)
    assert got.shape == (4, 384)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.02,
    )


def test_linear_dispatches_int4():
    rng = np.random.RandomState(4)
    w = rng.randn(256, 128).astype(np.float32) * 0.1
    b = rng.randn(128).astype(np.float32) * 0.01
    x = jnp.asarray(rng.randn(3, 5, 256), jnp.bfloat16)
    qk = quantize_kernel_int4(jnp.asarray(w))
    out = layers.linear(x, qk, jnp.asarray(b))
    assert out.shape == (3, 5, 128) and out.dtype == x.dtype
    ref = layers.linear(x, jnp.asarray(w), jnp.asarray(b))
    rel = (
        np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
        / max(np.abs(np.asarray(ref, np.float32)).max(), 1e-6)
    )
    assert rel < 0.3, rel  # 4-bit noise floor on Gaussians (see above)


def test_int4_linear_batched_leading_dims():
    rng = np.random.RandomState(5)
    w = rng.randn(256, 128).astype(np.float32)
    qk = quantize_kernel_int4(jnp.asarray(w))
    x = jnp.asarray(rng.randn(2, 256), jnp.float32)
    a = int4_linear(x, qk, impl="reference")
    b = int4_linear(x[None], qk, impl="reference")[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_tree_quantizer_int4_with_fallback():
    """Aligned block linears become int4; misaligned ones fall back to
    int8; embed stays per-row int8."""
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import zeros_params

    config = DotsOCRConfig.tiny()  # hidden 64: NOT int4-compatible
    params = zeros_params(config)
    q = quantize_decoder_params_int4(params)
    wq = q["decoder"]["blocks"]["attn"]["wq"]
    assert is_quantized_kernel(wq)  # int8 fallback
    assert is_quantized_kernel(q["decoder"]["embed"]) or isinstance(
        q["decoder"]["embed"], dict
    )

    # A synthetic aligned tree goes int4.
    aligned = {
        "blocks": {
            "attn": {
                "wq": jnp.zeros((2, 256, 128), jnp.float32),  # stacked
                "wo": jnp.zeros((256, 256), jnp.float32),
            },
            "mlp": {"gate": jnp.zeros((256, 512), jnp.float32)},
        },
    }
    q2 = quantize_decoder_params_int4(aligned, include_embed=False)
    assert is_int4_kernel(q2["blocks"]["attn"]["wo"])
    assert is_int4_kernel(q2["blocks"]["mlp"]["gate"])
    stacked = q2["blocks"]["attn"]["wq"]
    assert is_int4_kernel(stacked)
    assert stacked["qint4"].shape == (2, 128, 128)
    assert stacked["scale4"].shape == (2, 2, 128)


def test_int4_compatible_predicate():
    assert int4_compatible(jnp.zeros((256, 128)))
    assert int4_compatible(jnp.zeros((4, 512, 256)))
    assert not int4_compatible(jnp.zeros((100, 128)))
    assert not int4_compatible(jnp.zeros((256, 100)))


@pytest.mark.parametrize("s_tokens", [1, 7, 16, 33])
def test_pallas_pads_small_batches(s_tokens):
    rng = np.random.RandomState(6)
    w = rng.randn(256, 128).astype(np.float32) * 0.1
    qk = quantize_kernel_int4(jnp.asarray(w))
    x = jnp.asarray(rng.randn(s_tokens, 256), jnp.bfloat16)
    got = int4_matmul(x, qk["qint4"], qk["scale4"], interpret=True)
    ref = int4_matmul_reference(x, qk["qint4"], qk["scale4"]).astype(
        jnp.bfloat16
    )
    assert got.shape == (s_tokens, 128)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.02,
    )


def test_pallas_w4a8_matches_reference():
    """act_quant=True (int8 x int8 MXU dots) adds only per-token int8
    activation noise on top of the int4 weight noise."""
    rng = np.random.RandomState(7)
    w = rng.randn(512, 384).astype(np.float32) * 0.1
    x = (rng.randn(8, 512) * 0.5).astype(np.float32)
    qk = quantize_kernel_int4(jnp.asarray(w))
    xb = jnp.asarray(x, jnp.bfloat16)
    ref = np.asarray(
        int4_matmul_reference(xb, qk["qint4"], qk["scale4"]), np.float32
    )
    got = np.asarray(
        int4_matmul(xb, qk["qint4"], qk["scale4"], interpret=True,
                    act_quant=True),
        np.float32,
    )
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel  # A8 noise alone: ~1/127 per element
