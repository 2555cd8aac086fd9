"""int4-quantized decode through the continuous engine (CPU reference path).

Uses an int4-ALIGNED miniature config (hidden 256: in%256==0, out%128==0
for every decoder linear) — the stock tiny config (hidden 64) falls back
to int8 and would not exercise the path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dots_ocr_tpu.models.config import (
    DecoderConfig,
    DotsOCRConfig,
    SpecialTokens,
    VisionConfig,
)
from dots_ocr_tpu.models.init import init_params
from dots_ocr_tpu.models.quantize import (
    is_int4_kernel,
    quantize_decoder_params_int4,
)


def aligned_tiny(vocab_size: int = 512) -> DotsOCRConfig:
    return DotsOCRConfig(
        vision=VisionConfig(
            hidden_size=32, num_layers=2, num_heads=2, head_dim=16,
            intermediate_size=64,
        ),
        decoder=DecoderConfig(
            vocab_size=vocab_size,
            hidden_size=256,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=64,
            intermediate_size=512,
        ),
        special=SpecialTokens(
            eos_token_id=vocab_size - 1,
            pad_token_id=0,
            im_start_id=vocab_size - 2,
            im_end_id=vocab_size - 1,
            img_id=vocab_size - 5,
            imgpad_id=vocab_size - 4,
            endofimg_id=vocab_size - 3,
        ),
        dtype="float32",
    )


@pytest.fixture(scope="module")
def setup():
    cfg = aligned_tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def build_engine(setup, params=None):
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )

    cfg, base = setup
    return ContinuousBatchingEngine(
        params if params is not None else base,
        cfg,
        sched=SchedulerConfig(
            num_pages=64, page_size=8, max_slots=4, max_pages_per_seq=32,
            prompt_bucket_step=32, vision_bucket_step=16, steps_per_sync=2,
        ),
        default_max_new_tokens=8,
    )


def test_tree_goes_int4(setup):
    cfg, params = setup
    q = quantize_decoder_params_int4(params)
    blocks = q["decoder"]["blocks"]
    for grp, name in [("attn", "wq"), ("attn", "wo"),
                      ("mlp", "gate"), ("mlp", "down")]:
        assert is_int4_kernel(blocks[grp][name]), (grp, name)
    # stacked leaves: packed halves the in axis
    wq = blocks["attn"]["wq"]["qint4"]
    assert wq.shape == (cfg.decoder.num_layers, 128, 256)


def test_int4_engine_decodes_full_budget(setup):
    cfg, params = setup
    eng = build_engine(setup, quantize_decoder_params_int4(params))
    out = eng.generate_one("hello int4 world", temperature=0.0,
                           max_new_tokens=12)
    assert isinstance(out, str)


def test_int4_tokens_match_dequantized_tree(setup):
    """Greedy decode over the int4 tree must match a bf16 tree built by
    dequantizing the SAME int4 values — the grouped kernel vs the plain
    einsum differ only in f32 summation order."""
    from dots_ocr_tpu.ops.int4_matmul import GROUP, unpack_int4

    cfg, params = setup
    q = quantize_decoder_params_int4(params)

    def dequant(tree):
        if is_int4_kernel(tree):
            packed, s = tree["qint4"], tree["scale4"]

            def one(p2, s2):
                qv = unpack_int4(p2).astype(jnp.float32)  # [in, out]
                g = qv.shape[0] // GROUP
                return (
                    qv.reshape(g, GROUP, -1) * s2[:, None, :]
                ).reshape(qv.shape)

            if packed.ndim == 3:
                return jax.vmap(one)(packed, s)
            return one(packed, s)
        if isinstance(tree, dict):
            return {k: dequant(v) for k, v in tree.items()}
        return tree

    deq = dequant(q)
    a = build_engine(setup, q).generate_one(
        "the quick brown fox", temperature=0.0, max_new_tokens=10
    )
    b = build_engine(setup, deq).generate_one(
        "the quick brown fox", temperature=0.0, max_new_tokens=10
    )
    assert a == b
