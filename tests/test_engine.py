"""Engine tests: sampling, tokenizer, chat template, end-to-end generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dots_ocr_tpu.engine.chat_template import IMAGE_PLACEHOLDER, build_prompt_ids, render_chat
from dots_ocr_tpu.engine.engine import InferenceEngine
from dots_ocr_tpu.engine.sampling import sample_logits
from dots_ocr_tpu.engine.tokenizer import ByteTokenizer
from dots_ocr_tpu.models.config import DotsOCRConfig


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------


def test_greedy_when_temperature_zero():
    logits = jnp.array([[0.0, 5.0, 1.0], [3.0, 0.0, -1.0]])
    toks = sample_logits(jax.random.PRNGKey(0), logits, jnp.array(0.0), jnp.array(1.0))
    assert toks.tolist() == [1, 0]


def test_top_p_restricts_support():
    # One dominant token (p ~ 0.97): top_p=0.5 must always pick it.
    logits = jnp.array([[8.0, 2.0, 1.0, 0.0]])
    picks = set()
    for i in range(20):
        t = sample_logits(
            jax.random.PRNGKey(i), logits, jnp.array(1.0), jnp.array(0.5)
        )
        picks.add(int(t[0]))
    assert picks == {0}


def test_top_p_one_samples_broadly():
    logits = jnp.zeros((1, 4))  # uniform
    picks = {
        int(sample_logits(jax.random.PRNGKey(i), logits, jnp.array(1.0), jnp.array(1.0))[0])
        for i in range(40)
    }
    assert len(picks) >= 3


def test_top_p_exact_support_large_vocab():
    """The top-k nucleus path must keep exactly the tokens whose preceding
    cumulative (true, full-vocab) mass is < top_p."""
    v = 1000
    probs = np.full(v, 0.05 / (v - 4))
    probs[:4] = [0.5, 0.3, 0.1, 0.05]
    logits = jnp.log(jnp.asarray(probs, jnp.float32))[None, :]
    # cum-before: 0, .5, .8, .9 -> top_p=0.85 keeps {0, 1, 2}
    picks = {
        int(sample_logits(jax.random.PRNGKey(i), logits,
                          jnp.array(1.0), jnp.array(0.85))[0])
        for i in range(300)
    }
    assert picks == {0, 1, 2}


def test_top_p_one_row_not_truncated_to_top_k():
    """Rows with top_p >= 1 inside a nucleus batch sample the FULL vocab,
    not just the top-K pool."""
    v = 1024  # uniform: any single draw lands past index 255 w.p. 0.75
    logits = jnp.zeros((1, v))
    picks = [
        int(sample_logits(jax.random.PRNGKey(i), logits,
                          jnp.array(1.0), jnp.array(1.0), nucleus=True)[0])
        for i in range(60)
    ]
    assert max(picks) >= 256


def test_per_row_temperature():
    logits = jnp.array([[0.0, 5.0, 1.0], [0.0, 5.0, 1.0]])
    toks = sample_logits(
        jax.random.PRNGKey(0), logits, jnp.array([0.0, 1.0]), jnp.array([1.0, 1.0])
    )
    assert int(toks[0]) == 1  # greedy row


# ---------------------------------------------------------------------------
# Tokenizer + template
# ---------------------------------------------------------------------------


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    ids = tok.encode("hello, wörld!")
    assert tok.decode(ids) == "hello, wörld!"


def test_byte_tokenizer_specials():
    tok = ByteTokenizer()
    ids = tok.encode("<|img|><|imgpad|><|endofimg|>hi")
    assert ids[:3] == [tok.token_id("<|img|>"), tok.token_id("<|imgpad|>"), tok.token_id("<|endofimg|>")]
    assert tok.decode(ids) == "hi"
    assert tok.decode(ids, skip_special_tokens=False).startswith("<|img|>")


def test_render_chat():
    s = render_chat("question", system_prompt="sys")
    assert s == (
        "<|im_start|>system\nsys<|im_end|>\n"
        "<|im_start|>user\nquestion<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_build_prompt_ids_expands_image_span():
    tok = ByteTokenizer()
    ids = build_prompt_ids(tok, f"{IMAGE_PLACEHOLDER}parse", num_image_tokens=[5])
    assert ids.count(tok.token_id("<|imgpad|>")) == 5
    assert ids.count(tok.token_id("<|img|>")) == 1
    assert ids.count(tok.token_id("<|endofimg|>")) == 1


def test_build_prompt_ids_auto_placeholder():
    tok = ByteTokenizer()
    ids = build_prompt_ids(tok, "no placeholder", num_image_tokens=[3])
    assert ids.count(tok.token_id("<|imgpad|>")) == 3


def test_build_prompt_ids_mismatch_raises():
    tok = ByteTokenizer()
    with pytest.raises(ValueError):
        build_prompt_ids(
            tok, f"{IMAGE_PLACEHOLDER}{IMAGE_PLACEHOLDER}", num_image_tokens=[3]
        )


# ---------------------------------------------------------------------------
# End-to-end generate (tiny random model)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine.random_init(
        DotsOCRConfig.tiny(),
        prompt_bucket_step=32,
        vision_bucket_step=16,
        default_max_new_tokens=8,
    )


def test_generate_text_only(engine):
    out = engine.generate_one("hello", temperature=0.0, max_new_tokens=6)
    assert isinstance(out, str)
    stats = engine.last_stats
    assert stats.prompt_tokens > 0
    assert stats.completion_tokens <= 6


def test_generate_deterministic_greedy(engine):
    a = engine.generate_one("abc", temperature=0.0, max_new_tokens=6)
    b = engine.generate_one("abc", temperature=0.0, max_new_tokens=6)
    assert a == b


def test_generate_seeded_sampling_reproducible(engine):
    a = engine.generate_one("abc", temperature=0.9, max_new_tokens=6, seed=7)
    b = engine.generate_one("abc", temperature=0.9, max_new_tokens=6, seed=7)
    assert a == b


def test_generate_with_image(engine):
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    out = engine.generate_one(
        "describe", images=[img], temperature=0.0, max_new_tokens=4
    )
    assert isinstance(out, str)
    assert engine.last_stats.vision_tokens > 0


def test_generate_batch_mixed(engine):
    rng = np.random.RandomState(1)
    img = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    outs = engine.generate_batch(
        ["one", "two"],
        [[img], [img]],
        temperature=0.0,
        max_new_tokens=4,
    )
    assert len(outs) == 2
