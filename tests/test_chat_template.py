"""Checkpoint chat-template loading (Jinja) vs builtin rendering."""

import json

import pytest

from dots_ocr_tpu.engine import chat_template as ct


@pytest.fixture(autouse=True)
def _reset_template():
    yield
    ct._CHECKPOINT_TEMPLATE = None


def test_builtin_render():
    out = ct.render_chat("hello", system_prompt="sys")
    assert out == (
        "<|im_start|>system\nsys<|im_end|>\n"
        "<|im_start|>user\nhello<|im_end|>\n<|im_start|>assistant\n"
    )


def test_checkpoint_jinja_template(tmp_path):
    template = (
        "{% for message in messages %}"
        "<<{{ message.role }}>>{{ message.content }}<<end>>\n"
        "{% endfor %}"
        "{% if add_generation_prompt %}<<assistant>>{% endif %}"
    )
    (tmp_path / "chat_template.json").write_text(
        json.dumps({"chat_template": template})
    )
    assert ct.load_checkpoint_template(str(tmp_path)) == template
    out = ct.render_chat("ask", system_prompt="be nice")
    assert out == "<<system>>be nice<<end>>\n<<user>>ask<<end>>\n<<assistant>>"


def test_tokenizer_config_fallback(tmp_path):
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"chat_template": "X{{ messages[0].content }}Y"})
    )
    assert ct.load_checkpoint_template(str(tmp_path))
    assert ct.render_chat("q") == "XqY"


def test_missing_template_keeps_builtin(tmp_path):
    assert ct.load_checkpoint_template(str(tmp_path)) is None
    assert "<|im_start|>" in ct.render_chat("q")
