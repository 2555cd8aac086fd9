"""Chat templating + image-span expansion.

The reference client sends OpenAI chat messages whose user text is prefixed
with the literal image placeholder ``<|img|><|imgpad|><|endofimg|>``
(``dots_ocr/model/inference.py:33``); the server's chat template (Qwen2.5
``<|im_start|>`` format, applied with ``--chat-template-content-format
string``, ``docker/docker-compose.yml:38``) wraps it, and the processor
expands ``<|imgpad|>`` to one token per merged vision token.

[EXTERNAL — template text verified against the checkpoint's
chat_template.json at load time.]
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from dots_ocr_tpu.engine.tokenizer import TokenizerLike

IMAGE_PLACEHOLDER = "<|img|><|imgpad|><|endofimg|>"


def render_chat(user_content: str, system_prompt: Optional[str] = None) -> str:
    """Qwen2.5-style chat rendering with generation prompt."""
    parts = []
    if system_prompt:
        parts.append(f"<|im_start|>system\n{system_prompt}<|im_end|>\n")
    parts.append(f"<|im_start|>user\n{user_content}<|im_end|>\n")
    parts.append("<|im_start|>assistant\n")
    return "".join(parts)


def build_prompt_ids(
    tokenizer: TokenizerLike,
    prompt: str,
    num_image_tokens: Sequence[int] = (),
    system_prompt: Optional[str] = None,
    add_placeholder_if_missing: bool = True,
) -> List[int]:
    """Render + tokenize a request, expanding each image placeholder to its
    merged-vision-token count.

    ``num_image_tokens[i]`` is the merged token count of the i-th image. If
    the prompt lacks a placeholder but images are present, one is prepended
    per image (matching the reference client's hardcoded prefix).
    """
    n_placeholders = prompt.count(IMAGE_PLACEHOLDER)
    if num_image_tokens and n_placeholders == 0 and add_placeholder_if_missing:
        prompt = IMAGE_PLACEHOLDER * len(num_image_tokens) + prompt
        n_placeholders = len(num_image_tokens)
    if n_placeholders != len(num_image_tokens):
        raise ValueError(
            f"{n_placeholders} image placeholders but {len(num_image_tokens)} images"
        )

    text = render_chat(prompt, system_prompt)

    img_id = tokenizer.token_id("<|img|>")
    imgpad_id = tokenizer.token_id("<|imgpad|>")
    endofimg_id = tokenizer.token_id("<|endofimg|>")

    ids: List[int] = []
    image_idx = 0
    chunks = text.split(IMAGE_PLACEHOLDER)
    for i, chunk in enumerate(chunks):
        if i > 0:
            ids.append(img_id)
            ids.extend([imgpad_id] * int(num_image_tokens[image_idx]))
            ids.append(endofimg_id)
            image_idx += 1
        if chunk:
            ids.extend(tokenizer.encode(chunk))
    return ids
