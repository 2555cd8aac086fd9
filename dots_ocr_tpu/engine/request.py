"""Request preparation shared by the sync and continuous-batching engines:
images -> smart-resize -> packed patches; prompt -> chat-templated token ids
with expanded image spans."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import numpy as np
from PIL import Image

from dots_ocr_tpu.engine.chat_template import build_prompt_ids
from dots_ocr_tpu.engine.tokenizer import TokenizerLike
from dots_ocr_tpu.models import preprocess
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.utils.consts import MAX_PIXELS, MIN_PIXELS
from dots_ocr_tpu.utils.image_io import fetch_image


@dataclass
class PreparedRequest:
    prompt_ids: List[int]
    packed: Optional[preprocess.PackedVisionInput]  # None for text-only

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_ids)


def prepare_request(
    tokenizer: TokenizerLike,
    config: DotsOCRConfig,
    prompt: str,
    images: Sequence[Union[Image.Image, str]] = (),
    system_prompt: Optional[str] = None,
    min_pixels: Optional[int] = None,
    max_pixels: Optional[int] = None,
    vision_bucket_step: int = 512,
) -> PreparedRequest:
    cfg = config.vision
    grid = cfg.patch_size * cfg.spatial_merge_size
    resized = [
        fetch_image(
            img,
            min_pixels=min_pixels or MIN_PIXELS,
            max_pixels=max_pixels or MAX_PIXELS,
        )
        for img in images
    ]
    counts = [(im.width // grid) * (im.height // grid) for im in resized]
    packed = (
        preprocess.pack_images(resized, cfg, bucket_step=vision_bucket_step)
        if resized
        else None
    )
    ids = build_prompt_ids(tokenizer, prompt, counts, system_prompt=system_prompt)
    return PreparedRequest(prompt_ids=ids, packed=packed)
