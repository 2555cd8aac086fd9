"""InferenceEngine: the in-process image+prompt -> text path.

This is the TPU-native replacement for both of the reference's inference
routes — the HF in-process path (``dots_ocr/parser.py:62-117``) and, through
``serve/server.py``, the vLLM HTTP path. It owns params, tokenizer, and the
jitted generate function; requests are preprocessed (smart-resize ->
patchify -> prompt ids) on host and executed with bucketed static shapes.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dots_ocr_tpu.engine.chat_template import build_prompt_ids
from dots_ocr_tpu.engine.generate import bucket_length, generate
from dots_ocr_tpu.engine.tokenizer import ByteTokenizer, TokenizerLike, load_tokenizer
from dots_ocr_tpu.models import preprocess
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params, zeros_params
from dots_ocr_tpu.models.vlm import build_scatter_indices
from dots_ocr_tpu.utils.consts import MAX_PIXELS, MIN_PIXELS
from dots_ocr_tpu.utils.image_io import fetch_image

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class RequestStats:
    prompt_tokens: int = 0
    vision_tokens: int = 0
    completion_tokens: int = 0
    prefill_seconds: float = 0.0
    decode_seconds: float = 0.0


class InferenceEngine:
    """Single-program batch engine over the jitted generate loop."""

    def __init__(
        self,
        params,
        config: DotsOCRConfig,
        tokenizer: Optional[TokenizerLike] = None,
        prompt_bucket_step: int = 128,
        vision_bucket_step: int = 512,
        default_max_new_tokens: int = 16384,
        attn_impl: str = "auto",
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer or self._default_tokenizer(config)
        self.prompt_bucket_step = prompt_bucket_step
        self.vision_bucket_step = vision_bucket_step
        self.default_max_new_tokens = default_max_new_tokens
        if attn_impl == "auto":
            # Pallas flash attention on TPU (required for 14k-token vision
            # sequences); dense XLA reference elsewhere (CPU tests).
            attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
        self.attn_impl = attn_impl
        self._rng = jax.random.PRNGKey(0)
        self.last_stats = RequestStats()

    @staticmethod
    def _default_tokenizer(config: DotsOCRConfig) -> TokenizerLike:
        sp = config.special
        return ByteTokenizer(
            special_ids={
                "<|endoftext|>": sp.pad_token_id,
                "<|im_start|>": sp.im_start_id,
                "<|im_end|>": sp.im_end_id,
                "<|img|>": sp.img_id,
                "<|imgpad|>": sp.imgpad_id,
                "<|endofimg|>": sp.endofimg_id,
            },
            vocab_size=config.decoder.vocab_size,
        )

    @classmethod
    def from_pretrained(
        cls, model_path: str, config: Optional[DotsOCRConfig] = None, **kwargs
    ) -> "InferenceEngine":
        from dots_ocr_tpu.engine.chat_template import load_checkpoint_template
        from dots_ocr_tpu.models.loader import load_checkpoint

        config, params = load_checkpoint(model_path, config=config)
        tokenizer = load_tokenizer(model_path)
        if load_checkpoint_template(model_path):
            logger.info("using the checkpoint's own chat template")
        return cls(params, config, tokenizer=tokenizer, **kwargs)

    @classmethod
    def random_init(
        cls, config: Optional[DotsOCRConfig] = None, seed: int = 0, zeros: bool = False, **kwargs
    ) -> "InferenceEngine":
        """Weightless engine (tests, compile checks, throughput benches)."""
        config = config or DotsOCRConfig.tiny()
        params = (
            zeros_params(config)
            if zeros
            else init_params(jax.random.PRNGKey(seed), config)
        )
        return cls(params, config, **kwargs)

    # ------------------------------------------------------------------

    def _next_rng(self) -> jax.Array:
        self._rng, out = jax.random.split(self._rng)
        return out

    def _prepare_images(
        self,
        images: Sequence[Union[Image.Image, str]],
        min_pixels: Optional[int],
        max_pixels: Optional[int],
    ) -> List[Image.Image]:
        return [
            fetch_image(
                img,
                min_pixels=min_pixels or MIN_PIXELS,
                max_pixels=max_pixels or MAX_PIXELS,
            )
            for img in images
        ]

    def generate_batch(
        self,
        prompts: Sequence[str],
        images_per_prompt: Sequence[Sequence[Union[Image.Image, str]]],
        temperature: Union[float, Sequence[float]] = 0.1,
        top_p: Union[float, Sequence[float]] = 1.0,
        max_new_tokens: Optional[int] = None,
        system_prompt: Optional[str] = None,
        min_pixels: Optional[int] = None,
        max_pixels: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> List[str]:
        """Run a synchronous batch: one generated string per prompt."""
        assert len(prompts) == len(images_per_prompt)
        batch = len(prompts)
        max_new = max_new_tokens or self.default_max_new_tokens
        cfg = self.config
        merge = cfg.vision.spatial_merge_size**2

        # Host preprocessing: resize + pack all images across the batch.
        all_images: List[Image.Image] = []
        counts: List[List[int]] = []
        for images in images_per_prompt:
            resized = self._prepare_images(images, min_pixels, max_pixels)
            counts.append(
                [
                    (im.width // (cfg.vision.patch_size * cfg.vision.spatial_merge_size))
                    * (im.height // (cfg.vision.patch_size * cfg.vision.spatial_merge_size))
                    for im in resized
                ]
            )
            all_images.extend(resized)

        packed = None
        if all_images:
            packed = preprocess.pack_images(
                all_images, cfg.vision, bucket_step=self.vision_bucket_step
            )

        # Prompt ids with expanded image spans.
        ids_list = [
            build_prompt_ids(
                self.tokenizer, prompt, counts[i], system_prompt=system_prompt
            )
            for i, prompt in enumerate(prompts)
        ]
        max_len = max(len(ids) for ids in ids_list)
        t_bucket = bucket_length(max_len, self.prompt_bucket_step)
        input_ids = np.full((batch, t_bucket), cfg.special.pad_token_id, np.int32)
        seq_lens = np.zeros(batch, np.int32)
        for i, ids in enumerate(ids_list):
            input_ids[i, : len(ids)] = ids
            seq_lens[i] = len(ids)

        kwargs = {}
        if packed is not None:
            sb, sp_idx = build_scatter_indices(
                input_ids,
                cfg.special.imgpad_id,
                packed.patches.shape[0] // merge,
                valid_rows=packed.merged_valid_rows(merge),
            )
            kwargs = dict(
                patches=jnp.asarray(packed.patches),
                pos2d=jnp.asarray(packed.pos2d),
                segment_ids=jnp.asarray(packed.segment_ids),
                scatter_batch=jnp.asarray(sb),
                scatter_pos=jnp.asarray(sp_idx),
            )
            if packed.window_ids is not None:
                kwargs["window_ids"] = jnp.asarray(packed.window_ids)

        temp = np.broadcast_to(np.asarray(temperature, np.float32), (batch,)).copy()
        tp = np.broadcast_to(np.asarray(top_p, np.float32), (batch,)).copy()
        rng = jax.random.PRNGKey(seed) if seed is not None else self._next_rng()

        nucleus = bool(np.any(tp < 1.0))
        t0 = time.perf_counter()
        result = generate(
            self.params,
            cfg,
            jnp.asarray(input_ids),
            jnp.asarray(seq_lens),
            rng,
            jnp.asarray(temp),
            jnp.asarray(tp),
            max_new_tokens=max_new,
            attn_impl=self.attn_impl,
            nucleus=nucleus,
            **kwargs,
        )
        tokens = np.asarray(result.tokens)
        counts_out = np.asarray(result.num_generated)
        elapsed = time.perf_counter() - t0

        self.last_stats = RequestStats(
            prompt_tokens=int(seq_lens.sum()),
            vision_tokens=packed.num_merged if packed else 0,
            completion_tokens=int(counts_out.sum()),
            decode_seconds=elapsed,
        )

        texts = []
        eos = cfg.special.eos_token_id
        for i in range(batch):
            ids = tokens[i, : counts_out[i]].tolist()
            if ids and ids[-1] == eos:
                ids = ids[:-1]
            texts.append(self.tokenizer.decode(ids, skip_special_tokens=True))
        return texts

    def generate_one(
        self,
        prompt: str,
        images: Sequence[Union[Image.Image, str]] = (),
        **kwargs,
    ) -> str:
        return self.generate_batch([prompt], [list(images)], **kwargs)[0]
