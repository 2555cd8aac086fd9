"""Model configuration for the dots.ocr VLM rebuilt TPU-native.

Architecture facts from the reference blog (``assets/blog.md:997-1002``): a
1.2B NaViT-style vision encoder trained from scratch, aligned to a
Qwen2.5-1.5B language decoder; resolution contract factor 28 = patch 14 x
spatial-merge 2 (``dots_ocr/utils/consts.py:1-3``).

Exact vision block count/dims are [EXTERNAL — verified against the HF
checkpoint config at weight-load time]; the defaults below follow the
published checkpoint (42 blocks, width 1536, 12 heads, patch 14, 2x2 merge,
SwiGLU, RMSNorm, 2D-RoPE). Decoder defaults are the Qwen2.5-1.5B spec
(hidden 1536, 28 layers, GQA 12q/2kv, intermediate 8960, rope theta 1e6,
tied embeddings). ``loader.from_checkpoint`` overrides every field from the
checkpoint's config.json when one is present.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
import jax.numpy as jnp


@dataclass(frozen=True)
class VisionConfig:
    """NaViT-style variable-resolution vision encoder."""

    hidden_size: int = 1536
    num_layers: int = 42
    num_heads: int = 12
    head_dim: int = 128
    intermediate_size: int = 4224
    patch_size: int = 14
    temporal_patch_size: int = 1
    spatial_merge_size: int = 2
    in_channels: int = 3
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # Post-norm residual blocks (NaViT convention per SURVEY.md §2.4).
    post_norm: bool = True
    qkv_bias: bool = True
    # 0 = full per-image attention in every layer (NaViT default; matches
    # the published dots.ocr vision tower). >0 = windowed attention over
    # window_size x window_size RAW-PATCH tiles (must be a multiple of
    # spatial_merge_size); layers listed in full_attn_layers still attend
    # image-wide (Qwen2.5-VL-style policy). Tokens are packed window-major
    # so the flash kernel's segment-range tile skip makes windowed layers
    # near-linear in sequence length. [EXTERNAL — set from the checkpoint
    # config at load time.]
    window_size: int = 0
    full_attn_layers: tuple = ()
    # Input normalization (OpenAI-CLIP family) applied ON DEVICE — patches
    # travel host->device as uint8 (4x less transfer than f32).
    # [EXTERNAL — overridden from the checkpoint's preprocessor_config.json.]
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def merge_dim(self) -> int:
        return self.hidden_size * self.spatial_merge_size**2


@dataclass(frozen=True)
class DecoderConfig:
    """Qwen2.5-style causal decoder with GQA."""

    vocab_size: int = 151936
    hidden_size: int = 1536
    num_layers: int = 28
    num_heads: int = 12
    num_kv_heads: int = 2
    head_dim: int = 128
    intermediate_size: int = 8960
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    qkv_bias: bool = True  # Qwen2-family uses q/k/v projection biases
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 131072

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


@dataclass(frozen=True)
class SpecialTokens:
    """Token ids for chat structure and the image span.

    Values follow the Qwen2.5 tokenizer family; the dots.ocr image tokens
    (`<|img|><|imgpad|><|endofimg|>`, hardcoded by the reference client at
    ``dots_ocr/model/inference.py:33``) are [EXTERNAL — re-read from the
    checkpoint tokenizer at load time].
    """

    eos_token_id: int = 151645  # <|im_end|>
    pad_token_id: int = 151643  # <|endoftext|>
    im_start_id: int = 151644  # <|im_start|>
    im_end_id: int = 151645  # <|im_end|>
    img_id: int = 151665  # <|img|>
    imgpad_id: int = 151666  # <|imgpad|>
    endofimg_id: int = 151667  # <|endofimg|>


@dataclass(frozen=True)
class DotsOCRConfig:
    """Full VLM: vision encoder -> 2x2 merger/projector -> causal decoder."""

    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    special: SpecialTokens = dataclasses.field(default_factory=SpecialTokens)
    dtype: str = "bfloat16"

    @property
    def jax_dtype(self):
        return jnp.dtype(self.dtype)

    def replace(self, **kwargs) -> "DotsOCRConfig":
        return dataclasses.replace(self, **kwargs)

    # ------------------------------------------------------------------
    # Factory configs
    # ------------------------------------------------------------------

    @staticmethod
    def flagship() -> "DotsOCRConfig":
        """The ~3B production model (1.2B ViT + Qwen2.5-1.5B decoder)."""
        return DotsOCRConfig()

    @staticmethod
    def tiny(vocab_size: int = 512) -> "DotsOCRConfig":
        """A structurally identical miniature for CPU tests."""
        return DotsOCRConfig(
            vision=VisionConfig(
                hidden_size=32,
                num_layers=2,
                num_heads=2,
                head_dim=16,
                intermediate_size=64,
            ),
            decoder=DecoderConfig(
                vocab_size=vocab_size,
                hidden_size=64,
                num_layers=2,
                num_heads=4,
                num_kv_heads=2,
                head_dim=16,
                intermediate_size=128,
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

    @staticmethod
    def small(vocab_size: int = 32000) -> "DotsOCRConfig":
        """A mid-size config for single-chip experiments."""
        return DotsOCRConfig(
            vision=VisionConfig(hidden_size=512, num_layers=8, num_heads=8, head_dim=64,
                                intermediate_size=1408),
            decoder=DecoderConfig(
                vocab_size=vocab_size,
                hidden_size=1024,
                num_layers=12,
                num_heads=16,
                num_kv_heads=4,
                head_dim=64,
                intermediate_size=2816,
            ),
        )
