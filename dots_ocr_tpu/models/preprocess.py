"""Host-side vision preprocessing: image -> packed patches + metadata.

Produces exactly what ``vision.encode_images`` consumes: an im2col patch
matrix in merge-contiguous order, 2D-RoPE tables, and segment ids. All numpy
(this runs in the request path on the host while the TPU computes), all
shapes bucket-padded so the device sees a small set of static shapes.

Replaces the qwen_vl_utils processor the reference depends on
(``requirements.txt:7``, ``parser.py:98-105``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image

from dots_ocr_tpu.models.config import VisionConfig
from dots_ocr_tpu.models.rope import vision_grid_positions, vision_rope_table

# OpenAI-CLIP-family normalization [EXTERNAL — the checkpoint's
# preprocessor_config.json overrides these at load time].
DEFAULT_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
DEFAULT_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass
class PackedVisionInput:
    """Device-ready packed vision batch."""

    patches: np.ndarray        # [T_pad, patch_dim] float32
    rope_cos: np.ndarray       # [T_pad, head_dim] float32
    rope_sin: np.ndarray       # [T_pad, head_dim] float32
    segment_ids: np.ndarray    # [T_pad] int32, -1 = padding
    grids: List[Tuple[int, int]]  # per-image (grid_h, grid_w) in raw patches
    num_tokens: int            # valid (unpadded) raw patch count
    num_merged: int            # valid merged tokens = num_tokens / merge^2

    def merged_valid_mask(self) -> np.ndarray:
        """Bool [T_pad / merge^2]: which merged rows are real tokens."""
        merged_total = self.segment_ids.shape[0] // 4
        mask = np.zeros(merged_total, dtype=bool)
        mask[: self.num_merged] = True
        return mask


def extract_patches(
    image: Image.Image,
    cfg: VisionConfig,
    mean: Sequence[float] = DEFAULT_IMAGE_MEAN,
    std: Sequence[float] = DEFAULT_IMAGE_STD,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Image (already smart-resized to the 28-grid) -> patch matrix.

    Returns (patches [grid_h*grid_w, patch_dim] float32 in merge-contiguous
    order, (grid_h, grid_w)).
    """
    arr = np.asarray(image.convert("RGB"), dtype=np.float32) / 255.0
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    h, w, c = arr.shape
    p = cfg.patch_size
    assert h % (p * cfg.spatial_merge_size) == 0, f"height {h} not on the grid"
    assert w % (p * cfg.spatial_merge_size) == 0, f"width {w} not on the grid"
    grid_h, grid_w = h // p, w // p

    # im2col: [gh, p, gw, p, c] -> [gh, gw, p*p*c] (row-major patch pixels,
    # channel-last inside the patch to match conv weight reshaping in the
    # loader).
    patches = (
        arr.reshape(grid_h, p, grid_w, p, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(grid_h, grid_w, p * p * c)
    )

    # Reorder into merge-contiguous order (2x2 blocks adjacent) to match
    # vision_grid_positions; the merger is then a pure reshape on device.
    m = cfg.spatial_merge_size
    hb, wb = grid_h // m, grid_w // m
    patches = (
        patches.reshape(hb, m, wb, m, -1)
        .transpose(0, 2, 1, 3, 4)
        .reshape(grid_h * grid_w, -1)
    )
    return patches.astype(np.float32), (grid_h, grid_w)


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def token_bucket(num_tokens: int, bucket_step: int = 512, min_bucket: int = 512) -> int:
    """Pad the packed token count to a bucket so jit compiles a few shapes."""
    return max(min_bucket, _round_up(num_tokens, bucket_step))


def merge_packed(
    packed_list: Sequence["PackedVisionInput"],
    cfg: VisionConfig,
    bucket_step: int = 512,
) -> "PackedVisionInput":
    """Merge several per-request packs into one token axis (batched prefill).

    Valid (unpadded) regions are concatenated in request order — which
    matches the row-major imgpad scatter order of a batched prompt — and
    segment ids are offset so images never alias across requests.
    """
    parts_p, parts_c, parts_s, parts_seg = [], [], [], []
    grids = []
    seg_offset = 0
    for packed in packed_list:
        n = packed.num_tokens
        parts_p.append(packed.patches[:n])
        parts_c.append(packed.rope_cos[:n])
        parts_s.append(packed.rope_sin[:n])
        parts_seg.append(packed.segment_ids[:n] + seg_offset)
        seg_offset += len(packed.grids)
        grids.extend(packed.grids)

    patches = np.concatenate(parts_p, axis=0) if parts_p else np.zeros((0, cfg.patch_dim), np.float32)
    total = patches.shape[0]
    merge = cfg.spatial_merge_size**2
    padded = token_bucket(total, bucket_step=bucket_step)

    def pad(a, fill, feature_shape):
        out = np.full((padded,) + feature_shape, fill, a.dtype if len(a) else np.float32)
        if len(a):
            out[:total] = a
        return out

    return PackedVisionInput(
        patches=pad(patches, 0.0, (cfg.patch_dim,)),
        rope_cos=pad(np.concatenate(parts_c, axis=0) if parts_c else np.ones((0, cfg.head_dim), np.float32), 1.0, (cfg.head_dim,)),
        rope_sin=pad(np.concatenate(parts_s, axis=0) if parts_s else np.zeros((0, cfg.head_dim), np.float32), 0.0, (cfg.head_dim,)),
        segment_ids=pad(np.concatenate(parts_seg, axis=0).astype(np.int32) if parts_seg else np.zeros((0,), np.int32), -1, ()),
        grids=grids,
        num_tokens=total,
        num_merged=total // merge,
    )


def pack_images(
    images: Sequence[Image.Image],
    cfg: VisionConfig,
    bucket_step: int = 512,
    mean: Sequence[float] = DEFAULT_IMAGE_MEAN,
    std: Sequence[float] = DEFAULT_IMAGE_STD,
) -> PackedVisionInput:
    """Pack N smart-resized images into one padded token axis."""
    all_patches = []
    all_cos = []
    all_sin = []
    all_seg = []
    grids = []
    for idx, image in enumerate(images):
        patches, (gh, gw) = extract_patches(image, cfg, mean, std)
        pos2d = vision_grid_positions(gh, gw)
        cos, sin = vision_rope_table(pos2d, cfg.head_dim, cfg.rope_theta)
        all_patches.append(patches)
        all_cos.append(cos)
        all_sin.append(sin)
        all_seg.append(np.full(patches.shape[0], idx, np.int32))
        grids.append((gh, gw))

    patches = np.concatenate(all_patches, axis=0) if all_patches else np.zeros(
        (0, cfg.patch_dim), np.float32
    )
    total = patches.shape[0]
    merge = cfg.spatial_merge_size**2
    assert total % merge == 0
    padded = token_bucket(total, bucket_step=bucket_step)

    def pad(a: np.ndarray, fill=0.0) -> np.ndarray:
        out_shape = (padded,) + a.shape[1:]
        out = np.full(out_shape, fill, a.dtype)
        out[:total] = a
        return out

    return PackedVisionInput(
        patches=pad(patches),
        rope_cos=pad(np.concatenate(all_cos, axis=0) if all_cos else np.ones((0, cfg.head_dim), np.float32), fill=1.0),
        rope_sin=pad(np.concatenate(all_sin, axis=0) if all_sin else np.zeros((0, cfg.head_dim), np.float32), fill=0.0),
        segment_ids=pad(np.concatenate(all_seg, axis=0) if all_seg else np.zeros((0,), np.int32), fill=-1),
        grids=grids,
        num_tokens=total,
        num_merged=total // merge,
    )
