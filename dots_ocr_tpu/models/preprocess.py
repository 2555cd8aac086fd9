"""Host-side vision preprocessing: image -> packed patches + metadata.

Produces exactly what ``vision.encode_images`` consumes: an im2col patch
matrix in merge-contiguous order, 2D-RoPE tables, and segment ids. All numpy
(this runs in the request path on the host while the TPU computes), all
shapes bucket-padded so the device sees a small set of static shapes.

Replaces the qwen_vl_utils processor the reference depends on
(``requirements.txt:7``, ``parser.py:98-105``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image

from dots_ocr_tpu.models.config import VisionConfig
from dots_ocr_tpu.models.rope import vision_grid_positions

# Normalization constants live on VisionConfig (image_mean/image_std) and
# are applied ON DEVICE (vision_forward); the host ships raw uint8 patches.


@dataclass
class PackedVisionInput:
    """Device-ready packed vision batch.

    2D-RoPE travels as the compact [T_pad, 2] int32 position pairs —
    the serving path computes cos/sin ON DEVICE (rope.vision_rope_device)
    so admission uploads 0.1 MB of positions instead of 12.6 MB of f32
    tables per 12k-patch page. ``rope_cos``/``rope_sin`` remain available
    as lazily-computed HOST properties for non-serving consumers (tests,
    parity harness, training)."""

    patches: np.ndarray        # [T_pad, patch_dim] uint8 (normalized on device)
    pos2d: np.ndarray          # [T_pad, 2] int32 (row, col); padding = (0, 0)
    segment_ids: np.ndarray    # [T_pad] int32, image index, -1 = padding
    grids: List[Tuple[int, int]]  # per-image (grid_h, grid_w) in raw patches
    num_tokens: int            # valid (unpadded) raw patch count
    num_merged: int            # valid merged tokens = num_tokens / merge^2
    # RoPE geometry captured at pack time (for the host-side properties).
    head_dim: int = 0
    rope_theta: float = 10000.0
    # Window ids for windowed-attention layers (window-major packing);
    # None when the config runs full attention everywhere.
    window_ids: "np.ndarray | None" = None

    @property
    def rope_cos(self) -> np.ndarray:
        return self._rope_tables()[0]

    @property
    def rope_sin(self) -> np.ndarray:
        return self._rope_tables()[1]

    def _rope_tables(self):
        cached = getattr(self, "_rope_cache", None)
        if cached is None:
            from dots_ocr_tpu.models.rope import vision_rope_table

            cached = vision_rope_table(self.pos2d, self.head_dim, self.rope_theta)
            object.__setattr__(self, "_rope_cache", cached)
        return cached

    def merged_valid_mask(self, merge: int = 4) -> np.ndarray:
        """Bool [T_pad / merge]: which merged rows are real tokens (merge
        groups are homogeneous: window/bucket padding covers whole groups)."""
        return self.segment_ids[::merge] >= 0

    def merged_valid_rows(self, merge: int = 4) -> np.ndarray:
        """Indices of valid merged rows, in emission order — the k-th
        imgpad token maps to row merged_valid_rows[k]."""
        return np.nonzero(self.merged_valid_mask(merge))[0]


def extract_patches(
    image: Image.Image,
    cfg: VisionConfig,
) -> Tuple[np.ndarray, Tuple[int, int], np.ndarray, np.ndarray]:
    """Image (already smart-resized to the 28-grid) -> patch matrix.

    Returns (patches [T_emit, patch_dim] float32 in emission order,
    (grid_h, grid_w), per-token window ids, per-token validity). With
    windowing enabled T_emit > grid_h*grid_w: edge windows are padded to a
    uniform window^2 tokens (zero patches, valid=False).
    """
    arr = np.asarray(image.convert("RGB"), dtype=np.uint8)
    h, w, c = arr.shape
    p = cfg.patch_size
    assert h % (p * cfg.spatial_merge_size) == 0, f"height {h} not on the grid"
    assert w % (p * cfg.spatial_merge_size) == 0, f"width {w} not on the grid"
    grid_h, grid_w = h // p, w // p

    # Emission order (merge-contiguous; window-major with uniform padded
    # windows when the config windows attention) matches
    # vision_grid_positions; the merger is then a pure reshape on device.
    from dots_ocr_tpu.models.rope import token_order

    perm, window_ids = token_order(
        grid_h, grid_w, merge=cfg.spatial_merge_size, window=cfg.window_size,
        pad_windows=cfg.window_size > 0,
    )
    valid = perm >= 0

    # Fast path: single-pass C++ im2col + reorder (native.patchify_native)
    # copies each emitted patch straight from the strided image rows —
    # the numpy path below makes 2-3 full-image passes, a measurable
    # slice of per-page submit time on a 1-core serving host.
    from dots_ocr_tpu.native import patchify_native

    out = patchify_native(np.ascontiguousarray(arr), perm, p, grid_w)
    if out is None:
        # im2col: [gh, p, gw, p, c] -> [gh, gw, p*p*c] (row-major patch
        # pixels, channel-last inside the patch to match conv weight
        # reshaping in the loader).
        patches = (
            arr.reshape(grid_h, p, grid_w, p, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(grid_h, grid_w, p * p * c)
        )
        flat = patches.reshape(grid_h * grid_w, -1)
        out = np.zeros((len(perm), flat.shape[1]), np.uint8)
        out[valid] = flat[perm[valid]]
    return out, (grid_h, grid_w), window_ids, valid


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
    # Single-pass assembly straight into the padded outputs: the patch
    # payload is tens of MB per admission group, and on slow-memcpy hosts
    # (single-core VMs) an intermediate np.concatenate + full-array
    # np.full doubles-to-triples the admission's host wall. Allocate once
    # (np.empty), place each request's valid region, zero only the tail.
    total = sum(p.num_tokens for p in packed_list)
    merge = cfg.spatial_merge_size**2
    padded = token_bucket(total, bucket_step=bucket_step)
    if cfg.window_size > 0:
        wtok = cfg.window_size**2
        padded = -(-padded // wtok) * wtok

    patches = np.empty((padded, cfg.patch_dim), np.uint8)
    pos2d = np.empty((padded, 2), np.int32)
    segment_ids = np.empty((padded,), np.int32)
    windowed = cfg.window_size > 0 and any(
        p.window_ids is not None for p in packed_list
    )
    window_ids = np.empty((padded,), np.int32) if windowed else None

    grids = []
    off = seg_offset = win_offset = 0
    for packed in packed_list:
        n = packed.num_tokens
        patches[off : off + n] = packed.patches[:n]
        pos2d[off : off + n] = packed.pos2d[:n]
        seg = packed.segment_ids[:n]
        # preserve -1 (window padding inside the emitted region)
        segment_ids[off : off + n] = np.where(seg >= 0, seg + seg_offset, -1)
        seg_offset += len(packed.grids)
        if windowed:
            win = packed.window_ids[:n]
            window_ids[off : off + n] = win + win_offset
            win_offset += int(win.max()) + 1 if n else 0
        grids.extend(packed.grids)
        off += n

    patches[total:] = 0
    pos2d[total:] = 0
    segment_ids[total:] = -1
    if windowed:
        window_ids[total:] = -1
    num_valid_merged = sum((gh * gw) // merge for gh, gw in grids)
    return PackedVisionInput(
        patches=patches,
        pos2d=pos2d,
        segment_ids=segment_ids,
        grids=grids,
        num_tokens=total,
        num_merged=num_valid_merged,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        window_ids=window_ids,
    )


def pack_images(
    images: Sequence[Image.Image],
    cfg: VisionConfig,
    bucket_step: int = 512,
) -> PackedVisionInput:
    """Pack N smart-resized images into one padded token axis."""
    all_patches = []
    all_pos = []
    all_seg = []
    all_win = []
    grids = []
    num_valid_merged = 0
    window_offset = 0
    for idx, image in enumerate(images):
        patches, (gh, gw), window_ids, valid = extract_patches(image, cfg)
        pos2d = vision_grid_positions(
            gh, gw, merge=cfg.spatial_merge_size, window=cfg.window_size,
            pad_windows=cfg.window_size > 0,
        )
        all_patches.append(patches)
        all_pos.append(pos2d)
        all_seg.append(np.where(valid, idx, -1).astype(np.int32))
        all_win.append(window_ids + window_offset)
        window_offset += int(window_ids.max()) + 1 if len(window_ids) else 0
        grids.append((gh, gw))
        num_valid_merged += (gh * gw) // cfg.spatial_merge_size**2

    total = sum(len(p) for p in all_patches)
    merge = cfg.spatial_merge_size**2
    assert total % merge == 0
    padded = token_bucket(total, bucket_step=bucket_step)
    if cfg.window_size > 0:
        # Keep the bucket a multiple of window^2 so windowed layers reshape
        # cleanly into [num_windows, window^2].
        wtok = cfg.window_size**2
        padded = -(-padded // wtok) * wtok

    # Direct placement into the padded outputs (np.empty + tail fill) —
    # see merge_packed for why the concat-then-pad shape costs real wall
    # on slow-memcpy hosts.
    patches = np.empty((padded, cfg.patch_dim), np.uint8)
    pos2d = np.empty((padded, 2), np.int32)
    segment_ids = np.empty((padded,), np.int32)
    window_ids = np.empty((padded,), np.int32) if cfg.window_size > 0 else None
    off = 0
    for i, part in enumerate(all_patches):
        n = len(part)
        patches[off : off + n] = part
        pos2d[off : off + n] = all_pos[i]
        segment_ids[off : off + n] = all_seg[i]
        if window_ids is not None:
            window_ids[off : off + n] = all_win[i]
        off += n
    patches[total:] = 0
    pos2d[total:] = 0
    segment_ids[total:] = -1
    if window_ids is not None:
        window_ids[total:] = -1
    return PackedVisionInput(
        patches=patches,
        pos2d=pos2d,
        segment_ids=segment_ids,
        grids=grids,
        num_tokens=total,
        num_merged=num_valid_merged,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        window_ids=window_ids,
    )
