"""Rotary position embeddings: 1D (decoder) and 2D (vision grids).

Conventions match the Qwen/Llama "rotate-half" layout so that HF checkpoint
weights load without permutation: the head dim is split into two halves and
(x1, x2) -> (x1*cos - x2*sin, x2*cos + x1*sin), with the frequency vector
repeated across both halves.

The 2D variant (vision) assigns the first half of the frequency bins to the
patch row index and the second half to the column index, matching the
Qwen2.5-VL-style 2D RoPE the dots.ocr vision tower uses (SURVEY.md §2.4,
[EXTERNAL — validated against checkpoint activations when available]).

All tables are precomputed outside jit (host or constant-folded) and passed
into kernels as arrays — no data-dependent shapes inside traced code.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_freqs(head_dim: int, theta: float) -> np.ndarray:
    """Inverse frequencies, shape [head_dim // 2], float32."""
    return 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    )


def rope_table(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) tables for integer positions.

    positions: int array [...]; returns cos/sin of shape [..., head_dim]
    (frequencies tiled over both halves, rotate-half layout).
    """
    inv_freq = jnp.asarray(rope_freqs(head_dim, theta))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [..., hd]
    return jnp.cos(angles), jnp.sin(angles)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate q or k. x: [..., seq, heads, head_dim]; cos/sin: [seq, head_dim]
    or broadcastable. Compute in f32, return in x.dtype."""
    while cos.ndim < x.ndim:
        cos = cos[..., None, :]  # add heads axis before head_dim
        sin = sin[..., None, :]
        if cos.ndim == x.ndim:
            break
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half(xf) * sin
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# 2D RoPE for vision grids
# ---------------------------------------------------------------------------


def vision_grid_positions(grid_h: int, grid_w: int) -> np.ndarray:
    """(row, col) index pairs for a grid's patches in NaViT merge order.

    Patches are ordered so that each spatial_merge_size x merge_size block is
    contiguous — the decoder-facing merged token j then owns raw patches
    [4j, 4j+4). Order within a block is row-major; blocks themselves are
    row-major over the merged grid. Shape [grid_h * grid_w, 2], int32.
    """
    rows = np.repeat(np.arange(grid_h, dtype=np.int32)[:, None], grid_w, axis=1)
    cols = np.repeat(np.arange(grid_w, dtype=np.int32)[None, :], grid_h, axis=0)
    merge = 2
    hb, wb = grid_h // merge, grid_w // merge

    def to_blocks(a: np.ndarray) -> np.ndarray:
        return (
            a.reshape(hb, merge, wb, merge)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )

    return np.stack([to_blocks(rows), to_blocks(cols)], axis=-1)


def vision_rope_table(
    positions_2d: np.ndarray, head_dim: int, theta: float
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) for 2D positions, shape [T, head_dim] each, float32.

    The head_dim is covered by head_dim//2 frequency bins (rotate-half);
    the first half of the bins encode the row coordinate, the second half
    the column coordinate.
    """
    inv_freq = rope_freqs(head_dim // 2, theta)  # [head_dim // 4]
    rows = positions_2d[:, 0].astype(np.float32)
    cols = positions_2d[:, 1].astype(np.float32)
    row_angles = rows[:, None] * inv_freq  # [T, hd/4]
    col_angles = cols[:, None] * inv_freq
    angles = np.concatenate([row_angles, col_angles], axis=-1)  # [T, hd/2]
    angles = np.concatenate([angles, angles], axis=-1)  # [T, hd]
    return np.cos(angles), np.sin(angles)


@partial(jax.jit, static_argnames=("head_dim", "theta"))
def decoder_rope_table(positions: jnp.ndarray, head_dim: int, theta: float):
    return rope_table(positions, head_dim, theta)
