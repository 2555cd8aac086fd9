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


def token_order(
    grid_h: int, grid_w: int, merge: int = 2, window: int = 0,
    pad_windows: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Emission order of a grid's raw patches + per-token window ids.

    Ordering invariant (both modes): each merge x merge block is contiguous
    (row-major inside), so merged token j owns raw patches
    [merge^2 * j, merge^2 * (j+1)). Blocks are row-major — over the whole
    merged grid when window == 0, or within each window (windows row-major)
    when window > 0 (window = side length in raw patches, multiple of
    merge).

    pad_windows=True emits EXACTLY window^2 entries per window, padding edge
    windows with perm = -1 (callers zero-fill those rows and mark them
    padding); uniform windows let windowed attention run as dense batched
    attention over a [num_windows, window^2] reshape — the fast path.

    Returns (perm, window_ids): ``perm[t]`` is the row-major patch index
    emitted at position t (-1 = window padding); ``window_ids[t]`` is the
    window index (all zeros when window == 0).
    """
    if window == 0:
        window = max(
            ((grid_h + merge - 1) // merge) * merge,
            ((grid_w + merge - 1) // merge) * merge,
        )
        pad_windows = False
    assert window % merge == 0, (window, merge)

    # Vectorized construction (a Python loop here costs seconds at the 28k+
    # tokens of a large page): pad the row-major id grid to window multiples
    # with -1, carve into windows (row-major), then into merge blocks
    # (row-major within each window).
    hp = -(-grid_h // window) * window
    wp = -(-grid_w // window) * window
    ids = np.full((hp, wp), -1, np.int64)
    ids[:grid_h, :grid_w] = np.arange(grid_h * grid_w, dtype=np.int64).reshape(
        grid_h, grid_w
    )
    nwr, nwc = hp // window, wp // window
    wb = window // merge
    # [nwr, nwc, wb, merge, wb, merge] -> windows row-major, merge blocks
    # row-major inside, block cells row-major.
    blocks = (
        ids.reshape(nwr, window, nwc, window)
        .transpose(0, 2, 1, 3)
        .reshape(nwr * nwc, wb, merge, wb, merge)
        .transpose(0, 1, 3, 2, 4)
        .reshape(nwr * nwc, window * window)
    )
    window_ids = np.broadcast_to(
        np.arange(nwr * nwc, dtype=np.int32)[:, None], blocks.shape
    )
    perm = blocks.reshape(-1)
    window_ids = window_ids.reshape(-1)
    if not pad_windows:
        keep = perm >= 0
        perm = perm[keep]
        window_ids = np.ascontiguousarray(window_ids[keep])
    return perm, window_ids


def vision_grid_positions(
    grid_h: int, grid_w: int, merge: int = 2, window: int = 0,
    pad_windows: bool = False,
) -> np.ndarray:
    """(row, col) index pairs for a grid's patches in emission order
    (see :func:`token_order`; window-padding slots get (0, 0)). Shape
    [num_emitted, 2], int32."""
    perm, _ = token_order(
        grid_h, grid_w, merge=merge, window=window, pad_windows=pad_windows
    )
    safe = np.maximum(perm, 0)
    rows = (safe // grid_w).astype(np.int32)
    cols = (safe % grid_w).astype(np.int32)
    rows[perm < 0] = 0
    cols[perm < 0] = 0
    return np.stack([rows, cols], axis=-1)


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


def vision_rope_device(
    pos2d: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side :func:`vision_rope_table` (trace inside jit).

    The host used to upload the [T, head_dim] f32 cos/sin tables with every
    vision prefill — 2 x 64 x more bytes than the [T, 2] int32 positions
    they derive from (12.6 MB vs 0.1 MB per 12k-patch page). Computing the
    tables on device next to the encoder makes the upload payload the
    patches alone; the sin/cos VPU work is ~T*head_dim flops, noise.
    """
    inv_freq = jnp.asarray(rope_freqs(head_dim // 2, theta))  # [hd/4]
    rows = pos2d[:, 0].astype(jnp.float32)
    cols = pos2d[:, 1].astype(jnp.float32)
    angles = jnp.concatenate(
        [rows[:, None] * inv_freq, cols[:, None] * inv_freq], axis=-1
    )  # [T, hd/2]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [T, hd]
    return jnp.cos(angles), jnp.sin(angles)


@partial(jax.jit, static_argnames=("head_dim", "theta"))
def decoder_rope_table(positions: jnp.ndarray, head_dim: int, theta: float):
    return rope_table(positions, head_dim, theta)
