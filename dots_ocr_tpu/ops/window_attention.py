"""Fused dense attention over uniform attention windows (vision encoder).

The windowed vision layers attend within independent ``window^2``-token
tiles (window-major packing, every window padded to exactly W tokens —
``models/preprocess.py``). At W = 256 the whole window's score matrix fits
VMEM, so this kernel computes a SINGLE-TILE dense softmax per (window,
head): one [W, D] x [D, W] MXU dot, an in-register f32 softmax, one
[W, W] x [W, D] dot — no online-softmax carries, no K-tiling, no
cross-tile masking machinery the generic flash kernel
(``ops/flash_attention.py``) pays per 256-token window.

**Measured outcome (PERF.md round-4 encoder ablation): NOT the encoder
default.** The kernel body is genuinely faster than flash (34.5 ms vs
47.5 ms across 36 windowed layers on a 12.8k-token page), but any
pallas_call is a fusion boundary: the [T, H, D] -> head-major relayout
of q/k/v/o materializes as ~37 ms of copy ops that XLA cannot fuse into
the projections, while the same relayouts FUSE when the windowed
attention is a plain batched einsum. End-to-end page encode: 342 ms
XLA-dense / 375 ms flash / 402 ms this kernel. The encoder therefore
defaults to the einsum path (``models/vision.py USE_WINDOW_KERNEL =
"xla"``); this kernel stays as the measured-and-documented alternative —
it wins whenever the caller's data is already head-major (1.44 ms vs
1.69 ms flash per 50-window call).

Masking: key validity only (segment id >= 0). Window-major packing never
splits an image across a window, so "same segment" within a window
reduces to "not padding". Padded QUERY rows produce finite garbage
(masked to a uniform average by the -1e30 fill) and are dropped by the
merge-stage validity mask downstream.

The reference's windowed vision tower analog is Qwen2.5-VL-style
windowed flash-attn (reference vision config ``window_size``/
``fullatt_block_indexes``; flash-attn 2.8 in
/root/reference/docker/Dockerfile:5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK = -1e30


def _window_kernel(
    seg_ref,     # [nw, W] int32 (whole array resident: 4*nw*W bytes)
    q_ref,       # [1, 1, W, D]
    k_ref,       # [1, 1, W, D]
    v_ref,       # [1, 1, W, D]
    o_ref,       # [1, 1, W, D]
    *,
    scale: float,
):
    i = pl.program_id(0)
    valid = (seg_ref[i, :] >= 0)[None, :]  # [1, W] key-side validity
    q = q_ref[0, 0]  # [W, D]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [W, W]
    s = jnp.where(valid, s, _MASK)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l
    o_ref[0, 0] = o.astype(o_ref.dtype)


def window_attention(
    q: jnp.ndarray,            # [nw, W, H, D]
    k: jnp.ndarray,            # [nw, W, H, D]
    v: jnp.ndarray,            # [nw, W, H, D]
    segment_ids: jnp.ndarray,  # [nw, W] int32, -1 = padding
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense attention within each independent window. Returns [nw, W, H, D]."""
    nw, w, h, d = q.shape
    kernel = functools.partial(_window_kernel, scale=d**-0.5)
    # Head-major for (W, D)-tiled blocks — the same transpose the generic
    # flash kernel performs on entry (ops/flash_attention.py:286), so the
    # kernels cost the same relayout and differ only in inner-loop work.
    qh = q.transpose(0, 2, 1, 3)  # [nw, H, W, D]
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    grid = (nw, h)
    blk = pl.BlockSpec((1, 1, w, d), lambda i, j: (i, j, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Whole seg array as one resident block: a (1, W) row block
            # violates the (8, 128)-divisibility rule; nw*W int32 is tiny.
            pl.BlockSpec((nw, w), lambda i, j: (0, 0)),
            blk, blk, blk,
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((nw, h, w, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(segment_ids, qh, kh, vh)
    return out.transpose(0, 2, 1, 3)
