"""Weight-only int4 (W4A16) matmul for the decode hot path.

Decode at serving batch sizes is bound by *parameter reads* from HBM
(PERF.md roofline: bf16 decode saturates ~94% of v5e bandwidth; int8
weight-only reaches ~67% effective because XLA's convert-in-dot spends
VPU cycles per weight element). int4 halves the weight bytes again —
but this chip's XLA backend cannot execute native ``jnp.int4`` arrays
(UNIMPLEMENTED, probed r5), so the int4 path is a Pallas kernel over
manually nibble-packed int8 bytes:

  * **Packing**: two int4 values per int8 byte along the *contraction*
    (``in``) axis, first half of the rows in the low nibbles, second
    half in the high nibbles: ``packed[i, o] = (q[i, o] & 0xF) |
    (q[i + in/2, o] << 4)`` — so unpacking is two arithmetic shifts
    (``(p << 4) >> 4`` and ``p >> 4``) with no interleaving shuffle.
  * **Group-wise scales**: symmetric, q ∈ [-7, 7], one f32 scale per
    (128-row input group, output channel) — the standard grouped scheme
    (per-output-channel alone is too coarse at 4 bits). Because the
    scale varies along the contraction axis it no longer commutes out
    of the dot, so the kernel runs one MXU dot per 128-row group and
    applies the group's scale to the [S, tile] accumulator (cheap: the
    accumulator is tiny next to the weights).
  * **Pipelining**: the grid walks output tiles; Pallas double-buffers
    the packed-weight tile DMAs against the unpack+dot compute, so the
    kernel runs at max(HBM stream of int4 bytes, VPU unpack + MXU).

The reference repo has no quantized serving of its own (vLLM's is
external, SURVEY.md §2.2); this is a TPU-native extra, opt-in via
``--quantize int4``.

``int4_matmul_reference`` is the bit-identical XLA fallback used on CPU
(tests) and for numerics cross-checks; both compute
``sum_g (x_g @ q_g) * s_g`` in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

GROUP = 128  # input-axis rows per scale group (MXU-native contraction)


# ---------------------------------------------------------------------------
# Packing (host/trace-time; used by models/quantize.py)
# ---------------------------------------------------------------------------


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """[in, out] int values in [-7, 7] -> [in/2, out] int8 nibble-packed.

    Low nibbles hold rows [0, in/2), high nibbles rows [in/2, in).
    """
    assert q.shape[0] % 2 == 0, q.shape
    half = q.shape[0] // 2
    lo = q[:half].astype(jnp.int8)
    hi = q[half:].astype(jnp.int8)
    return (lo & 0xF) | (hi << 4)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`: [in/2, out] int8 -> [in, out] int8."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # arithmetic: sign
    hi = jnp.right_shift(packed, 4)
    return jnp.concatenate([lo, hi], axis=0)


# ---------------------------------------------------------------------------
# XLA reference (CPU tests / numerics oracle)
# ---------------------------------------------------------------------------


def int4_matmul_reference(
    x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray
) -> jnp.ndarray:
    """x: [..., in] bf16/f32; packed: [in/2, out] int8; scales: [G, out] f32.

    Grouped dequant matmul in f32; returns [..., out] f32 (caller casts).
    """
    q = unpack_int4(packed)  # [in, out]
    in_dim, out_dim = q.shape
    g = in_dim // GROUP
    # f32 operands: int4 values and bf16 activations are exactly
    # representable, and the CPU eager executor cannot dispatch bf16 dots.
    xg = x.astype(jnp.float32).reshape(*x.shape[:-1], g, GROUP)
    qg = q.reshape(g, GROUP, out_dim).astype(jnp.float32)
    acc = jnp.einsum(
        "...gi,gio->...go", xg, qg, preferred_element_type=jnp.float32
    )
    return (acc * scales).sum(axis=-2)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _int4_kernel(
    x_ref, w_ref, s_ref, o_ref, *, groups_per_half: int, compute_dtype
):
    """One output tile: unpack nibbles in VMEM, one MXU dot per 128-row
    group, group scale applied to the accumulator.

    compute_dtype: bf16 on TPU (MXU-rate dots; the weights were bf16
    before quantization so this loses nothing) — f32 in interpreter mode
    (the CPU thunk can't dispatch bf16 x bf16 dots)."""
    p = w_ref[:]  # [in/2, T] int8
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    s_tokens = x_ref.shape[0]
    tile = o_ref.shape[1]
    half = groups_per_half * GROUP
    acc = jnp.zeros((s_tokens, tile), jnp.float32)
    for g in range(groups_per_half):
        xg = x_ref[:, g * GROUP:(g + 1) * GROUP].astype(compute_dtype)
        wg = lo[g * GROUP:(g + 1) * GROUP, :].astype(compute_dtype)
        acc += (
            jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            * s_ref[g, :][None]
        )
    for g in range(groups_per_half):
        xg = x_ref[:, half + g * GROUP: half + (g + 1) * GROUP].astype(
            compute_dtype
        )
        wg = hi[g * GROUP:(g + 1) * GROUP, :].astype(compute_dtype)
        acc += (
            jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            * s_ref[groups_per_half + g, :][None]
        )
    o_ref[:] = acc.astype(o_ref.dtype)


def _pick_tile(out_dim: int) -> int:
    for t in (512, 256, 128):
        if out_dim % t == 0:
            return t
    raise ValueError(f"out dim {out_dim} not 128-aligned")


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Grouped int4 weight-only matmul: [S, in] x packed[in/2, out] -> [S, out].

    S is padded up to the bf16 sublane tile (16) internally; in must be a
    multiple of 256 (two halves of 128-row groups) and out of 128.
    """
    from jax.experimental import pallas as pl

    s_tokens, in_dim = x.shape
    half, out_dim = packed.shape
    assert in_dim == 2 * half and in_dim % (2 * GROUP) == 0, (x.shape, packed.shape)
    groups = scales.shape[0]
    assert groups * GROUP == in_dim, (scales.shape, in_dim)

    pad_s = max(16, -(-s_tokens // 8) * 8)
    if pad_s != s_tokens:
        x = jnp.pad(x, ((0, pad_s - s_tokens), (0, 0)))
    tile = _pick_tile(out_dim)
    grid = (out_dim // tile,)

    out = pl.pallas_call(
        functools.partial(
            _int4_kernel,
            groups_per_half=groups // 2,
            compute_dtype=jnp.float32 if interpret else x.dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pad_s, in_dim), lambda j: (0, 0)),
            pl.BlockSpec((half, tile), lambda j: (0, j)),
            pl.BlockSpec((groups, tile), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((pad_s, tile), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((pad_s, out_dim), x.dtype),
        interpret=interpret,
    )(x, packed, scales)
    return out[:s_tokens]


def int4_linear(x: jnp.ndarray, kernel: dict, impl: str = "auto") -> jnp.ndarray:
    """layers.linear entry: dispatch {"qint4", "scale4"} kernels.

    impl: 'pallas' (TPU), 'reference' (XLA grouped einsum — CPU tests),
    'interpret' (Pallas interpreter), 'auto' (pallas on TPU else reference).
    """
    packed, scales = kernel["qint4"], kernel["scale4"]
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "reference"
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if impl == "reference":
        out = int4_matmul_reference(x2, packed, scales).astype(x.dtype)
    else:
        out = int4_matmul(x2, packed, scales, interpret=(impl == "interpret"))
    return out.reshape(*lead, out.shape[-1])


def quantize_int4_np(w: np.ndarray, group: int = GROUP):
    """NumPy reference quantizer (tests): returns (packed, scales, q)."""
    in_dim, out_dim = w.shape
    g = in_dim // group
    wg = w.reshape(g, group, out_dim).astype(np.float32)
    s = np.maximum(np.abs(wg).max(axis=1) / 7.0, 1e-8)  # [G, out]
    q = np.clip(np.round(wg / s[:, None, :]), -7, 7).astype(np.int8)
    q = q.reshape(in_dim, out_dim)
    half = in_dim // 2
    packed = (q[:half] & 0xF) | (q[half:] << 4)
    return packed.astype(np.int8), s.astype(np.float32), q
