"""Weight-only int4 (W4A16 / W4A8) matmul for the decode hot path.

Decode at serving batch sizes is bound by *parameter reads* from HBM
(PERF.md roofline: bf16 decode saturates ~94% of v5e bandwidth; int8
weight-only reaches ~67% effective because XLA's convert-in-dot spends
VPU cycles per weight element). int4 halves the weight bytes again —
but this chip's XLA backend cannot execute native ``jnp.int4`` arrays
(UNIMPLEMENTED, probed r5), and Mosaic does not legalize shifts on i8
vectors (``arith.shli`` probe), so the int4 path is a Pallas kernel over
nibble-packed int8 bytes unpacked with AND-masks only:

  * **Packing** (two int4 per byte, along the *contraction* axis; first
    half of the input rows in low nibbles, second half in high):
    ``packed[i, o] = ((q[i, o] + 8) & 0xF) | (q[i + in/2, o] << 4)``.
    The low nibble is stored BIASED by +8 so unpacking is a single
    ``& 0x0F`` (value = q_lo + 8); the +8 falls out of the dot as a
    rank-1 correction ``8 * s_g * rowsum(x_g)`` applied to the [S, tile]
    accumulator. The high nibble needs no shift at all:
    ``packed & 0xF0`` IS ``16 * q_hi`` as a signed int8, and the 16
    folds into the group scale.
  * **Group-wise scales**: symmetric, q ∈ [-7, 7], one f32 scale per
    (128-row input group, output channel) — per-output-channel alone is
    too coarse at 4 bits, and a 128 group matches the MXU contraction
    tile, so the kernel runs one dot per group with the scale applied to
    the accumulator (D-fold cheaper than dequantizing the weights).
  * **Two compute modes** (static flag):
      - W4A16 (default): nibbles convert to bf16, bf16 x bf16 MXU dots.
      - W4A8 (``act_quant=True``): activations quantize per token to
        int8 in-kernel and the dots run int8 x int8 -> int32 on the MXU
        at ~2x the bf16 rate with NO weight-side converts — the masked
        nibbles are consumed as int8 directly.
  * **Pipelining**: the grid walks output tiles; Pallas double-buffers
    the packed-weight tile DMAs against the unpack+dot compute.

The reference repo has no quantized serving of its own (vLLM's is
external, SURVEY.md §2.2); this is a TPU-native extra, opt-in via
``--quantize int4``.

``int4_matmul_reference`` is the XLA oracle used on CPU (tests) and for
numerics cross-checks.
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

    Low nibbles hold rows [0, in/2) BIASED by +8 (values 1..15); high
    nibbles hold rows [in/2, in) in two's complement.
    """
    assert q.shape[0] % 2 == 0, q.shape
    half = q.shape[0] // 2
    lo = (q[:half].astype(jnp.int8) + 8) & 0xF
    hi = q[half:].astype(jnp.int8)
    return lo | (hi << 4)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`: [in/2, out] int8 -> [in, out] int8."""
    lo = (packed & 0xF) - 8
    hi = jnp.right_shift(packed, 4)  # arithmetic: sign-correct
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


# ---------------------------------------------------------------------------
# XLA reference (CPU tests / numerics oracle)
# ---------------------------------------------------------------------------


def int4_matmul_reference(
    x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray
) -> jnp.ndarray:
    """x: [..., in] bf16/f32; packed: [in/2, out] int8; scales: [G, out] f32.

    Grouped dequant matmul in f32; returns [..., out] f32 (caller casts).
    f32 operands throughout: int4 values and bf16 activations are exactly
    representable, and the CPU eager executor cannot dispatch bf16 dots.
    """
    q = unpack_int4(packed)  # [in, out]
    in_dim, out_dim = q.shape
    g = in_dim // GROUP
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
    x_ref, w_ref, s_ref, o_ref, *,
    groups_per_half: int, compute_dtype, act_quant: bool,
):
    """One output tile: AND-mask nibble unpack in VMEM, one MXU dot per
    128-row group, group scale + rank-1 bias correction on the accumulator."""
    p = w_ref[:]                     # [in/2, T] int8
    lo = p & 0xF                     # q_lo + 8, values 1..15 (int8)
    hi = p & (-16)                   # 16 * q_hi as signed int8
    s_tokens = x_ref.shape[0]
    tile = o_ref.shape[1]
    half = groups_per_half * GROUP

    if act_quant:
        # W4A8: per-token symmetric activation int8; dots run int8 x int8
        # -> int32 on the MXU (~2x bf16 rate), no weight-side converts.
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        a_scale = jnp.where(amax > 0, amax / 127.0, 1.0)  # [S, 1]
        xq = jnp.round(xf / a_scale).astype(jnp.int8)

        def dot_g(xg, wg):
            return jax.lax.dot_general(
                xg, wg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)

        x_of = lambda a, b: xq[:, a:b]  # noqa: E731
        # Row-sums of the quantized activations per lo-group, for the
        # rank-1 (+8 bias) correction.
        rowsum = lambda a, b: jnp.sum(  # noqa: E731
            xq[:, a:b].astype(jnp.float32), axis=1, keepdims=True
        )
        post = lambda acc: acc * a_scale  # noqa: E731
    else:
        def dot_g(xg, wg):
            return jnp.dot(
                xg.astype(compute_dtype), wg.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        x_of = lambda a, b: x_ref[:, a:b]  # noqa: E731
        rowsum = lambda a, b: jnp.sum(  # noqa: E731
            x_ref[:, a:b].astype(jnp.float32), axis=1, keepdims=True
        )
        post = lambda acc: acc  # noqa: E731

    acc = jnp.zeros((s_tokens, tile), jnp.float32)
    for g in range(groups_per_half):
        a, b = g * GROUP, (g + 1) * GROUP
        sg = s_ref[g, :][None]
        # dot(x, q_lo + 8) * s - 8 * s * rowsum(x) == dot(x, q_lo) * s
        acc += (dot_g(x_of(a, b), lo[a:b, :]) - 8.0 * rowsum(a, b)) * sg
    for g in range(groups_per_half):
        a, b = g * GROUP, (g + 1) * GROUP
        sg16 = s_ref[groups_per_half + g, :][None] * (1.0 / 16.0)
        acc += dot_g(x_of(half + a, half + b), hi[a:b, :]) * sg16
    o_ref[:] = post(acc).astype(o_ref.dtype)


def _pick_tile(out_dim: int, half: int, groups: int, pad_s: int) -> int:
    """Largest 128-multiple tile dividing out_dim whose working set fits
    VMEM — FEWEST grid steps wins: measured r5, a 256-wide tile put 35
    grid steps on the 1536x8960 matmul and per-step pipeline overhead
    (~1 us) dominated the 200 GB/s-effective kernel; big tiles run the
    same bytes in 2-4 steps.

    DOTS_INT4_MIN_STEPS (env, default 1) forces at least N grid steps:
    a single-step call cannot overlap its weight DMA with compute, so
    in-context (inside the decode scan) a floor of 2-4 may win even
    though it loses standalone — measured by tools/bench_int4.py
    --chain with the env set."""
    import os

    min_steps = int(os.environ.get("DOTS_INT4_MIN_STEPS", "1"))
    budget = 11 * 1024 * 1024  # leave headroom of the ~16 MB VMEM
    best = None
    for n in range(max(1, min_steps), out_dim // 128 + 1):
        if out_dim % (n * 128):
            continue
        tile = out_dim // n
        vmem = (
            half * tile * (2 if n > 1 else 1)   # packed tile (+double buf)
            + groups * tile * 4 * 2             # scales (+double buf)
            + pad_s * 2 * half * 2              # x (bf16, full)
            + pad_s * tile * 4                  # f32 accumulator
            + pad_s * tile * 2 * 2              # out tile (+double buf)
        )
        if vmem <= budget:
            best = tile
            break
    if best is None:
        raise ValueError(f"no VMEM-feasible tile for out={out_dim}")
    return best


@functools.partial(jax.jit, static_argnames=("interpret", "act_quant"))
def int4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    interpret: bool = False,
    act_quant: bool = False,
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
    tile = _pick_tile(out_dim, half, groups, pad_s)
    grid = (out_dim // tile,)

    out = pl.pallas_call(
        functools.partial(
            _int4_kernel,
            groups_per_half=groups // 2,
            compute_dtype=jnp.float32 if interpret else x.dtype,
            act_quant=act_quant,
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

    DOTS_INT4_ACT=1 (env, read at trace time) switches the Pallas path to
    W4A8: activations quantize per token to int8 in-kernel and the dots
    run int8 x int8 on the MXU — the A/B knob for the decode bandwidth
    study (PERF.md r5); the reference path ignores it (W4A16 numerics).
    """
    import os

    packed, scales = kernel["qint4"], kernel["scale4"]
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "reference"
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if impl == "reference":
        out = int4_matmul_reference(x2, packed, scales).astype(x.dtype)
    else:
        out = int4_matmul(
            x2, packed, scales, interpret=(impl == "interpret"),
            act_quant=os.environ.get("DOTS_INT4_ACT", "0") == "1",
        )
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
    packed = (((q[:half] + 8) & 0xF) | (q[half:] << 4)).astype(np.int8)
    return packed, s.astype(np.float32), q
