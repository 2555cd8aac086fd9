"""Sweep flash-attention block sizes on the real chip.

Usage: python tools/bench_flash.py [--tokens 14336] [--heads 12] [--dim 128]

Prints ms + TFLOP/s per (block_q, block_k) config at the flagship vision
shape (packed NaViT, windowed segment ids) and at causal-prefill shape.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dots_ocr_tpu.ops.flash_attention import flash_attention


def _fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][0, 0, 0])


def bench(fn, args, iters=8):
    fn(*args)  # warm/compile
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _fetch(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=14336)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--window", type=int, default=0,
                    help="segment size; 0 = one segment (full attention)")
    ap.add_argument("--causal", action="store_true")
    args = ap.parse_args()

    T, H, D = args.tokens, args.heads, args.dim
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, T, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (1, T, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (1, T, H, D), jnp.bfloat16)
    if args.window:
        seg = jnp.asarray(np.arange(T) // args.window, jnp.int32)[None]
    else:
        seg = jnp.zeros((1, T), jnp.int32)

    # FLOPs: 2 matmuls of 2*T*T*D each per head (x0.5 if causal).
    flops = 4 * T * T * D * H * (0.5 if args.causal else 1.0)

    for bq in (256, 512, 1024, 2048):
        for bk in (512, 1024, 2048):
            try:
                dt = bench(
                    lambda q=q, k=k, v=v: flash_attention(
                        q, k, v, seg, seg, causal=args.causal,
                        block_q=bq, block_k=bk),
                    (),
                )
            except Exception as e:  # VMEM overflow etc.
                print(f"bq={bq:4d} bk={bk:4d}  FAILED: {type(e).__name__}")
                continue
            print(f"bq={bq:4d} bk={bk:4d}  {dt*1e3:7.2f} ms  "
                  f"{flops/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
