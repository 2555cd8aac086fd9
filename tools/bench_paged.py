"""Microbench: the Pallas paged-attention decode kernel in isolation.

Separates the decode iteration's attention cost from params/sampling:
sweeps slots x live-context at the flagship head geometry and prints
us/call and effective KV bandwidth. Memoization-safe (fresh q per rep,
scalar fetch per timing).

    python tools/bench_paged.py [--page-size 64] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--int8", action="store_true",
                    help="int8-quantized KV payloads + per-vector scales")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dots_ocr_tpu.ops.paged_attention import (
        paged_attention,
        paged_attention_multipage,
        paged_attention_reference,
    )

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    kv_heads, q_heads, head_dim = 2, 12, 128
    ps = args.page_size

    iters = 100

    impls = {
        "v1-grid": paged_attention,
        "v2-dma": paged_attention_multipage,
        "xla-gather": paged_attention_reference,
    }
    try:
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention as jax_lib_paged,
        )

        def lib_impl(q, kp, vp, lengths, tables):
            blk = max(1, min(8, tables.shape[1]))
            return jax_lib_paged(
                q, kp, vp, lengths, tables, pages_per_compute_block=blk
            )

        impls["jaxlib"] = lib_impl
    except ImportError:
        pass

    def make_run(impl, scale_kwargs):
        @jax.jit
        def run(q, k_pages, v_pages, lengths, tables):
            # Chain kernel calls in-program: a single dispatch/fetch costs a
            # full tunnel RTT (~30 ms), far above one kernel invocation. The
            # q bump defeats CSE; the output feeds the next q so XLA cannot
            # reorder or elide iterations.
            def body(i, q):
                out = impl(q, k_pages, v_pages, lengths, tables, **scale_kwargs)
                return q + out.astype(q.dtype) * jnp.bfloat16(1e-6)

            return jax.lax.fori_loop(0, iters, body, q)

        return run

    for slots in (16, 64):
        for ctx in (256, 1024, 4096):
            pages_per_seq = (ctx + ps - 1) // ps
            num_pages = slots * pages_per_seq + 1
            rng = np.random.RandomState(0)
            k_pages = jnp.asarray(
                rng.randn(kv_heads, num_pages, ps, head_dim), jnp.bfloat16
            )
            v_pages = jnp.asarray(
                rng.randn(kv_heads, num_pages, ps, head_dim), jnp.bfloat16
            )
            tables = jnp.asarray(
                rng.permutation(num_pages - 1)[: slots * pages_per_seq]
                .reshape(slots, pages_per_seq) + 1,
                jnp.int32,
            ) - 1
            lengths = jnp.full((slots,), ctx, jnp.int32)
            q0 = jnp.asarray(rng.randn(slots, q_heads, head_dim), jnp.bfloat16)
            bytes_per_elem = 1 if args.int8 else 2
            kv_bytes = (
                2 * slots * pages_per_seq * ps * kv_heads * head_dim
                * bytes_per_elem
            )
            scale_kwargs = {}
            if args.int8:
                from dots_ocr_tpu.engine.kv_cache import quantize_kv

                k_pages, ks = quantize_kv(k_pages)
                v_pages, vs = quantize_kv(v_pages)
                scale_kwargs = dict(k_scales=ks, v_scales=vs)

            for name, impl in impls.items():
                if args.int8 and name == "jaxlib":
                    continue  # library kernel takes no scale payloads
                run = make_run(impl, scale_kwargs)
                try:
                    out = run(q0, k_pages, v_pages, lengths, tables)
                    np.asarray(out[0, 0, :1])  # compile + settle
                except Exception as e:  # noqa: BLE001
                    print(f"S={slots:3d} ctx={ctx:5d} ps={ps} {name:10s}: "
                          f"FAILED ({type(e).__name__})")
                    continue

                times = []
                for r in range(args.reps):
                    q = q0 + jnp.bfloat16(r * 1e-3)  # defeat memoization
                    t0 = time.perf_counter()
                    out = run(q, k_pages, v_pages, lengths, tables)
                    np.asarray(out[0, 0, :1])
                    times.append(time.perf_counter() - t0)
                best = min(times) / iters  # per kernel call; RTT amortized
                print(
                    f"S={slots:3d} ctx={ctx:5d} ps={ps} {name:10s}: "
                    f"{best*1e6:8.0f} us/call  "
                    f"({kv_bytes/best/1e9:6.1f} GB/s effective KV read; "
                    f"x28 layers = {28*best*1e3:.2f} ms/decode-iter)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
