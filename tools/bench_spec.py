"""Microbench: spec_decode_program vs decode_program, compile-separated.

Times the SECOND call at identical shapes (first call pays the XLA
compile), flagship zeros weights, realistic 64-slot serving shapes.
Reports per-iteration wall and effective tok/s at 100% draft acceptance
(zeros-weights greedy is a period-1 loop, so every draft accepts — this
is the verify-path CEILING, not a realistic acceptance mix).

    python tools/bench_spec.py [--slots 64] [--steps 16] [--spec-k 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--spec-k", type=int, default=3)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=128,
                    help="starting sequence length per slot")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from dots_ocr_tpu.engine.kv_cache import PagedKV
    from dots_ocr_tpu.engine.scheduler import (
        decode_program,
        spec_decode_program,
    )
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import zeros_params

    log(f"devices: {jax.devices()}")
    config = DotsOCRConfig.flagship()
    params = zeros_params(config)

    s, ps, ctx = args.slots, args.page_size, args.ctx
    nq = args.spec_k + 1
    # Room for ctx + steps*nq new tokens.
    pages_per_seq = -(-(ctx + args.steps * nq + ps) // ps)
    mp = 1
    while mp < pages_per_seq:
        mp *= 2
    num_pages = s * mp + 1
    paged = PagedKV.create(config.decoder, num_pages, ps, dtype=jnp.bfloat16)
    tables = jnp.asarray(
        np.arange(s * mp, dtype=np.int32).reshape(s, mp)
    )  # unique pages per slot (page 0 reuse is harmless here)
    tokens = jnp.full((s,), 11, jnp.int32)
    positions = jnp.full((s,), ctx, jnp.int32)
    active = jnp.ones((s,), bool)
    temps = jnp.zeros((s,), jnp.float32)
    top_ps = jnp.ones((s,), jnp.float32)
    rng = jax.random.PRNGKey(0)

    def run_decode(paged):
        return decode_program(
            params, config, paged, tokens, positions, tables, active,
            temps, top_ps, rng, page_size=ps, num_steps=args.steps,
            attn_impl="paged", nucleus=False,
        )

    def run_spec(paged, buf):
        return spec_decode_program(
            params, config, paged, buf, tokens, positions,
            jnp.zeros((s,), jnp.int32), tables, active, temps, rng,
            page_size=ps, num_steps=args.steps, spec_k=args.spec_k,
            attn_impl="paged",
        )

    results = {}
    # decode_program baseline
    for name in ("decode", "spec"):
        times = []
        for rep in range(4):
            if name == "decode":
                t0 = time.perf_counter()
                packed, carry, paged = run_decode(paged)
                np.asarray(packed)
            else:
                buf = jnp.zeros((s, mp * ps), jnp.int32)
                t0 = time.perf_counter()
                packed, carry, paged, buf = run_spec(paged, buf)
                np.asarray(packed)
            dt = time.perf_counter() - t0
            times.append(dt)
            log(f"{name} rep{rep}: {dt*1e3:.1f} ms "
                f"({dt*1e3/args.steps:.2f} ms/iter)")
        best = min(times[1:])  # rep0 = compile
        per_iter = best / args.steps
        toks = s * args.steps * (nq if name == "spec" else 1)
        results[name] = dict(
            ms_per_iter=round(per_iter * 1e3, 2),
            tok_s_ceiling=round(toks / best, 0),
        )
    import json

    out = {
        "metric": "spec_verify_ceiling_tok_s",
        "value": results["spec"]["tok_s_ceiling"],
        "decode_ms_per_iter": results["decode"]["ms_per_iter"],
        "spec_ms_per_iter": results["spec"]["ms_per_iter"],
        "decode_tok_s": results["decode"]["tok_s_ceiling"],
        "slots": s, "spec_k": args.spec_k, "steps": args.steps,
    }
    log(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
