"""Steady-state continuous-batching decode throughput (flagship, 1 chip).

Text-only prompts (prefill negligible) keep all S slots decoding; reports
end-to-end generated tok/s plus the chunk-input rebuild ratio (the
zero-upload device-carry path — scheduler.step() — should make rebuilds
rare). Usage:

    python tools/bench_continuous.py [--slots 64] [--max-new 256] [--quant]

Memoization-safe: every request has a distinct prompt; the engine's rng
advances per chunk.
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
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--requests", type=int, default=None,
                    help="default = slots (one full wave)")
    ap.add_argument("--quant", action="store_true", help="int8 weights")
    ap.add_argument("--steps-per-sync", type=int, default=16)
    ap.add_argument("--page-size", type=int, default=64,
                    help="KV page size: bigger pages -> fewer, larger "
                    "paged-attention tiles (less per-tile overhead), "
                    "coarser allocation")
    ap.add_argument("--speculate-k", type=int, default=0,
                    help="n-gram speculative decode depth (NB: zeros-params "
                    "greedy output is a period-1 loop, so acceptance here is "
                    "~100%% — this measures the verify-kernel ceiling, not a "
                    "realistic acceptance mix)")
    args = ap.parse_args()

    import jax

    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import zeros_params

    log(f"devices: {jax.devices()}")
    config = DotsOCRConfig.flagship()
    params = zeros_params(config)
    if args.quant:
        from dots_ocr_tpu.models.quantize import quantize_decoder_params

        params = quantize_decoder_params(params)
        log("int8 weight-only decoder")

    n_req = args.requests or args.slots
    ps = args.page_size
    seq_cap = ps * ((16 + args.max_new + ps - 1) // ps) + ps
    sched = SchedulerConfig(
        num_pages=args.slots * (seq_cap // ps) + max(64 // (ps // 64), 8),
        page_size=ps,
        max_slots=args.slots,
        max_pages_per_seq=max(2, seq_cap // ps),
        prompt_bucket_step=128,
        vision_bucket_step=512,
        steps_per_sync=args.steps_per_sync,
        # Zeros-weights greedy decode is a period-1 token loop by
        # construction; the degeneration guard would stop every request
        # early and distort the measurement.
        repetition_min_repeats=0,
        speculate_k=args.speculate_k,
    )
    eng = ContinuousBatchingEngine(
        params, config, sched=sched, default_max_new_tokens=args.max_new
    )

    log("warmup (prefill bucket + decode widths)...")
    t0 = time.perf_counter()
    eng.generate_batch(["warm a", "warm b"], [[], []],
                       temperature=0.0, max_new_tokens=8)
    eng.warmup_decode(nucleus_variants=(False,))
    log(f"  warm in {time.perf_counter() - t0:.1f}s")

    prompts = [f"document page {i} content analysis request" for i in range(n_req)]
    g0 = eng.metrics["generated_tokens"]
    s0 = eng.metrics["steps"]
    r0 = eng.metrics["chunk_input_rebuilds"]
    # Drive the wave step by step, splitting time into prefill chunks
    # (admission happened) vs pure decode chunks — "steady state" = the
    # decode-only rate at full occupancy, the number a long-decode serving
    # load sees; "wave" = end-to-end including prefills.
    for i in range(n_req):
        eng.submit(prompts[i], temperature=0.0, max_new_tokens=args.max_new)
    decode_t = prefill_t = 0.0
    decode_gen = 0
    t0 = time.perf_counter()
    while eng.has_work():
        p_before = eng.metrics["prefills"]
        g_before = eng.metrics["generated_tokens"]
        ts = time.perf_counter()
        eng.step()
        dt_step = time.perf_counter() - ts
        if eng.metrics["prefills"] > p_before:
            prefill_t += dt_step
        else:
            decode_t += dt_step
            decode_gen += eng.metrics["generated_tokens"] - g_before
    dt = time.perf_counter() - t0
    gen = eng.metrics["generated_tokens"] - g0
    steps = eng.metrics["steps"] - s0
    rebuilds = eng.metrics["chunk_input_rebuilds"] - r0
    steady = decode_gen / decode_t if decode_t else 0.0
    log(
        f"S={args.slots} n={n_req} max_new={args.max_new} chunk={args.steps_per_sync}: "
        f"wave {gen} tokens in {dt:.2f}s = {gen/dt:.0f} tok/s | "
        f"steady-state {decode_gen} tokens in {decode_t:.2f}s = {steady:.0f} tok/s "
        f"(prefill {prefill_t:.2f}s) | {steps} chunks, {rebuilds} rebuilt "
        f"({100*rebuilds/max(1,steps):.0f}% upload chunks)"
    )
    print(
        '{"metric": "continuous_decode_tok_s", "value": %.1f, '
        '"wave_tok_s": %.1f, "slots": %d, "rebuild_frac": %.3f%s}'
        % (steady, gen / dt, args.slots, rebuilds / max(1, steps),
           (', "quant": "int8"' if args.quant else "")
           + (', "speculate_k": %d' % args.speculate_k
              if args.speculate_k else ""))
    )


if __name__ == "__main__":
    main()
