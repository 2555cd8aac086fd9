"""Mixed-wave serving bench: concurrent vision pages, prefill + decode.

The workload the <1 s p50 / pages-per-second target is about: N document
pages arrive together; each needs a vision prefill (the chunked-prefill
scheduler interleaves these with decode) and a few hundred output tokens.
Reports pages/s, time-to-first-token per request, and decode-chunk latency
p50/p99 split by whether a prefill chunk ran in the same step — the
interleaving guarantee is "decode keeps flowing during prefill bursts".

    python tools/bench_mixed.py [--pages 8] [--max-new 256] \
        [--side 1536] [--chunk 2048] [--windowed] [--quant]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def pct(xs, p):
    if not xs:
        return 0.0
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--side", type=int, default=1536,
                    help="square page side in px (1536 -> ~2.4MP -> ~3k "
                    "vision tokens)")
    ap.add_argument("--chunk", type=int, default=2048,
                    help="prefill_chunk_tokens (0 = monolithic)")
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--steps-per-sync", type=int, default=8)
    ap.add_argument("--windowed", action="store_true",
                    help="windowed vision attention (encoder fast path)")
    ap.add_argument("--quant", action="store_true", help="int8 weights")
    ap.add_argument("--vision-quant", action="store_true",
                    help="W8A8 vision tower (int8 MXU encoder matmuls)")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 paged KV cache (halves decode attention "
                    "bytes; int8 MXU dots in-kernel)")
    ap.add_argument("--speculate-k", type=int, default=0,
                    help="n-gram speculative decode depth (exact for this "
                    "bench's greedy requests; zeros-weights output is "
                    "maximally repetitive -> acceptance is near the "
                    "ceiling, real pages sit lower)")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    import jax

    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import zeros_params

    log(f"devices: {jax.devices()}")
    config = DotsOCRConfig.flagship()
    if args.windowed:
        import dataclasses
        config = config.replace(
            vision=dataclasses.replace(config.vision, window_size=16)
        )
    params = zeros_params(config)
    if args.quant:
        from dots_ocr_tpu.models.quantize import quantize_decoder_params

        params = quantize_decoder_params(params)
        log("int8 weight-only decoder")
    if args.vision_quant:
        from dots_ocr_tpu.models.quantize import quantize_vision_params

        params = quantize_vision_params(params)
        log("W8A8 vision tower (dynamic act int8 + int8 MXU dots)")

    # Page budget: merged vision tokens = (side/28)^2 (patch 14 + 2x2
    # merge) + prompt + max_new.
    ps = args.page_size
    if args.kv_int8 and ps % 128 != 0:
        ps = 128  # int8 scale DMA needs 128-lane-aligned pages (v2 kernel)
        log(f"--kv-int8: page size bumped {args.page_size} -> {ps}")
    vis_tokens = (args.side // 28 + 1) ** 2
    seq_cap = vis_tokens + 512 + args.max_new
    pages_per_seq = -(-seq_cap // ps) + 1
    sched = SchedulerConfig(
        num_pages=args.slots * pages_per_seq + 8,
        page_size=ps,
        max_slots=args.slots,
        max_pages_per_seq=pages_per_seq,
        prompt_bucket_step=512,
        vision_bucket_step=512,
        steps_per_sync=args.steps_per_sync,
        prefill_chunk_tokens=args.chunk,
        repetition_min_repeats=0,
        kv_cache_dtype="int8" if args.kv_int8 else "bf16",
        speculate_k=args.speculate_k,
    )
    eng = ContinuousBatchingEngine(
        params, config, sched=sched, default_max_new_tokens=args.max_new
    )

    rng = np.random.RandomState(0)
    pages = [
        Image.fromarray(
            rng.randint(160, 255, (args.side, args.side, 3), np.uint8)
        )
        for _ in range(args.pages)
    ]
    prompt = "Please output the layout of this document page."

    log("warmup (encoder + prefill chunks + decode widths)...")
    t0 = time.perf_counter()
    eng.generate_one(prompt, images=[pages[0]], temperature=0.0,
                     max_new_tokens=max(8, args.steps_per_sync))
    eng.warmup_decode(nucleus_variants=(False,))
    log(f"  warm in {time.perf_counter() - t0:.1f}s")

    # Warm the WAVE shapes too: batched embed admission + lockstep chunk
    # groups compile at the wave's (batch bucket, vision bucket) — without
    # this the measured wave eats those XLA compiles (tens of seconds
    # through a remote-compile tunnel) and the numbers are meaningless.
    log("warmup wave (batched embed + group-chunk shapes)...")
    t0 = time.perf_counter()
    for i in range(args.pages):
        eng.submit(f"warm wave {i}", images=[pages[i]], temperature=0.0,
                   max_new_tokens=args.steps_per_sync)
    eng.run()
    for k in eng.metrics:
        eng.metrics[k] = 0
    log(f"  wave warm in {time.perf_counter() - t0:.1f}s")

    # The measured wave: all pages submitted at once. The clock starts
    # BEFORE the submits — host-side image preprocessing is part of the
    # page-parse cost (t_submit_s in the breakdown shows its share).
    # NB: measured A/B — parallel prep on a thread pool is SLOWER here
    # (3.4s on 4 threads vs 1.1s serial for 8 pages: GIL + allocator
    # contention in the numpy-heavy patcher); serial submit it is.
    first_token_at = {}
    decode_with_prefill, decode_alone = [], []
    g0 = eng.metrics["generated_tokens"]
    t0 = time.perf_counter()
    ids = []
    group = eng.sched.max_prefill_batch
    for i in range(args.pages):
        ids.append(
            eng.submit(f"{prompt} (page {i})", images=[pages[i]],
                       temperature=0.0, max_new_tokens=args.max_new)
        )
        if i + 1 == group and args.pages > group:
            # Dispatch the first admission group's uploads + encoders NOW
            # so the remaining pages' host preprocessing overlaps chip
            # compute (mirrors generate_batch's pipelined submission).
            eng.step()
    while eng.has_work():
        pc0 = eng.metrics.get("prefill_chunks", 0)
        p0 = eng.metrics["prefills"]
        d0 = eng.metrics["steps"]
        g_before = eng.metrics["generated_tokens"]
        ts = time.perf_counter()
        eng.step()
        dt = time.perf_counter() - ts
        had_prefill = (
            eng.metrics.get("prefill_chunks", 0) > pc0
            or eng.metrics["prefills"] > p0
        )
        had_decode = eng.metrics["steps"] > d0
        if had_decode:
            (decode_with_prefill if had_prefill else decode_alone).append(dt)
        for rid in ids:
            req = eng._finished.get(rid)
            if rid not in first_token_at:
                live = next(
                    (r for r in eng._slot_req
                     if r is not None and r.req_id == rid), None
                )
                if (live is not None and live.output_ids) or req is not None:
                    first_token_at[rid] = time.perf_counter() - t0
    wall = time.perf_counter() - t0
    gen = eng.metrics["generated_tokens"] - g0

    ttft = sorted(first_token_at.values())
    result = {
        "metric": "mixed_wave_pages_per_s",
        "value": round(args.pages / wall, 3),
        "pages": args.pages,
        "side_px": args.side,
        "prefill_chunk_tokens": args.chunk,
        "windowed": bool(args.windowed),
        "kv_int8": bool(args.kv_int8),
        "speculate_k": args.speculate_k,
        "quant": bool(args.quant),
        "wall_s": round(wall, 2),
        "gen_tok_s": round(gen / wall, 1),
        "ttft_p50_s": round(pct(ttft, 50), 2),
        "ttft_max_s": round(pct(ttft, 100), 2),
        "decode_step_p50_ms": round(1e3 * pct(decode_alone, 50), 1),
        "decode_step_p99_ms": round(1e3 * pct(decode_alone, 99), 1),
        "decode_step_with_prefill_p99_ms": round(
            1e3 * pct(decode_with_prefill, 99), 1
        ),
        "prefill_chunks": eng.metrics.get("prefill_chunks", 0),
        # Wall attribution (engine phase timers): where the wave's time
        # actually goes. t_* are host wall incl. the blocking fetches.
        "t_submit_s": round(eng.metrics.get("t_submit_s", 0.0), 2),
        "t_admit_s": round(eng.metrics.get("t_admit_s", 0.0), 2),
        "t_prefill_s": round(eng.metrics.get("t_prefill_s", 0.0), 2),
        "t_decode_s": round(eng.metrics.get("t_decode_s", 0.0), 2),
    }
    import json

    log(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
