"""Benchmark: SERVING-PATH decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "decode_tok_s_per_chip", "value": N, "unit": "tok/s",
   "vs_baseline": N / 2000}

Baseline: the rebuild's north-star target of 2,000 decode tokens/sec/chip
(BASELINE.md "Rebuild performance targets"; the reference publishes no
speed numbers, ``assets/blog.md:1030``).

Method: the production path — the continuous-batching engine
(paged KV cache, multi-page DMA paged-attention kernel, multi-step decode
chunks) — at BENCH_SLOTS slots of text prompts on the real ~3B
architecture with deterministic params. Reported value is the steady-state
decode rate (time in decode-only scheduler steps at full occupancy), the
number a long-decode serving load sees. Round 1 measured the monolithic
generate() loop; since round 2 the serving path is the FASTER path
(PERF.md), so the headline now measures the engine users actually get.
Tunable via env: BENCH_SLOTS, BENCH_DECODE_TOKENS, BENCH_QUANT
(default int8 — the deploy/docker-compose.yml shipping default; set
BENCH_QUANT=bf16 for the unquantized decoder; measured r3: int8 8,412 vs
bf16 6,990 tok/s at 64 slots), BENCH_KV=int8, BENCH_ENGINE=monolithic
(round-1 method fallback).
"""

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_monolithic(config, params) -> float:
    """Round-1 method: wall-clock delta between long and short generate()."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dots_ocr_tpu.engine.generate import generate

    batch = int(os.environ.get("BENCH_BATCH", 48))
    context = int(os.environ.get("BENCH_CONTEXT", 1024))
    decode_steps = int(os.environ.get("BENCH_DECODE_STEPS", 64))
    short_steps = 8
    rng = np.random.RandomState(0)
    vocab_safe = config.decoder.vocab_size - 1000
    seq_lens = jnp.full((batch,), context, jnp.int32)
    temperature = jnp.zeros((batch,), jnp.float32)
    top_p = jnp.ones((batch,), jnp.float32)

    def run(steps: int, seed: int) -> float:
        input_ids = jnp.asarray(
            rng.randint(1, vocab_safe, (batch, context)).astype(np.int32)
        )
        key = jax.random.PRNGKey(seed)
        t0 = time.perf_counter()
        result = generate(
            params, config, input_ids, seq_lens, key, temperature, top_p,
            max_new_tokens=steps, nucleus=False,
        )
        np.asarray(result.tokens)
        return time.perf_counter() - t0

    run(short_steps, 0)
    run(short_steps + decode_steps, 1)
    t_short = min(run(short_steps, 10 + i) for i in range(3))
    t_long = min(run(short_steps + decode_steps, 20 + i) for i in range(3))
    tok_s = batch * decode_steps / (t_long - t_short)
    log(f"monolithic B={batch}: {tok_s:.1f} tok/s/chip")
    return tok_s


def bench_serving(config, params) -> float:
    """Continuous-batching engine, steady-state decode rate."""
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )

    slots = int(os.environ.get("BENCH_SLOTS", 64))
    max_new = int(os.environ.get("BENCH_DECODE_TOKENS", 256))
    # page 128 = the shipping default (deploy/launch_server_tpu.sh) and the
    # alignment the int8-KV multi-page kernel needs for its f32 scale DMAs.
    ps = int(os.environ.get("BENCH_PAGE_SIZE", 128))
    seq_cap = ps * ((16 + max_new + ps - 1) // ps) + ps
    sched = SchedulerConfig(
        num_pages=slots * (seq_cap // ps) + 8,
        page_size=ps,
        max_slots=slots,
        max_pages_per_seq=max(2, seq_cap // ps),
        prompt_bucket_step=128,
        vision_bucket_step=512,
        steps_per_sync=16,
        # Zeros-weights greedy decode is a period-1 token loop by
        # construction; the degeneration guard would stop every request.
        repetition_min_repeats=0,
        kv_cache_dtype="int8" if os.environ.get("BENCH_KV") == "int8" else "bf16",
        speculate_k=int(os.environ.get("BENCH_SPEC_K", 0)),
    )
    eng = ContinuousBatchingEngine(
        params, config, sched=sched, default_max_new_tokens=max_new
    )
    log("warmup (prefill bucket + decode widths)...")
    t0 = time.perf_counter()
    eng.generate_batch(["warm a", "warm b"], [[], []],
                       temperature=0.0, max_new_tokens=8)
    eng.warmup_decode(nucleus_variants=(False,))
    log(f"  warm in {time.perf_counter() - t0:.1f}s")

    temp = float(os.environ.get("BENCH_TEMP", 0.0))
    for i in range(slots):
        eng.submit(
            f"document page {i} content analysis request",
            temperature=temp, max_new_tokens=max_new,
        )
    decode_t = 0.0
    decode_gen = 0
    t0 = time.perf_counter()
    while eng.has_work():
        p_before = eng.metrics["prefills"]
        g_before = eng.metrics["generated_tokens"]
        ts = time.perf_counter()
        eng.step()
        dt = time.perf_counter() - ts
        if eng.metrics["prefills"] == p_before:
            decode_t += dt
            decode_gen += eng.metrics["generated_tokens"] - g_before
    wall = time.perf_counter() - t0
    steady = decode_gen / decode_t if decode_t else 0.0
    log(
        f"serving S={slots} max_new={max_new}: steady {steady:.0f} tok/s "
        f"({decode_gen} tokens / {decode_t:.2f}s decode; wave "
        f"{eng.metrics['generated_tokens']/wall:.0f} tok/s incl. prefill)"
    )
    return steady


def main() -> None:
    # Device acquisition watchdog: with the axon relay down, jax.devices()
    # sleeps in a reconnect loop FOREVER (observed r3: hours) — bound it
    # so the driver's bench run fails loudly instead of hanging.
    import threading

    devices_box: list = []

    def _acquire():
        import jax

        devices_box.append(jax.devices())

    t = threading.Thread(target=_acquire, daemon=True)
    t.start()
    t.join(timeout=float(os.environ.get("BENCH_DEVICE_TIMEOUT_S", 900)))
    if not devices_box:
        log("ERROR: no TPU device within the timeout (axon relay down?)")
        sys.exit(3)
    import jax

    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import count_params, zeros_params

    dev = devices_box[0][0]
    log(f"device: {dev} platform={dev.platform}")

    config = DotsOCRConfig.flagship()
    params = zeros_params(config)
    log(f"params: {count_params(params)/1e9:.2f}B ({config.dtype})")

    if os.environ.get("BENCH_QUANT", "int8") == "int8":
        from dots_ocr_tpu.models.quantize import quantize_decoder_params

        params = quantize_decoder_params(params)
        log("decoder quantized to int8 (BENCH_QUANT default; shipping "
            "config — deploy/docker-compose.yml)")

    if os.environ.get("BENCH_ENGINE") == "monolithic":
        tok_s = bench_monolithic(config, params)
    else:
        tok_s = bench_serving(config, params)

    print(
        json.dumps(
            {
                "metric": "decode_tok_s_per_chip",
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / 2000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
