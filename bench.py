"""Benchmark: flagship-model decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "decode_tok_s_per_chip", "value": N, "unit": "tok/s",
   "vs_baseline": N / 2000}

Baseline: the rebuild's north-star target of 2,000 decode tokens/sec/chip
(BASELINE.md "Rebuild performance targets"; the reference publishes no
speed numbers, ``assets/blog.md:1030``).

Method: the real ~3B architecture (1.2B-ViT config unused at decode; the
1.5B-class decoder dominates) with deterministic params, batch B sequences
at CONTEXT prompt tokens, measured as the wall-clock delta between a
LONG-decode and a SHORT-decode generate() call (both include the identical
prefill, so the delta isolates steady-state decode). Tunable via env:
BENCH_BATCH, BENCH_CONTEXT, BENCH_DECODE_STEPS.
"""

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    # Defaults chosen empirically on a single v5e chip: B=48 amortizes the
    # 5.6 GB/step parameter read well past the 2k tok/s target while the
    # KV cache (+prefill activations) still fits HBM alongside the params.
    batch = int(os.environ.get("BENCH_BATCH", 48))
    context = int(os.environ.get("BENCH_CONTEXT", 1024))
    decode_steps = int(os.environ.get("BENCH_DECODE_STEPS", 64))
    short_steps = 8

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dots_ocr_tpu.engine.generate import generate
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import count_params, zeros_params

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    config = DotsOCRConfig.flagship()
    params = zeros_params(config)
    n_params = count_params(params)
    log(f"params: {n_params/1e9:.2f}B ({config.dtype})")

    if os.environ.get("BENCH_QUANT") == "int8":
        # weight-only int8 decoder (models/quantize.py) — halves the
        # per-step parameter HBM read; opt-in, timing-comparison knob
        from dots_ocr_tpu.models.quantize import quantize_decoder_params

        params = quantize_decoder_params(params)
        log("decoder quantized to int8 (BENCH_QUANT=int8)")

    rng = np.random.RandomState(0)
    vocab_safe = config.decoder.vocab_size - 1000
    seq_lens = jnp.full((batch,), context, jnp.int32)
    temperature = jnp.zeros((batch,), jnp.float32)  # greedy (layout default 0.1~greedy-ish cost)
    top_p = jnp.ones((batch,), jnp.float32)

    def run(steps: int, seed: int) -> float:
        # Fresh inputs per call: the axon tunnel platform memoizes identical
        # (computation, inputs) pairs. Force a host fetch at the end —
        # block_until_ready does not synchronize on this platform.
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

    log(f"compiling short ({short_steps} steps)...")
    run(short_steps, 0)  # compile
    log("compiling long (%d steps)..." % (short_steps + decode_steps))
    run(short_steps + decode_steps, 1)  # compile

    t_short = min(run(short_steps, 10 + i) for i in range(3))
    t_long = min(run(short_steps + decode_steps, 20 + i) for i in range(3))
    decode_time = t_long - t_short
    tok_s = batch * decode_steps / decode_time
    log(
        f"B={batch} ctx={context} steps={decode_steps}: "
        f"short={t_short:.3f}s long={t_long:.3f}s delta={decode_time:.3f}s "
        f"-> {tok_s:.1f} tok/s/chip"
    )

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
