"""Pre-seed the XLA compile cache with the shipping program set.

Cold-start economics on a fresh host (BENCH_r04 + r5 captures): the first
full warmup compiles for ~288 s through the remote-compile tunnel; with a
warm persistent cache the same warmup binds in 10-30 s. The cache is
already persisted across restarts (compose volume / --compile-cache), but
nothing SEEDED it at deploy time — the first boot after image pull was a
~5-minute outage (VERDICT r4 item 7).

This primer compiles the exact program set the shipping server will
dispatch — same config geometry (deploy/shipping.env), same quantization
mode, same warmup shapes — against ZEROS weights, so it runs before any
checkpoint is downloaded. Program cache keys depend on HLO (shapes +
dtypes + config), not weight values, so the real-weights server hits
every entry.

Run ON THE TARGET TOPOLOGY (the cache is per TPU generation/topology):

    python tools/prime_cache.py --cache /workspace/compile-cache \
        [--weights ./weights/DotsOCR]   # config.json only, for exact dims

Deploy wiring: `docker compose --profile prime run primer` (one-shot
service sharing the cache volume), or `PRIME_CACHE=1
./deploy/launch_server_tpu.sh` to prime inline before binding.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[prime_cache] {m}", file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", "xla"))
    ap.add_argument("--weights", default=None,
                    help="checkpoint dir — config.json/preprocessor only "
                    "(no tensors are read); omit to prime the flagship "
                    "default geometry")
    ap.add_argument("--pages", default="560x420,1540x2044",
                    help="page classes to warm the vision/prefill buckets "
                    "for (the server's --warmup-pages default set)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config smoke (CI orchestration test)")
    args = ap.parse_args(argv)

    import jax

    os.makedirs(args.cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", args.cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"cache dir: {args.cache}; device: {jax.devices()[0]}")

    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import zeros_params
    from dots_ocr_tpu.utils.shipping import apply_vision_policy, shipping_config

    ship = shipping_config()
    if args.tiny:
        config = DotsOCRConfig.tiny()
        sched = SchedulerConfig(
            num_pages=192, page_size=8, max_slots=4, max_pages_per_seq=80,
            prompt_bucket_step=32, vision_bucket_step=16,
        )
    else:
        if args.weights and os.path.exists(
            os.path.join(args.weights, "config.json")
        ):
            from dots_ocr_tpu.models.loader import config_from_hf

            config = config_from_hf(args.weights)
            log(f"config from {args.weights}/config.json")
        else:
            config = DotsOCRConfig.flagship()
        config = apply_vision_policy(config, ship)
        ps = int(ship["PAGE_SIZE"])
        sched = SchedulerConfig(
            num_pages=int(ship["NUM_PAGES"]),
            page_size=ps,
            max_slots=int(ship["MAX_SLOTS"]),
            max_pages_per_seq=max(
                2, (int(ship["MAX_SEQ_TOKENS"]) + ps - 1) // ps
            ),
            steps_per_sync=int(ship["STEPS_PER_SYNC"]),
            prefill_chunk_tokens=int(ship["PREFILL_CHUNK"]),
            speculate_k=int(ship["SPECULATE_K"]),
            kv_cache_dtype=(
                "int8" if ship["KV_DTYPE"] == "int8" else "bf16"
            ),
        )

    params = zeros_params(config)
    if not args.tiny and ship["QUANTIZE"] in ("int8", "int4"):
        from dots_ocr_tpu.models.quantize import (
            quantize_decoder_params,
            quantize_decoder_params_int4,
        )

        params = (
            quantize_decoder_params_int4(params)
            if ship["QUANTIZE"] == "int4"
            else quantize_decoder_params(params)
        )
        log(f"decoder quantized ({ship['QUANTIZE']}) to match the server")

    t0 = time.time()
    eng = ContinuousBatchingEngine(params, config, sched=sched)
    for wh in args.pages.split(","):
        w, h = (int(x) for x in wh.lower().split("x"))
        img = Image.fromarray(np.zeros((h, w, 3), np.uint8))
        log(f"vision/prefill bucket for {w}x{h}...")
        eng.generate_batch(["warm", "warm"], [[img], []],
                           temperature=0.0, max_new_tokens=8)
    n = eng.warmup_decode()
    log(f"primed: {n} decode programs + "
        f"{len(args.pages.split(','))} page classes in {time.time()-t0:.0f}s")
    print(f"primed cache at {args.cache} in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
