"""Single-page latency anatomy: where do the warm seconds go?

Measures the bench_suite scenario-1 page (1400x1980 layout parse, 256
tokens, shipping engine geometry) with the engine's phase timers split
out (t_submit = host preprocessing; t_admit = vision-encoder dispatch;
t_prefill = decoder prefill chunks; t_decode = decode chunks), across
vision configurations:

  full        - image-wide attention everywhere (r3 shipping default)
  windowed    - window 16 + 6 spread full layers (docs/windowed_vision.md)
  full+w8a8   - full attention, W8A8 vision block matmuls
  win+w8a8    - both

Usage: python tools/bench_single_page.py [--max-new 256] [--reps 2]
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--max-new", type=int, default=256)
ap.add_argument("--reps", type=int, default=2)
ap.add_argument("--configs", default="full,windowed,full+w8a8,win+w8a8")
ap.add_argument("--wave", action="store_true",
                help="also measure the 8-page wave (suite scenario 4 "
                "shapes) with the phase split")
args = ap.parse_args()

import os

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print(f"devices: {jax.devices()}", file=sys.stderr)

from dots_ocr_tpu.engine.scheduler import (
    ContinuousBatchingEngine,
    SchedulerConfig,
)
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import zeros_params
from dots_ocr_tpu.models.quantize import (
    quantize_decoder_params,
    quantize_vision_params,
)
from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_suite import make_page_image  # noqa: E402

base_config = DotsOCRConfig.flagship()
params = zeros_params(base_config)
params_q = quantize_decoder_params(params)
prompt = dict_promptmode_to_prompt["prompt_layout_all_en"]

WINDOW_FULL_LAYERS = (6, 13, 20, 27, 34, 41)


def make_config(windowed: bool) -> DotsOCRConfig:
    if not windowed:
        return base_config
    return base_config.replace(vision=dataclasses.replace(
        base_config.vision, window_size=16,
        full_attn_layers=WINDOW_FULL_LAYERS,
    ))


def run(tag: str, windowed: bool, w8a8: bool):
    config = make_config(windowed)
    p = quantize_vision_params(params_q) if w8a8 else params_q
    # Same geometry as bench_suite.py flagship: shipping.env values with
    # the suite's documented 1024-page pool exception — so the two tools
    # share persistent-cache entries for every engine program.
    from dots_ocr_tpu.utils.shipping import shipping_config

    ship = shipping_config()
    sched = SchedulerConfig(
        num_pages=1024, page_size=int(ship["PAGE_SIZE"]),
        max_slots=int(ship["MAX_SLOTS"]),
        max_pages_per_seq=-(-int(ship["MAX_SEQ_TOKENS"])
                            // int(ship["PAGE_SIZE"])),
        prompt_bucket_step=512,
        vision_bucket_step=2048,
        steps_per_sync=int(ship.get("STEPS_PER_SYNC", "16")),
        prefill_chunk_tokens=int(ship["PREFILL_CHUNK"]),
        speculate_k=int(ship.get("SPECULATE_K", "2")),
        repetition_min_repeats=0,
    )
    eng = ContinuousBatchingEngine(
        p, config, sched=sched, default_max_new_tokens=args.max_new)
    # compile wave
    t0 = time.perf_counter()
    eng.generate_one(prompt, images=[make_page_image()], temperature=0.1,
                     max_new_tokens=args.max_new)
    eng.warmup_decode()
    compile_s = time.perf_counter() - t0
    best = None
    for rep in range(args.reps):
        for k in list(eng.metrics):
            eng.metrics[k] = (
                0 if not isinstance(eng.metrics[k], float) else 0.0)
        t0 = time.perf_counter()
        eng.generate_one(prompt, images=[make_page_image(seed=rep + 1)],
                         temperature=0.1, max_new_tokens=args.max_new)
        dt = time.perf_counter() - t0
        phases = {k: round(eng.metrics[k], 2) for k in (
            "t_submit_s", "t_admit_s", "t_prefill_s", "t_decode_s",
            "t_step_other_s")}
        if best is None or dt < best[0]:
            best = (dt, phases)
    print(f"{tag:12s}: warm {best[0]:.2f}s  phases={best[1]}  "
          f"(compile {compile_s:.0f}s)", file=sys.stderr)
    if args.wave:
        # 8-page wave anatomy (bench_suite scenario 4 shapes).
        imgs = [make_page_image(seed=10 + i, width=1540, height=2044)
                for i in range(8)]
        eng.generate_batch([prompt] * 8, [[im] for im in imgs],
                           temperature=0.0, max_new_tokens=16)
        wbest = None
        for rep in range(args.reps):
            for k in list(eng.metrics):
                eng.metrics[k] = (
                    0 if not isinstance(eng.metrics[k], float) else 0.0)
            t0 = time.perf_counter()
            eng.generate_batch([prompt] * 8, [[im] for im in imgs],
                               temperature=0.0, max_new_tokens=args.max_new)
            dt = time.perf_counter() - t0
            phases = {k: round(eng.metrics[k], 2) for k in (
                "t_submit_s", "t_admit_s", "t_prefill_s", "t_decode_s",
                "t_step_other_s")}
            extra = {k: eng.metrics.get(k, 0) for k in (
                "steps", "spec_chunks", "prefill_chunks",
                "pipelined_chunks", "generated_tokens")}
            if wbest is None or dt < wbest[0]:
                wbest = (dt, phases, extra)
        print(f"{tag:12s}: wave {wbest[0]:.2f}s ({8 / wbest[0]:.2f} pages/s)"
              f"  phases={wbest[1]}  counts={wbest[2]}", file=sys.stderr)
    del eng, p
    return best


want = set(args.configs.split(","))
for tag, windowed, w8a8 in (
    ("full", False, False),
    ("windowed", True, False),
    ("full+w8a8", False, True),
    ("win+w8a8", True, True),
):
    if tag in want:
        try:
            run(tag, windowed, w8a8)
        except Exception as ex:  # noqa: BLE001
            print(f"{tag}: FAILED {type(ex).__name__} {ex}", file=sys.stderr)
