"""End-to-end scenario suite -> BENCH_SUITE_r{N}.json.

Reproduces the reference's headline usage patterns on one chip with the
CONTINUOUS engine (the serving path): single-page layout parse, OCR +
grounding pages, a multi-page PDF drained sequentially, the 8-concurrent-
pages wave, and the 1,024-token sampled SVG decode. Zeros flagship
weights: speed/capacity only (quality needs the real checkpoint).

    python tools/bench_suite.py --out BENCH_SUITE_r2.json \
        [--windowed] [--quant] [--speculate-k 3] [--side 2304]

Scenario notes
- Warm shapes first (each scenario's buckets), then measure — mid-flight
  XLA compiles through a remote-compile tunnel are minutes each and would
  swamp the numbers.
- The SVG scenario samples at temp 0.9 / top_p 0.9 — since r3 the
  nucleus-exact verify lets speculation engage there too (acceptance
  depends on how repetitive the sampled stream is).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="BENCH_SUITE_r2.json")
    ap.add_argument("--side", type=int, default=2304,
                    help="big-page side in px (2304 ~ 5.3MP-class page)")
    ap.add_argument("--wave-side", type=int, default=1536)
    ap.add_argument("--windowed", action="store_true")
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--speculate-k", type=int, default=0)
    ap.add_argument("--max-new", type=int, default=256)
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

    ps = 128  # measured end-to-end sweet spot (see PERF.md); server default
    vis_big = (args.side // 28 + 1) ** 2
    seq_cap = vis_big + 512 + 1024  # covers the SVG decode budget
    pps = -(-seq_cap // ps) + 1
    sched = SchedulerConfig(
        num_pages=16 * pps + 8,
        page_size=ps,
        max_slots=16,
        max_pages_per_seq=pps,
        prompt_bucket_step=512,
        vision_bucket_step=512,
        steps_per_sync=8,
        prefill_chunk_tokens=2048,
        repetition_min_repeats=0,
        speculate_k=args.speculate_k,
    )
    eng = ContinuousBatchingEngine(
        params, config, sched=sched, default_max_new_tokens=args.max_new
    )

    rng = np.random.RandomState(0)

    def page(side):
        return Image.fromarray(
            rng.randint(160, 255, (side, side, 3), np.uint8)
        )

    big = page(args.side)
    wave_pages = [page(args.wave_side) for _ in range(8)]
    layout = "Please output the layout of this document page."
    ocr = "Extract the text content from this image."
    ground = "Extract text from the given bounding box <|box_start|>(100,100),(400,300)<|box_end|>"

    results = {}

    # -- warm every scenario shape --------------------------------------
    t0 = time.perf_counter()
    eng.generate_one(layout, images=[big], temperature=0.0, max_new_tokens=8)
    eng.generate_one(layout, images=[wave_pages[0]], temperature=0.0,
                     max_new_tokens=8)
    eng.warmup_decode()
    # sampled decode shapes (SVG): nucleus variant
    eng.generate_one("svg warm", temperature=0.9, top_p=0.9,
                     max_new_tokens=8, seed=1)
    for i in range(8):
        eng.submit(f"wave warm {i}", images=[wave_pages[i]],
                   temperature=0.0, max_new_tokens=8)
    eng.run()
    compile_s = time.perf_counter() - t0
    results["warmup"] = {"compile_s": round(compile_s, 2)}
    log(f"warm in {compile_s:.1f}s")

    # -- 1. single big page, layout ------------------------------------
    t0 = time.perf_counter()
    eng.generate_one(layout, images=[big], temperature=0.0,
                     max_new_tokens=args.max_new)
    results["single_image_layout"] = {
        "warm_page_s": round(time.perf_counter() - t0, 3),
        "tokens": args.max_new,
        "side_px": args.side,
    }
    log(f"single page: {results['single_image_layout']}")

    # -- 2. OCR + grounding --------------------------------------------
    t0 = time.perf_counter()
    eng.generate_one(ocr, images=[big], temperature=0.0,
                     max_new_tokens=args.max_new)
    ocr_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.generate_one(ground, images=[big], temperature=0.0,
                     max_new_tokens=128)
    results["ocr_and_grounding"] = {
        "ocr_page_s": round(ocr_s, 3),
        "grounding_page_s": round(time.perf_counter() - t0, 3),
    }
    log(f"ocr/grounding: {results['ocr_and_grounding']}")

    # -- 3. multi-page PDF (sequential single stream) ------------------
    t0 = time.perf_counter()
    for i in range(4):
        eng.generate_one(f"{layout} (pdf page {i})", images=[wave_pages[i]],
                         temperature=0.0, max_new_tokens=args.max_new)
    pdf_s = time.perf_counter() - t0
    results["multi_page_pdf"] = {
        "pages": 4, "total_s": round(pdf_s, 3),
        "s_per_page": round(pdf_s / 4, 3),
    }
    log(f"pdf: {results['multi_page_pdf']}")

    # -- 4. 8-page concurrent wave -------------------------------------
    g0 = eng.metrics["generated_tokens"]
    t0 = time.perf_counter()
    for i in range(8):
        eng.submit(f"{layout} (page {i})", images=[wave_pages[i]],
                   temperature=0.0, max_new_tokens=args.max_new)
    while eng.has_work():
        eng.step()
    wave_s = time.perf_counter() - t0
    results["continuous_batch"] = {
        "requests": 8,
        "total_s": round(wave_s, 3),
        "pages_per_s": round(8 / wave_s, 3),
        "decode_tok_per_s": round(
            (eng.metrics["generated_tokens"] - g0) / wave_s, 1
        ),
    }
    log(f"wave: {results['continuous_batch']}")

    # -- 5. SVG-style long sampled decode (B=1) ------------------------
    t0 = time.perf_counter()
    eng.generate_one("Draw this page as SVG.", images=[wave_pages[0]],
                     temperature=0.9, top_p=0.9, max_new_tokens=1024,
                     seed=5)
    results["svg_long_decode"] = {
        "max_new_tokens": 1024,
        "total_s": round(time.perf_counter() - t0, 3),
    }
    log(f"svg: {results['svg_long_decode']}")

    results["config"] = {
        "windowed": bool(args.windowed),
        "quant_int8": bool(args.quant),
        "speculate_k": args.speculate_k,
        "engine": "continuous",
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
