"""Single-process A/B: vision encoder bf16 vs W8A8 (--vision-quantize).

The encoder at a full page is MXU-compute-bound: ~55 TFLOP of attention
(flash kernel) + ~36 TFLOP of block matmuls at 14.6k tokens. W8A8 runs
the matmul half on the int8 MXU at ~2x the bf16 rate; this tool measures
the actual end-to-end encoder delta ON ONE CHIP IN ONE PROCESS (the
tunnel's compile/transfer service drifts 3-5x between processes — only
same-process A/Bs are trustworthy here).

Usage: python tools/bench_encoder.py [--side 1540] [--windowed] [--reps 5]
Prints one JSON line with bf16/w8a8 times per variant.
"""

import argparse
import json
import os
import sys
import time

# Runnable as `python tools/bench_encoder.py` from anywhere: repo root on
# sys.path directly (NOT via PYTHONPATH — a PYTHONPATH entry shadows a
# module the axon TPU plugin imports and kills backend discovery).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=1540,
                    help="square page side in px (1540 ~ 3.0 MP, ~12k tok)")
    ap.add_argument("--windowed", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    import jax

    from dots_ocr_tpu.engine.scheduler import encode_program
    from dots_ocr_tpu.models import preprocess
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import zeros_params
    from dots_ocr_tpu.models.quantize import quantize_vision_params

    log(f"devices: {jax.devices()}")
    config = DotsOCRConfig.flagship()
    if args.windowed:
        import dataclasses

        config = config.replace(
            vision=dataclasses.replace(config.vision, window_size=16)
        )
    params = zeros_params(config)

    rng = np.random.RandomState(0)
    img = Image.fromarray(
        rng.randint(0, 255, (args.side, args.side, 3), np.uint8)
    )
    packed = preprocess.pack_images([img], config.vision, bucket_step=512)
    log(f"page {args.side}px -> {packed.num_tokens} vision tokens "
        f"(bucket {packed.patches.shape[0]})")

    dev_inputs = dict(
        patches=jax.device_put(packed.patches),
        pos2d=jax.device_put(packed.pos2d),
        segment_ids=jax.device_put(packed.segment_ids),
        window_ids=(
            jax.device_put(packed.window_ids)
            if packed.window_ids is not None else None
        ),
    )
    attn = "flash" if jax.devices()[0].platform != "cpu" else "xla"

    def run(p, label):
        # Sync via a tiny data FETCH, not block_until_ready: the tunneled
        # axon backend's block_until_ready can return before execution
        # completes (measured: 0.1 ms "runs" of a 42-layer encoder);
        # pulling bytes is the only reliable barrier.
        t0 = time.perf_counter()
        out = encode_program(p, config, attn_impl=attn, **dev_inputs)
        np.asarray(out[:1, :1])
        log(f"  {label} compile+run: {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = encode_program(p, config, attn_impl=attn, **dev_inputs)
            np.asarray(out[:1, :1])
            times.append(time.perf_counter() - t0)
        best = min(times)
        log(f"  {label}: best {best*1e3:.1f} ms over {args.reps}")
        return best

    t_bf16 = run(params, "bf16")
    qparams = quantize_vision_params(params)
    t_w8a8 = run(qparams, "w8a8")

    print(json.dumps({
        "side_px": args.side,
        "vision_tokens": int(packed.num_tokens),
        "windowed": bool(args.windowed),
        "attn_impl": attn,
        "encoder_bf16_ms": round(t_bf16 * 1e3, 1),
        "encoder_w8a8_ms": round(t_w8a8 * 1e3, 1),
        "speedup": round(t_bf16 / t_w8a8, 3),
    }))


if __name__ == "__main__":
    main()
