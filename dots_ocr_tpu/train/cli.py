"""Training driver: SFT-style fine-tuning loop over the full VLM.

The reference trains dots.ocr with multitask prompts and reading-order
targets (``assets/blog.md:1004-1015``) but ships no training code. This
driver runs that recipe TPU-natively: JSONL samples -> chat-templated,
image-packed batches -> sharded train_step over a (data, model) mesh, with
orbax checkpointing and optional per-layer remat.

Data format (one JSON object per line):
  {"prompt": "<task prompt>", "response": "<target text>",
   "images": ["path.png", ...]}        # images optional

Smoke mode (--synthetic N) trains on generated batches — exercises the full
path without data or a checkpoint.

Usage:
  python -m dots_ocr_tpu.train.cli --synthetic 16 --size tiny --steps 10
  python -m dots_ocr_tpu.train.cli --data sft.jsonl --weights ./weights/DotsOCR \
      --batch-size 8 --seq-len 4096 --model-parallel 1 --ckpt ./ckpts
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from typing import Iterator, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def build_batch(samples: List[dict], tokenizer, config, seq_len: int,
                vision_bucket_step: int = 512):
    """Tokenize + pack a list of samples into one TrainBatch."""
    import jax.numpy as jnp

    from dots_ocr_tpu.engine.chat_template import build_prompt_ids
    from dots_ocr_tpu.models import preprocess
    from dots_ocr_tpu.models.vlm import build_scatter_indices
    from dots_ocr_tpu.train.train_step import TrainBatch
    from dots_ocr_tpu.utils.image_io import fetch_image

    cfg = config.vision
    grid = cfg.patch_size * cfg.spatial_merge_size
    batch = len(samples)
    pad = config.special.pad_token_id
    eos = config.special.eos_token_id

    input_ids = np.full((batch, seq_len), pad, np.int32)
    targets = np.full((batch, seq_len), pad, np.int32)
    loss_mask = np.zeros((batch, seq_len), np.float32)
    seq_lens = np.zeros(batch, np.int32)
    all_images = []
    for row, sample in enumerate(samples):
        images = [
            fetch_image(p, min_pixels=3136, max_pixels=11289600)
            for p in sample.get("images", [])
        ]
        counts = [(im.width // grid) * (im.height // grid) for im in images]
        prompt_ids = build_prompt_ids(tokenizer, sample["prompt"], counts)
        response_ids = tokenizer.encode(sample["response"]) + [eos]
        ids = (prompt_ids + response_ids)[:seq_len]
        n = len(ids)
        input_ids[row, :n] = ids
        # next-token targets; supervise only the response span
        targets[row, : n - 1] = ids[1:]
        start = min(len(prompt_ids), n - 1)
        loss_mask[row, max(0, start - 1) : n - 1] = 1.0
        seq_lens[row] = n
        all_images.extend(images)

    kwargs = {}
    if all_images:
        packed = preprocess.pack_images(
            all_images, cfg, bucket_step=vision_bucket_step
        )
        merge = cfg.spatial_merge_size**2
        sb, sp = build_scatter_indices(
            input_ids, config.special.imgpad_id,
            packed.patches.shape[0] // merge,
            valid_rows=packed.merged_valid_rows(merge),
        )
        kwargs = dict(
            patches=jnp.asarray(packed.patches),
            rope_cos=jnp.asarray(packed.rope_cos),
            rope_sin=jnp.asarray(packed.rope_sin),
            segment_ids=jnp.asarray(packed.segment_ids),
            scatter_batch=jnp.asarray(sb),
            scatter_pos=jnp.asarray(sp),
        )
    positions = np.broadcast_to(np.arange(seq_len, dtype=np.int32),
                                input_ids.shape)
    return TrainBatch(
        input_ids=jnp.asarray(input_ids),
        positions=jnp.asarray(positions),
        seq_lens=jnp.asarray(seq_lens),
        target_ids=jnp.asarray(targets),
        loss_mask=jnp.asarray(loss_mask),
        **kwargs,
    )


def data_batches(path: str, batch_size: int) -> Iterator[List[dict]]:
    """Cycle over JSONL rows in fixed-size batches."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    if not rows:
        raise ValueError(f"no samples in {path}")
    idx = 0
    while True:
        batch = [rows[(idx + j) % len(rows)] for j in range(batch_size)]
        idx = (idx + batch_size) % len(rows)
        yield batch


def main(argv=None):
    ap = argparse.ArgumentParser(description="dots_ocr_tpu SFT trainer")
    ap.add_argument("--data", type=str, default=None, help="JSONL samples")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N synthetic batches (smoke mode)")
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--size", choices=["tiny", "small", "flagship"],
                    default="flagship")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--log-every", type=int, default=10)
    args = ap.parse_args(argv)

    import jax

    from dots_ocr_tpu.engine.engine import InferenceEngine
    from dots_ocr_tpu.engine.tokenizer import load_tokenizer
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import init_params
    from dots_ocr_tpu.parallel.distributed import initialize_distributed
    from dots_ocr_tpu.parallel.sharding import auto_mesh, batch_specs, shard_params
    from dots_ocr_tpu.train.train_step import (
        init_train_state,
        make_dummy_batch,
        make_optimizer,
        train_step,
    )
    from dots_ocr_tpu.utils.observability import setup_logging

    setup_logging()
    initialize_distributed()

    if args.weights:
        from dots_ocr_tpu.models.loader import load_checkpoint

        config, params = load_checkpoint(args.weights)
        tokenizer = load_tokenizer(args.weights)
    else:
        config = {
            "tiny": DotsOCRConfig.tiny,
            "small": DotsOCRConfig.small,
            "flagship": DotsOCRConfig.flagship,
        }[args.size]()
        params = init_params(jax.random.PRNGKey(0), config)
        tokenizer = InferenceEngine._default_tokenizer(config)

    mesh = auto_mesh(model_parallel=args.model_parallel)
    logger.info("mesh: %s", dict(mesh.shape))
    params = shard_params(params, config, mesh)
    optimizer = make_optimizer(learning_rate=args.lr)
    state = init_train_state(params, optimizer)

    if not args.synthetic:
        assert args.data, "--data or --synthetic required"
        source = data_batches(args.data, args.batch_size)

    t0 = time.time()
    with jax.set_mesh(mesh):
        for step in range(1, args.steps + 1):
            if args.synthetic:
                batch = make_dummy_batch(
                    config, batch_size=args.batch_size, seq_len=args.seq_len,
                    seed=step,
                )
            else:
                batch = build_batch(next(source), tokenizer, config, args.seq_len)
            state, metrics = train_step(state, batch, config, optimizer,
                                        remat=args.remat)
            if step % args.log_every == 0 or step == args.steps:
                loss = float(metrics["loss"])
                logger.info(
                    "step=%d loss=%.4f acc=%.3f grad_norm=%.3f elapsed=%.1fs",
                    step, loss, float(metrics["accuracy"]),
                    float(metrics["grad_norm"]), time.time() - t0,
                )
            if args.ckpt and (step % args.ckpt_every == 0 or step == args.steps):
                from dots_ocr_tpu.train.checkpoint import save_checkpoint

                save_checkpoint(args.ckpt, state, config)
                logger.info("checkpoint saved at step %d", step)


if __name__ == "__main__":
    main()
