"""Multimodal training step: sharded loss + optimizer over the full VLM.

The reference repo is inference-only (SURVEY.md §5.4) — but the rebuilt
framework ships the training path so SFT-style fine-tuning (the reference's
own recipe: multitask prompts, reading-order-sorted layout targets,
``assets/blog.md:1004-1015``) runs TPU-natively: pjit over a
``(data, model)`` mesh, next-token cross entropy with a loss mask covering
only response tokens, optax AdamW, and ``jax.checkpoint``-friendly pure
functions.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.vlm import vlm_prefill


class TrainBatch(NamedTuple):
    """One packed multimodal batch (all padded to static shapes)."""

    input_ids: jnp.ndarray       # [B, T]
    positions: jnp.ndarray       # [B, T]
    seq_lens: jnp.ndarray        # [B]
    target_ids: jnp.ndarray      # [B, T] next-token targets
    loss_mask: jnp.ndarray       # [B, T] 1.0 on supervised positions
    # Packed vision inputs (zero-size friendly: pass None for text-only).
    patches: Optional[jnp.ndarray] = None
    rope_cos: Optional[jnp.ndarray] = None
    rope_sin: Optional[jnp.ndarray] = None
    segment_ids: Optional[jnp.ndarray] = None
    scatter_batch: Optional[jnp.ndarray] = None
    scatter_pos: Optional[jnp.ndarray] = None


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    learning_rate: float = 1e-5,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.95,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay),
    )


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def loss_fn(
    params, config: DotsOCRConfig, batch: TrainBatch, remat: bool = False
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Masked next-token cross entropy (f32 logits). remat rematerializes
    decoder layers in the backward pass (activation-memory for FLOPs)."""
    logits, _ = vlm_prefill(
        params,
        config,
        batch.input_ids,
        batch.positions,
        batch.seq_lens,
        patches=batch.patches,
        rope_cos=batch.rope_cos,
        rope_sin=batch.rope_sin,
        segment_ids=batch.segment_ids,
        scatter_batch=batch.scatter_batch,
        scatter_pos=batch.scatter_pos,
        remat=remat,
    )
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    target_logprobs = jnp.take_along_axis(
        logprobs, batch.target_ids[..., None], axis=-1
    )[..., 0]
    mask = batch.loss_mask.astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = -(target_logprobs * mask).sum() / denom
    accuracy = (
        ((jnp.argmax(logits, axis=-1) == batch.target_ids) * mask).sum() / denom
    )
    return loss, {"loss": loss, "accuracy": accuracy, "tokens": denom}


@partial(jax.jit, static_argnames=("config", "optimizer", "remat"), donate_argnames=("state",))
def train_step(
    state: TrainState,
    batch: TrainBatch,
    config: DotsOCRConfig,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step. jit-compatible with sharded params/batch: under a
    mesh, GSPMD derives gradient collectives from the in/out shardings."""
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, metrics), grads = grad_fn(state.params, config, batch, remat)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(params, opt_state, state.step + 1), metrics


def make_dummy_batch(
    config: DotsOCRConfig,
    batch_size: int = 2,
    seq_len: int = 16,
    vision_tokens: int = 0,
    seed: int = 0,
) -> TrainBatch:
    """Tiny synthetic batch (tests / multi-chip dry runs)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    vocab = config.decoder.vocab_size
    ids = rng.randint(1, vocab - 8, (batch_size, seq_len)).astype(np.int32)
    kwargs = {}
    if vision_tokens > 0:
        merge = config.vision.spatial_merge_size**2
        sp = config.special
        n_raw = vision_tokens * merge
        ids[:, 0] = sp.img_id
        ids[:, 1 : 1 + vision_tokens] = sp.imgpad_id
        ids[:, 1 + vision_tokens] = sp.endofimg_id
        total = batch_size * vision_tokens
        patches = rng.randn(total * merge, config.vision.patch_dim).astype(np.float32)
        from dots_ocr_tpu.models.rope import vision_grid_positions, vision_rope_table

        grid = int(np.sqrt(n_raw))
        assert grid * grid == n_raw, "vision_tokens must give a square grid"
        pos2d = np.concatenate(
            [vision_grid_positions(grid, grid) for _ in range(batch_size)], axis=0
        )
        cos, sin = vision_rope_table(pos2d, config.vision.head_dim, config.vision.rope_theta)
        seg = np.repeat(np.arange(batch_size, dtype=np.int32), n_raw)
        from dots_ocr_tpu.models.vlm import build_scatter_indices

        sb, sp_idx = build_scatter_indices(ids, sp.imgpad_id, total)
        kwargs = dict(
            patches=jnp.asarray(patches),
            rope_cos=jnp.asarray(cos),
            rope_sin=jnp.asarray(sin),
            segment_ids=jnp.asarray(seg),
            scatter_batch=jnp.asarray(sb),
            scatter_pos=jnp.asarray(sp_idx),
        )

    targets = np.roll(ids, -1, axis=1)
    mask = np.ones((batch_size, seq_len), np.float32)
    mask[:, -1] = 0.0
    positions = np.broadcast_to(np.arange(seq_len, dtype=np.int32), ids.shape)
    return TrainBatch(
        input_ids=jnp.asarray(ids),
        positions=jnp.asarray(positions),
        seq_lens=jnp.full((batch_size,), seq_len, jnp.int32),
        target_ids=jnp.asarray(targets),
        loss_mask=jnp.asarray(mask),
        **kwargs,
    )
