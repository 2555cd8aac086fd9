"""Training checkpoint save/restore (orbax).

The reference has no checkpoint/resume story at all — its only
"checkpointing" is the HF snapshot download with resume (SURVEY.md §5.4).
The rebuilt training path persists the full TrainState (params, optimizer
state, step) through orbax, plus the model config, so interrupted SFT runs
resume exactly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax

from dots_ocr_tpu.models.config import (
    DecoderConfig,
    DotsOCRConfig,
    SpecialTokens,
    VisionConfig,
)
from dots_ocr_tpu.train.train_step import TrainState


def _config_to_dict(config: DotsOCRConfig) -> dict:
    return {
        "vision": dataclasses.asdict(config.vision),
        "decoder": dataclasses.asdict(config.decoder),
        "special": dataclasses.asdict(config.special),
        "dtype": config.dtype,
    }


def _config_from_dict(d: dict) -> DotsOCRConfig:
    vision = d["vision"]
    vision["full_attn_layers"] = tuple(vision.get("full_attn_layers", ()))
    return DotsOCRConfig(
        vision=VisionConfig(**vision),
        decoder=DecoderConfig(**d["decoder"]),
        special=SpecialTokens(**d["special"]),
        dtype=d["dtype"],
    )


def save_checkpoint(path: str, state: TrainState, config: DotsOCRConfig) -> None:
    """Write a resumable checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model_config.json"), "w") as f:
        json.dump(_config_to_dict(config), f, indent=2)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"state_{int(state.step)}"), state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "latest"), "w") as f:
        f.write(str(int(state.step)))


def latest_step(path: str) -> Optional[int]:
    marker = os.path.join(path, "latest")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def restore_checkpoint(
    path: str, reference_state: TrainState
) -> Tuple[TrainState, DotsOCRConfig]:
    """Restore the newest checkpoint. ``reference_state`` provides the
    pytree structure/shapes (e.g. a fresh init with the same config)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    step = latest_step(path)
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    with open(os.path.join(path, "model_config.json")) as f:
        config = _config_from_dict(json.load(f))

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(
        os.path.join(path, f"state_{step}"),
        jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), reference_state
        ),
    )
    return state, config
