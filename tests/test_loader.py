"""Checkpoint loader tests: HF-name mapping round-trip on a tiny config."""

import json

import jax
import numpy as np
import pytest

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params, param_specs
from dots_ocr_tpu.models.loader import (
    CheckpointFormatError,
    config_from_hf,
    export_hf_state_dict,
    load_checkpoint,
    map_hf_state_dict,
)


@pytest.fixture(scope="module")
def cfg():
    return DotsOCRConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(jax.random.PRNGKey(1), cfg)


def test_roundtrip_identity(cfg, params):
    state = export_hf_state_dict(params, cfg)
    loaded = map_hf_state_dict(state, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=0,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_fused_qkv_split(cfg, params):
    state = export_hf_state_dict(params, cfg)
    # Fuse the vision q/k/v of each layer into attn.qkv and reload.
    n_layers = cfg.vision.num_layers
    for i in range(n_layers):
        q = state.pop(f"vision_tower.blocks.{i}.attn.q_proj.weight")
        k = state.pop(f"vision_tower.blocks.{i}.attn.k_proj.weight")
        v = state.pop(f"vision_tower.blocks.{i}.attn.v_proj.weight")
        state[f"vision_tower.blocks.{i}.attn.qkv.weight"] = np.concatenate([q, k, v], 0)
        qb = state.pop(f"vision_tower.blocks.{i}.attn.q_proj.bias")
        kb = state.pop(f"vision_tower.blocks.{i}.attn.k_proj.bias")
        vb = state.pop(f"vision_tower.blocks.{i}.attn.v_proj.bias")
        state[f"vision_tower.blocks.{i}.attn.qkv.bias"] = np.concatenate([qb, kb, vb], 0)
    loaded = map_hf_state_dict(state, cfg)
    np.testing.assert_allclose(
        np.asarray(loaded["vision"]["blocks"]["attn"]["wq"], np.float32),
        np.asarray(params["vision"]["blocks"]["attn"]["wq"], np.float32),
    )


def test_unmapped_tensor_raises(cfg, params):
    state = export_hf_state_dict(params, cfg)
    state["mystery.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(CheckpointFormatError, match="unmapped"):
        map_hf_state_dict(state, cfg)


def test_missing_layer_raises(cfg, params):
    state = export_hf_state_dict(params, cfg)
    del state["model.layers.1.self_attn.q_proj.weight"]
    with pytest.raises(CheckpointFormatError):
        map_hf_state_dict(state, cfg)


def test_shape_mismatch_raises(cfg, params):
    state = export_hf_state_dict(params, cfg)
    state["model.norm.weight"] = np.zeros((7,), np.float32)
    with pytest.raises(CheckpointFormatError, match="shape mismatch"):
        map_hf_state_dict(state, cfg)


def test_load_checkpoint_from_dir(tmp_path, cfg, params):
    from safetensors.numpy import save_file

    state = export_hf_state_dict(params, cfg)
    save_file(state, str(tmp_path / "model.safetensors"))
    hf_config = {
        "vocab_size": cfg.decoder.vocab_size,
        "hidden_size": cfg.decoder.hidden_size,
        "num_hidden_layers": cfg.decoder.num_layers,
        "num_attention_heads": cfg.decoder.num_heads,
        "num_key_value_heads": cfg.decoder.num_kv_heads,
        "head_dim": cfg.decoder.head_dim,
        "intermediate_size": cfg.decoder.intermediate_size,
        "tie_word_embeddings": True,
        "vision_config": {
            "embed_dim": cfg.vision.hidden_size,
            "num_hidden_layers": cfg.vision.num_layers,
            "num_attention_heads": cfg.vision.num_heads,
            "head_dim": cfg.vision.head_dim,
            "intermediate_size": cfg.vision.intermediate_size,
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_config))
    loaded_cfg, loaded = load_checkpoint(str(tmp_path))
    assert loaded_cfg.decoder.num_layers == cfg.decoder.num_layers
    assert loaded_cfg.vision.hidden_size == cfg.vision.hidden_size
    # dtype defaults to bf16 for the loaded flagship-style config
    specs = param_specs(loaded_cfg)
    flat = jax.tree_util.tree_leaves(specs)
    loaded_flat = jax.tree_util.tree_leaves(loaded)
    assert [s.shape for s in flat] == [a.shape for a in loaded_flat]


def test_config_from_hf_defaults():
    cfg = config_from_hf({})
    assert cfg.decoder.num_layers == 28
    assert cfg.vision.num_layers == 42
    assert cfg.decoder.num_kv_heads == 2
    # No window keys -> full attention (the safe default; see
    # docs/windowed_vision.md).
    assert cfg.vision.window_size == 0
    assert cfg.vision.full_attn_layers == ()


def test_config_from_hf_window_autodetect_qwen_pixels():
    """Qwen2.5-VL convention: window_size in PIXELS + fullatt_block_indexes."""
    cfg = config_from_hf(
        {
            "vision_config": {
                "patch_size": 14,
                "window_size": 112,  # px -> 8 raw patches
                "fullatt_block_indexes": [7, 15, 23, 31],
            }
        }
    )
    assert cfg.vision.window_size == 8
    assert cfg.vision.full_attn_layers == (7, 15, 23, 31)


def test_config_from_hf_window_patch_units():
    """Small values (< 4 patches' worth of px) are taken as patch units."""
    cfg = config_from_hf(
        {"vision_config": {"patch_size": 14, "window_size": 16}}
    )
    assert cfg.vision.window_size == 16
