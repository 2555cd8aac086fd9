"""Checkpoint-parity harness CI: exercised on a synthetic mini-checkpoint.

tools/parity_vs_hf.py is the one-command check to run the day the real
dots.ocr weights land (/root/reference/tools/download_model.py). Until
then this test proves the harness itself works — and the decoder section
is a REAL parity check already: it diffs our JAX decoder against
transformers' Qwen2ForCausalLM on shared weights, pinning the RMSNorm /
rotate-half RoPE / GQA / SwiGLU conventions.
"""

import json

import jax
import numpy as np
import pytest

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params
from dots_ocr_tpu.models.loader import export_hf_state_dict


@pytest.fixture(scope="module")
def synthetic_checkpoint(tmp_path_factory):
    """Write a tiny random model as an HF-style checkpoint dir."""
    from safetensors.numpy import save_file

    tmp = tmp_path_factory.mktemp("synth_ckpt")
    cfg = DotsOCRConfig.tiny().replace(dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = export_hf_state_dict(params, cfg)
    save_file(state, str(tmp / "model.safetensors"))
    hf_config = {
        "vocab_size": cfg.decoder.vocab_size,
        "hidden_size": cfg.decoder.hidden_size,
        "num_hidden_layers": cfg.decoder.num_layers,
        "num_attention_heads": cfg.decoder.num_heads,
        "num_key_value_heads": cfg.decoder.num_kv_heads,
        "head_dim": cfg.decoder.head_dim,
        "intermediate_size": cfg.decoder.intermediate_size,
        "rope_theta": cfg.decoder.rope_theta,
        "rms_norm_eps": cfg.decoder.rms_norm_eps,
        "tie_word_embeddings": cfg.decoder.tie_word_embeddings,
        "eos_token_id": cfg.special.eos_token_id,
        "pad_token_id": cfg.special.pad_token_id,
        "image_token_id": cfg.special.img_id,
        "image_pad_token_id": cfg.special.imgpad_id,
        "image_end_token_id": cfg.special.endofimg_id,
        "vision_config": {
            "embed_dim": cfg.vision.hidden_size,
            "num_hidden_layers": cfg.vision.num_layers,
            "num_attention_heads": cfg.vision.num_heads,
            "head_dim": cfg.vision.head_dim,
            "intermediate_size": cfg.vision.intermediate_size,
            "patch_size": cfg.vision.patch_size,
            "spatial_merge_size": cfg.vision.spatial_merge_size,
        },
    }
    (tmp / "config.json").write_text(json.dumps(hf_config))
    return str(tmp), cfg, params


def test_loader_report_passes(synthetic_checkpoint):
    from tools.parity_vs_hf import loader_report

    path, cfg, _ = synthetic_checkpoint
    report = loader_report(path, f32=True)
    assert report["status"] == "PASS", report
    assert report["config"]["decoder_layers"] == cfg.decoder.num_layers
    assert report["mapped_leaves"] > 10


def test_loader_report_fails_on_missing_dir(tmp_path):
    from tools.parity_vs_hf import loader_report

    assert loader_report(str(tmp_path))["status"] == "FAIL"


def test_decoder_parity_vs_transformers_qwen2(synthetic_checkpoint):
    """THE convention check: our decoder == HF Qwen2 on shared weights."""
    from tools.parity_vs_hf import decoder_parity

    path, cfg, params = synthetic_checkpoint
    report = decoder_parity(cfg, params, seq_len=16)
    if report["status"] == "SKIP":
        pytest.skip(report["reason"])
    assert report["status"] == "PASS", report
    assert report["max_abs_diff"] < 2e-3


def test_decoder_parity_detects_convention_bugs(synthetic_checkpoint, monkeypatch):
    """Simulate a wrong weight-name mapping (gate<->up swapped on the HF
    side only) — exactly the [EXTERNAL]-convention bug class the harness
    exists to catch. It must FAIL, not silently pass."""
    import dots_ocr_tpu.models.loader as loader_mod
    from tools.parity_vs_hf import decoder_parity

    real_export = loader_mod.export_hf_state_dict

    def corrupted_export(params, config):
        state = real_export(params, config)
        a = "model.layers.0.mlp.gate_proj.weight"
        b = "model.layers.0.mlp.up_proj.weight"
        state[a], state[b] = state[b], state[a]
        return state

    monkeypatch.setattr(loader_mod, "export_hf_state_dict", corrupted_export)
    path, cfg, params = synthetic_checkpoint
    report = decoder_parity(cfg, params, seq_len=16)
    if report["status"] == "SKIP":
        pytest.skip(report["reason"])
    assert report["status"] == "FAIL"


def test_vision_section_skips_without_modeling_code(synthetic_checkpoint):
    from tools.parity_vs_hf import vision_parity

    path, cfg, params = synthetic_checkpoint
    report = vision_parity(path, cfg, params)
    assert report["status"] == "SKIP"
    assert "modeling" in report["reason"]


def test_tokenizer_section_skips_without_tokenizer(synthetic_checkpoint):
    from tools.parity_vs_hf import tokenizer_report

    path, cfg, _ = synthetic_checkpoint
    report = tokenizer_report(path, cfg)
    assert report["status"] == "SKIP"


def test_run_all_on_synthetic(synthetic_checkpoint):
    """End-to-end harness run: no FAILs on the synthetic checkpoint."""
    from tools.parity_vs_hf import run_all

    path, _, _ = synthetic_checkpoint
    report = run_all(path, f32=True)
    failed = {k: v for k, v in report.items()
              if isinstance(v, dict) and v.get("status") == "FAIL"}
    assert not failed, failed
