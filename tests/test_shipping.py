"""The shipping config has ONE source of truth (deploy/shipping.env).

Round-3 verdict: docker-compose shipped QUANTIZE=int8 while
launch_server_tpu.sh defaulted to no quantization — the two launchers
disagreed on what "shipping" meant. These tests pin every consumer to the
same file so they cannot drift again.
"""

import os
import re

from dots_ocr_tpu.utils.shipping import _FALLBACK, shipping_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_env_file_parses_and_matches_fallback():
    cfg = shipping_config()
    # The baked fallback must mirror the file exactly — editing one without
    # the other is the drift this test exists to catch.
    assert cfg == _FALLBACK


def test_shipping_values_are_the_r3_verdict_resolution():
    cfg = shipping_config()
    assert cfg["QUANTIZE"] == "int8"
    assert cfg["KV_DTYPE"] == "bf16"
    assert int(cfg["PAGE_SIZE"]) % 128 == 0  # int8-KV kernel alignment
    assert int(cfg["SPECULATE_K"]) >= 0


def test_launch_script_sources_the_env_file():
    with open(os.path.join(REPO, "deploy", "launch_server_tpu.sh")) as f:
        script = f.read()
    assert "shipping.env" in script
    # No hard-coded per-knob defaults left behind (the old `${PAGE_SIZE:-128}`
    # pattern) — defaults must come from the file.
    assert not re.search(r"\$\{(PAGE_SIZE|KV_DTYPE|SPECULATE_K|PREFILL_CHUNK"
                         r"|NUM_PAGES|MAX_SLOTS|STEPS_PER_SYNC|WARMUP):-",
                         script)


def test_docker_compose_uses_env_file():
    with open(os.path.join(REPO, "deploy", "docker-compose.yml")) as f:
        compose = f.read()
    assert "shipping.env" in compose
    # Knobs must not be duplicated inline in the compose environment block.
    assert "- QUANTIZE=" not in compose
    assert "- PAGE_SIZE=" not in compose


def test_bench_reads_shipping_config():
    with open(os.path.join(REPO, "bench.py")) as f:
        bench = f.read()
    assert "shipping_config" in bench
