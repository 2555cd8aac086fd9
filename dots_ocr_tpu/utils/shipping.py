"""Single-source shipping config loader.

``deploy/shipping.env`` is THE shipping serving config (reference analog:
the vLLM flags in ``docker/docker-compose.yml:35-40`` of the reference).
Shell consumers (launch_server_tpu.sh, docker-compose) read it natively;
Python consumers (bench.py, bench_suite.py) read it through here so every
entry point agrees on QUANTIZE/KV_DTYPE/PAGE_SIZE/... without duplication.
"""

from __future__ import annotations

import os
from typing import Dict

_DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "deploy",
    "shipping.env",
)

# Fallbacks if the env file is missing (e.g. an installed wheel without the
# deploy/ tree) — MUST mirror deploy/shipping.env.
_FALLBACK = {
    "PAGE_SIZE": "128",
    "KV_DTYPE": "bf16",
    "QUANTIZE": "int8",
    "SPECULATE_K": "3",
    "PREFILL_CHUNK": "2048",
    "NUM_PAGES": "2048",
    "MAX_SLOTS": "16",
    "STEPS_PER_SYNC": "16",
    "WARMUP": "full",
}


def shipping_config(path: str | None = None) -> Dict[str, str]:
    """Parse deploy/shipping.env into a dict; falls back to baked defaults."""
    path = path or _DEFAULT_PATH
    cfg = dict(_FALLBACK)
    try:
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                k, v = line.split("=", 1)
                cfg[k.strip()] = v.strip()
    except OSError:
        pass
    return cfg
