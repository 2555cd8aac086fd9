"""Orchestration smoke tests for the deploy-time tools.

`tools/prime_cache.py` is the VERDICT-r4-item-7 deliverable (pre-seed the
XLA compile cache so first boot is not a ~5-minute outage) and
`tools/weights_day.py` is the insurance policy on the one
environment-blocked item (real-checkpoint fidelity). Both are wired into
deploy scripts (deploy/launch_server_tpu.sh PRIME_CACHE=1, compose
`--profile prime`), so a signature drift in the engine/loader APIs they
drive would otherwise only surface on a production host. These tests run
their --tiny/--smoke orchestration paths end to end on CPU.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env_extra=None, timeout=1200):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "")
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_prime_cache_tiny_seeds_cache(tmp_path):
    cache = tmp_path / "xla-cache"
    r = _run(
        ["tools/prime_cache.py", "--tiny", "--cache", str(cache),
         "--pages", "112x112"],
        # Persist even fast CPU compiles so the tiny config writes entries.
        env_extra={"JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "primed cache at" in r.stdout
    # The primer's whole point is a non-empty persistent cache.
    entries = list(cache.iterdir())
    assert entries, "primer exited 0 but wrote no cache entries"


def test_weights_day_smoke_drill():
    # The drill compiles ~30 XLA:CPU engine programs (~25 min cold on the
    # 1-core CI host — the warmup stage alone is ~22 min). A persistent
    # compile cache makes repeat runs cheap; the timeout covers a cold
    # cache under CI contention.
    r = _run(
        ["tools/weights_day.py", "--smoke"],
        env_extra={
            "JAX_COMPILATION_CACHE_DIR": os.path.join(
                REPO, ".cache", "xla-cpu-tests"
            ),
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "2",
        },
        timeout=3600,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    combined = r.stdout + r.stderr
    # The four r4-era gates VERDICT item 8 demanded must all have run.
    for stage in ("windowed", "windowed_ab", "vision_w8a8", "end2end_scorer"):
        assert stage in combined, f"drill did not report stage {stage!r}"
