"""2-process DCN path: jax.distributed.initialize + multihost_mesh run live.

Spawns two worker processes (tests/multihost_worker.py), each owning 2
virtual CPU devices, connected through the JAX coordination service — the
same wiring a 2-host TPU pod slice uses over DCN. Verifies:

  * ``initialize_distributed`` (env-driven) brings both processes up;
  * ``multihost_mesh(model_parallel=2)`` keeps the TP axis inside one
    process and spans hosts only on the data axis;
  * one sharded prefill + greedy decode produces IDENTICAL tokens and
    matching logit checksums on both processes AND vs a single-process
    run of the same computation on a local (2, 2) mesh.

Reference analog: vLLM's NCCL TP knob (launch_model_vllm.sh); SURVEY.md
§2.3 comm-backend row and §5.8.
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")

_OK_RE = re.compile(
    r"MULTIHOST_OK pid=(\d) checksum=([0-9.eE+-]+) tokens=([0-9,]+)"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # The workers pin their own JAX_PLATFORMS/XLA_FLAGS before importing
    # jax; scrub the pytest process's values so they don't leak through.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def _parse(outs):
    results = {}
    for rc, out in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out[-3000:]}"
        m = _OK_RE.search(out)
        assert m, f"no MULTIHOST_OK line in worker output:\n{out[-3000:]}"
        results[int(m.group(1))] = (
            float(m.group(2)),
            [int(t) for t in m.group(3).split(",")],
        )
    return results


def test_both_processes_complete(worker_results):
    results = _parse(worker_results)
    assert set(results) == {0, 1}


def test_processes_agree(worker_results):
    results = _parse(worker_results)
    (c0, t0), (c1, t1) = results[0], results[1]
    assert t0 == t1, "greedy tokens differ across processes"
    np.testing.assert_allclose(c0, c1, rtol=1e-6)


def test_matches_single_process(worker_results):
    """The DCN-partitioned computation equals a single-process (2,2) mesh."""
    import jax
    from jax.sharding import Mesh

    from tests.multihost_worker import run_decode

    results = _parse(worker_results)
    devices = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("data", "model"))
    checksum, tokens = run_decode(mesh)

    assert tokens == results[0][1], "tokens differ from single-process run"
    np.testing.assert_allclose(checksum, results[0][0], rtol=1e-4)
