"""Multi-host initialization + DCN/ICI mesh construction.

The reference's only inter-process story is NCCL hidden inside vLLM
(SURVEY.md §2.3/§5.8). The TPU-native equivalent: one process per host,
``jax.distributed.initialize`` over DCN, then a mesh whose ``data`` axis
spans hosts (collectives ride DCN) while ``model`` stays inside each host's
chips (collectives ride ICI).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op when single-process.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID); on Cloud TPU pods with no explicit
    configuration, ``jax.distributed.initialize()`` autodetects.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")

    if num_processes in (None, 1) and coordinator_address is None:
        logger.info("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed initialized: process %d / %d",
        jax.process_index(),
        jax.process_count(),
    )


def _env_int(name: str) -> Optional[int]:
    value = os.environ.get(name)
    return int(value) if value else None


def multihost_mesh(model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over all processes' devices.

    ``model`` never crosses a host boundary (TP collectives must ride ICI);
    ``data`` spans hosts over DCN. Requires local device count divisible by
    model_parallel.
    """
    devices = np.asarray(jax.devices())
    local = jax.local_device_count()
    assert local % model_parallel == 0, (
        f"{local} local devices not divisible by model_parallel={model_parallel}"
    )
    data = devices.size // model_parallel
    return Mesh(devices.reshape(data, model_parallel), ("data", "model"))
