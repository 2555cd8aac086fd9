"""Worker process for the 2-process DCN test (test_distributed_multihost.py).

Each worker is one "host" of a 2-host x 2-chip topology (2 virtual CPU
devices per process): ``initialize_distributed`` brings up the JAX
coordination service over localhost (the DCN stand-in), ``multihost_mesh``
lays out a (data=2, model=2) mesh whose model axis stays inside the
process (ICI) while data spans processes (DCN), and one sharded text
prefill + greedy decode step runs under GSPMD — the collectives for the
tensor-parallel matmuls ride the intra-process axis, the logit checksum
all-reduce crosses processes.

Reference analog: the NCCL/TP knob vLLM exposes for the reference
(/root/reference/demo/launch_model_vllm.sh --tensor-parallel-size);
SURVEY.md §2.3/§5.8 names DCN for multi-host fan-out.
"""

from __future__ import annotations

import os
import sys


def run_decode(mesh):
    """One sharded text prefill + greedy next-token on the tiny model.

    Returns (checksum, tokens): a replicated scalar summary of the logits
    and the greedy next token per row — comparable across any device
    layout of the same computation.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import init_params
    from dots_ocr_tpu.models.vlm import vlm_prefill
    from dots_ocr_tpu.parallel.sharding import shard_params

    config = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), config)
    params = shard_params(params, config, mesh)

    batch, seq = 4, 8
    rng = np.random.RandomState(7)
    ids = rng.randint(4, config.decoder.vocab_size - 4, (batch, seq)).astype(np.int32)
    positions = np.broadcast_to(np.arange(seq, dtype=np.int32), ids.shape)
    seq_lens = np.full((batch,), seq, np.int32)

    tok_sharding = NamedSharding(mesh, P("data", None))
    seq_sharding = NamedSharding(mesh, P("data"))
    ids = jax.device_put(ids, tok_sharding)
    positions = jax.device_put(positions, tok_sharding)
    seq_lens = jax.device_put(seq_lens, seq_sharding)

    @jax.jit
    def step(params, ids, positions, seq_lens):
        logits, _cache = vlm_prefill(params, config, ids, positions, seq_lens)
        last = logits[:, -1, :]
        # Replicated summaries: the checksum all-reduce and the token
        # all-gather cross the DCN (data) axis, so every process can read
        # them (a data-sharded output is not addressable off-host).
        tokens = jax.lax.with_sharding_constraint(
            jnp.argmax(last, axis=-1), NamedSharding(mesh, P())
        )
        return jnp.sum(jnp.abs(last)) / last.size, tokens

    checksum, tokens = step(params, ids, positions, seq_lens)
    jax.block_until_ready(tokens)
    return float(checksum), np.asarray(jax.device_get(tokens)).tolist()


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    # Backend config must precede the first jax device query; the host's
    # axon TPU plugin ignores JAX_PLATFORMS, so pin via jax.config too.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from dots_ocr_tpu.parallel.distributed import (
        initialize_distributed,
        multihost_mesh,
    )

    initialize_distributed()  # env-driven (JAX_COORDINATOR_ADDRESS etc.)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()

    mesh = multihost_mesh(model_parallel=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2}, dict(mesh.shape)
    # The model (TP) axis must never cross a process boundary: its
    # collectives are per-layer and must ride ICI, not DCN.
    for row in mesh.devices:
        owners = {d.process_index for d in row}
        assert len(owners) == 1, f"model axis crosses hosts: {owners}"

    checksum, tokens = run_decode(mesh)
    print(
        f"MULTIHOST_OK pid={pid} checksum={checksum:.8f} "
        f"tokens={','.join(map(str, tokens))}",
        flush=True,
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
