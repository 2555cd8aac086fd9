"""Test harness config.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(mesh/pjit) is exercised without TPU hardware. The env vars must be set
before jax is first imported anywhere, hence this lives at conftest import
time.
"""

import os

# Force CPU: the host environment pre-sets JAX_PLATFORMS=axon (TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


def pytest_configure(config):
    import jax

    # The host environment force-registers the 'axon' TPU plugin and rewrites
    # jax_platforms to "axon,cpu" regardless of JAX_PLATFORMS; pin CPU here
    # (before any backend is touched) so tests run on the virtual 8-device
    # CPU mesh.
    jax.config.update("jax_platforms", "cpu")
    # XLA's DEFAULT matmul precision truncates f32 inputs (bf16-class passes,
    # on CPU and TPU alike). Numerical-equivalence tests need true f32.
    jax.config.update("jax_default_matmul_precision", "highest")
    config.addinivalue_line(
        "markers",
        "slow: jit/engine-heavy module (>20 s on the 1-core CI host); "
        "the fast tier is `pytest -m 'not slow'` (<2 min)",
    )


# Modules whose whole-file wall time exceeds ~20 s on the 1-core reference
# host (measured r4; mostly XLA:CPU compiles of engine/kernel/TP programs).
# `pytest -m "not slow"` runs the parity/postproc/eval/ingest core in
# under two minutes; the slow tier covers kernels, the serving engine,
# quantization, TP, and the soak/fuzz batteries.
SLOW_MODULES = {
    "test_aux",
    "test_chunked_prefill",
    "test_chunked_scheduler",
    "test_distributed_multihost",
    "test_engine",
    "test_flash_attention",
    "test_logit_bias",
    "test_logprobs",
    "test_minipdf_fuzz",
    "test_model",
    "test_paged",
    "test_parallel",
    "test_parity_harness",
    "test_penalties",
    "test_quantize",
    "test_scheduler_soak",
    "test_seed",
    "test_server",
    "test_serving_tp",
    "test_spec_realism",
    "test_speculative",
    "test_streaming",
    "test_tools_smoke",
    "test_windowed",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng_seed():
    return 0


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles many hundreds of XLA:CPU programs in one
    process (incl. shard_map/donation-heavy TP programs); with all of
    them held live, a later LLVM compile can segfault inside
    backend_compile_and_load (observed at ~78% of the r3 suite,
    reproducible only with the accumulated state). Clearing the pjit
    caches between modules releases the executables and keeps the
    whole-suite single-process run stable.
    """
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
