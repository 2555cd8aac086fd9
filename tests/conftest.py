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
