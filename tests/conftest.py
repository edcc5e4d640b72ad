import os

# Force a virtual 8-device CPU platform BEFORE jax import: this is how the
# multi-chip sharding path is tested without TPU hardware (SURVEY.md section 4).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the env var; force CPU through the config too.
jax.config.update("jax_platforms", "cpu")
# x64 so parity tests against scipy LSODA at rtol 1e-6 are meaningful.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(items):
    """Insert a cache-clear boundary between test modules.

    A full-suite run compiles many hundreds of XLA programs in one
    process; letting executables/tracing caches accumulate across all of
    them has produced compiler segfaults deep into the run (XLA CPU,
    observed at ~240 tests on this machine). Dropping JAX's caches at
    module boundaries keeps the compiler's resident state bounded;
    within a module, fixtures still share compilations.
    """
    seen = {}
    for it in items:
        mod = it.nodeid.split("::", 1)[0]
        if mod not in seen:
            seen[mod] = True
            it.add_marker(pytest.mark.usefixtures("_module_cache_clear"))


@pytest.fixture
def _module_cache_clear():
    jax.clear_caches()
    yield
