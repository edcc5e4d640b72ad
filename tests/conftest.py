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
