"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before jax is imported (hence module-level, and tests never import
jax before conftest loads).
"""

import os

# Force CPU even if the environment wires up an accelerator plugin (e.g. a
# tunneled TPU that rewrites jax_platforms at import): the suite must be
# hermetic and provide 8 virtual devices for mesh tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
