"""Test harness: run everything on a virtual 8-device CPU platform.

Must run before the first `import jax` anywhere in the test session, so the
multi-chip sharding paths can be exercised without TPU hardware
(SURVEY.md §4: multi-device tests via ``xla_force_host_platform_device_count``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is not honored when an out-of-tree TPU plugin is
# installed; pin the platform explicitly before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
