"""Test configuration: run JAX on a simulated 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4 item 4):
`xla_force_host_platform_device_count=8` gives the sharding tests a virtual
8-chip mesh without TPU hardware.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU: the session environment registers a remote-TPU backend whose init
# handshake takes minutes and which overrides JAX_PLATFORMS programmatically —
# so the config entry (which wins over the env var) must be set here, before
# any backend initializes. Set PCFA_TEST_TPU=1 to run against real hardware.
import jax

if not os.environ.get("PCFA_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
