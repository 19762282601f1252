"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via XLA's host-platform
device-count override, the standard JAX recipe (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin (axon) force-sets jax_platforms="axon,cpu" at
# interpreter start, overriding the env var; pin it back so unit tests run on
# the virtual 8-device CPU mesh and never contend for the real chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng(request):
    """Per-test deterministic RNG.

    Seeded from the test id, NOT shared across tests: a session-scoped
    stream made every test's data depend on how many draws ran before it,
    so adding a test file could shift an fp-marginal case past tolerance
    in an unrelated test."""
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode()) & 0xFFFF
    return np.random.default_rng(1234 + seed)
