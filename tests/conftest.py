"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip behavior (sharding, collectives, distributed top-k) is exercised
without real TPUs via XLA's host-platform device-count override -- the
standard JAX fake-backend trick (SURVEY.md section 4).  Must run before jax
is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
