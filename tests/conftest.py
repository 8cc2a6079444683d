"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip behavior (sharding, collectives, distributed top-k) is exercised
without real TPUs via XLA's host-platform device-count override -- the
standard JAX fake-backend trick (SURVEY.md section 4).  Must run before jax
is imported anywhere.
"""

import os

# Forced (not setdefault): the surrounding environment pins JAX_PLATFORMS to
# the TPU plugin (and a sitecustomize pre-imports jax internals), which would
# route every test compile through the TPU tunnel.  Belt and braces: set the
# env var AND update the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
# Hermetic tests: command mains enable the persistent XLA compilation
# cache; don't write cache entries into $HOME from the suite.
os.environ.setdefault("MFAR_COMPILE_CACHE", "off")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The TPU-tunnel PJRT plugin is registered at interpreter start (axon
# sitecustomize), and jax initializes every REGISTERED plugin when it first
# builds the backend registry -- even under jax_platforms=cpu.  When the
# tunnel is half-dead that init HANGS for minutes in every process, so drop
# the factory before any test touches jax.devices().  Best-effort: the
# attribute is jax-internal, and a missing factory only means the plugin was
# never registered (e.g. PALLAS_AXON_POOL_IPS unset).
try:  # pragma: no cover
    from jax._src import xla_bridge as _xb

    for _reg in ("_backend_factories",):
        getattr(_xb, _reg, {}).pop("axon", None)
except Exception:  # noqa: BLE001
    pass

import pytest  # noqa: E402

# Build the native C++ library once per session if the toolchain is present;
# native-dependent tests skip when the build is impossible.
try:
    from mfar_tpu.native import build_native_library

    build_native_library()
except Exception as _e:  # pragma: no cover
    print(f"[conftest] native build unavailable: {_e}")


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_prng_impl():
    """CLI mains set jax_default_prng_impl (--prng); keep it from leaking
    across tests."""
    impl = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != impl:
        jax.config.update("jax_default_prng_impl", impl)
