"""Device-capacity introspection for serving cost models.

The Pallas rerank auto-gate (eval/retrieval.py) needs one number: how much
HBM one chip will actually let us allocate.  ``memory_stats()`` is the
source of truth when the backend exposes it, but the axon relay used on
this rig returns None -- so the lookup degrades to an env override and
finally a v5e-class default scaled by the XLA client allocator fraction
(by default JAX's BFC allocator claims XLA_PYTHON_CLIENT_MEM_FRACTION=0.75
of physical HBM; measured on this rig round 5: allocation fails at ~13 of
16 GiB).
"""

from __future__ import annotations

import os

import jax

# TPU v5e (this rig's chip class) ships 16 GiB HBM per chip.
DEFAULT_HBM_BYTES = 16 * 2**30


def _client_fraction() -> float:
    """The fraction of physical HBM the XLA client allocator may claim."""
    if os.environ.get("XLA_PYTHON_CLIENT_PREALLOCATE", "").lower() == "false":
        # on-demand allocator: no preallocation cap, the whole chip minus
        # runtime reserves is reachable
        return 1.0
    try:
        return float(os.environ.get("XLA_PYTHON_CLIENT_MEM_FRACTION", 0.75))
    except ValueError:
        return 0.75


def device_hbm_bytes(device=None) -> int:
    """Best-effort ALLOCATABLE HBM of one device, in bytes.

    Resolution order: ``MFAR_HBM_BYTES`` env (explicit operator override of
    the allocatable budget, also the deterministic knob for tests),
    ``memory_stats()['bytes_limit']`` when the backend reports it (already
    fraction-scaled), else :data:`DEFAULT_HBM_BYTES` x the client
    allocator fraction.
    """
    env = os.environ.get("MFAR_HBM_BYTES")
    if env:
        return int(env)
    try:
        dev = device if device is not None else jax.devices()[0]
        stats = dev.memory_stats()
        if stats:
            limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
            if limit:
                return int(limit)
    except Exception:  # noqa: BLE001 -- relay/backends without stats
        pass
    return int(DEFAULT_HBM_BYTES * _client_fraction())
