"""Multi-host (multi-process) runtime bootstrap.

The reference's runtime is multi-process by construction: Lightning's DDP
launcher spawns one process per device and handles multi-node (reference:
mfar/commands/train.py:246-250).  The TPU-native equivalent is JAX's
multi-controller model -- one Python process per host, each owning its local
chips, wired into ONE global mesh by ``jax.distributed.initialize``.  On a
real multi-host slice (v5e-16+) or any multi-slice topology, the runtime
CANNOT start without this call; single-host runs are unaffected.

Operating model (chosen to keep every process's control flow identical --
collectives must be issued in the same order everywhere):

- Every process computes the SAME host-global batches (the data pipeline is
  deterministic under its explicit seeds), and ``jax.device_put`` of an
  identical host-global array onto a global sharding transfers only each
  process's addressable shards (verified against jax 0.9 semantics).  No
  per-process dataset sharding logic, no divergence.
- jitted scalar outputs (losses) and merges forced to a replicated
  out-sharding are fully addressable, so every process can fetch them and
  reach the SAME early-stop / best-checkpoint decisions.
- Only FILE I/O is gated to process 0 (qres, checkpoints, metrics logs) --
  the multihost replacement for the reference's per-rank qres files +
  rank-0 dedup-merge (reference: mfar/modeling/contrastive.py:516-551).

Gating: ``maybe_initialize`` engages on an explicit coordinator env
(MFAR_COORDINATOR + MFAR_NUM_PROCESSES + MFAR_PROCESS_ID), on cloud-TPU
multi-host env markers (auto-detected by jax.distributed.initialize), or
when forced; plain single-host runs never touch jax.distributed.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def maybe_initialize(mode: str = "auto") -> bool:
    """Bring up the JAX distributed runtime when the environment calls for
    it.  Returns True when running multi-process after the call.

    mode: 'auto' (default) engages only on the explicit coordinator env
    triple (MFAR_COORDINATOR + MFAR_NUM_PROCESSES + MFAR_PROCESS_ID); 'off'
    never initializes; 'force' is 'auto' that fails loudly when the env is
    absent; 'pod' calls bare jax.distributed.initialize() for cloud-TPU pod
    slices where JAX self-configures from the TPU metadata.  Passive env
    markers (e.g. TPU_WORKER_HOSTNAMES) are deliberately NOT auto-detected:
    single-host rigs with a TPU plugin export them too.
    """
    global _initialized
    # NB: decide from env/mode BEFORE touching jax.process_count() --
    # querying it initializes the XLA backend, after which
    # jax.distributed.initialize refuses to run.
    if mode == "off":
        return jax.process_count() > 1
    if _initialized:
        return True
    if mode == "pod":
        jax.distributed.initialize()
        _initialized = True
        return True

    coord = os.environ.get("MFAR_COORDINATOR")
    nproc = os.environ.get("MFAR_NUM_PROCESSES")
    pid = os.environ.get("MFAR_PROCESS_ID")
    if coord and nproc and pid:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
        _initialized = True
        return True
    if mode == "force":
        raise SystemExit(
            "--multihost force requires MFAR_COORDINATOR, MFAR_NUM_PROCESSES "
            "and MFAR_PROCESS_ID in the environment"
        )
    return jax.process_count() > 1


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns file I/O (qres, checkpoints, logs)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def replicated_sharding(mesh) -> Optional["jax.sharding.NamedSharding"]:
    """Fully-replicated out-sharding for tiny results every process must be
    able to fetch (top-k merges, metrics scalars).  None without a mesh."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def sync(name: str = "mfar") -> None:
    """Barrier across processes (no-op single-process)."""
    if is_multiprocess():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
