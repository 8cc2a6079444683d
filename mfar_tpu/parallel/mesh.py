"""Device mesh construction and corpus sharding.

One ``jax.sharding.Mesh`` replaces the reference's entire NCCL/DDP plumbing
(SURVEY.md section 2.2): axis ``replica`` spans slices (collectives ride
DCN), axis ``data`` shards the corpus (index rows) and the train batch
within a slice (ICI), axis ``model`` shards encoder parameters (tensor
parallelism -- the reference has none).  Collectives are XLA-compiled; the
layout keeps the heavy traffic (in-batch negative all-gathers, corpus
scans) on ICI and only the tiny [B, k] candidate merges / gradient
all-reduce cross slices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REPLICA_AXIS = "replica"  # cross-slice (DCN) data parallelism
DATA_AXIS = "data"  # within-slice (ICI) data parallelism / corpus rows
MODEL_AXIS = "model"  # tensor parallelism

# The batch / corpus-row sharding axes, outer-to-inner.
BATCH_AXES = (REPLICA_AXIS, DATA_AXIS)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_replica: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with ('replica', 'data', 'model') axes.  Defaults to all devices
    on the data axis (replica and model singleton).

    For real multi-slice topologies, device order matters: devices are
    grouped so that the replica axis changes slowest, which matches
    ``mesh_utils.create_hybrid_device_mesh``'s slice-major ordering when
    devices arrive sorted by slice_index (jax.devices() guarantees this).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_replica)
    assert n_replica * n_data * n_model == len(devices), (
        f"mesh {n_replica}x{n_data}x{n_model} != {len(devices)} devices"
    )
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if n_replica > 1 and None not in slice_ids and len(slice_ids) == n_replica:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (n_data, n_model), (n_replica, 1), devices=devices
        ).reshape(n_replica, n_data, n_model)
    else:
        # Single physical slice (or virtual CPU devices, which all report
        # slice_index 0): plain slowest-axis-major reshape.  Devices arrive
        # process-major, so replica still spans processes in multi-process
        # runs -- the DCN-posture layout the replica axis exists for.
        if len(slice_ids - {None}) > 1:
            # Real multi-slice pod whose slice count != n_replica (e.g.
            # 4 slices, --n-replica 2).  The reshape keeps replica
            # slice-contiguous (devices arrive slice-sorted) but the DATA
            # axis then spans DCN within each replica -- a legitimate
            # capacity layout, but collectives on it run at DCN, not ICI,
            # bandwidth.  Say so instead of silently degrading.
            import warnings

            warnings.warn(
                f"make_mesh: {len(slice_ids)} physical slices but "
                f"n_replica={n_replica}; the '{DATA_AXIS}' axis will span "
                "DCN links inside each replica (expect DCN-bandwidth "
                "collectives there). Set --n-replica to the slice count "
                "for the ICI-aligned hybrid mesh.",
                stacklevel=2,
            )
        arr = np.asarray(devices).reshape(n_replica, n_data, n_model)
    return Mesh(arr, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def mesh_from_flag(
    flag: str, tag: str = "mesh", n_model: int = 1, n_replica: int = 1
) -> Optional[Mesh]:
    """CLI bootstrap for ``--mesh auto``: the all-device serving mesh when
    more than one chip is visible, else None.  One definition so the
    serving commands cannot drift (callers add their own feature gating,
    e.g. int8/pallas-gather force single-chip)."""
    if flag != "auto" or len(jax.devices()) <= 1:
        return None
    if len(jax.devices()) % (n_model * n_replica):
        raise SystemExit(
            f"n_model x n_replica = {n_model} x {n_replica} must divide the "
            f"{len(jax.devices())} visible devices"
        )
    mesh = make_mesh(n_model=n_model, n_replica=n_replica)
    print(f"[{tag}] mesh: {dict(mesh.shape)}")
    return mesh


def batch_axes(mesh: Mesh) -> Union[str, Tuple[str, ...]]:
    """The axes the train batch / corpus shards over: ('replica', 'data')
    when the mesh has a real replica axis, else just 'data'."""
    if REPLICA_AXIS in mesh.shape and mesh.shape[REPLICA_AXIS] > 1:
        return BATCH_AXES
    return DATA_AXIS


def n_batch_shards(mesh: Mesh) -> int:
    ax = batch_axes(mesh)
    if isinstance(ax, str):
        return mesh.shape[ax]
    return int(np.prod([mesh.shape[a] for a in ax]))


def pad_rows(x: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad axis 0 to a multiple; returns (padded, valid_n).  Padding rows are
    zero (they score 0 and are masked out by valid_n in top-k)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad_widths), n


def shard_array(mesh: Mesh, x, spec: P) -> jax.Array:
    """Place an array with the given PartitionSpec."""
    return jax.device_put(x, NamedSharding(mesh, spec))


def corpus_sharding(mesh: Mesh, replicate_across_slices: bool = False) -> P:
    """Corpus embedding matrices shard on rows and stay HBM-resident --
    replacing the reference's temp-dir memmaps as the 'vector store'
    (reference: mfar/data/util.py:28-59).

    Default shards rows over every batch axis (a corpus bigger than one
    slice spans slices; only [B, k] merges ride DCN).  Pass
    ``replicate_across_slices=True`` to keep a full copy per slice instead
    (higher QPS per query batch when the corpus fits in one slice).
    """
    if replicate_across_slices:
        return P(DATA_AXIS)
    return P(batch_axes(mesh))


def replicated(mesh: Mesh) -> P:
    return P()
