"""Device mesh construction and corpus sharding.

One ``jax.sharding.Mesh`` replaces the reference's entire NCCL/DDP plumbing
(SURVEY.md section 2.2): axis ``data`` shards the corpus (index rows) and the
train batch; axis ``model`` shards encoder parameters (tensor parallelism --
the reference has none).  All collectives are XLA-compiled over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with ('data', 'model') axes.  Defaults to all devices on the
    data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


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


def corpus_sharding(mesh: Mesh) -> P:
    """Corpus embedding matrices shard on rows over the data axis and stay
    HBM-resident -- replacing the reference's temp-dir memmaps as the
    'vector store' (reference: mfar/data/util.py:28-59)."""
    return P(DATA_AXIS)


def replicated(mesh: Mesh) -> P:
    return P()
