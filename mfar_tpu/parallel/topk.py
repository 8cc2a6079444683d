"""Distributed retrieval primitives over the device mesh.

The TPU equivalents of the reference's eval data flow (SURVEY.md section
3.3), with the corpus sharded over the ``data`` mesh axis:

- :func:`distributed_dense_topk`: each shard streams its corpus slice
  through the fused scoring matmul and keeps a local top-k; the [B, k]
  candidates all-gather over ICI and merge -- replacing the reference's
  CPU memmap scan + per-rank qres files + dedup-merge
  (reference: mfar/data/index.py:181-222, mfar/modeling/contrastive.py:516-551).
- :func:`distributed_candidate_scores`: rerank-stage gather without
  materializing a global gather: each shard scores the candidate ids it
  owns and a psum over ICI assembles the full [B, C, F] score tensor.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mfar_tpu.ops.scoring import _pad_topk, dense_topk_chunked, dense_topk_chunked_approx
from mfar_tpu.parallel.mesh import DATA_AXIS

AxisSpec = Union[str, Tuple[str, ...]]


def _axis_size(mesh, axis: AxisSpec) -> int:
    if isinstance(axis, str):
        return mesh.shape[axis]
    return int(np.prod([mesh.shape[a] for a in axis]))


def distributed_dense_topk(
    mesh,
    qflat: jax.Array,  # [B, F*E] folded queries (replicated)
    docs_flat: jax.Array,  # [N, F*E] sharded P('data') on rows; N % n_shards == 0
    valid_n: int,  # real rows (padding beyond scores -inf)
    k: int,
    chunk_size: int = 131072,
    approx: bool = False,  # PartialReduce local top-k (recall stage)
    axis: AxisSpec = DATA_AXIS,  # e.g. ('replica', 'data') for multi-slice
) -> Tuple[jax.Array, jax.Array]:  # [B, k] scores, [B, k] global row ids
    n = docs_flat.shape[0]
    n_shards = _axis_size(mesh, axis)
    shard_n = n // n_shards
    local_k = min(k, shard_n)
    # Per-shard chunking must divide the shard and hold the top-k carry.
    chunk_size = min(chunk_size, shard_n)
    if chunk_size < local_k or shard_n % chunk_size != 0:
        chunk_size = shard_n
    local_op = dense_topk_chunked_approx if approx else dense_topk_chunked

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(None, axis), P(None, axis)),
    )
    def _local_topk(q, docs):
        shard_id = jax.lax.axis_index(axis)
        offset = (shard_id * shard_n).astype(jnp.int32)
        local_valid = jnp.clip(valid_n - offset, 0, shard_n)
        loc_s, loc_i = local_op(
            q, docs, local_valid, k=local_k, chunk_size=chunk_size
        )
        return loc_s, loc_i + offset

    # [B, n_shards*local_k] shard-candidate lists; the final merge is a tiny
    # top-k (XLA all-gathers the candidates over ICI automatically).
    cand_s, cand_i = _local_topk(qflat, docs_flat)

    kk = min(k, cand_s.shape[1])

    @jax.jit
    def _merge(cs, ci):
        top_s, sel = jax.lax.top_k(cs, kk)
        return _pad_topk(top_s, jnp.take_along_axis(ci, sel, axis=1), k)

    return _merge(cand_s, cand_i)


def distributed_candidate_scores(
    mesh,
    q: jax.Array,  # [B, E] (replicated)
    docs: jax.Array,  # [N, F, E] sharded P('data') on rows
    cand_ids: jax.Array,  # [B, C] global row ids (replicated); -1 = padding
    axis: AxisSpec = DATA_AXIS,
) -> jax.Array:  # [B, C, F] per-field dense scores
    """Each shard gathers only the candidates that live in its slice and
    contributes their scores; a psum over ICI yields the full tensor.
    Avoids a cross-shard gather of embedding rows (only the [B, C, F] score
    tensor rides the interconnect)."""
    n = docs.shape[0]
    n_shards = _axis_size(mesh, axis)
    shard_n = n // n_shards

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
    )
    def _run(q_, docs_, ids_):
        shard_id = jax.lax.axis_index(axis)
        offset = (shard_id * shard_n).astype(ids_.dtype)
        local = ids_ - offset
        mine = (local >= 0) & (local < shard_n)
        safe = jnp.where(mine, local, 0)
        gathered = jnp.take(docs_, safe, axis=0)  # [B, C, F, E]
        scores = jnp.einsum(
            "be,bcfe->bcf", q_, gathered, preferred_element_type=jnp.float32
        )
        scores = jnp.where(mine[..., None], scores, 0.0)
        return jax.lax.psum(scores, axis)

    return _run(q, docs, cand_ids)


def shard_info(mesh, n: int) -> Tuple[int, int]:
    n_shards = _axis_size(mesh, DATA_AXIS)
    assert n % n_shards == 0
    return n_shards, n // n_shards
