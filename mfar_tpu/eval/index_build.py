"""Corpus index construction: dense encoding pipeline + sparse BM25 builds.

Replaces the reference's eval-time corpus (re)indexing -- per-rank encoding
into a shared temp-dir memmap with a barrier (reference:
mfar/modeling/contrastive.py:465-496, mfar/data/index.py:234-258) -- with a
single-controller pipeline: per dense field, documents format + tokenize on
host into fixed-size bucketed batches and stream through the jitted encoder
in large MXU-saturating batches; the resulting ``[N, Fd, E]`` matrix is
device_put sharded over the mesh data axis and stays HBM-resident.
"""

from __future__ import annotations

import os

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mfar_tpu.data.format import format_documents
from mfar_tpu.data.types import Corpus, Field
from mfar_tpu.data.schema import dense_keys, sparse_keys
from mfar_tpu.sparse.bm25 import BM25Index


def make_batch_sharder(mesh) -> Callable:
    """(ids, mask) -> mesh-batch-sharded copies when the row count divides
    the shard count, else unchanged (replicated compute fallback).  The one
    place the divisibility/sharding rule lives -- shared by
    :func:`make_encode_fn` and the trainer's eval-time encoder."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mfar_tpu.parallel.mesh import batch_axes, n_batch_shards

    sharding = NamedSharding(mesh, P(batch_axes(mesh)))
    n_dp = n_batch_shards(mesh)
    # Ragged batches fall back to replicated compute.  Multi-host: they
    # must still be committed to the GLOBAL mesh -- a process-local host
    # array mixed with globally-sharded params in the encode jit raises
    # 'incompatible devices' (mirrors Trainer._place_batch).
    rep = None
    if jax.process_count() > 1:
        rep = NamedSharding(mesh, P())

    def shard(ids, mask):
        if ids.shape[0] % n_dp == 0:
            return jax.device_put(ids, sharding), jax.device_put(mask, sharding)
        if rep is not None:
            return jax.device_put(ids, rep), jax.device_put(mask, rep)
        return ids, mask

    return shard


def make_encode_fn(encoder, params, mesh=None) -> Callable:
    """Jitted (input_ids, attention_mask) -> [n, E] with params bound as a
    jit ARGUMENT, never a closure constant: closure capture embeds the full
    weights in the compile payload (overflowing remote-compile transports at
    full model scale) and recompiles whenever the closure is rebuilt.

    With a ``mesh``, encode batches shard over the batch axes so corpus
    encoding uses every chip (rows that don't divide the shard count fall
    back to replicated compute)."""
    # Multi-host: replicate the embedding output so every process can fetch
    # it on host (encode_texts consumes with np.asarray); a batch-sharded
    # output would have non-addressable shards.
    out_shardings = None
    if mesh is not None and jax.process_count() > 1:
        from mfar_tpu.parallel import multihost

        out_shardings = multihost.replicated_sharding(mesh)
    jit_encode = jax.jit(
        lambda p, ids, mask: encoder.apply({"params": p}, ids, mask),
        out_shardings=out_shardings,
    )

    if mesh is None:
        jparams = jax.tree.map(jnp.asarray, params)

        def encode(ids, mask):
            return jit_encode(jparams, ids, mask)

        return encode

    # Params replicate onto the mesh in ONE transfer (an eager asarray
    # first would commit the whole tree to the default device and then
    # re-transfer it): checkpoint-restored (or jit-created) params arrive
    # committed to one device, and mixing them with mesh-sharded batches
    # is a device-set mismatch.
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    jparams = jax.tree.map(lambda x: jax.device_put(x, rep), params)
    shard = make_batch_sharder(mesh)

    def encode_sharded(ids, mask):
        return jit_encode(jparams, *shard(ids, mask))

    return encode_sharded


def encode_texts(
    encode_fn: Callable,  # (input_ids, attention_mask) -> [n, E]
    tokenizer,
    texts: Sequence[str],
    max_length: int,
    batch_size: int = 256,
    out=None,  # optional [len(texts), E] write target (e.g. a disk memmap
    #            row-slice): batches stream straight into it, so host RAM
    #            stays O(window * batch) instead of O(corpus)
) -> np.ndarray:
    """Batched encoder forward over texts.  Batches are padded to the full
    ``batch_size`` and a single bucket width so every step reuses one
    compiled program (no per-batch recompiles on TPU).

    Dispatches are asynchronous: host tokenization of batch i+1 overlaps
    device compute of batch i, and results transfer to host in a bounded
    sliding window -- fetching per batch would serialize on the device
    round-trip (on a relay-tunneled chip that alone is ~35 ms/batch), while
    keeping every batch device-resident would grow HBM by O(corpus)."""
    window = 8  # batches in flight; bounds device residency to O(window)
    pending: List[Tuple[Any, int, int]] = []
    acc: List[np.ndarray] = []

    def drain(upto: int) -> None:
        while len(pending) > upto:
            embs, real, pos = pending.pop(0)
            if out is not None:
                out[pos : pos + real] = np.asarray(embs)[:real]
            else:
                acc.append(np.asarray(embs)[:real])

    n = len(texts)
    for start in range(0, n, batch_size):
        chunk = list(texts[start : start + batch_size])
        real = len(chunk)
        if real < batch_size:
            chunk += [""] * (batch_size - real)
        toks = tokenizer.encode_batch(chunk, max_length, bucket=False)
        embs = encode_fn(jnp.asarray(toks["input_ids"]), jnp.asarray(toks["attention_mask"]))
        pending.append((embs, real, start))
        drain(window)
    drain(0)
    if out is not None:
        return out
    if not acc:
        return np.zeros((0, 0), np.float32)
    return np.concatenate(acc, axis=0)


def build_dense_corpus_matrix(
    encode_fn: Callable,
    tokenizer,
    corpus: Corpus,
    field_info: Dict[str, Field],
    batch_size: int = 256,
    prefix: bool = False,
    dtype=np.float32,
    out=None,  # optional [N, Fd, E] write target (e.g. np.lib.format.
    #            open_memmap): each field's batches stream into
    #            out[:, fi, :], so corpora beyond host RAM can be built
    #            (pairs with --corpus-on-host serving from the same file)
) -> np.ndarray:
    """[N, Fd, E] per-field corpus embeddings (dense fields, schema order)."""
    dkeys = dense_keys(field_info)
    mats: List[np.ndarray] = []
    pairs = list(corpus.pairs())
    for fi, fk in enumerate(dkeys):
        field = field_info[fk]
        texts = [t for _, t in format_documents(pairs, field.name, field.dataset)]
        if prefix:
            texts = [field.name.replace("___", " ") + ": " + t for t in texts]
        embs = encode_texts(
            encode_fn, tokenizer, texts, field.max_seq_length, batch_size,
            out=None if out is None else out[:, fi, :],
        )
        if out is None:
            mats.append(embs.astype(dtype))
    if out is not None:
        return out
    if not mats:
        return np.zeros((len(corpus), 0, 0), dtype)
    return np.stack(mats, axis=1)


def build_sparse_indices(
    corpus: Corpus,
    field_info: Dict[str, Field],
) -> Dict[str, BM25Index]:
    """Per-sparse-field BM25 indices (reference: mfar/modeling/util.py:102-106)."""
    out: Dict[str, BM25Index] = {}
    pairs = list(corpus.pairs())
    for fk in sparse_keys(field_info):
        field = field_info[fk]
        formatted = format_documents(pairs, field.name, field.dataset)
        out[fk] = BM25Index.create(formatted, name=field.name)
    return out


def save_dense_matrix(path: str, matrix: np.ndarray, keys: Sequence[str]) -> str:
    """Returns the ACTUAL path written: np.savez appends .npz to a bare
    path, which previously broke the save -> --dense-index round-trip
    (the printed path did not exist).

    A ``.npy`` path writes the RAW array (keys in a ``<path>.keys`` text
    sidecar, one per line): unlike npz (a zip, decompressed wholesale on
    load), a raw .npy can be memory-mapped at serving time -- the on-disk
    format for corpora beyond host RAM (``--corpus-on-host``).  If
    ``matrix`` already IS the open memmap written by the build, the data
    is on disk; only the sidecar is written."""
    if path.endswith(".npy"):
        if not (isinstance(matrix, np.memmap)
                and getattr(matrix, "filename", None) == os.path.abspath(path)):
            np.save(path, matrix)
        elif hasattr(matrix, "flush"):
            matrix.flush()
        with open(path + ".keys", "w", encoding="utf-8") as f:
            f.write("\n".join(keys) + ("\n" if len(keys) else ""))
        return path
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, matrix=matrix, keys=np.asarray(list(keys), dtype=object))
    return path


def load_dense_matrix(path: str) -> Tuple[np.ndarray, List[str]]:
    if not os.path.exists(path):
        for ext in (".npz", ".npy"):  # tolerate the bare spelling
            if os.path.exists(path + ext):
                path = path + ext
                break
    if path.endswith(".npy"):
        matrix = np.load(path, mmap_mode="r")  # lazy: rows page in on access
        with open(path + ".keys", encoding="utf-8") as f:
            keys = f.read().splitlines()
        return matrix, keys
    data = np.load(path, allow_pickle=True)
    return data["matrix"], list(data["keys"])
