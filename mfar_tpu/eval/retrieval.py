"""The retrieval engine: query -> top-k documents over the hybrid index.

The serving equivalent of the reference's ``trec_eval_step``
(mfar/modeling/contrastive.py:669-704), re-designed TPU-first with two modes:

- ``exact``: the full corpus is scored in one fused folded matmul + top-k
  (distributed over the mesh when the corpus is sharded).  For hybrid
  configurations, the BM25 engine produces full-corpus per-field score
  vectors on the host, the mixer's sparse weights fold them into one
  [B, N] tensor, and the fused scan adds each chunk to the dense matmul
  before the top-k.  No recall stage, no candidate union: exact retrieval,
  which the reference can only approximate.
- ``rerank`` (compat mode, reference semantics): stage-1 recall takes the
  per-field dense top-k on device (all fields in ONE corpus pass, F batched
  matmuls per chunk) plus the per-field BM25 top-k on host; the per-query
  candidate union is padded to a static width and stage-2 reranks all
  (dense+sparse) field scores with the query-conditioned mixer -- the
  reference's semantics, with the per-query python loop replaced by one
  batched device program.

When constructed with a ``mesh``, the corpus shards over the mesh's batch
axes and every corpus-scan op routes through the ``shard_map`` collectives
in :mod:`mfar_tpu.parallel.topk` -- the multi-chip serving path.

Field ablation masks (mask_fields) multiply the per-field scores exactly as
the reference does (mfar/modeling/contrastive.py:686,706-714).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mfar_tpu.data import trec
from mfar_tpu.data.schema import dense_keys, sparse_keys
from mfar_tpu.data.types import Field
from mfar_tpu.ops.scoring import (
    dense_topk_chunked,
    dense_topk_chunked_approx_int8,
    fold_queries,
    fused_dense_topk_from_query,
    fused_hybrid_topk_postings_from_query,
    hybrid_topk_chunked,
    per_field_candidate_scores,
    per_field_topk_chunked_approx,
    quantize_rows_int8_np,
    rerank_candidates,
    softmax_field_weights,
)
from mfar_tpu.train.data_pipeline import clean_query
from mfar_tpu.train.model import FieldMixer


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Corpus chunk FLOOR for the streaming top-k scans (the ops stream a ragged
# tail chunk, so no chunk-multiple corpus padding exists; mesh serving pads
# only to the shard count and masks via valid_n).  The actual chunk per
# dispatch comes from :func:`topk_chunk` below.
TOPK_CHUNK = 131072

# f32 score-tile HBM budget for one streamed chunk ([B, chunk] f32).  Bigger
# chunks amortize the per-chunk selection + carry merge -- round-4 TPU
# measurement (benchmarks/exp_exact_topk.py, N=1M B=256 FE=3840): the exact
# path runs 91.8 ms/batch at 131072-row chunks vs 27.5 ms as one 1M-row
# chunk, and even the selection-free matmul floor improves 37 -> 16 ms.
TOPK_SCORE_TILE_BYTES = int(os.environ.get("MFAR_TOPK_TILE_BYTES", 1 << 30))


def topk_chunk(n_rows: int, batch: int) -> int:
    """Corpus rows per streamed top-k chunk for a ``batch``-query dispatch:
    as large as the f32 score-tile budget allows (fewer selection + merge
    rounds), never below the TOPK_CHUNK floor.  Mesh serving passes the
    same value; each shard scans at most its own rows, so oversized chunks
    degrade to one-shot per shard."""
    cap = TOPK_SCORE_TILE_BYTES // (4 * max(batch, 1))
    if cap >= n_rows:
        return max(n_rows, 1)
    return max(TOPK_CHUNK, cap - cap % TOPK_CHUNK)


class RetrievalEngine:
    """Holds the hybrid index + scoring params and answers query batches."""

    def __init__(
        self,
        field_info: Dict[str, Field],
        doc_keys: Sequence[str],
        encode_fn,  # (input_ids, attention_mask) -> [B, E] device fn
        tokenizer,
        mixer_params: Dict,  # {'weight': [E or 1, Ftot]}
        dense_matrix: Optional[np.ndarray] = None,  # [N, Fd, E]
        sparse_indices: Optional[Dict[str, object]] = None,
        query_max_length: int = 512,
        recall_k: int = 100,
        mask: Optional[np.ndarray] = None,  # [Ftot] field ablation mask
        use_pallas_gather="auto",  # Pallas rerank gather (ops/pallas_kernels.py):
        #   True = always (asserts on incompatible configs), False = never,
        #   "auto" (default) = the cost-model gate -- on iff this is a
        #   dedicated rerank-mode TPU engine (mode="rerank", single chip,
        #   HBM corpus, f32/bf16) AND both corpus copies + scan workspace
        #   fit HBM (see _pallas_gather_auto)
        pallas_cross_row: bool = False,  # cross-row DMA prefetch inside the
        #   Pallas rerank kernel (no per-query warm-up stall).  Validated on
        #   hardware round 4 but slower than the megacore default (32.3 vs
        #   29.3 ms/batch), which it excludes -- kept for sequential-grid
        #   debugging
        quantize: Optional[str] = None,  # "int8": half corpus HBM (2x docs/chip),
        #                                  ~0.5% score precision trade
        mesh=None,  # jax.sharding.Mesh: shard the corpus + distribute the scans
        corpus_per_slice: bool = False,  # replicate the corpus per slice
        #   (shard only within-slice over ICI): higher QPS per query batch
        #   when the corpus fits one slice; default spans slices (capacity)
        mode: str = "auto",  # default retrieve() mode: auto|exact|rerank
        dense_dtype=None,  # device dtype for the corpus matrix (None keeps the
        #                    input dtype; bfloat16 halves HBM -- the right
        #                    choice at production corpus sizes: 1M 5-field
        #                    docs = 7.4 GB bf16 vs 15 GB f32)
        dense_topk: str = "exact",  # dense selection in exact mode: 'exact'
        #   (full per-chunk sort) or 'approx' (TPU PartialReduce,
        #   recall>=0.95, ~2x faster at 1M rows; candidate SCORES stay
        #   exact -- only the selection is approximate)
        corpus_on_host: bool = False,  # capacity escape hatch: keep the
        #   corpus in HOST RAM/memmap and stream chunks H2D per scan
        #   (double-buffered; the reference's memmap-scan posture,
        #   reference mfar/data/index.py:181-222).  Corpus size is bounded
        #   by the host, not HBM -- at H2D-bandwidth-bound throughput.
        #   Serves BOTH modes (exact and rerank-compat: stage-1 recall
        #   streams one-hot folded queries, stage-2 gathers candidate rows
        #   from the host like the reference's memmap gather) and is
        #   hybrid-capable (postings scatter per chunk).  Composes with
        #   the mesh (each chunk's rows shard over the corpus axes, so
        #   aggregate H2D bandwidth scales with chip count) and with int8
        #   (1-byte chunks), including all together; prefer HBM-resident
        #   serving when the corpus fits.
    ):
        self.field_info = field_info
        self.doc_keys = list(doc_keys)
        self._doc_keys_arr = None  # lazy np object array (see _to_keyed)
        self.last_serve_path = None  # set by _note_path on every dispatch
        self.encode_fn = encode_fn
        self.tokenizer = tokenizer
        self.mixer_params = mixer_params
        self.sparse_indices = sparse_indices or {}
        self.query_max_length = query_max_length
        self.recall_k = recall_k
        self.dense_keys = dense_keys(field_info)
        self.sparse_keys = sparse_keys(field_info)
        self.mask = mask
        self.pallas_cross_row = pallas_cross_row
        assert use_pallas_gather in (True, False, "auto"), use_pallas_gather
        assert not pallas_cross_row or use_pallas_gather, (
            "pallas_cross_row tunes the Pallas rerank kernel and does "
            "nothing without use_pallas_gather (--use-pallas-gather)"
        )
        self.corpus_on_host = corpus_on_host
        if corpus_on_host:
            assert use_pallas_gather is not True, (
                "corpus_on_host has no device-resident corpus for the "
                "Pallas rerank gather"
            )
            use_pallas_gather = False
            # hybrid corpus_on_host composes with the mesh (per-chunk rows
            # shard over the corpus axes, postings scatter per shard) and
            # with int8 (1-byte chunks) -- see the host-streamed hybrid
            # dispatch in _dispatch_exact
        self.n_docs = len(self.doc_keys)
        self.mesh = mesh
        assert mode in ("auto", "exact", "rerank"), mode
        self.mode = mode
        assert dense_topk in ("exact", "approx"), dense_topk
        self.dense_topk = dense_topk
        self._corpus_axes = None
        self._query_axis = None
        if mesh is not None:
            assert use_pallas_gather is not True, (
                "pallas-gather keeps a second single-chip row-DMA corpus "
                "copy and is not composed with the mesh (int8 IS: the "
                "quantized corpus shards over the corpus axes -- 2x docs "
                "per MESH)"
            )
            use_pallas_gather = False
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mfar_tpu.parallel.mesh import DATA_AXIS, REPLICA_AXIS, batch_axes

            self._corpus_axes = DATA_AXIS if corpus_per_slice else batch_axes(mesh)
            # With a per-slice corpus, slices serve DISJOINT slices of the
            # query batch (throughput scales with slice count) instead of
            # duplicating the scan.
            self._query_axis = (
                REPLICA_AXIS
                if corpus_per_slice and mesh.shape.get(REPLICA_AXIS, 1) > 1
                else None
            )
            # Mixer params replicate onto the mesh once: they may arrive
            # committed elsewhere (host restore, or a trainer state placed on
            # a different device subset), and eager ops can't mix device
            # sets.  Staged through host numpy so the same code serves a
            # multi-host mesh (device_put of an identical host value onto a
            # global sharding transfers each process's shards; a committed
            # local device array cannot be re-put cross-process).
            rep = NamedSharding(mesh, P())
            self.mixer_params = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), rep), mixer_params
            )

        # ONE HBM-resident corpus copy, in the fused-matmul layout.  Stage-2
        # rerank gathers candidate rows from this same matrix (XLA gather);
        # the optional Pallas DMA-gather path keeps a second, row-DMA-layout
        # copy (rerank-heavy serving trade-off, see ops/pallas_kernels.py).
        self.docs_flat = None
        self.docs_rows = None
        self.docs_host = None  # host-resident corpus (corpus_on_host)
        self.docs_host_q = None  # host int8 corpus (+ scales): corpus_on_host
        self.docs_host_scales = None  # ... composed with --quantize int8
        self.docs_q = None  # int8 corpus (+ self.doc_scales) when quantized
        self.doc_scales = None
        self.emb_dim = None
        self.n_pad = self.n_docs  # padded row count of the device corpus
        self.has_dense = dense_matrix is not None and dense_matrix.size > 0
        if self.has_dense:
            if dense_matrix.ndim == 3:
                n, fd, e = dense_matrix.shape
                flat = dense_matrix.reshape(n, fd * e)
            else:
                # Pre-flattened [N, Fd*E]: the layout the device wants.  A 3D
                # [N, Fd, E] DEVICE array is TPU-tiled with Fd padded to 8
                # sublanes (1.6x HBM at Fd=5) and flattening forces a full
                # relayout copy; callers holding the corpus on device should
                # build it flat.
                n, fe = dense_matrix.shape
                fd = len(self.dense_keys)
                assert fe % max(fd, 1) == 0, (fe, fd)
                e = fe // fd
                flat = dense_matrix
            self.emb_dim = e
            if mesh is not None and not corpus_on_host:
                # (the host-streamed scan pads each CHUNK to the shard
                # count instead -- padding the host matrix would
                # materialize a copy of a possibly-disk-backed memmap)
                # Every shard must hold the same row count -- pad to a
                # multiple of n_shards ONLY.  The streaming top-k ops handle
                # a ragged tail chunk per shard, so no chunk-multiple
                # padding (which cost up to ~75% extra HBM + scan work for
                # corpora just past a shard*chunk boundary, e.g. 600K docs
                # on 4 shards padding to 1M rows).
                axes = self._corpus_axes if isinstance(self._corpus_axes, tuple) \
                    else (self._corpus_axes,)
                n_shards = int(np.prod([mesh.shape[a] for a in axes]))
                if n % n_shards:  # np.pad would D2H-copy a
                    #               device-resident aligned corpus
                    flat = np.pad(flat, ((0, _round_up(n, n_shards) - n), (0, 0)))
            self.n_pad = flat.shape[0]
            if corpus_on_host:
                # NO device copy: chunks stream per scan.  dense_dtype
                # becomes the per-chunk transfer dtype (bf16 halves H2D
                # bytes); memmaps pass through unmaterialized.  int8
                # composes: quantized chunks move 1 byte/element through
                # the H2D-bandwidth-bound path.
                if quantize == "int8":
                    # Quantize in row slabs: quantize_rows_int8_np is
                    # row-wise, and a whole-corpus call would materialize
                    # a full f32 copy + temporaries -- defeating the
                    # capacity escape hatch at build time for corpora
                    # sized near host RAM.
                    n_rows = flat.shape[0]
                    self.docs_host_q = np.empty(flat.shape, np.int8)
                    self.docs_host_scales = np.empty(n_rows, np.float32)
                    for lo in range(0, n_rows, 65536):
                        hi = min(n_rows, lo + 65536)
                        dq, ds = quantize_rows_int8_np(flat[lo:hi])
                        self.docs_host_q[lo:hi] = dq
                        self.docs_host_scales[lo:hi] = ds
                    self._host_transfer_dtype = None
                elif quantize:
                    raise ValueError(f"unknown quantize mode {quantize!r}")
                else:
                    # In-RAM ndarray: cast ONCE at init (halves RAM and
                    # avoids a full-corpus cast per retrieve batch).  A
                    # memmap must stream uncast -- casting would
                    # materialize it -- so the per-chunk transfer cast
                    # stays for that case.
                    if not isinstance(flat, np.memmap):
                        if dense_dtype is not None and \
                                flat.dtype != jnp.dtype(dense_dtype):
                            flat = flat.astype(jnp.dtype(dense_dtype))
                        dense_dtype = None  # chunks stream as-is
                    self.docs_host = flat
                    self._host_transfer_dtype = dense_dtype
            elif quantize == "int8":
                assert use_pallas_gather is not True, (
                    "int8 rerank dequantizes candidates through the XLA "
                    "gather; the Pallas DMA gather reads f32/bf16 rows"
                )
                use_pallas_gather = False
                if isinstance(flat, jax.Array):
                    # Corpus already device-committed: quantize THERE (one
                    # row-wise reduce + cast).  Pulling it to host first
                    # D2H's the full corpus and runs minutes of 1-thread
                    # numpy (round 4: the N=1M int8 build never finished).
                    from mfar_tpu.ops.scoring import quantize_rows_int8

                    if mesh is not None:
                        from jax.sharding import NamedSharding, PartitionSpec as P

                        flat = jax.device_put(
                            flat, NamedSharding(mesh, P(self._corpus_axes))
                        )
                    self.docs_q, self.doc_scales = jax.jit(quantize_rows_int8)(flat)
                else:
                    # host corpus: quantize host-side so the f32 matrix
                    # never transits HBM
                    dq, ds = quantize_rows_int8_np(flat)
                    if mesh is not None:
                        from jax.sharding import NamedSharding, PartitionSpec as P

                        row_sh = NamedSharding(mesh, P(self._corpus_axes))
                        self.docs_q = jax.device_put(dq, row_sh)
                        self.doc_scales = jax.device_put(ds, row_sh)
                    else:
                        self.docs_q = jnp.asarray(dq)
                        self.doc_scales = jnp.asarray(ds)
            elif quantize:
                raise ValueError(f"unknown quantize mode {quantize!r}")
            elif mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                if dense_dtype is not None:
                    flat = flat.astype(dense_dtype)  # host cast (ml_dtypes)
                self.docs_flat = jax.device_put(
                    flat, NamedSharding(mesh, P(self._corpus_axes))
                )
            else:
                self.docs_flat = jnp.asarray(flat, dtype=dense_dtype)
            if use_pallas_gather == "auto":
                use_pallas_gather = self._pallas_gather_auto()
            if use_pallas_gather:
                assert self.docs_flat.dtype in (jnp.float32, jnp.bfloat16), (
                    f"pallas gather reads f32/bf16 corpora, got "
                    f"{self.docs_flat.dtype}"
                )
                if e % 128 == 0:  # kernel needs lane-aligned field segments
                    from mfar_tpu.ops.pallas_kernels import make_row_dma_view

                    self.docs_rows = make_row_dma_view(self.docs_flat)
                else:
                    print(
                        f"[retrieval] pallas gather needs emb_dim % 128 == 0 "
                        f"(got {e}); falling back to the XLA gather"
                    )

        # Prebuilt sparse indices may cover a different doc set or order
        # than the corpus (e.g. --lexical-index built elsewhere).  Per field:
        # None = rows aligned with doc_keys (fast positional paths), else an
        # int64 [n_bm25] map of BM25 row -> corpus row (-1 = not in corpus).
        missing = [fk for fk in self.sparse_keys if fk not in self.sparse_indices]
        if missing:
            # Fail here, not with a KeyError on the first query: every
            # serving path scores each declared sparse field through its
            # index.
            raise ValueError(
                f"field_info declares sparse fields {missing} but "
                f"sparse_indices has no index for them (got "
                f"{sorted(self.sparse_indices)})"
            )
        self._sparse_row_map: Dict[str, Optional[np.ndarray]] = {}
        key_to_row = None
        for fk in self.sparse_keys:
            index = self.sparse_indices.get(fk)
            if index is None:
                continue
            keys = list(index.keys)
            if keys == self.doc_keys:
                self._sparse_row_map[fk] = None
            else:
                if key_to_row is None:
                    key_to_row = {k_: i for i, k_ in enumerate(self.doc_keys)}
                self._sparse_row_map[fk] = np.asarray(
                    [key_to_row.get(k_, -1) for k_ in keys], np.int64
                )
        self._sparse_inv_map: Dict[str, np.ndarray] = {}  # corpus row -> BM25 row

    # ------------------------------------------------------------------

    # Auto-gate runtime reserve: HBM the rerank programs need BESIDES the
    # two corpus copies and the streamed score tile -- PartialReduce carry
    # state, query/candidate arrays, XLA runtime buffers.  Calibrated on
    # hardware (round 5): N=1M bf16 (2 x 7.68 GB + 0.67 GB tile, ~0.75 GB
    # slack on a 16 GiB v5e) OOMs in the recall scan, so the reserve must
    # exceed that slack.
    PALLAS_GATHER_RESERVE_BYTES = 2 << 30

    def _pallas_gather_auto(self) -> bool:
        """Resolve use_pallas_gather="auto": enable the DMA-gather rerank
        kernel (measured 26.2-30.7 ms vs XLA's 43.6-49.4 at N=131K B=256
        C=128, rounds 4-5) iff this engine is DEDICATED to rerank serving
        and the extra row/pair-DMA corpus copy fits the cost model:

            2 x corpus + score tile (TOPK_SCORE_TILE_BYTES) + reserve <= HBM

        Callers reach here only with a single-chip HBM-resident f32/bf16
        corpus (mesh / host-corpus / int8 configs resolved to False
        upstream).  Additional conditions:

        - ``mode == "rerank"``: exact-mode serving never touches the
          rowview; an engine that merely *can* rerank must not carry a 2x
          corpus for the occasional compat call.
        - a real TPU backend: off-TPU the kernel runs in interpret mode --
          a correctness tool, orders of magnitude slower than the XLA
          gather it would replace.
        - lane-aligned fields (emb_dim % 128) -- the kernel's requirement.
        """
        if self.mode != "rerank":
            return False
        if jax.default_backend() != "tpu":
            return False
        if self.emb_dim is None or self.emb_dim % 128 != 0:
            return False
        from mfar_tpu.utils.device import device_hbm_bytes

        corpus_bytes = self.docs_flat.size * self.docs_flat.dtype.itemsize
        need = (
            2 * corpus_bytes
            + TOPK_SCORE_TILE_BYTES
            + self.PALLAS_GATHER_RESERVE_BYTES
        )
        hbm = device_hbm_bytes()
        if need > hbm:
            print(
                f"[retrieval] pallas rerank gather auto-OFF: 2 x "
                f"{corpus_bytes / 2**30:.1f} GiB corpus + scan workspace "
                f"needs {need / 2**30:.1f} GiB > {hbm / 2**30:.1f} GiB HBM "
                f"(force with --use-pallas-gather on)"
            )
            return False
        return True

    def _map_postings(self, fk: str, ids: np.ndarray, vals: np.ndarray):
        """BM25-row postings -> corpus-row postings (docs outside the corpus
        drop to id 0 / val 0, which scatter-adds nothing)."""
        rm = self._sparse_row_map.get(fk)
        if rm is None:
            return ids, vals
        mapped = rm[ids]
        keep = mapped >= 0
        return (
            np.where(keep, mapped, 0).astype(np.int32),
            np.where(keep, vals, 0.0).astype(np.float32),
        )

    def _map_dense_scores(self, fk: str, scores: np.ndarray) -> np.ndarray:
        """[B, n_bm25] BM25 scores -> [B, n_pad] corpus-row-aligned scores."""
        b = scores.shape[0]
        out = np.zeros((b, self.n_pad), np.float32)
        rm = self._sparse_row_map.get(fk)
        if rm is None:
            out[:, : scores.shape[1]] = scores
        else:
            keep = rm >= 0
            out[:, rm[keep]] = scores[:, keep]
        return out

    def _inv_map(self, fk: str) -> Optional[np.ndarray]:
        """corpus row -> BM25 row (-1 = doc absent from the index)."""
        rm = self._sparse_row_map.get(fk)
        if rm is None:
            return None
        if fk not in self._sparse_inv_map:
            inv = np.full(self.n_docs, -1, np.int64)
            keep = rm >= 0
            inv[rm[keep]] = np.nonzero(keep)[0]
            self._sparse_inv_map[fk] = inv
        return self._sparse_inv_map[fk]

    def _qaxis(self, b: int) -> Optional[str]:
        """Query-shard axis for a batch of b rows (None unless the batch
        divides across the replica groups)."""
        if self._query_axis is not None and b % self.mesh.shape[self._query_axis] == 0:
            return self._query_axis
        return None

    def set_mask(self, mask: Optional[np.ndarray]) -> None:
        """Field ablation mask over [dense..., sparse...] (schema order)."""
        self.mask = mask

    def encode_queries(self, queries: Sequence[str]) -> jax.Array:
        toks = self.tokenizer.encode_batch(
            [clean_query(q) for q in queries], self.query_max_length
        )
        q = self.encode_fn(jnp.asarray(toks["input_ids"]), jnp.asarray(toks["attention_mask"]))
        if self.mesh is not None:  # commit to the serving mesh, replicated
            from jax.sharding import NamedSharding, PartitionSpec as P

            q = jax.device_put(q, NamedSharding(self.mesh, P()))
        return q

    def _to_dev(self, x):
        """Host array -> device array that can join the engine's jitted
        computations.  Multi-host mesh: explicit REPLICATED global placement
        (an uncommitted local array cannot join a global computation);
        otherwise plain asarray."""
        from mfar_tpu.parallel import multihost

        if self.mesh is not None and multihost.is_multiprocess():
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(np.asarray(x), NamedSharding(self.mesh, P()))
        return jnp.asarray(x)

    def _field_weights(self, q: jax.Array) -> jax.Array:
        mask = None if self.mask is None else jnp.asarray(self.mask, jnp.float32)
        return softmax_field_weights(self.mixer_params["weight"], q, mask)

    # ------------------------------------------------------------------

    def _sparse_full_scores(self, cleaned: List[str], weights: np.ndarray) -> np.ndarray:
        """Combined (weight-mixed) full-corpus sparse scores [B, n_pad].

        Each sparse field's BM25 engine produces its full-corpus score
        vector on the host (impact-CSR matvec; native C++ when built) and
        the mixer's post-softmax weight for that field folds it in -- the
        host half of the exact hybrid path."""
        b = len(cleaned)
        fd = len(self.dense_keys)
        comb = np.zeros((b, self.n_pad), np.float32)
        for s_i, fk in enumerate(self.sparse_keys):
            w = weights[:, fd + s_i]  # [B] post-softmax (and post-mask) weight
            if not np.any(w):
                continue  # field masked out: skip the corpus scan entirely
            scores = self.sparse_indices[fk].get_scores_batch(cleaned)
            comb += w[:, None] * self._map_dense_scores(fk, scores)
        return comb

    def _masked_out(self, field_idx: int) -> bool:
        """Host-known ablation-mask skip (the mixer weights also zero masked
        fields on device, so skipping is an optimization, not correctness)."""
        return self.mask is not None and float(self.mask[field_idx]) == 0.0

    def _sparse_comb_device(self, cleaned: List[str], weights: jax.Array) -> jax.Array:
        """Device-densified combined sparse scores [B, n_pad]: the host ships
        only the query terms' POSTINGS (O(nnz) ids+impacts) and a scatter-add
        builds the dense score tensor on device -- the dense host path moves
        [B, N] floats and is host/PCIe-bound (measured 3.6 s vs ~0.1 s per
        64-query batch at N=1M on a 1-vCPU host).  ``weights`` stays a
        DEVICE array: fetching it would put a blocking host sync in the
        dispatch path and stall retrieve_many's pipeline."""
        b = len(cleaned)
        fd = len(self.dense_keys)
        comb = jnp.zeros((b, self.n_pad), jnp.float32)
        rows = jnp.arange(b)[:, None]
        for s_i, fk in enumerate(self.sparse_keys):
            if self._masked_out(fd + s_i):
                continue  # field masked out: skip the host scan entirely
            w = weights[:, fd + s_i].astype(jnp.float32)
            ids, vals = self.sparse_indices[fk].get_postings_batch(cleaned)
            # Density check on the UNPADDED mean nnz per query (BM25 impacts
            # are strictly positive; zeros are padding).  The padded batch-max
            # width would flip small corpora (n_docs < 2*pad) or a batch with
            # one outlier-long query onto the dense [B, N] host path even
            # when most queries have tiny postings.
            if float((vals != 0).sum()) * 2 > b * self.n_docs:
                dense = self.sparse_indices[fk].get_scores_batch(cleaned)
                comb = comb + w[:, None] * jnp.asarray(
                    self._map_dense_scores(fk, dense)
                )
                continue
            ids, vals = self._map_postings(fk, ids, vals)
            comb = comb.at[rows, jnp.asarray(ids)].add(
                jnp.asarray(vals) * w[:, None]
            )
        return comb

    def _collect_sparse_postings(self, cleaned: List[str]):
        """Shared host half of both postings feeds: per unmasked sparse
        field, the batch's query-term postings (row-mapped to corpus rows).
        Returns (per_field list of (ids, vals, s_i), dense) where dense=True
        means the combined postings are denser than half the corpus
        (unpadded nnz check -- the padded width would misjudge small
        corpora and outlier-long queries) and the [B, N] path is the
        cheaper transfer."""
        fd = len(self.dense_keys)
        per_field = []
        for s_i, fk in enumerate(self.sparse_keys):
            if self._masked_out(fd + s_i):
                continue
            ids, vals = self.sparse_indices[fk].get_postings_batch(cleaned)
            ids, vals = self._map_postings(fk, ids, vals)
            per_field.append((ids, np.asarray(vals), s_i))
        nnz_total = sum(float((v != 0).sum()) for _, v, _ in per_field)
        dense = nnz_total * 2 > len(cleaned) * self.n_docs
        return per_field, dense

    @staticmethod
    def _bucket_pad(width: int) -> int:
        """Zero-pad amount taking a concatenated postings width to its
        geometric bucket: per-field widths are bucketed
        (bm25.get_postings_batch), but their SUM varies per field combo and
        would recompile the fused serving program per batch."""
        from mfar_tpu.native import bucket_width

        return bucket_width(width) - width

    def _sparse_postings_raw(
        self, cleaned: List[str]
    ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """All sparse fields' query-term postings concatenated per query,
        with RAW impacts plus a per-posting SPARSE-FIELD INDEX -- the feed
        for the fully-fused single-program hybrid path, where each posting
        picks up its field's softmax weight on device.  Host numpy only (no
        device work in this dispatch-side helper).  Returns None when the
        combined postings are denser than half the corpus."""
        b = len(cleaned)
        per_field, dense = self._collect_sparse_postings(cleaned)
        if not per_field:
            z = np.zeros((b, 128), np.int32)
            return z, np.zeros((b, 128), np.float32), z
        if dense:
            return None
        ids = np.concatenate([i for i, _, _ in per_field], axis=1)
        vals = np.concatenate([v for _, v, _ in per_field], axis=1)
        # int8 field index: lossless (sparse-field count < 128) and 1/3 off
        # the per-posting H2D bytes (ids i32 + vals f32 + fidx: 12 -> 9 B);
        # device consumers widen in-program before the weight gather.
        fidx = np.concatenate(
            [np.full(i.shape, s_i, np.int8) for i, _, s_i in per_field], axis=1
        )
        pad = self._bucket_pad(ids.shape[1])
        if pad:
            wide = ((0, 0), (0, pad))
            ids, vals, fidx = (np.pad(a, wide) for a in (ids, vals, fidx))
        return ids.astype(np.int32), vals.astype(np.float32), fidx

    def retrieve_exact(self, queries: Sequence[str], top_k: int = 100) -> List[List[Tuple[str, float]]]:
        """Fused exact full-corpus retrieval.

        Dense fields ride the folded matmul; sparse fields stream their
        query-term postings from the host and densify ON DEVICE into the
        same fused scan (:func:`mfar_tpu.ops.scoring.hybrid_topk_chunked`).
        Under int8 quantization (dense-only), exact up to the ~0.5% per-row
        quantization error."""
        return self._finish_exact(self._dispatch_exact(queries, top_k))

    def _finish_exact(self, dispatched) -> List[List[Tuple[str, float]]]:
        if dispatched[0] == "host":
            return dispatched[1]
        _, top_s, top_i = dispatched
        return self._to_keyed(*jax.device_get((top_s, top_i)))  # one fetch round-trip

    def _note_path(self, name: str) -> None:
        """Record which serving program this dispatch chose:
        ``engine.last_serve_path`` always, plus a ``[serve-path] <name>``
        stdout line when MFAR_DEBUG_SERVE_PATH is set -- multi-process
        tests read worker stdout to assert the routing (e.g. that the int8
        mesh hybrid rides the fused raw-postings program, not the
        host-combined [B, N] fallback)."""
        self.last_serve_path = name
        if os.environ.get("MFAR_DEBUG_SERVE_PATH"):
            print(f"[serve-path] {name}", flush=True)

    def _dispatch_exact(self, queries: Sequence[str], top_k: int):
        """Dispatch phase of exact retrieval: all host prep + async device
        work, NO result fetch.  Returns ('device', top_s, top_i) device
        arrays (or ('host', results) for sparse-only corpora) so
        :meth:`retrieve_many` can pipeline batches -- the fetch round-trip
        and the next batch's host prep then overlap device compute."""
        k = min(top_k, self.n_docs)
        q = self.encode_queries(queries)
        fd = len(self.dense_keys)
        chunk = topk_chunk(self.n_docs, len(queries))

        # Host-streamed corpus (capacity escape hatch): fold on device, then
        # stream the host corpus through the chunked scan double-buffered.
        if self.docs_host is not None or self.docs_host_q is not None:
            from mfar_tpu.ops.scoring import (
                dense_topk_host_streamed,
                dense_topk_host_streamed_int8,
            )

            weights = self._field_weights(q)
            weights = jnp.broadcast_to(weights, (q.shape[0], weights.shape[-1]))
            qflat = fold_queries(q, weights[:, :fd])
            if self.sparse_keys:
                # hybrid host stream: postings scatter per chunk (the dense-
                # postings fallback streams the combined host tensor
                # chunk-by-chunk instead).  Composes with the mesh (each
                # chunk's rows shard over the corpus axes, postings scatter
                # per shard) and with int8 (1-byte chunks); sparse scores
                # stay f32 either way.
                cleaned = [clean_query(t) for t in queries]
                raw = self._sparse_postings_raw(cleaned)
                wnp = np.asarray(weights)  # [B, F]: one tiny fetch
                sparse_kw: Dict[str, Any] = {}
                if raw is not None:
                    ids, vals, fidx = raw
                    wvals = (
                        vals * np.take_along_axis(wnp, fd + fidx, axis=1)
                    ).astype(np.float32)
                    if self.mesh is not None:
                        # mesh streams re-slice ids per chunk: HOST arrays
                        sparse_kw = dict(post_ids=ids, post_wvals=wvals)
                    else:
                        sparse_kw = dict(
                            post_ids=jnp.asarray(ids),
                            post_wvals=jnp.asarray(wvals),
                        )
                else:
                    sparse_kw = dict(
                        sparse_comb_host=self._sparse_full_scores(cleaned, wnp)
                    )
                if self.docs_host_q is not None and self.mesh is not None:
                    from mfar_tpu.parallel.topk import (
                        distributed_hybrid_topk_host_streamed_int8,
                    )

                    top_s, top_i = distributed_hybrid_topk_host_streamed_int8(
                        self.mesh, qflat, self.docs_host_q,
                        self.docs_host_scales, k, axis=self._corpus_axes,
                        **sparse_kw,
                    )
                elif self.docs_host_q is not None:
                    from mfar_tpu.ops.scoring import hybrid_topk_host_streamed_int8

                    top_s, top_i = hybrid_topk_host_streamed_int8(
                        qflat, self.docs_host_q, self.docs_host_scales, k,
                        **sparse_kw,
                    )
                elif self.mesh is not None:
                    from mfar_tpu.parallel.topk import (
                        distributed_hybrid_topk_host_streamed,
                    )

                    top_s, top_i = distributed_hybrid_topk_host_streamed(
                        self.mesh, qflat, self.docs_host, k,
                        transfer_dtype=self._host_transfer_dtype,
                        axis=self._corpus_axes, **sparse_kw,
                    )
                else:
                    from mfar_tpu.ops.scoring import hybrid_topk_host_streamed

                    top_s, top_i = hybrid_topk_host_streamed(
                        qflat, self.docs_host, k,
                        transfer_dtype=self._host_transfer_dtype,
                        **sparse_kw,
                    )
                self._note_path(
                    "host-stream-hybrid"
                    + ("-int8" if self.docs_host_q is not None else "")
                    + ("-mesh" if self.mesh is not None else "")
                    + ("-postings" if raw is not None else "-combined")
                )
                return ("device", top_s, top_i)
            if self.docs_host_q is not None and self.mesh is not None:
                from mfar_tpu.parallel.topk import (
                    distributed_dense_topk_host_streamed_int8,
                )

                top_s, top_i = distributed_dense_topk_host_streamed_int8(
                    self.mesh, qflat, self.docs_host_q, self.docs_host_scales,
                    k, axis=self._corpus_axes,
                )
            elif self.docs_host_q is not None:
                top_s, top_i = dense_topk_host_streamed_int8(
                    qflat, self.docs_host_q, self.docs_host_scales, k
                )
            elif self.mesh is not None:
                # disk-bound capacity x mesh throughput: each chunk's rows
                # shard over the corpus axes (each chip's PCIe carries only
                # its shard) and scan via the usual shard_map top-k
                from mfar_tpu.parallel.topk import (
                    distributed_dense_topk_host_streamed,
                )

                top_s, top_i = distributed_dense_topk_host_streamed(
                    self.mesh, qflat, self.docs_host, k,
                    transfer_dtype=self._host_transfer_dtype,
                    axis=self._corpus_axes,
                )
            else:
                top_s, top_i = dense_topk_host_streamed(
                    qflat, self.docs_host, k,
                    transfer_dtype=self._host_transfer_dtype,
                )
            self._note_path(
                "host-stream-dense"
                + ("-int8" if self.docs_host_q is not None else "")
                + ("-mesh" if self.mesh is not None else "")
            )
            return ("device", top_s, top_i)

        # Single-chip full-precision serving: ONE jitted program from query
        # embeddings to top-k (weights + fold + scatter densification +
        # chunked scan fused) -- the eager steps between the encode jit and
        # the scan jit each paid a dispatch round-trip (~ms on the relay)
        # and blocked XLA from fusing the fold into the first matmul.
        if self.mesh is None and self.docs_q is None and self.has_dense:
            W = self.mixer_params["weight"]
            mask_arr = None if self.mask is None else jnp.asarray(self.mask, jnp.float32)
            if self.sparse_keys:
                cleaned = [clean_query(t) for t in queries]
                raw = self._sparse_postings_raw(cleaned)
                if raw is not None:
                    ids, vals, fidx = raw
                    top_s, top_i = fused_hybrid_topk_postings_from_query(
                        q, W, mask_arr, self.docs_flat,
                        jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(fidx),
                        jnp.int32(self.n_docs), fd, k, chunk_size=chunk,
                    )
                    self._note_path("singlechip-hybrid-postings")
                    return ("device", top_s, top_i)
                # postings denser than the corpus: host-combined fallback
                weights = self._field_weights(q)
                weights = jnp.broadcast_to(weights, (q.shape[0], weights.shape[-1]))
                sparse_comb = self._sparse_full_scores(cleaned, np.asarray(weights))
                qflat = fold_queries(q, weights[:, :fd])
                top_s, top_i = hybrid_topk_chunked(
                    qflat.astype(self.docs_flat.dtype), self.docs_flat,
                    jnp.asarray(sparse_comb), jnp.int32(self.n_docs),
                    k=k, chunk_size=chunk,
                )
                self._note_path("singlechip-hybrid-combined")
                return ("device", top_s, top_i)
            top_s, top_i = fused_dense_topk_from_query(
                q, W, mask_arr, self.docs_flat, jnp.int32(self.n_docs),
                fd, k, chunk_size=chunk,
                approx=self.dense_topk == "approx",
            )
            self._note_path("singlechip-dense")
            return ("device", top_s, top_i)

        # Mesh full-precision serving: the same fusion as ONE shard_map
        # program per batch (weights + fold + per-shard scatter + scan).
        # RAW postings are host arrays, so this path is multi-host safe
        # (the old premultiplied-impacts path kept device-committed local
        # tensors that could not be re-put onto a global mesh).
        if self.mesh is not None and self.docs_q is None and self.has_dense:
            from mfar_tpu.parallel.topk import (
                distributed_fused_dense_topk,
                distributed_fused_hybrid_topk_postings,
            )

            W = self.mixer_params["weight"]
            n_fields = len(self.field_info)
            mask_arr = (
                jnp.ones(n_fields, jnp.float32) if self.mask is None
                else jnp.asarray(self.mask, jnp.float32)
            )
            qa = self._qaxis(len(queries))
            if self.sparse_keys:
                cleaned = [clean_query(t) for t in queries]
                raw = self._sparse_postings_raw(cleaned)
                if raw is not None:
                    ids, vals, fidx = raw
                    top_s, top_i = distributed_fused_hybrid_topk_postings(
                        self.mesh, q, W, mask_arr, self.docs_flat,
                        jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(fidx),
                        self.n_docs, fd, k, chunk_size=chunk,
                        axis=self._corpus_axes, query_axis=qa,
                    )
                    self._note_path("mesh-hybrid-postings")
                    return ("device", top_s, top_i)
                # postings denser than the corpus: host-combined fallback
                from jax.sharding import NamedSharding, PartitionSpec as P

                from mfar_tpu.parallel.topk import distributed_hybrid_topk

                weights = self._field_weights(q)
                weights = jnp.broadcast_to(weights, (q.shape[0], weights.shape[-1]))
                sparse_comb = self._sparse_full_scores(cleaned, np.asarray(weights))
                qflat = fold_queries(q, weights[:, :fd])
                sparse_sharded = jax.device_put(
                    sparse_comb, NamedSharding(self.mesh, P(qa, self._corpus_axes))
                )
                top_s, top_i = distributed_hybrid_topk(
                    self.mesh, qflat.astype(self.docs_flat.dtype), self.docs_flat,
                    sparse_sharded, self.n_docs, k=k, chunk_size=chunk,
                    axis=self._corpus_axes, query_axis=qa,
                )
                self._note_path("mesh-hybrid-combined")
                return ("device", top_s, top_i)
            top_s, top_i = distributed_fused_dense_topk(
                self.mesh, q, W, mask_arr, self.docs_flat, self.n_docs, fd, k,
                chunk_size=chunk, approx=self.dense_topk == "approx",
                axis=self._corpus_axes, query_axis=qa,
            )
            self._note_path("mesh-dense")
            return ("device", top_s, top_i)

        # Mesh int8 hybrid serving: the same raw-postings fusion over the
        # quantized corpus.  RAW impacts + per-posting field index ship as
        # host arrays and each posting picks up its softmax weight
        # in-program -- multi-host safe (no device-committed premultiplied
        # tensors, no host-built [B, N] fallback shipping ~1 GB/batch at
        # N=1M, B=256).
        if (
            self.mesh is not None and self.docs_q is not None
            and self.has_dense and self.sparse_keys
        ):
            W = self.mixer_params["weight"]
            n_fields = len(self.field_info)
            mask_arr = (
                jnp.ones(n_fields, jnp.float32) if self.mask is None
                else jnp.asarray(self.mask, jnp.float32)
            )
            qa = self._qaxis(len(queries))
            cleaned = [clean_query(t) for t in queries]
            raw = self._sparse_postings_raw(cleaned)
            if raw is not None:
                from mfar_tpu.parallel.topk import (
                    distributed_fused_hybrid_topk_postings_int8,
                )

                ids, vals, fidx = raw
                top_s, top_i = distributed_fused_hybrid_topk_postings_int8(
                    self.mesh, q, W, mask_arr, self.docs_q, self.doc_scales,
                    ids, vals, fidx, self.n_docs, fd, k,
                    chunk_size=chunk, axis=self._corpus_axes,
                    query_axis=qa,
                )
                self._note_path("mesh-int8-hybrid-postings")
                return ("device", top_s, top_i)
            # postings denser than the corpus: host-combined fallback (same
            # rule as the fp paths -- [B, N] is then the cheaper transfer)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mfar_tpu.parallel.topk import distributed_hybrid_topk_int8

            weights = self._field_weights(q)
            weights = jnp.broadcast_to(weights, (q.shape[0], weights.shape[-1]))
            sparse_comb = self._sparse_full_scores(cleaned, np.asarray(weights))
            qflat = fold_queries(q, weights[:, :fd])
            sparse_sharded = jax.device_put(
                sparse_comb, NamedSharding(self.mesh, P(qa, self._corpus_axes))
            )
            top_s, top_i = distributed_hybrid_topk_int8(
                self.mesh, qflat.astype(jnp.float32), self.docs_q,
                self.doc_scales, sparse_sharded, self.n_docs, k=k,
                chunk_size=chunk, axis=self._corpus_axes, query_axis=qa,
            )
            self._note_path("mesh-int8-hybrid-combined")
            return ("device", top_s, top_i)

        # Single-chip int8 serving: the same ONE-jitted-program fusion over
        # the quantized corpus (weights + fold + per-posting weight gather +
        # scatter + quantized scan).  Before round 4 this configuration paid
        # the eager weight/fold dispatches the fp path eliminated in round 3
        # -- the int8 engine e2e trailed bf16 despite a 1.7x faster op.
        if self.mesh is None and self.docs_q is not None and self.has_dense:
            from mfar_tpu.ops.scoring import (
                fused_dense_topk_from_query_int8,
                fused_hybrid_topk_postings_from_query_int8,
                hybrid_topk_chunked_int8,
            )

            W = self.mixer_params["weight"]
            mask_arr = None if self.mask is None else jnp.asarray(self.mask, jnp.float32)
            if self.sparse_keys:
                cleaned = [clean_query(t) for t in queries]
                raw = self._sparse_postings_raw(cleaned)
                if raw is not None:
                    ids, vals, fidx = raw
                    top_s, top_i = fused_hybrid_topk_postings_from_query_int8(
                        q, W, mask_arr, self.docs_q, self.doc_scales,
                        jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(fidx),
                        jnp.int32(self.n_docs), fd, k, chunk_size=chunk,
                    )
                    self._note_path("singlechip-int8-hybrid-postings")
                    return ("device", top_s, top_i)
                # postings denser than the corpus: host-combined fallback
                # (same rule as the fp path -- [B, N] is the cheaper form)
                weights = self._field_weights(q)
                weights = jnp.broadcast_to(weights, (q.shape[0], weights.shape[-1]))
                sparse_comb = self._sparse_full_scores(cleaned, np.asarray(weights))
                qflat = fold_queries(q, weights[:, :fd])
                top_s, top_i = hybrid_topk_chunked_int8(
                    qflat.astype(jnp.float32), self.docs_q, self.doc_scales,
                    jnp.asarray(sparse_comb), jnp.int32(self.n_docs),
                    k=k, chunk_size=chunk,
                )
                self._note_path("singlechip-int8-hybrid-combined")
                return ("device", top_s, top_i)
            top_s, top_i = fused_dense_topk_from_query_int8(
                q, W, mask_arr, self.docs_q, self.doc_scales,
                jnp.int32(self.n_docs), fd, k, chunk_size=chunk,
                exact=self.dense_topk != "approx",
            )
            self._note_path("singlechip-int8-dense")
            return ("device", top_s, top_i)

        # Remaining paths: sparse-only corpora and the mesh int8 dense
        # engine (every hybrid or single-chip configuration with dense
        # fields returned from one of the fused blocks above).
        weights = self._field_weights(q)
        weights = jnp.broadcast_to(weights, (q.shape[0], weights.shape[-1]))

        if not self.has_dense:
            # sparse-only corpus: host scores ARE the totals
            cleaned = [clean_query(t) for t in queries]
            sparse_comb = self._sparse_full_scores(cleaned, np.asarray(weights))
            total = sparse_comb[:, : self.n_docs]
            part = np.argpartition(-total, k - 1, axis=1)[:, :k]
            part_s = np.take_along_axis(total, part, axis=1)
            order = np.argsort(-part_s, axis=1, kind="stable")
            self._note_path("host-sparse-only")
            return ("host", self._to_keyed(
                np.take_along_axis(part_s, order, axis=1),
                np.take_along_axis(part, order, axis=1),
            ))

        qflat = fold_queries(q, weights[:, :fd])
        if sparse_comb is None:
            if self.docs_q is not None and self.mesh is not None:
                from mfar_tpu.parallel.topk import distributed_dense_topk_int8

                top_s, top_i = distributed_dense_topk_int8(
                    self.mesh, qflat.astype(jnp.float32), self.docs_q,
                    self.doc_scales, self.n_docs, k=k, chunk_size=chunk,
                    exact=self.dense_topk != "approx", axis=self._corpus_axes,
                    query_axis=self._qaxis(qflat.shape[0]),
                )
                path = "mesh-int8-dense"
            elif self.docs_q is not None:
                # exact per-chunk top-k by default (the only deviation from
                # f32 retrieval is then the quantization error itself);
                # --dense-topk approx composes here like it does for f32
                top_s, top_i = dense_topk_chunked_approx_int8(
                    qflat.astype(jnp.float32), self.docs_q, self.doc_scales,
                    jnp.int32(self.n_docs), k=k, chunk_size=chunk,
                    exact=self.dense_topk != "approx",
                )
                path = "singlechip-int8-dense"
            elif self.mesh is not None:
                # defensive fallback: fp mesh dense normally rides the
                # fused branch above ("mesh-dense")
                from mfar_tpu.parallel.topk import distributed_dense_topk

                top_s, top_i = distributed_dense_topk(
                    self.mesh, qflat.astype(self.docs_flat.dtype), self.docs_flat,
                    self.n_docs, k=k, chunk_size=chunk, axis=self._corpus_axes,
                    approx=self.dense_topk == "approx",
                    query_axis=self._qaxis(qflat.shape[0]),
                )
                path = "mesh-dense-unfused"
            else:
                # defensive fallback: fp single-chip dense normally rides
                # the fused branch above
                top_s, top_i = dense_topk_chunked(
                    qflat.astype(self.docs_flat.dtype), self.docs_flat,
                    jnp.int32(self.n_docs), k=k, chunk_size=chunk,
                )
                path = "singlechip-dense-unfused"
        else:
            # Only the single-chip int8 hybrid reaches here: fp hybrid (both
            # single-chip and mesh) rides the fused-postings branches above,
            # and mesh int8 hybrid has its own fused branch.
            from mfar_tpu.ops.scoring import hybrid_topk_chunked_int8

            top_s, top_i = hybrid_topk_chunked_int8(
                qflat.astype(jnp.float32), self.docs_q, self.doc_scales,
                jnp.asarray(sparse_comb), jnp.int32(self.n_docs),
                k=k, chunk_size=chunk,
            )
            path = "singlechip-int8-hybrid"
        self._note_path(path)
        return ("device", top_s, top_i)

    def retrieve_rerank(self, queries: Sequence[str], top_k: int = 100) -> List[List[Tuple[str, float]]]:
        """Recall (per-field top-k union) + rerank, the reference pipeline."""
        return self._rerank_finish(self._rerank_dispatch(queries), top_k)

    def _rerank_dispatch(self, queries: Sequence[str]):
        """Stage-1 dispatch of the rerank pipeline: query encode + ASYNC
        per-field dense recall (device arrays, not fetched) + host sparse
        recall.  No device fetch happens here, so retrieve_many can overlap
        the next batch's recall scans with this batch's host candidate
        assembly + stage-2 (the compat mode previously paid two blocking
        syncs per batch, serial)."""
        b = len(queries)
        q = self.encode_queries(queries)
        # Recall scans run one-hot folded queries ([B*Fd, Fd*E]), so the
        # score-tile budget sees B*Fd rows.
        chunk = topk_chunk(self.n_docs, b * max(len(self.dense_keys), 1))
        # Per-query candidate row-id ARRAYS (unioned with np.unique at
        # finish): python sets cost ~1 us per element-add on the 1-vCPU
        # host -- b * recall_k * n_fields adds per batch.
        cand_lists: List[List[np.ndarray]] = [[] for _ in range(b)]
        s = idx = None
        fd = k = 0

        # stage 1a: dense per-field recall -- all fields in ONE corpus pass
        # (F batched matmuls per chunk read + F running PartialReduce
        # top-ks, see per_field_topk_chunked_approx).  This is a recall
        # stage (the reference's own eval approximates with per-field
        # top-100 unions), so the PartialReduce top-k (recall>=0.95) applies.
        if self.dense_keys and self.has_dense:
            fd = len(self.dense_keys)
            k = min(self.recall_k, self.n_docs)
            if self.docs_host is not None or self.docs_host_q is not None:
                # Host-streamed corpus: per-field recall via ONE-HOT folded
                # queries ([B*Fd, Fd*E]) through the existing dense host
                # streams -- Fd x the matmul FLOPs of a folded scan, but the
                # stream is H2D-bandwidth-bound by construction, so the
                # extra MXU work hides under the chunk transfers.  Composes
                # with the mesh and int8 for free.
                eye = jnp.eye(fd, dtype=q.dtype)
                onehot_q = jnp.einsum("fg,be->bfge", eye, q).reshape(
                    b * fd, fd * self.emb_dim
                )
                if self.docs_host_q is not None and self.mesh is not None:
                    from mfar_tpu.parallel.topk import (
                        distributed_dense_topk_host_streamed_int8,
                    )

                    s, idx = distributed_dense_topk_host_streamed_int8(
                        self.mesh, onehot_q.astype(jnp.float32),
                        self.docs_host_q, self.docs_host_scales, k,
                        axis=self._corpus_axes,
                    )
                elif self.docs_host_q is not None:
                    from mfar_tpu.ops.scoring import dense_topk_host_streamed_int8

                    s, idx = dense_topk_host_streamed_int8(
                        onehot_q.astype(jnp.float32), self.docs_host_q,
                        self.docs_host_scales, k,
                    )
                elif self.mesh is not None:
                    from mfar_tpu.parallel.topk import (
                        distributed_dense_topk_host_streamed,
                    )

                    s, idx = distributed_dense_topk_host_streamed(
                        self.mesh, onehot_q, self.docs_host, k,
                        transfer_dtype=self._host_transfer_dtype,
                        axis=self._corpus_axes,
                    )
                else:
                    from mfar_tpu.ops.scoring import dense_topk_host_streamed

                    s, idx = dense_topk_host_streamed(
                        onehot_q, self.docs_host, k,
                        transfer_dtype=self._host_transfer_dtype,
                    )
            elif self.docs_q is not None and self.mesh is not None:
                # mesh + int8: one-hot folded queries through the sharded
                # int8 kernel (PartialReduce recall per shard)
                from mfar_tpu.parallel.topk import distributed_dense_topk_int8

                eye = jnp.eye(fd, dtype=q.dtype)
                onehot_q = jnp.einsum("fg,be->bfge", eye, q).reshape(b * fd, fd * self.emb_dim)
                s, idx = distributed_dense_topk_int8(
                    self.mesh, onehot_q.astype(jnp.float32), self.docs_q,
                    self.doc_scales, self.n_docs, k=k, chunk_size=chunk,
                    exact=False, axis=self._corpus_axes,
                    query_axis=self._qaxis(onehot_q.shape[0]),
                )
            elif self.docs_q is not None:
                # int8 corpus: per-row scales make the per-field einsum form
                # awkward; the one-hot query folding re-uses the int8 kernel
                from mfar_tpu.ops.scoring import dense_topk_chunked_approx_int8 as _i8

                eye = jnp.eye(fd, dtype=q.dtype)
                onehot_q = jnp.einsum("fg,be->bfge", eye, q).reshape(b * fd, fd * self.emb_dim)
                s, idx = _i8(
                    onehot_q.astype(jnp.float32), self.docs_q, self.doc_scales,
                    jnp.int32(self.n_docs), k=k, chunk_size=chunk,
                )
            elif self.mesh is not None:
                from mfar_tpu.parallel.topk import distributed_per_field_topk

                s, idx = distributed_per_field_topk(
                    self.mesh, q.astype(self.docs_flat.dtype), self.docs_flat,
                    self.n_docs, fd, k=k, chunk_size=chunk,
                    axis=self._corpus_axes, query_axis=self._qaxis(q.shape[0]),
                )
            else:
                s, idx = per_field_topk_chunked_approx(
                    q.astype(self.docs_flat.dtype), self.docs_flat,
                    jnp.int32(self.n_docs), fd, k=k, chunk_size=chunk,
                )
        # stage 1b: sparse per-field recall on host (unordered row ids; the
        # union below only needs membership)
        cleaned = [clean_query(t) for t in queries]
        for fk in self.sparse_keys:
            index = self.sparse_indices[fk]
            rm = self._sparse_row_map.get(fk)
            hits = index.retrieve_rows_batch(
                cleaned, top_k=min(self.recall_k, self.n_docs)
            )
            for i, rows in enumerate(hits):
                if rm is not None:  # prebuilt index with different doc set
                    rows = rm[rows]
                    rows = rows[rows >= 0]  # docs absent from the corpus
                cand_lists[i].append(rows)

        return dict(
            b=b, q=q, s=s, idx=idx, fd=fd, k=k,
            cand_lists=cand_lists, cleaned=cleaned,
        )

    def _rerank_finish(self, st, top_k: int) -> List[List[Tuple[str, float]]]:
        """Finish phase: fetch the stage-1 recall, union candidates on host,
        score + rerank (stage 2), fetch results."""
        b, q, cleaned = st["b"], st["q"], st["cleaned"]
        cand_lists = st["cand_lists"]
        if st["s"] is not None:
            fd, k = st["fd"], st["k"]
            s = np.asarray(st["s"]).reshape(b, fd * k)
            idx = np.asarray(st["idx"]).reshape(b, fd * k)
            for i in range(b):  # -inf hits = shard/corpus padding, drop
                cand_lists[i].append(idx[i][np.isfinite(s[i])].astype(np.int64))

        # Per-query sorted-unique union (np.unique == sorted(set), C-speed).
        uniq = [
            np.unique(np.concatenate(lst)) if lst else np.zeros(0, np.int64)
            for lst in cand_lists
        ]
        # static-width candidate matrix (padded; pad entries masked out).
        # Geometric bucket, not batch-max: a distinct width per batch would
        # recompile the stage-2 candidate-scoring program every batch
        # (union size varies with every query mix; buckets cap it at ~4
        # programs for realistic recall_k * field counts).
        from mfar_tpu.native import bucket_width

        width = bucket_width(max(max(len(u) for u in uniq), 1), 128)
        cand = np.zeros((b, width), np.int64)
        valid = np.zeros((b, width), bool)
        for i, ids in enumerate(uniq):
            cand[i, : len(ids)] = ids
            valid[i, : len(ids)] = True

        # stage 2: per-field scores for candidates
        if self.dense_keys and self.has_dense:
            fd = len(self.dense_keys)
            cand_j = self._to_dev(cand)
            if self.docs_host is not None or self.docs_host_q is not None:
                # Host corpus: gather the batch's GLOBAL-unique candidate
                # rows from host RAM/memmap (the reference's own stage-2
                # posture, reference mfar/data/index.py:227-232) into one
                # [U, Fd*E] slab, ship it once, and index per candidate on
                # device.  U <= B*C deduped, so the transfer is bounded by
                # the candidate union, not the corpus.
                uniq_g = np.unique(cand)
                pos = np.searchsorted(uniq_g, cand).astype(np.int32)
                if self.docs_host_q is not None:
                    slab = (
                        np.asarray(self.docs_host_q[uniq_g], np.float32)
                        * np.asarray(
                            self.docs_host_scales[uniq_g], np.float32
                        )[:, None]
                    )
                else:
                    slab = np.asarray(self.docs_host[uniq_g], np.float32)
                rows = jnp.take(self._to_dev(slab), self._to_dev(pos), axis=0)
                cand_docs = rows.reshape(b, width, fd, self.emb_dim)
                dense_scores = per_field_candidate_scores(
                    q.astype(jnp.float32), cand_docs
                )
            elif self.mesh is not None and self.docs_q is not None:
                from mfar_tpu.parallel.topk import distributed_candidate_scores_int8

                dense_scores = distributed_candidate_scores_int8(
                    self.mesh, q.astype(jnp.float32), self.docs_q,
                    self.doc_scales, cand_j.astype(jnp.int32), num_fields=fd,
                    axis=self._corpus_axes, query_axis=self._qaxis(q.shape[0]),
                )
            elif self.mesh is not None:
                from mfar_tpu.parallel.topk import distributed_candidate_scores

                dense_scores = distributed_candidate_scores(
                    self.mesh, q.astype(jnp.float32), self.docs_flat,
                    cand_j.astype(jnp.int32), axis=self._corpus_axes, num_fields=fd,
                    query_axis=self._qaxis(q.shape[0]),
                )
            elif self.docs_rows is not None:
                from mfar_tpu.ops.pallas_kernels import (
                    gather_per_field_scores_pallas_jit,
                )

                dense_scores = gather_per_field_scores_pallas_jit(
                    q.astype(jnp.float32), self.docs_rows, cand_j.astype(jnp.int32), fd,
                    interpret=jax.default_backend() != "tpu",
                    cross_row_prefetch=self.pallas_cross_row,
                    # Megacore (parallel query-row grid axis) won the round-4
                    # hardware validation (29.3 vs 35.3 ms/batch base, 49.4
                    # XLA at N=131K B=256 C=128) but composes only with
                    # row-local prefetch -- default on unless cross-row
                    # prefetch was requested.
                    megacore=not self.pallas_cross_row,
                )
            else:
                if self.docs_q is not None:  # dequantize just the candidates
                    rows = jnp.take(self.docs_q, cand_j, axis=0).astype(jnp.float32)
                    rows = rows * jnp.take(self.doc_scales, cand_j, axis=0)[..., None]
                else:
                    rows = jnp.take(self.docs_flat, cand_j, axis=0)  # [B, C, Fd*E]
                cand_docs = rows.reshape(b, width, fd, self.emb_dim)
                dense_scores = per_field_candidate_scores(
                    q.astype(jnp.float32), cand_docs.astype(jnp.float32)
                )
        else:
            # No dense matrix: zero-fill the DECLARED dense columns so the
            # [B, C, F] component tensor still spans every mixer field
            # (the mixed score then reduces to the sparse part, matching
            # the exact-mode sparse-only host path).
            dense_scores = jnp.zeros(
                (b, width, len(self.dense_keys)), jnp.float32
            )

        sparse_scores = None
        if self.sparse_keys:
            # One full-corpus scoring pass per field, then a [B, C] column
            # gather -- replacing the per-query host loop (one score_batch
            # call per query per field) that round 1 shipped.
            sp = np.zeros((b, width, len(self.sparse_keys)), np.float32)
            for s_i, fk in enumerate(self.sparse_keys):
                all_scores = self.sparse_indices[fk].get_scores_batch(cleaned)  # [B, n_bm25]
                inv = self._inv_map(fk)
                if inv is None:  # index rows == corpus rows
                    sp[:, :, s_i] = np.take_along_axis(all_scores, cand, axis=1)
                else:  # prebuilt index with different doc set/order
                    cand_bm = inv[cand]
                    vals = np.take_along_axis(
                        all_scores, np.maximum(cand_bm, 0), axis=1
                    )
                    sp[:, :, s_i] = np.where(cand_bm >= 0, vals, 0.0)
            sparse_scores = self._to_dev(sp)

        mask = None if self.mask is None else self._to_dev(np.asarray(self.mask, np.float32))
        top_s, top_pos = rerank_candidates(
            q.astype(jnp.float32),
            dense_scores,
            sparse_scores,
            self.mixer_params["weight"],
            mask=mask,
            cand_valid=self._to_dev(valid),
            k=min(top_k, width),
        )
        top_s, top_pos = jax.device_get((top_s, top_pos))  # one fetch round-trip
        top_i = np.take_along_axis(cand, top_pos, axis=1)
        return self._to_keyed(top_s, top_i)

    def retrieve_many(
        self,
        queries: Sequence[str],
        top_k: int = 100,
        mode: Optional[str] = None,
        batch_size: int = 256,
        window: int = 4,
    ) -> List[List[Tuple[str, float]]]:
        """Batched retrieval over an arbitrary query list, PIPELINED in exact
        mode: up to ``window`` batches are dispatched (host tokenize/BM25
        postings + async device scans) before the oldest result is fetched,
        so the per-batch fetch round-trip and the next batch's host prep
        hide under device compute.  Results match per-batch
        :meth:`retrieve` exactly (same programs, same order)."""
        mode = self._resolve_mode(mode)
        chunks = [
            list(queries[s : s + batch_size]) for s in range(0, len(queries), batch_size)
        ]
        # Pad a ragged tail chunk to batch_size (repeating its last query):
        # a new batch shape would trace -- and on TPU remotely recompile,
        # ~20-40 s -- every serving program for one tail batch, while
        # scoring the duplicates in the already-compiled program is
        # microseconds of device time.  Single-chunk calls stay unpadded
        # (there is no compiled batch_size program to reuse, and a small
        # B compiles faster).  The duplicate results are sliced off below.
        if len(chunks) > 1 and len(chunks[-1]) < batch_size:
            chunks[-1] = chunks[-1] + [chunks[-1][-1]] * (
                batch_size - len(chunks[-1])
            )
        out: List[List[Tuple[str, float]]] = []
        if mode == "rerank":
            # One-batch dispatch-ahead: batch i+1's recall scans run on
            # device while batch i's host candidate assembly + stage-2
            # rerank proceed (the candidate-union host sync prevents the
            # deeper exact-mode window).
            pend = None
            for chunk in chunks:
                st = self._rerank_dispatch(chunk)
                if pend is not None:
                    out.extend(self._rerank_finish(pend, top_k))
                pend = st
            if pend is not None:
                out.extend(self._rerank_finish(pend, top_k))
            return out[: len(queries)]
        pending: List[Any] = []
        for chunk in chunks:
            pending.append(self._dispatch_exact(chunk, top_k))
            if len(pending) >= window:
                out.extend(self._finish_exact(pending.pop(0)))
        for d in pending:
            out.extend(self._finish_exact(d))
        return out[: len(queries)]

    def retrieve(
        self, queries: Sequence[str], top_k: int = 100, mode: Optional[str] = None
    ) -> List[List[Tuple[str, float]]]:
        """``mode``: 'exact' (fused full-corpus scoring, hybrid-capable;
        the default), 'rerank' (reference-compat recall+rerank), or 'auto'
        (= exact)."""
        mode = self._resolve_mode(mode)
        if mode == "exact":
            return self.retrieve_exact(queries, top_k)
        return self.retrieve_rerank(queries, top_k)

    # -- public dispatch/finish split (pipelined callers) ----------------

    def dispatch(self, queries: Sequence[str], top_k: int = 100,
                 mode: Optional[str] = None):
        """Dispatch half of :meth:`retrieve`: all host prep + ASYNC device
        work, no result fetch.  Returns an opaque handle for
        :meth:`finish`.  Callers that overlap batches (the serving daemon's
        MicroBatcher, :meth:`retrieve_many`) dispatch batch i+1 while batch
        i's device program is still in flight, hiding the fetch round-trip
        and the next batch's host prep under device compute -- the same
        split that took batch mode 3,212 -> 4,823 QPS (BENCH_NOTES)."""
        mode = self._resolve_mode(mode)
        if mode == "rerank":
            return ("rerank", self._rerank_dispatch(queries), top_k)
        return ("exact", self._dispatch_exact(queries, top_k), top_k)

    def finish(self, handle) -> List[List[Tuple[str, float]]]:
        """Fetch half of :meth:`retrieve` for a :meth:`dispatch` handle."""
        kind, st, top_k = handle
        if kind == "rerank":
            return self._rerank_finish(st, top_k)
        return self._finish_exact(st)

    def _resolve_mode(self, mode: Optional[str]) -> str:
        mode = mode or self.mode
        if mode == "auto":
            # exact is the default everywhere: full-corpus fused scoring is
            # this framework's point (the reference can only approximate
            # hybrid retrieval with top-100 unions + rerank, which remains
            # available as the explicit compat mode)
            mode = "exact"
        return mode

    # ------------------------------------------------------------------

    def _to_keyed(self, scores: np.ndarray, ids: np.ndarray) -> List[List[Tuple[str, float]]]:
        """[B, k] (scores, row ids) -> per-query [(doc_key, score)] lists.

        Vectorized: per-scalar numpy ops here (isfinite/float/int per hit)
        cost ~1-2 us each on the 1-vCPU serving host -- at B=256, k=100
        that is tens of ms of host time per batch, comparable to the
        device scan itself, sitting in retrieve_many's serial finish
        path."""
        arr = self._doc_keys_arr
        if arr is None:
            arr = self._doc_keys_arr = np.asarray(self.doc_keys, dtype=object)
        # -inf (padding) entries can carry out-of-range row ids (mesh shard
        # padding rows); they are filtered below, but the gather must not
        # fault on them.
        keys = arr[np.clip(np.asarray(ids, np.int64), 0, self.n_docs - 1)]
        scores = np.asarray(scores, np.float32)
        finite = np.isfinite(scores)
        key_rows, score_rows = keys.tolist(), scores.tolist()
        if finite.all():  # the common case: no -inf padding reached top-k
            return [list(zip(kr, sr)) for kr, sr in zip(key_rows, score_rows)]
        return [
            [(kk, ss) for kk, ss, f in zip(kr, sr, fr) if f]
            for kr, sr, fr in zip(key_rows, score_rows, finite.tolist())
        ]

    def to_qres(
        self, query_ids: Sequence[str], results: List[List[Tuple[str, float]]]
    ) -> List[trec.QRes]:
        qres = []
        for qid, hits in zip(query_ids, results):
            for rank, (doc_key, score) in enumerate(hits):
                qres.append(trec.QRes(qid, doc_key, score, rank=rank))
        return qres

    @classmethod
    def mixer_weights_from_params(cls, params: Dict) -> Dict:
        """Extract mixer subtree from a full MFARModel param tree."""
        return params["mixer"]

    def field_weight_report(self, queries: Sequence[str]) -> np.ndarray:
        """Softmax field weights for analysis (what mask_fields inspects)."""
        q = self.encode_queries(queries)
        return np.asarray(FieldMixer.weights_of(self.mixer_params, q))
