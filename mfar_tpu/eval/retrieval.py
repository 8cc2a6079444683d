"""The retrieval engine: query -> top-k documents over the hybrid index.

The serving equivalent of the reference's ``trec_eval_step``
(mfar/modeling/contrastive.py:669-704), re-designed TPU-first with two modes:

- ``exact`` (dense-only fields): the full corpus is scored in one fused
  folded matmul + top-k (distributed over the mesh when the corpus is
  sharded).  No recall stage, no candidate union: exact retrieval, which
  the reference approximates.
- ``rerank`` (default for hybrid): stage-1 recall takes the per-field dense
  top-k on device (all fields in one corpus pass via one-hot query folding)
  plus the per-field BM25 top-k on host; the per-query candidate union is
  padded to a static width and stage-2 reranks all (dense+sparse) field
  scores with the query-conditioned mixer -- the reference's semantics,
  with the per-query python loop replaced by one batched device program.

Field ablation masks (mask_fields) multiply the per-field scores exactly as
the reference does (mfar/modeling/contrastive.py:686,706-714).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mfar_tpu.data import trec
from mfar_tpu.data.schema import dense_keys, sparse_keys
from mfar_tpu.data.types import Field
from mfar_tpu.ops.scoring import (
    dense_topk_chunked,
    dense_topk_chunked_approx,
    dense_topk_chunked_approx_int8,
    fold_queries,
    per_field_candidate_scores,
    quantize_rows_int8_np,
    rerank_candidates,
    softmax_field_weights,
)
from mfar_tpu.train.data_pipeline import clean_query
from mfar_tpu.train.model import FieldMixer


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Corpus chunk for the streaming top-k scans; docs_flat is padded once at
# engine build to a multiple of this (the ops mask padding via valid_n).
TOPK_CHUNK = 131072


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
        use_pallas_gather: bool = False,  # opt-in Pallas rerank (see ops/pallas_kernels.py)
        quantize: Optional[str] = None,  # "int8": half corpus HBM (2x docs/chip),
        #                                  ~0.5% score precision trade
    ):
        self.field_info = field_info
        self.doc_keys = list(doc_keys)
        self.encode_fn = encode_fn
        self.tokenizer = tokenizer
        self.mixer_params = mixer_params
        self.sparse_indices = sparse_indices or {}
        self.query_max_length = query_max_length
        self.recall_k = recall_k
        self.dense_keys = dense_keys(field_info)
        self.sparse_keys = sparse_keys(field_info)
        self.mask = mask
        self.n_docs = len(self.doc_keys)

        # ONE HBM-resident corpus copy, in the fused-matmul layout.  Stage-2
        # rerank gathers candidate rows from this same matrix (XLA gather);
        # the optional Pallas DMA-gather path keeps a second, row-DMA-layout
        # copy (rerank-heavy serving trade-off, see ops/pallas_kernels.py).
        self.docs_flat = None
        self.docs_rows = None
        self.docs_q = None  # int8 corpus (+ self.doc_scales) when quantized
        self.doc_scales = None
        self.emb_dim = None
        self.has_dense = dense_matrix is not None and dense_matrix.size > 0
        if self.has_dense:
            n, fd, e = dense_matrix.shape
            self.emb_dim = e
            flat = dense_matrix.reshape(n, fd * e)
            if n > TOPK_CHUNK and n % TOPK_CHUNK:  # pad for the chunked scans
                flat = np.pad(flat, ((0, _round_up(n, TOPK_CHUNK) - n), (0, 0)))
            if quantize == "int8":
                assert not use_pallas_gather, "pallas gather path is full-precision only"
                # host-side quantization so the f32 corpus never transits HBM
                dq, ds = quantize_rows_int8_np(flat)
                self.docs_q = jnp.asarray(dq)
                self.doc_scales = jnp.asarray(ds)
            elif quantize:
                raise ValueError(f"unknown quantize mode {quantize!r}")
            else:
                self.docs_flat = jnp.asarray(flat)
            if use_pallas_gather:
                if e % 128 == 0:  # kernel needs lane-aligned field segments
                    from mfar_tpu.ops.pallas_kernels import make_row_dma_view

                    self.docs_rows = make_row_dma_view(self.docs_flat)
                else:
                    print(
                        f"[retrieval] pallas gather needs emb_dim % 128 == 0 "
                        f"(got {e}); falling back to the XLA gather"
                    )

    # ------------------------------------------------------------------

    def set_mask(self, mask: Optional[np.ndarray]) -> None:
        """Field ablation mask over [dense..., sparse...] (schema order)."""
        self.mask = mask

    def encode_queries(self, queries: Sequence[str]) -> jax.Array:
        toks = self.tokenizer.encode_batch(
            [clean_query(q) for q in queries], self.query_max_length
        )
        return self.encode_fn(jnp.asarray(toks["input_ids"]), jnp.asarray(toks["attention_mask"]))

    def _field_weights(self, q: jax.Array) -> jax.Array:
        mask = None if self.mask is None else jnp.asarray(self.mask, jnp.float32)
        return softmax_field_weights(self.mixer_params["weight"], q, mask)

    # ------------------------------------------------------------------

    def retrieve_exact(self, queries: Sequence[str], top_k: int = 100) -> List[List[Tuple[str, float]]]:
        """Fused exact full-corpus retrieval (dense fields only; under int8
        quantization, exact up to the ~0.5% per-row quantization error)."""
        assert not self.sparse_keys, "exact mode requires all-dense fields"
        q = self.encode_queries(queries)
        weights = self._field_weights(q)
        weights = jnp.broadcast_to(weights, (q.shape[0], weights.shape[-1]))
        qflat = fold_queries(q, weights)
        if self.docs_q is not None:
            # exact per-chunk top-k: the only deviation from f32 retrieval
            # is the quantization error itself
            top_s, top_i = dense_topk_chunked_approx_int8(
                qflat.astype(jnp.float32), self.docs_q, self.doc_scales,
                jnp.int32(self.n_docs), k=min(top_k, self.n_docs),
                chunk_size=TOPK_CHUNK, exact=True,
            )
        else:
            top_s, top_i = dense_topk_chunked(
                qflat.astype(self.docs_flat.dtype), self.docs_flat, jnp.int32(self.n_docs),
                k=min(top_k, self.n_docs), chunk_size=TOPK_CHUNK,
            )
        return self._to_keyed(np.asarray(top_s), np.asarray(top_i))

    def retrieve_rerank(self, queries: Sequence[str], top_k: int = 100) -> List[List[Tuple[str, float]]]:
        """Recall (per-field top-k union) + rerank, the reference pipeline."""
        b = len(queries)
        q = self.encode_queries(queries)
        cand_sets: List[set] = [set() for _ in range(b)]

        # stage 1a: dense per-field recall -- all fields in ONE corpus pass
        # by folding one-hot field selectors into the queries.  This is a
        # recall stage (the reference's own eval approximates with per-field
        # top-100 unions), so the PartialReduce top-k (recall>=0.95) applies.
        if self.dense_keys and self.has_dense:
            fd = len(self.dense_keys)
            eye = jnp.eye(fd, dtype=q.dtype)
            onehot_q = jnp.einsum("fg,be->bfge", eye, q).reshape(b * fd, fd * self.emb_dim)
            k = min(self.recall_k, self.n_docs)
            if self.docs_q is not None:
                _, idx = dense_topk_chunked_approx_int8(
                    onehot_q.astype(jnp.float32), self.docs_q, self.doc_scales,
                    jnp.int32(self.n_docs), k=k, chunk_size=TOPK_CHUNK,
                )
            else:
                _, idx = dense_topk_chunked_approx(
                    onehot_q.astype(self.docs_flat.dtype),
                    self.docs_flat,
                    jnp.int32(self.n_docs),
                    k=k,
                    chunk_size=TOPK_CHUNK,
                )
            idx = np.asarray(idx).reshape(b, fd, k)
            for i in range(b):
                cand_sets[i].update(int(x) for x in idx[i].ravel())

        # stage 1b: sparse per-field recall on host
        cleaned = [clean_query(t) for t in queries]
        for fk in self.sparse_keys:
            index = self.sparse_indices[fk]
            hits = index.retrieve_batch(cleaned, top_k=min(self.recall_k, self.n_docs))
            for i, per_q in enumerate(hits):
                for key, _ in per_q:
                    cand_sets[i].add(index.key_to_id[key])

        # static-width candidate matrix (padded; pad entries masked out)
        width = _round_up(max(max(len(s) for s in cand_sets), 1), 128)
        cand = np.zeros((b, width), np.int64)
        valid = np.zeros((b, width), bool)
        for i, s in enumerate(cand_sets):
            ids = sorted(s)
            cand[i, : len(ids)] = ids
            valid[i, : len(ids)] = True

        # stage 2: per-field scores for candidates
        if self.dense_keys and self.has_dense:
            fd = len(self.dense_keys)
            cand_j = jnp.asarray(cand)
            if self.docs_rows is not None:
                from mfar_tpu.ops.pallas_kernels import gather_per_field_scores_pallas

                dense_scores = gather_per_field_scores_pallas(
                    q.astype(jnp.float32), self.docs_rows, cand_j.astype(jnp.int32), fd,
                    interpret=jax.default_backend() != "tpu",
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
            dense_scores = jnp.zeros((b, width, 0), jnp.float32)

        sparse_scores = None
        if self.sparse_keys:
            sp = np.zeros((b, width, len(self.sparse_keys)), np.float32)
            cand_keys = [[self.doc_keys[j] for j in row] for row in cand]
            for s_i, fk in enumerate(self.sparse_keys):
                index = self.sparse_indices[fk]
                for i in range(b):
                    sp[i, :, s_i] = index.score_batch([cleaned[i]], cand_keys[i])[0]
            sparse_scores = jnp.asarray(sp)

        mask = None if self.mask is None else jnp.asarray(self.mask, jnp.float32)
        top_s, top_pos = rerank_candidates(
            q.astype(jnp.float32),
            dense_scores,
            sparse_scores,
            self.mixer_params["weight"],
            mask=mask,
            cand_valid=jnp.asarray(valid),
            k=min(top_k, width),
        )
        top_i = np.take_along_axis(cand, np.asarray(top_pos), axis=1)
        return self._to_keyed(np.asarray(top_s), top_i)

    def retrieve(self, queries: Sequence[str], top_k: int = 100) -> List[List[Tuple[str, float]]]:
        if not self.sparse_keys and self.has_dense:
            return self.retrieve_exact(queries, top_k)
        return self.retrieve_rerank(queries, top_k)

    # ------------------------------------------------------------------

    def _to_keyed(self, scores: np.ndarray, ids: np.ndarray) -> List[List[Tuple[str, float]]]:
        out = []
        for row_s, row_i in zip(scores, ids):
            hits = []
            for s, i in zip(row_s, row_i):
                if np.isfinite(s):
                    hits.append((self.doc_keys[int(i)], float(s)))
            out.append(hits)
        return out

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
