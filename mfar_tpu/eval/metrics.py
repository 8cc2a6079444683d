"""In-framework retrieval metrics with trec_eval semantics.

The reference depends on the external NIST ``trec_eval`` C binary for every
quality number (reference: mfar/data/trec.py:84-93).  This module is the
framework-native equivalent: vectorized numpy implementations of the
``-m all_trec`` measures the reference consumes (success_k, recall_k, P_k,
map, Rprec, recip_rank, ndcg, ndcg_cut_k -- reference consumption list:
mfar/modeling/contrastive.py:587).

Semantics matched to trec_eval:

- Ranking is by similarity descending, ties broken by document id in
  *descending* lexicographic order (trec_eval's internal sort).
- Only queries present in both the qrels and the run are averaged (default
  trec_eval behavior without ``-c``); queries with no relevant documents are
  skipped.
- ``rel > 0`` counts as relevant; graded relevance feeds ndcg gains linearly.
- ndcg discount is 1/log2(rank+1) starting at rank 1; ``ndcg`` is computed
  over the full ranked list, ``ndcg_cut_k`` cuts both DCG and ideal DCG
  at k.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, List, Mapping, Sequence, Tuple, Union

import numpy as np

from mfar_tpu.data import trec

RECALL_CUTS = (5, 10, 15, 20, 30, 100, 200, 500, 1000)
NDCG_CUTS = (5, 10, 15, 20, 30, 100, 200, 500, 1000)
PREC_CUTS = (5, 10, 15, 20, 30, 100, 200, 500, 1000)
SUCCESS_CUTS = (1, 5, 10)

QrelsLike = Union[Sequence[trec.QRels], Mapping[str, Mapping[str, float]]]
RunLike = Union[Sequence[trec.QRes], Mapping[str, Sequence[Tuple[str, float]]]]


def _qrels_to_dict(qrels: QrelsLike) -> Dict[str, Dict[str, float]]:
    if isinstance(qrels, Mapping):
        return {q: dict(docs) for q, docs in qrels.items()}
    out: Dict[str, Dict[str, float]] = defaultdict(dict)
    for r in qrels:
        out[r.query_id][r.doc_id] = r.relevance
    return dict(out)


def _run_to_dict(run: RunLike) -> Dict[str, List[Tuple[str, float]]]:
    if isinstance(run, Mapping):
        return {q: list(docs) for q, docs in run.items()}
    out: Dict[str, List[Tuple[str, float]]] = defaultdict(list)
    for r in run:
        out[r.query_id].append((r.doc_id, r.sim))
    return dict(out)


def _rank(docs: List[Tuple[str, float]]) -> List[str]:
    """trec_eval ordering: sim descending, ties by doc id descending
    (stable sort by -sim over a doc-id-descending pre-sort)."""
    by_doc_desc = sorted(docs, key=lambda x: x[0], reverse=True)
    return [d for d, _ in sorted(by_doc_desc, key=lambda x: -x[1])]


def _dcg(gains: np.ndarray) -> float:
    if gains.size == 0:
        return 0.0
    discounts = 1.0 / np.log2(np.arange(2, gains.size + 2))
    return float(np.sum(gains * discounts))


def _per_query_metrics(
    ranked_rel: np.ndarray,  # graded relevance of each ranked doc, in rank order
    all_rels: np.ndarray,  # graded relevance of every judged-relevant doc
) -> Dict[str, float]:
    num_rel = int(np.sum(all_rels > 0))
    num_ret = ranked_rel.size
    is_rel = (ranked_rel > 0).astype(np.float64)
    m: Dict[str, float] = {}

    cum_rel = np.cumsum(is_rel)
    ranks = np.arange(1, num_ret + 1, dtype=np.float64)

    # map: mean of precision@rank over relevant retrieved, normalized by num_rel
    prec_at_rel = (cum_rel / ranks) * is_rel
    m["map"] = float(np.sum(prec_at_rel) / num_rel) if num_rel else 0.0

    # reciprocal rank of first relevant
    first = np.argmax(is_rel) if np.any(is_rel > 0) else -1
    m["recip_rank"] = float(1.0 / (first + 1)) if first >= 0 else 0.0

    # R-precision
    if num_rel:
        r = min(num_rel, num_ret)
        m["Rprec"] = float(cum_rel[r - 1] / num_rel) if r > 0 else 0.0
    else:
        m["Rprec"] = 0.0

    for k in PREC_CUTS:
        topk = is_rel[:k]
        m[f"P_{k}"] = float(np.sum(topk) / k)

    for k in RECALL_CUTS:
        m[f"recall_{k}"] = float(np.sum(is_rel[:k]) / num_rel) if num_rel else 0.0

    for k in SUCCESS_CUTS:
        m[f"success_{k}"] = float(np.any(is_rel[:k] > 0))

    ideal = np.sort(all_rels[all_rels > 0])[::-1].astype(np.float64)
    idcg_full = _dcg(ideal)
    m["ndcg"] = _dcg(ranked_rel.astype(np.float64)) / idcg_full if idcg_full > 0 else 0.0
    for k in NDCG_CUTS:
        idcg_k = _dcg(ideal[:k])
        m[f"ndcg_cut_{k}"] = (
            _dcg(ranked_rel[:k].astype(np.float64)) / idcg_k if idcg_k > 0 else 0.0
        )

    m["num_ret"] = float(num_ret)
    m["num_rel"] = float(num_rel)
    m["num_rel_ret"] = float(cum_rel[-1]) if num_ret else 0.0
    return m


def evaluate(qrels: QrelsLike, run: RunLike) -> Dict[str, float]:
    """Score a run against qrels; returns the metric dict averaged over
    evaluated queries (trec_eval default averaging)."""
    qrels_d = _qrels_to_dict(qrels)
    run_d = _run_to_dict(run)

    query_ids = [q for q in run_d if q in qrels_d and any(v > 0 for v in qrels_d[q].values())]
    if not query_ids:
        return {"num_q": 0.0}

    acc: Dict[str, float] = defaultdict(float)
    sums = {"num_ret": 0.0, "num_rel": 0.0, "num_rel_ret": 0.0}
    for qid in query_ids:
        judged = qrels_d[qid]
        ranked = _rank(run_d[qid])
        ranked_rel = np.array([max(judged.get(d, 0.0), 0.0) for d in ranked])
        all_rels = np.array(list(judged.values()), dtype=np.float64)
        per_q = _per_query_metrics(ranked_rel, all_rels)
        for k, v in per_q.items():
            if k in sums:
                sums[k] += v
            else:
                acc[k] += v

    n = float(len(query_ids))
    out = {k: v / n for k, v in acc.items()}
    out.update(sums)
    out["num_q"] = n
    return out


def evaluate_files(qrels_path: str, qres_path: str) -> Dict[str, float]:
    return evaluate(trec.QRels.from_file(qrels_path), trec.QRes.from_file(qres_path))


def evaluate_ranked_ids(
    qrels: QrelsLike,
    ranked_ids: Mapping[str, Sequence[str]],
) -> Dict[str, float]:
    """Convenience: score already-ranked id lists (no tie-break re-sorting)."""
    run = {
        qid: [(doc_id, float(len(ids) - i)) for i, doc_id in enumerate(ids)]
        for qid, ids in ranked_ids.items()
    }
    return evaluate(qrels, run)
