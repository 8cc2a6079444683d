import math

import numpy as np
import pytest

from mfar_tpu.data import trec
from mfar_tpu.eval.metrics import evaluate, evaluate_ranked_ids


def _mk(qrels, run):
    qrels_items = [trec.QRels(q, d, r) for q, d, r in qrels]
    run_items = [trec.QRes(q, d, s) for q, d, s in run]
    return evaluate(qrels_items, run_items)


def test_single_query_hand_computed():
    # Query 1: relevant docs {a, c}; ranking by score: b(0.9), a(0.8), c(0.2)
    m = _mk(
        [("1", "a", 1.0), ("1", "c", 1.0)],
        [("1", "a", 0.8), ("1", "b", 0.9), ("1", "c", 0.2)],
    )
    # ranks: b, a, c -> rel pattern 0,1,1
    assert m["recip_rank"] == pytest.approx(1 / 2)
    assert m["success_1"] == 0.0
    assert m["success_5"] == 1.0
    assert m["recall_5"] == 1.0
    # AP = (1/2 * [prec@2=1/2] + [prec@3=2/3]) / 2
    assert m["map"] == pytest.approx((1 / 2 + 2 / 3) / 2)
    # Rprec: R=2, top-2 contains 1 relevant
    assert m["Rprec"] == pytest.approx(1 / 2)
    # ndcg: DCG = 0 + 1/log2(3) + 1/log2(4); IDCG = 1 + 1/log2(3)
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1 + 1 / math.log2(3)
    assert m["ndcg"] == pytest.approx(dcg / idcg)
    assert m["ndcg_cut_10"] == pytest.approx(dcg / idcg)
    assert m["num_q"] == 1
    assert m["num_rel"] == 2
    assert m["num_rel_ret"] == 2


def test_tie_break_doc_id_descending():
    # Same score: trec_eval ranks doc id descending -> "z" before "a".
    m = _mk(
        [("1", "z", 1.0)],
        [("1", "a", 0.5), ("1", "z", 0.5)],
    )
    assert m["recip_rank"] == 1.0
    m2 = _mk(
        [("1", "a", 1.0)],
        [("1", "a", 0.5), ("1", "z", 0.5)],
    )
    assert m2["recip_rank"] == pytest.approx(1 / 2)


def test_graded_relevance_ndcg():
    # rel 2 ranked first, rel 1 second -> perfect ndcg
    m = _mk(
        [("1", "a", 2.0), ("1", "b", 1.0)],
        [("1", "a", 0.9), ("1", "b", 0.5)],
    )
    assert m["ndcg"] == pytest.approx(1.0)
    # swapped order is imperfect
    m2 = _mk(
        [("1", "a", 2.0), ("1", "b", 1.0)],
        [("1", "a", 0.5), ("1", "b", 0.9)],
    )
    dcg = 1.0 + 2.0 / math.log2(3)
    idcg = 2.0 + 1.0 / math.log2(3)
    assert m2["ndcg"] == pytest.approx(dcg / idcg)


def test_multi_query_averaging_skips_unretrieved():
    m = _mk(
        [("1", "a", 1.0), ("2", "b", 1.0), ("3", "c", 1.0)],
        [("1", "a", 1.0), ("2", "x", 1.0), ("2", "b", 0.5)],
    )
    # query 3 absent from run -> skipped (trec_eval default); q1 rr=1, q2 rr=1/2
    assert m["num_q"] == 2
    assert m["recip_rank"] == pytest.approx((1.0 + 0.5) / 2)
    assert m["success_1"] == pytest.approx(0.5)


def test_unjudged_docs_count_as_nonrelevant():
    m = _mk(
        [("1", "a", 1.0)],
        [("1", "u1", 0.9), ("1", "u2", 0.8), ("1", "a", 0.7)],
    )
    assert m["recip_rank"] == pytest.approx(1 / 3)
    assert m["P_5"] == pytest.approx(1 / 5)


def test_evaluate_ranked_ids():
    m = evaluate_ranked_ids(
        [trec.QRels("1", "a", 1.0)],
        {"1": ["b", "a", "c"]},
    )
    assert m["recip_rank"] == pytest.approx(1 / 2)


def test_negative_relevance_is_nonrelevant():
    m = _mk(
        [("1", "a", 1.0), ("1", "b", -1.0)],
        [("1", "b", 0.9), ("1", "a", 0.8)],
    )
    assert m["num_rel"] == 1
    assert m["recip_rank"] == pytest.approx(1 / 2)


@pytest.mark.skipif(
    not trec.trec_eval_available(), reason="trec_eval binary not installed"
)
def test_parity_with_trec_eval_binary(tmp_path):
    rng = np.random.default_rng(7)
    qrels, run = [], []
    for q in range(20):
        rel_docs = rng.choice(200, size=rng.integers(1, 6), replace=False)
        for d in rel_docs:
            qrels.append(trec.QRels(str(q), f"d{d}", float(rng.integers(1, 3))))
        ret = rng.choice(200, size=100, replace=False)
        for d in ret:
            run.append(trec.QRes(str(q), f"d{d}", float(rng.normal())))
    qrels_path, qres_path = str(tmp_path / "q.qrels"), str(tmp_path / "q.qres")
    trec.write_qrels(qrels_path, qrels)
    trec.write_qres(qres_path, run)
    import subprocess

    out = subprocess.run(
        ["trec_eval", "-m", "all_trec", qrels_path, qres_path],
        stdout=subprocess.PIPE,
        check=True,
    )
    external = trec.parse_trec_eval_output(out.stdout.decode())
    internal = evaluate(qrels, run)
    for key in ["map", "recip_rank", "ndcg", "ndcg_cut_10", "recall_10", "success_1", "Rprec", "P_10"]:
        assert internal[key] == pytest.approx(external[key], abs=1e-4), key
