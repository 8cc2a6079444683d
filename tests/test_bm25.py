import math

import numpy as np
import pytest

from mfar_tpu.data.negative_sampler import IndexNegativeSampler
from mfar_tpu.sparse.bm25 import BM25Index
from mfar_tpu.sparse.tokenize import tokenize

DOCS = [
    ("d0", "the red shoe glows brightly at night"),
    ("d1", "a blue lamp that glows in the dark"),
    ("d2", "red lamp red shoe red clock"),
    ("d3", "green table with a matching green chair"),
    ("d4", ""),
    ("d5", "shoe shoe shoe shoe"),
]


def naive_bm25_scores(pairs, query, k1=1.2, b=0.75):
    """Direct-formula lucene BM25 for cross-checking the CSR engine."""
    doc_tokens = [list(tokenize(t)) for _, t in pairs]
    n = len(doc_tokens)
    avgdl = sum(len(t) for t in doc_tokens) / n
    q_tokens = list(tokenize(query))
    scores = np.zeros(n)
    for d, toks in enumerate(doc_tokens):
        dl = len(toks)
        for qt in q_tokens:
            tf = toks.count(qt)
            if tf == 0:
                continue
            df = sum(1 for dt in doc_tokens if qt in dt)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            scores[d] += idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))
    return scores


@pytest.fixture(scope="module")
def index():
    return BM25Index.create(DOCS)


def test_scores_match_naive_formula(index):
    for query in ["red shoe", "glows", "green chair table", "red red lamp", "missing zebra"]:
        got = index.get_scores(query)
        want = naive_bm25_scores(DOCS, query)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_postings_width_uses_geometric_buckets(index):
    """Postings widths must land on power-of-two multiples of the base:
    a distinct batch-max width per batch would recompile the jitted
    serving consumers (the fused hybrid program) every batch."""
    from mfar_tpu.native import bucket_width

    assert bucket_width(0) == 128
    assert bucket_width(128) == 128
    assert bucket_width(129) == 256
    assert bucket_width(1000) == 1024
    assert bucket_width(7, base=4) == 8

    # Different query mixes with nearby nnz must share one bucketed width.
    w1 = index.get_postings_batch(["red shoe"], pad_multiple=4)[0].shape[1]
    w2 = index.get_postings_batch(["red shoe", "red lamp"], pad_multiple=4)[0].shape[1]
    for w in (w1, w2):
        assert w % 4 == 0 and (w // 4) & (w // 4 - 1) == 0  # pow2 multiple
    assert w1 == w2


def test_postings_batch_scatter_equals_dense_scores(index):
    """get_postings_batch (the device-densification feed for exact hybrid)
    must scatter-add back to exactly the dense score vectors, duplicates and
    unknown terms included, on both backends."""
    queries = ["red shoe", "red red lamp", "missing zebra", ""]
    n = len(index.keys)
    ids, vals = index.get_postings_batch(queries, pad_multiple=4)
    assert ids.shape == vals.shape and ids.shape[1] % 4 == 0
    dense = index.get_scores_batch(queries)
    for qi in range(len(queries)):
        acc = np.zeros(n, np.float32)
        np.add.at(acc, ids[qi], vals[qi])
        np.testing.assert_allclose(acc, dense[qi], rtol=1e-5, atol=1e-6)


def test_duplicate_query_terms_double_count(index):
    np.testing.assert_allclose(
        index.get_scores("red red"), 2 * index.get_scores("red"), rtol=1e-5
    )


def test_retrieve_ranks_by_score(index):
    hits = index.retrieve("red shoe", top_k=3)
    assert len(hits) == 3
    scores = [s for _, s in hits]
    assert scores == sorted(scores, reverse=True)
    assert hits[0][0] == "d2"  # most 'red' occurrences


def test_retrieve_batch_matches_single(index):
    batch = index.retrieve_batch(["red shoe", "glows"], top_k=2)
    assert batch[0] == index.retrieve("red shoe", 2)
    assert batch[1] == index.retrieve("glows", 2)


def test_score_batch_candidates_and_missing_keys(index):
    out = index.score_batch(["red shoe"], ["d2", "nope", "d4"])
    assert out.shape == (1, 3)
    full = index.get_scores("red shoe")
    assert out[0, 0] == pytest.approx(full[2])
    assert out[0, 1] == 0.0
    assert out[0, 2] == pytest.approx(full[4])


def test_score_batch_with_cache(index):
    cache = {7: {2: 1.5, 0: 0.25}}
    out = index.score_batch_with_cache([7, 8], ["d0", "d2", "zzz"], cache)
    np.testing.assert_allclose(out, [[0.25, 1.5, 0.0], [0.0, 0.0, 0.0]])


def test_get_scores_sparse_and_safe_docs(index):
    sparse = index.get_scores_sparse("red shoe")
    assert set(sparse) == {0, 2, 5}
    index.set_safe_docs({2})
    assert set(index.get_scores_sparse("red shoe")) == {2}
    index.set_safe_docs(set())


def test_save_load_roundtrip(index, tmp_path):
    index.save(str(tmp_path / "idx"))
    back = BM25Index.load(str(tmp_path / "idx"))
    np.testing.assert_allclose(
        back.get_scores("red shoe"), index.get_scores("red shoe"), rtol=1e-6
    )
    assert back.keys == index.keys


def test_empty_query_and_empty_doc(index):
    assert index.get_scores("").sum() == 0.0
    assert index.get_scores("the at in").sum() == 0.0  # all stopwords


def test_negative_sampler_excludes_positives_takes_bottom():
    idx = BM25Index.create(DOCS)
    sampler = IndexNegativeSampler(idx, n_retrieve=4, n_bottom=2, n_sample=1)
    rng = np.random.default_rng(0)
    for _ in range(10):
        (neg,) = sampler.sample("red shoe", {"d2"}, rng)
        assert neg != "d2"
        # bottom-2 of the remaining top-4 can't include the top-scoring leftover
        top = [k for k, _ in idx.retrieve("red shoe", 4) if k != "d2"]
        assert neg in top[-2:]


def test_negative_sampler_widens_when_all_positive():
    idx = BM25Index.create(DOCS[:3])
    sampler = IndexNegativeSampler(idx, n_retrieve=1, n_bottom=2, n_sample=1)
    rng = np.random.default_rng(0)
    negs = sampler.sample("red shoe", {"d2"}, rng)
    assert negs and negs[0] != "d2"
