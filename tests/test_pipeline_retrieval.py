"""Data pipeline + retrieval engine integration on the synthetic corpus."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.synth import make_amazon_corpus, make_queries_and_qrels

from mfar_tpu.data.format import format_documents
from mfar_tpu.data.negative_sampler import IndexNegativeSampler
from mfar_tpu.data.schema import resolve_fields
from mfar_tpu.eval.index_build import (
    build_dense_corpus_matrix,
    build_sparse_indices,
)
from mfar_tpu.eval.metrics import evaluate_ranked_ids
from mfar_tpu.eval.retrieval import RetrievalEngine
from mfar_tpu.models import Encoder, EncoderConfig, SimpleVocabTokenizer
from mfar_tpu.models.encoder import init_params
from mfar_tpu.sparse.bm25 import BM25Index
from mfar_tpu.train.data_pipeline import ContrastiveDataset, strip_meta


@pytest.fixture(scope="module")
def world():
    corpus = make_amazon_corpus(40)
    queries, qrels = make_queries_and_qrels(corpus, n_queries=12)
    field_info = resolve_fields("title_dense,description_dense,title_sparse", "amazon")
    texts = []
    for fk, f in field_info.items():
        texts += [t for _, t in format_documents(corpus.pairs(), f.name, "amazon")]
    tok = SimpleVocabTokenizer.build(texts + list(queries.values()), max_length=64)
    config = EncoderConfig.tiny(vocab_size=tok.vocab_size)
    params = init_params(config)
    model = Encoder(config)

    @jax.jit
    def encode_fn(ids, mask):
        return model.apply({"params": params}, ids, mask)

    return dict(
        corpus=corpus, queries=queries, qrels=qrels, field_info=field_info,
        tok=tok, encode_fn=encode_fn, emb=config.hidden_size,
    )


@pytest.fixture(scope="module")
def single_index(world):
    pairs = format_documents(world["corpus"].pairs(), "single", "amazon")
    return BM25Index.create(pairs, name="single")


def test_dataset_batches(world, single_index):
    w = world
    sampler = IndexNegativeSampler(single_index, n_retrieve=10, n_bottom=5, n_sample=1)
    sparse_indices = build_sparse_indices(w["corpus"], w["field_info"])
    ds = ContrastiveDataset(
        w["queries"], w["corpus"], w["qrels"], sampler, w["field_info"], w["tok"],
        sparse_indices=sparse_indices,
    )
    rng = np.random.default_rng(0)
    batch = ds.make_batch([0, 1, 2, 3], rng)
    assert batch["query"]["input_ids"].shape[0] == 4
    assert set(batch["pos"]) == {"description_dense", "title_dense"}
    assert batch["sparse_pos"].shape == (4, 4, 1)
    assert batch["sparse_neg"].shape == (4, 4, 1)
    # negatives are never the item's own positive
    for b_i in range(4):
        assert batch["meta"]["neg_keys"][b_i] != batch["meta"]["pos_keys"][b_i]
    # sparse scores match direct BM25 scoring of (query, pos docs)
    idx = sparse_indices["title_sparse"]
    qtexts = [ds.queries[qid] for qid in batch["meta"]["query_ids"]]
    want = idx.score_batch(qtexts, batch["meta"]["pos_keys"])
    np.testing.assert_allclose(batch["sparse_pos"][:, :, 0], want, rtol=1e-5)
    # strip_meta removes host-only fields
    assert "meta" not in strip_meta(batch)


def test_dataset_epoch_determinism(world, single_index):
    w = world
    sampler = IndexNegativeSampler(single_index, n_retrieve=10, n_bottom=5, n_sample=1)
    ds = ContrastiveDataset(
        w["queries"], w["corpus"], w["qrels"], sampler, w["field_info"], w["tok"],
    )
    b1 = [b["meta"]["pos_keys"] for b in ds.epoch_batches(4, seed=3)]
    b2 = [b["meta"]["pos_keys"] for b in ds.epoch_batches(4, seed=3)]
    b3 = [b["meta"]["pos_keys"] for b in ds.epoch_batches(4, seed=4)]
    assert b1 == b2
    assert b1 != b3


@pytest.fixture(scope="module")
def engine(world):
    w = world
    dense_fields = resolve_fields("title_dense,description_dense", "amazon")
    matrix = build_dense_corpus_matrix(
        w["encode_fn"], w["tok"], w["corpus"], dense_fields, batch_size=16
    )
    assert matrix.shape == (40, 2, w["emb"])
    rngW = np.random.default_rng(0)
    mixer = {"weight": jnp.asarray(rngW.normal(size=(w["emb"], 2)).astype(np.float32))}
    return RetrievalEngine(
        field_info=dense_fields,
        doc_keys=list(w["corpus"].keys()),
        encode_fn=w["encode_fn"],
        tokenizer=w["tok"],
        mixer_params=mixer,
        dense_matrix=matrix,
        query_max_length=64,
    ), matrix, mixer


def test_exact_retrieval_matches_naive(world, engine):
    w = world
    eng, matrix, mixer = engine
    queries = list(w["queries"].values())[:5]
    results = eng.retrieve_exact(queries, top_k=7)

    q = np.asarray(eng.encode_queries(queries))
    weights = np.exp(q @ np.asarray(mixer["weight"]))
    weights /= weights.sum(-1, keepdims=True)
    per_field = np.einsum("be,nfe->bnf", q, matrix)
    full = np.einsum("bnf,bf->bn", per_field, weights)
    for i, hits in enumerate(results):
        want_rank = np.argsort(-full[i])[:7]
        got_ids = [w["corpus"].key_to_id[k] for k, _ in hits]
        assert got_ids == list(want_rank)


def test_rerank_mode_agrees_with_exact_on_dense(world, engine):
    """With recall_k = corpus size, the rerank pipeline must reproduce the
    exact ranking (candidates = whole corpus)."""
    w = world
    eng, matrix, mixer = engine
    eng.recall_k = 40
    queries = list(w["queries"].values())[:4]
    exact = eng.retrieve_exact(queries, top_k=5)
    rerank = eng.retrieve_rerank(queries, top_k=5)
    for e_hits, r_hits in zip(exact, rerank):
        assert [k for k, _ in e_hits] == [k for k, _ in r_hits]
        np.testing.assert_allclose(
            [s for _, s in e_hits], [s for _, s in r_hits], rtol=1e-4, atol=1e-4
        )


def test_hybrid_rerank_quality(world):
    """BM25 field carries the signal (random dense encoder): hybrid rerank
    should still retrieve gold docs via the sparse field."""
    w = world
    field_info = w["field_info"]  # title_dense + description_dense + title_sparse
    dense_fields = {k: f for k, f in field_info.items() if f.is_dense}
    matrix = build_dense_corpus_matrix(w["encode_fn"], w["tok"], w["corpus"], dense_fields, batch_size=16)
    sparse_indices = build_sparse_indices(w["corpus"], field_info)
    # global (non-query-conditioned) mixer favoring the sparse field, as a
    # trained mixer would when the dense encoder is uninformative
    # (col order: dense..., sparse)
    mixer = {"weight": jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)}
    eng = RetrievalEngine(
        field_info=field_info,
        doc_keys=list(w["corpus"].keys()),
        encode_fn=w["encode_fn"],
        tokenizer=w["tok"],
        mixer_params=mixer,
        dense_matrix=matrix,
        sparse_indices=sparse_indices,
        query_max_length=64,
        recall_k=20,
    )
    results = eng.retrieve(list(w["queries"].values()), top_k=10)
    ranked = {qid: [k for k, _ in hits] for qid, hits in zip(w["queries"], results)}
    m = evaluate_ranked_ids(w["qrels"], ranked)
    assert m["success_5"] >= 0.8, m

    # masking the sparse field must hurt (dense encoder is random)
    eng.set_mask(np.array([1.0, 1.0, 0.0], np.float32))
    results2 = eng.retrieve(list(w["queries"].values()), top_k=10)
    ranked2 = {qid: [k for k, _ in hits] for qid, hits in zip(w["queries"], results2)}
    m2 = evaluate_ranked_ids(w["qrels"], ranked2)
    assert m2["recip_rank"] < m["recip_rank"]


def test_to_qres(world, engine):
    w = world
    eng, _, _ = engine
    queries = dict(list(w["queries"].items())[:3])
    results = eng.retrieve_exact(list(queries.values()), top_k=4)
    qres = eng.to_qres(list(queries.keys()), results)
    assert len(qres) == 12
    assert qres[0].query_id == list(queries.keys())[0]


def test_engine_handles_non_chunk_multiple_corpus(monkeypatch):
    """Corpora above one top-k chunk need NO chunk-multiple padding: the
    streaming ops process the ragged tail chunk directly (round 3; padding
    previously cost up to ~75% extra HBM for sizes just past a boundary)."""
    import mfar_tpu.eval.retrieval as R

    monkeypatch.setattr(R, "TOPK_CHUNK", 16)
    # Shrink the adaptive score-tile budget so topk_chunk() actually returns
    # the 16-row floor (the default 1 GiB budget would single-shot this
    # corpus and dodge the ragged-tail path under test): 3 queries * 4 B *
    # 16 rows.
    monkeypatch.setattr(R, "TOPK_SCORE_TILE_BYTES", 3 * 4 * 16)
    rng = np.random.default_rng(0)
    n, fd, e = 37, 2, 8
    matrix = rng.normal(size=(n, fd, e)).astype(np.float32)
    q_emb = jnp.asarray(rng.normal(size=(3, e)), jnp.float32)
    field_info = resolve_fields("title_dense,description_dense", "amazon")
    eng = R.RetrievalEngine(
        field_info=field_info,
        doc_keys=[str(i) for i in range(n)],
        encode_fn=lambda ids, mask: q_emb,
        tokenizer=None,
        mixer_params={"weight": jnp.ones((1, fd), jnp.float32)},
        dense_matrix=matrix,
    )
    assert eng.docs_flat.shape[0] == n and eng.n_docs == n
    eng.encode_queries = lambda queries: q_emb  # bypass tokenizer
    res = eng.retrieve(["a", "b", "c"], top_k=5)
    naive = np.einsum("be,nfe->bn", np.asarray(q_emb), matrix) / fd
    for b, hits in enumerate(res):
        assert len(hits) == 5
        want = np.argsort(-naive[b])[:5]
        assert [int(k) for k, _ in hits] == list(want)


def test_int8_engine_honors_approx_selection(world, engine, monkeypatch):
    """dense_topk='approx' must reach the int8 kernel as exact=False (it
    was silently hardcoded to the exact per-chunk sort)."""
    from mfar_tpu.ops import scoring as smod

    real_i8 = smod.fused_dense_topk_from_query_int8  # the fused single-chip
    # int8 program (imported at dispatch time, so the patch takes)

    w = world
    eng, matrix, mixer = engine
    seen = {}

    def spy(*args, **kwargs):
        seen["exact"] = kwargs.get("exact")
        return real_i8(*args, **kwargs)

    monkeypatch.setattr(smod, "fused_dense_topk_from_query_int8", spy)
    eng8 = RetrievalEngine(
        field_info=eng.field_info,
        doc_keys=eng.doc_keys,
        encode_fn=w["encode_fn"],
        tokenizer=w["tok"],
        mixer_params=mixer,
        dense_matrix=matrix,
        query_max_length=64,
        quantize="int8",
        dense_topk="approx",
    )
    eng8.retrieve_exact(list(w["queries"].values())[:3], top_k=5)
    assert seen["exact"] is False
    eng8.dense_topk = "exact"
    eng8.retrieve_exact(list(w["queries"].values())[:3], top_k=5)
    assert seen["exact"] is True


def test_engine_rejects_missing_sparse_index(world, engine):
    """A declared sparse field without an index must fail at construction,
    not with a KeyError on the first query."""
    import pytest

    w = world
    eng, matrix, mixer = engine
    field_info = resolve_fields(
        "title_dense,description_dense,title_sparse", "amazon"
    )
    with pytest.raises(ValueError, match="title_sparse"):
        RetrievalEngine(
            field_info=field_info,
            doc_keys=eng.doc_keys,
            encode_fn=w["encode_fn"],
            tokenizer=w["tok"],
            mixer_params={"weight": jnp.ones((1, 3), jnp.float32)},
            dense_matrix=matrix,
            sparse_indices={},  # missing title_sparse
            query_max_length=64,
        )


def test_quantized_engine_matches_full_precision(world, engine):
    """int8 mode: same top-k ids as the f32 engine on separated scores; no
    full-precision corpus kept on device."""
    w = world
    eng, matrix, mixer = engine
    eng8 = RetrievalEngine(
        field_info=eng.field_info,
        doc_keys=eng.doc_keys,
        encode_fn=w["encode_fn"],
        tokenizer=w["tok"],
        mixer_params=mixer,
        dense_matrix=matrix,
        query_max_length=64,
        quantize="int8",
    )
    assert eng8.docs_flat is None and eng8.docs_q is not None
    assert eng8.docs_q.dtype == jnp.int8
    queries = list(w["queries"].values())[:5]
    full = eng.retrieve_exact(queries, top_k=7)
    quant = eng8.retrieve_exact(queries, top_k=7)

    # ground truth over the DEQUANTIZED corpus: the engine must agree with
    # it exactly (the quantization error itself, vs f32, only reorders
    # near-ties -- checked as overlap below)
    deq = np.asarray(eng8.docs_q, np.float32) * np.asarray(eng8.doc_scales)[:, None]
    deq = deq.reshape(len(eng8.doc_keys), len(eng.dense_keys), -1)
    q = np.asarray(eng8.encode_queries(queries), np.float32)
    wts = np.exp(q @ np.asarray(mixer["weight"]))
    wts /= wts.sum(-1, keepdims=True)
    truth = np.einsum("bnf,bf->bn", np.einsum("be,nfe->bnf", q, deq), wts)
    for i, q_hits in enumerate(quant):
        want = set(np.argsort(-truth[i])[:7])
        got = {w["corpus"].key_to_id[k] for k, _ in q_hits}
        assert got == want
        for k, s in q_hits:
            ref = truth[i][w["corpus"].key_to_id[k]]
            # engine also quantizes the query side -> ~2x the per-side error
            assert abs(s - ref) <= 1e-2 * max(1.0, abs(ref))
    # vs full precision: near-ties may cross the k-boundary, nothing else
    for f_hits, q_hits in zip(full, quant):
        overlap = {k for k, _ in f_hits} & {k for k, _ in q_hits}
        assert len(overlap) >= 5


def test_int8_mesh_engine_matches_single_chip_int8(world, engine):
    """mesh + int8 (round 3): the quantized corpus shards over the mesh and
    every serving mode (exact dense, exact hybrid, rerank) reproduces the
    single-chip int8 rankings exactly -- '2x docs/chip' becomes '2x docs
    per mesh'."""
    from mfar_tpu.parallel.mesh import make_mesh

    w = world
    eng, matrix, mixer = engine
    field_info = resolve_fields(
        "title_dense,description_dense,title_sparse", "amazon"
    )
    sparse_indices = build_sparse_indices(w["corpus"], field_info)
    mixer3 = {"weight": jnp.asarray(
        np.random.default_rng(0).normal(size=(w["emb"], 3)).astype(np.float32)
    )}
    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])

    def build(mesh_arg):
        return RetrievalEngine(
            field_info=field_info,
            doc_keys=list(w["corpus"].keys()),
            encode_fn=w["encode_fn"],
            tokenizer=w["tok"],
            mixer_params=mixer3,
            dense_matrix=matrix,
            sparse_indices={"title_sparse": sparse_indices["title_sparse"]},
            query_max_length=64,
            quantize="int8",
            mesh=mesh_arg,
        )

    single, meshed = build(None), build(mesh)
    assert meshed.docs_q is not None and meshed.docs_flat is None
    queries = list(w["queries"].values())[:5]
    for mode in ("exact", "rerank"):
        want = single.retrieve(queries, top_k=7, mode=mode)
        got = meshed.retrieve(queries, top_k=7, mode=mode)
        for wq, gq in zip(want, got):
            assert [k for k, _ in wq] == [k for k, _ in gq], mode
            np.testing.assert_allclose(
                [s for _, s in wq], [s for _, s in gq], rtol=1e-5, atol=1e-5
            )
