"""Unit tests for the data-pipeline helpers: prefetch + batch counting."""

import time

import pytest

from mfar_tpu.train.data_pipeline import prefetch


def test_prefetch_preserves_order_and_items():
    assert list(prefetch(iter(range(50)), depth=3)) == list(range(50))


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_overlaps_production():
    """Consumer work overlaps producer work: total wall time is well under
    the serial sum."""
    def slow_gen():
        for i in range(5):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_gen(), depth=2):
        time.sleep(0.05)  # consumer-side work
    elapsed = time.perf_counter() - t0
    assert elapsed < 0.45, elapsed  # serial would be ~0.5s


def test_prefetch_early_exit_unblocks_worker():
    """Abandoning the iterator mid-stream must not leave the worker thread
    blocked forever on a full queue."""
    import threading

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=1)
    next(it)
    it.close()  # GeneratorExit -> finally -> stop event
    deadline = time.time() + 5
    while threading.active_count() > 20 and time.time() < deadline:
        time.sleep(0.01)
    # the worker stopped early: nowhere near 1000 items were produced
    time.sleep(0.3)
    assert len(produced) < 20, len(produced)


def test_num_batches_matches_epoch_batches():
    from tests.synth import make_amazon_corpus, make_queries_and_qrels

    from mfar_tpu.data.format import format_documents
    from mfar_tpu.data.schema import resolve_fields
    from mfar_tpu.models import SimpleVocabTokenizer
    from mfar_tpu.train.data_pipeline import ContrastiveDataset

    corpus = make_amazon_corpus(20)
    queries, qrels = make_queries_and_qrels(corpus, n_queries=11)
    field_info = resolve_fields("title_dense", "amazon")
    texts = [t for _, t in format_documents(corpus.pairs(), "title", "amazon")]
    tok = SimpleVocabTokenizer.build(texts + list(queries.values()), max_length=32)
    ds = ContrastiveDataset(queries, corpus, qrels, None, field_info, tok)

    for bs in (2, 3, 4, 11, 16):
        for drop in (True, False):
            want = len(list(ds.epoch_batches(bs, seed=0, drop_remainder=drop)))
            assert ds.num_batches(bs, drop_remainder=drop) == want, (bs, drop)


def test_sparse_cache_empty_query_rows_survive_roundtrip(tmp_path):
    """A query whose scores are all zero must stay PRESENT through the npy
    round-trip (the trainer enables the precomputed cache only when every
    batch qid is covered; an absent qid silently disabled it per batch)."""
    from mfar_tpu.train.sparse_cache import load_field_scores, save_field_scores

    save_field_scores(str(tmp_path), "f", {1: {2: 0.5, 3: 1.25}, 7: {}})
    out = load_field_scores(str(tmp_path), "f")
    assert out[7] == {}
    assert out[1] == {2: 0.5, 3: 1.25}


def test_token_stats_counts_mask_and_size():
    import numpy as np

    from mfar_tpu.train.data_pipeline import token_stats

    def toks(mask_rows):
        m = np.asarray(mask_rows, np.int32)
        return {"input_ids": np.ones_like(m), "attention_mask": m}

    batch = {
        "query": toks([[1, 1, 0, 0], [1, 1, 1, 1]]),
        "pos": {"f_dense": toks([[1, 0], [1, 1]])},
        "neg": {},  # empty side must not crash
        "meta": {"ignored": True},
    }
    s = token_stats(batch)
    assert s == {"tokens_real": 6 + 3, "tokens_total": 8 + 4}


def test_stark_like_token_lengths_shape():
    """The documented distribution: clipped to [2, budget], long fields
    median well under budget, short fields far under."""
    import numpy as np

    from mfar_tpu.data.synth import stark_like_token_lengths

    rng = np.random.default_rng(0)
    long = stark_like_token_lengths(512, 20000, rng)
    short = stark_like_token_lengths(64, 20000, rng)
    assert long.min() >= 2 and long.max() <= 512
    assert short.min() >= 2 and short.max() <= 64
    assert 0.25 * 512 < np.median(long) < 0.45 * 512
    assert np.median(short) < 0.3 * 64
    # reproducible given the generator state
    r2 = np.random.default_rng(0)
    assert (stark_like_token_lengths(512, 100, r2)
            == stark_like_token_lengths(512, 100, np.random.default_rng(0))).all()
