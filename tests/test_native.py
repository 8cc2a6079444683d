"""Native C++ engine parity against the python/scipy implementations."""

import os

import numpy as np
import pytest

from mfar_tpu import native
from mfar_tpu.sparse.bm25 import BM25Index
from mfar_tpu.sparse.stemmer import porter2_stem
from mfar_tpu.sparse.tokenize import tokenize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C mfar_tpu/native)"
)

DOCS = [
    ("d0", "the red shoe glows brightly at night"),
    ("d1", "a blue lamp that glows in the dark"),
    ("d2", "red lamp red shoe red clock"),
    ("d3", "green table with a matching green chair; nationally rated!"),
    ("d4", ""),
    ("d5", "shoe shoe shoe shoe running easily generation"),
]
QUERIES = ["red shoe", "glows", "green chair table", "red red lamp",
           "running generation", "zebra missing", ""]


def test_stemmer_parity():
    words = """running fairly easily generation national skies dying agreed
    conflated troubling hopping happy relational generously communication
    abilities absorption atomization consciousness libraries knitting
    proceed exceed ties cries gas this gaps congeneric beautiful""".split()
    for w in words:
        assert native.native_stem(w) == porter2_stem(w), w


def test_tokenizer_parity():
    texts = [t for _, t in DOCS] + [
        "Hello, World! это test_underscore 42 a7b",
        "MixedCASE    punctuation...and---dashes",
    ]
    for t in texts:
        assert native.native_tokenize(t) == list(tokenize(t)), t


def test_scores_parity():
    scipy_idx = BM25Index.create(DOCS, backend="scipy")
    native_idx = BM25Index.create(DOCS, backend="native")
    assert native_idx.native is not None
    assert native_idx.vocab_size == scipy_idx.vocab_size
    for q in QUERIES:
        np.testing.assert_allclose(
            native_idx.get_scores(q), scipy_idx.get_scores(q), rtol=1e-5, atol=1e-6, err_msg=q
        )


def test_retrieve_and_score_batch_parity():
    scipy_idx = BM25Index.create(DOCS, backend="scipy")
    native_idx = BM25Index.create(DOCS, backend="native")
    hits_n = native_idx.retrieve_batch(["red shoe", "glows"], top_k=3)
    hits_s = scipy_idx.retrieve_batch(["red shoe", "glows"], top_k=3)
    for hn, hs in zip(hits_n, hits_s):
        np.testing.assert_allclose(
            sorted(s for _, s in hn), sorted(s for _, s in hs), rtol=1e-5
        )
    got = native_idx.score_batch(["red shoe"], ["d2", "nope", "d0"])
    want = scipy_idx.score_batch(["red shoe"], ["d2", "nope", "d0"])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_native_save_load_roundtrip(tmp_path):
    idx = BM25Index.create(DOCS, backend="native")
    idx.save(str(tmp_path / "nidx"))
    back = BM25Index.load(str(tmp_path / "nidx"))
    assert back.native is not None
    np.testing.assert_allclose(
        back.get_scores("red shoe"), idx.get_scores("red shoe"), rtol=1e-6
    )
    assert back.keys == idx.keys


def test_native_scoring_speed_sanity():
    """The native engine must comfortably beat the scipy fallback on the
    perf-critical surface: full-corpus scoring (SURVEY.md section 2.1).
    Builds are a wash (the python path amortizes a tokenization lru cache),
    measured ~10x on scoring; asserted at 2x so scheduler noise can't flake
    the suite."""
    import time

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(2000)]
    docs = [(str(i), " ".join(rng.choice(vocab, size=60))) for i in range(800)]
    idx_native = BM25Index.create(docs, backend="native")
    idx_scipy = BM25Index.create(docs, backend="scipy")
    queries = [" ".join(rng.choice(vocab, size=8)) for _ in range(300)]

    def score_time(idx):
        t0 = time.perf_counter()
        for q in queries:  # unique queries: the per-index score cache never hits
            idx.get_scores(q)
        return time.perf_counter() - t0

    t_scipy = score_time(idx_scipy)
    t_native = score_time(idx_native)
    print(f"scoring 300q: native {t_native*1000:.0f}ms vs python {t_scipy*1000:.0f}ms")
    assert t_native * 2 < t_scipy


def test_batched_postings_matches_per_query():
    """Round 3: the batched+threaded postings entry returns exactly what the
    per-query API returns (same order, same padding contract), at 1 and 4
    threads."""
    idx = native.NativeBM25.create([t for _, t in DOCS])
    queries = ["red shoe", "glows", "", "red red lamp", "zebra missing"]
    for n_threads in (1, 4):
        out = idx.get_postings_batch(queries, pad_multiple=8, n_threads=n_threads)
        assert out is not None
        ids, vals = out
        assert ids.shape == vals.shape and ids.shape[0] == len(queries)
        assert ids.shape[1] % 8 == 0
        for qi, q in enumerate(queries):
            want_ids, want_vals = idx.get_postings(q)
            n = len(want_ids)
            np.testing.assert_array_equal(ids[qi, :n], want_ids)
            np.testing.assert_allclose(vals[qi, :n], want_vals, rtol=1e-6)
            assert (vals[qi, n:] == 0).all() and (ids[qi, n:] == 0).all()


def test_threaded_score_batch_matches_serial():
    idx = native.NativeBM25.create([t for _, t in DOCS])
    queries = ["red shoe", "glows", "green chair table"]
    want = np.stack([idx.get_scores(q) for q in queries])
    for n_threads in (1, 3):
        got = idx.get_scores_batch(queries, n_threads=n_threads)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bm25index_batched_postings_densify_like_scipy():
    """BM25Index.get_postings_batch (one native batched call) densifies to
    the same score vectors as the scipy fallback engine."""
    nat = BM25Index.create(DOCS)
    ref = BM25Index.create(DOCS, backend="scipy")
    queries = ["red shoe", "glows", "red red lamp"]
    ids_n, vals_n = nat.get_postings_batch(queries, pad_multiple=4)
    ids_r, vals_r = ref.get_postings_batch(queries, pad_multiple=4)
    n = len(DOCS)
    dn = np.zeros((len(queries), n), np.float32)
    dr = np.zeros((len(queries), n), np.float32)
    for qi in range(len(queries)):
        np.add.at(dn[qi], ids_n[qi], vals_n[qi])
        np.add.at(dr[qi], ids_r[qi], vals_r[qi])
    np.testing.assert_allclose(dn, dr, rtol=1e-5, atol=1e-6)


def test_tokenizer_unicode_parity_with_python():
    """The C++ tokenizer must match the python (?u)\\b\\w\\w+\\b spec on
    non-ASCII text: typographic punctuation splits tokens, accented
    letters keep their words and lowercase correctly (old behavior glued
    multi-byte punctuation into tokens and skipped non-ASCII lowercasing,
    so native and scipy indexes diverged on any real-world corpus)."""
    from mfar_tpu.sparse.tokenize import tokenize

    cases = [
        "foo—bar baz",          # em-dash
        "don’t panic",          # curly apostrophe
        "CAFÉ au lait",         # uppercase accent
        "naïve résumé",
        "price… unknown",       # ellipsis
        "«quoted» words",  # guillemets
        "中文、测试",  # CJK + ideographic comma
        "emoji \U0001F600 test",
        "Ηλιος Москва",
        "x" * 100 + " longtoken",    # long-token stem parity
        "é a xy",               # 1-codepoint words dropped (\w\w+)
    ]
    for text in cases:
        assert native.native_tokenize(text) == list(tokenize(text, stem=True)), text


def test_native_load_rejects_corrupt_index(tmp_path):
    """A truncated/garbage index file must fail cleanly (python-level
    error), not crash the process via an exception crossing the C ABI."""
    import pytest

    good = native.NativeBM25.create([t for _, t in DOCS])
    path = str(tmp_path / "idx.bin")
    good.save(path)
    data = open(path, "rb").read()

    trunc = str(tmp_path / "trunc.bin")
    open(trunc, "wb").write(data[: len(data) // 2])
    with pytest.raises(Exception):
        native.NativeBM25.load(trunc)

    garbage = str(tmp_path / "garbage.bin")
    open(garbage, "wb").write(os.urandom(64))
    with pytest.raises(Exception):
        native.NativeBM25.load(garbage)
