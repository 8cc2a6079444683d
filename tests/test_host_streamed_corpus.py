"""Host-streamed corpus mode: parity with the HBM-resident scan.

The capacity escape hatch (`--corpus-on-host`) matches the reference's
memmap-scan posture (reference mfar/data/index.py:181-222): the corpus
stays in host RAM / on disk and chunks stream H2D double-buffered.  Scores
must match the resident op exactly -- the FE reduction never splits across
chunks, so chunking cannot change fp32 accumulation order.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mfar_tpu.ops.scoring import dense_topk_chunked, dense_topk_host_streamed


@pytest.mark.parametrize("n,chunk", [(1000, 256), (512, 512), (700, 1024)])
def test_streamed_matches_resident(n, chunk):
    rng = np.random.default_rng(0)
    docs = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(5, 64)).astype(np.float32)
    k = 50
    s1, i1 = dense_topk_host_streamed(jnp.asarray(q), docs, k, chunk_size=chunk)
    s2, i2 = dense_topk_chunked(
        jnp.asarray(q), jnp.asarray(docs), jnp.int32(n), k, chunk_size=chunk
    )
    # ids identical; scores to last-ULP tolerance (the streamed tail chunk
    # pads to the compiled shape, so its matmul vectorizes differently)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-6)


def test_streamed_k_exceeds_chunk():
    """k > chunk_size works streamed (the carry accumulates across chunks;
    the resident op asserts this case out) -- checked against brute force."""
    rng = np.random.default_rng(3)
    n, k, chunk = 90, 50, 32
    docs = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(5, 64)).astype(np.float32)
    s, i = dense_topk_host_streamed(jnp.asarray(q), docs, k, chunk_size=chunk)
    truth = q @ docs.T
    order = np.argsort(-truth, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(i), order)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(truth, order, 1), rtol=1e-5, atol=1e-5
    )


def test_streamed_memmap_and_transfer_dtype(tmp_path):
    """A disk-backed np.memmap corpus streams without materializing, and the
    bf16 transfer dtype matches a bf16-resident corpus bit-for-bit."""
    rng = np.random.default_rng(1)
    n, e, k = 600, 64, 20
    docs = rng.normal(size=(n, e)).astype(np.float32)
    path = tmp_path / "corpus.dat"
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, e))
    mm[:] = docs
    mm.flush()
    mm = np.memmap(path, dtype=np.float32, mode="r", shape=(n, e))
    q = rng.normal(size=(3, e)).astype(np.float32)

    s1, i1 = dense_topk_host_streamed(
        jnp.asarray(q), mm, k, chunk_size=256, transfer_dtype=jnp.bfloat16
    )
    s2, i2 = dense_topk_chunked(
        jnp.asarray(q, jnp.bfloat16).astype(jnp.bfloat16),
        jnp.asarray(docs, jnp.bfloat16), jnp.int32(n), k, chunk_size=256,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-6)


def test_k_exceeds_corpus():
    rng = np.random.default_rng(2)
    docs = rng.normal(size=(7, 16)).astype(np.float32)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    s, i = dense_topk_host_streamed(jnp.asarray(q), docs, 10, chunk_size=4)
    assert s.shape == (2, 10) and np.all(np.asarray(s)[:, 7:] == -np.inf)


@pytest.mark.parametrize("n,chunk", [(1000, 256), (300, 512), (520, 256)])
def test_distributed_streamed_matches_single_chip(n, chunk):
    """The mesh host stream (chunks sharded over the corpus axis, shard_map
    scan per chunk) returns the same ids as the single-chip stream; scores
    to fp32 tolerance (different reduction layouts)."""
    import jax
    from jax.sharding import Mesh

    from mfar_tpu.parallel.topk import distributed_dense_topk_host_streamed

    rng = np.random.default_rng(5)
    docs = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(4, 64)).astype(np.float32)
    k = 30
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8, 1),
                axis_names=("replica", "data", "model"))
    s1, i1 = distributed_dense_topk_host_streamed(
        mesh, jnp.asarray(q), docs, k, chunk_size=chunk, axis="data"
    )
    s2, i2 = dense_topk_host_streamed(jnp.asarray(q), docs, k, chunk_size=chunk)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,chunk", [(1000, 256), (300, 512)])
def test_distributed_streamed_int8_matches_single_chip(n, chunk):
    import jax
    from jax.sharding import Mesh

    from mfar_tpu.ops.scoring import (
        dense_topk_host_streamed_int8,
        quantize_rows_int8_np,
    )
    from mfar_tpu.parallel.topk import distributed_dense_topk_host_streamed_int8

    rng = np.random.default_rng(6)
    docs = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(4, 64)).astype(np.float32)
    dq, ds = quantize_rows_int8_np(docs)
    k = 30
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8, 1),
                axis_names=("replica", "data", "model"))
    s1, i1 = distributed_dense_topk_host_streamed_int8(
        mesh, jnp.asarray(q), dq, ds, k, chunk_size=chunk, axis="data"
    )
    s2, i2 = dense_topk_host_streamed_int8(jnp.asarray(q), dq, ds, k, chunk_size=chunk)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,chunk", [(1000, 256), (300, 512)])
def test_streamed_int8_matches_resident_int8(n, chunk):
    from mfar_tpu.ops.scoring import (
        dense_topk_chunked_int8,
        dense_topk_host_streamed_int8,
        quantize_rows_int8_np,
    )

    rng = np.random.default_rng(4)
    docs = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(5, 64)).astype(np.float32)
    dq, ds = quantize_rows_int8_np(docs)
    k = 40
    s1, i1 = dense_topk_host_streamed_int8(jnp.asarray(q), dq, ds, k, chunk_size=chunk)
    s2, i2 = dense_topk_chunked_int8(
        jnp.asarray(q), jnp.asarray(dq), jnp.asarray(ds), jnp.int32(n), k,
        chunk_size=chunk,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-6)


@pytest.mark.parametrize("n,chunk", [(1000, 256), (300, 512)])
def test_hybrid_streamed_matches_resident(n, chunk):
    """Both sparse representations of the hybrid host stream (per-chunk
    postings scatter; streamed combined tensor) match the resident
    hybrid_topk_chunked ids exactly."""
    from mfar_tpu.ops.scoring import hybrid_topk_chunked, hybrid_topk_host_streamed

    rng = np.random.default_rng(7)
    b, k = 4, 30
    docs = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(b, 64)).astype(np.float32)
    m = 64  # postings per query
    ids = rng.integers(0, n, size=(b, m)).astype(np.int32)
    wvals = np.abs(rng.normal(size=(b, m))).astype(np.float32) * 3
    comb = np.zeros((b, n), np.float32)
    np.add.at(comb, (np.arange(b)[:, None], ids), wvals)

    want_s, want_i = hybrid_topk_chunked(
        jnp.asarray(q), jnp.asarray(docs), jnp.asarray(comb), jnp.int32(n),
        k=k, chunk_size=chunk,
    )
    got_s, got_i = hybrid_topk_host_streamed(
        jnp.asarray(q), docs, k, chunk_size=chunk,
        post_ids=jnp.asarray(ids), post_wvals=jnp.asarray(wvals),
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)

    got_s2, got_i2 = hybrid_topk_host_streamed(
        jnp.asarray(q), docs, k, chunk_size=chunk, sparse_comb_host=comb
    )
    np.testing.assert_array_equal(np.asarray(got_i2), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s2), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,chunk", [(1000, 256), (300, 512)])
def test_hybrid_streamed_int8_matches_resident_int8(n, chunk):
    """Hybrid x int8 host stream (both sparse representations) matches the
    resident hybrid_topk_chunked_int8 exactly -- same quantized corpus, so
    the stream introduces no additional error."""
    from mfar_tpu.ops.scoring import (
        hybrid_topk_chunked_int8,
        hybrid_topk_host_streamed_int8,
        quantize_rows_int8_np,
    )

    rng = np.random.default_rng(8)
    b, k, m = 4, 30, 64
    docs = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(b, 64)).astype(np.float32)
    dq, ds = quantize_rows_int8_np(docs)
    ids = rng.integers(0, n, size=(b, m)).astype(np.int32)
    wvals = np.abs(rng.normal(size=(b, m))).astype(np.float32) * 3
    comb = np.zeros((b, n), np.float32)
    np.add.at(comb, (np.arange(b)[:, None], ids), wvals)

    want_s, want_i = hybrid_topk_chunked_int8(
        jnp.asarray(q), jnp.asarray(dq), jnp.asarray(ds), jnp.asarray(comb),
        jnp.int32(n), k=k, chunk_size=chunk,
    )
    got_s, got_i = hybrid_topk_host_streamed_int8(
        jnp.asarray(q), dq, ds, k, chunk_size=chunk,
        post_ids=jnp.asarray(ids), post_wvals=jnp.asarray(wvals),
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)

    got_s2, got_i2 = hybrid_topk_host_streamed_int8(
        jnp.asarray(q), dq, ds, k, chunk_size=chunk, sparse_comb_host=comb
    )
    np.testing.assert_array_equal(np.asarray(got_i2), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s2), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,chunk", [(1000, 256), (300, 512)])
def test_distributed_hybrid_streamed_matches_single_chip(n, chunk):
    """Hybrid x mesh host stream (per-chunk rows sharded, postings scatter
    per shard) reproduces the single-chip hybrid stream for both sparse
    representations."""
    import jax
    from jax.sharding import Mesh

    from mfar_tpu.ops.scoring import hybrid_topk_host_streamed
    from mfar_tpu.parallel.topk import distributed_hybrid_topk_host_streamed

    rng = np.random.default_rng(9)
    b, k, m = 4, 30, 64
    docs = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(b, 64)).astype(np.float32)
    ids = rng.integers(0, n, size=(b, m)).astype(np.int32)
    wvals = np.abs(rng.normal(size=(b, m))).astype(np.float32) * 3
    comb = np.zeros((b, n), np.float32)
    np.add.at(comb, (np.arange(b)[:, None], ids), wvals)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8, 1),
                axis_names=("replica", "data", "model"))

    want_s, want_i = hybrid_topk_host_streamed(
        jnp.asarray(q), docs, k, chunk_size=chunk,
        post_ids=jnp.asarray(ids), post_wvals=jnp.asarray(wvals),
    )
    got_s, got_i = distributed_hybrid_topk_host_streamed(
        mesh, jnp.asarray(q), docs, k, chunk_size=chunk,
        post_ids=ids, post_wvals=wvals, axis="data",
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)

    got_s2, got_i2 = distributed_hybrid_topk_host_streamed(
        mesh, jnp.asarray(q), docs, k, chunk_size=chunk,
        sparse_comb_host=comb, axis="data",
    )
    np.testing.assert_array_equal(np.asarray(got_i2), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s2), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,chunk", [(1000, 256), (300, 512)])
def test_distributed_hybrid_streamed_int8_matches_single_chip(n, chunk):
    """All three capacity knobs composed (host stream x int8 x mesh) match
    the single-chip int8 hybrid stream."""
    import jax
    from jax.sharding import Mesh

    from mfar_tpu.ops.scoring import (
        hybrid_topk_host_streamed_int8,
        quantize_rows_int8_np,
    )
    from mfar_tpu.parallel.topk import (
        distributed_hybrid_topk_host_streamed_int8,
    )

    rng = np.random.default_rng(10)
    b, k, m = 4, 30, 64
    docs = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(b, 64)).astype(np.float32)
    dq, ds = quantize_rows_int8_np(docs)
    ids = rng.integers(0, n, size=(b, m)).astype(np.int32)
    wvals = np.abs(rng.normal(size=(b, m))).astype(np.float32) * 3
    comb = np.zeros((b, n), np.float32)
    np.add.at(comb, (np.arange(b)[:, None], ids), wvals)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8, 1),
                axis_names=("replica", "data", "model"))

    want_s, want_i = hybrid_topk_host_streamed_int8(
        jnp.asarray(q), dq, ds, k, chunk_size=chunk,
        post_ids=jnp.asarray(ids), post_wvals=jnp.asarray(wvals),
    )
    got_s, got_i = distributed_hybrid_topk_host_streamed_int8(
        mesh, jnp.asarray(q), dq, ds, k, chunk_size=chunk,
        post_ids=ids, post_wvals=wvals, axis="data",
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)

    got_s2, got_i2 = distributed_hybrid_topk_host_streamed_int8(
        mesh, jnp.asarray(q), dq, ds, k, chunk_size=chunk,
        sparse_comb_host=comb, axis="data",
    )
    np.testing.assert_array_equal(np.asarray(got_i2), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s2), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)


def test_retrieve_cli_hybrid_corpus_on_host(tmp_path):
    """Hybrid (dense+BM25) retrieval through the CLI with a host corpus
    matches the resident engine ranking exactly (f32)."""
    from mfar_tpu.commands import (
        create_sparse_index,
        make_synth_data,
        retrieve as retrieve_cmd,
    )
    from mfar_tpu.data import trec

    ds, idx = str(tmp_path / "ds"), str(tmp_path / "idx")
    make_synth_data.main(["--out", ds, "--n-docs", "40", "--n-train", "8", "--n-val", "4"])
    create_sparse_index.main(["--data-path", ds, "--dataset-name", "amazon",
                              "--output-path", idx,
                              "--fields-str", "title_sparse,single_sparse"])
    base = ["--dataset-name", "amazon", "--data", ds, "--lexical-index", idx,
            "--field-names", "title_dense,title_sparse", "--model-name", "synthetic",
            "--partition", "val", "--recall-k", "10", "--top-k", "10",
            "--dense-dtype", "f32"]
    out_res = str(tmp_path / "res.qres")
    retrieve_cmd.main(base + ["--out", out_res, "--mesh", "off"])
    out_host = str(tmp_path / "host.qres")
    retrieve_cmd.main(base + ["--out", out_host, "--corpus-on-host"])
    rows = lambda p: [(r.query_id, r.doc_id, r.rank) for r in trec.QRes.from_file(p)]
    assert rows(out_host) == rows(out_res) and rows(out_host)


def test_mask_fields_sweep_corpus_on_host(tmp_path):
    """The full mask_fields ablation sweep runs against a host-streamed
    corpus (the beyond-HBM posture) and reproduces the resident sweep's
    metrics line-for-line (VERDICT r3 item 5)."""
    import json
    import os

    from mfar_tpu.commands import (
        create_sparse_index,
        make_synth_data,
        mask_fields as mask_cmd,
        train as train_cmd,
    )

    ds, idx, run = (str(tmp_path / k) for k in ("ds", "idx", "run"))
    make_synth_data.main(["--out", ds, "--n-docs", "30", "--n-train", "6", "--n-val", "3"])
    create_sparse_index.main(["--data-path", ds, "--dataset-name", "amazon",
                              "--output-path", idx,
                              "--fields-str", "title_sparse,single_sparse"])
    train_cmd.main([
        "--dataset-name", "amazon", "--data", ds, "--out", run,
        "--lexical-index", idx, "--field-names", "title_dense,title_sparse",
        "--model-name", "synthetic", "--weights-lr", "0.1",
        "--train-batch-size", "4", "--max-epochs", "1", "--run-one-iteration",
        "--recall-k", "10", "--dev-batch-size", "8",
    ])
    base = ["--dataset-name", "amazon", "--data", ds,
            "--lexical-index", idx, "--checkpoint-dir", run,
            "--field-names", "title_dense,title_sparse",
            "--model-name", "synthetic", "--recall-k", "10",
            "--dev-batch-size", "8", "--mesh", "off"]

    def sweep(out, extra):
        mask_cmd.main(base + ["--out", out] + extra)
        lines = [json.loads(l) for l in open(os.path.join(out, "results_dicts.jsonl"))]
        return [
            {k: round(v, 4) if isinstance(v, float) else v
             for k, v in l.items() if k != "wall_s"}
            for l in lines
        ]

    resident = sweep(str(tmp_path / "resident"), [])
    host = sweep(str(tmp_path / "host"), ["--corpus-on-host"])
    assert len(resident) > 1  # full sweep, not just the baseline
    assert host == resident


def test_npy_index_roundtrip_and_streamed_build(tmp_path):
    """encode_corpus --out .npy: the build streams into a disk memmap
    (identical to the in-RAM build), load_dense_matrix memory-maps it, and
    retrieve --dense-index <npy> --corpus-on-host serves straight from disk
    with the same ranking as the npz + resident path."""
    from mfar_tpu.commands import (
        encode_corpus as encode_cmd,
        make_synth_data,
        retrieve as retrieve_cmd,
    )
    from mfar_tpu.data import trec
    from mfar_tpu.eval.index_build import load_dense_matrix

    ds = str(tmp_path / "ds")
    make_synth_data.main(["--out", ds, "--n-docs", "25", "--n-train", "6", "--n-val", "3"])
    common = ["--dataset-name", "amazon", "--data", ds,
              "--field-names", "title_dense,description_dense",
              "--model-name", "synthetic"]
    npz, npy = str(tmp_path / "idx.npz"), str(tmp_path / "idx.npy")
    encode_cmd.main(common + ["--out", npz, "--mesh", "off"])
    encode_cmd.main(common + ["--out", npy, "--mesh", "off"])

    m_npz, k_npz = load_dense_matrix(npz)
    m_npy, k_npy = load_dense_matrix(npy)
    assert isinstance(m_npy, np.memmap) and k_npy == k_npz
    np.testing.assert_array_equal(np.asarray(m_npy), m_npz)

    base = common + ["--partition", "val", "--recall-k", "10", "--top-k", "10",
                     "--dense-dtype", "f32"]
    out_res = str(tmp_path / "res.qres")
    retrieve_cmd.main(base + ["--out", out_res, "--dense-index", npz, "--mesh", "off"])
    out_mm = str(tmp_path / "mm.qres")
    retrieve_cmd.main(base + ["--out", out_mm, "--dense-index", npy,
                              "--corpus-on-host"])
    rows = lambda p: [(r.query_id, r.doc_id, r.rank) for r in trec.QRes.from_file(p)]
    assert rows(out_mm) == rows(out_res) and rows(out_mm)


def test_microbatcher_serves_host_streamed_engine():
    """The online daemon's batcher composes with corpus_on_host (shared
    engine construction: the serve CLI inherits the flag via build_engine)."""
    import jax

    from tests.synth import make_amazon_corpus, make_queries_and_qrels

    from mfar_tpu.data.schema import resolve_fields
    from mfar_tpu.eval.index_build import build_dense_corpus_matrix
    from mfar_tpu.eval.retrieval import RetrievalEngine
    from mfar_tpu.models import Encoder, EncoderConfig, SimpleVocabTokenizer
    from mfar_tpu.models.encoder import init_params
    from mfar_tpu.serve import MicroBatcher

    corpus = make_amazon_corpus(30)
    queries, _ = make_queries_and_qrels(corpus, n_queries=6)
    field_info = resolve_fields("title_dense", "amazon")
    from mfar_tpu.data.format import format_documents

    texts = [t for _, t in format_documents(corpus.pairs(), "title", "amazon")]
    tok = SimpleVocabTokenizer.build(texts + list(queries.values()), max_length=64)
    config = EncoderConfig.tiny(vocab_size=tok.vocab_size)
    params = init_params(config)
    model = Encoder(config)

    @jax.jit
    def encode_fn(ids, mask):
        return model.apply({"params": params}, ids, mask)

    matrix = build_dense_corpus_matrix(encode_fn, tok, corpus, field_info)
    rngW = np.random.default_rng(0)
    mixer = {"weight": jnp.asarray(
        rngW.normal(size=(config.hidden_size, 1)).astype(np.float32))}

    def build(**kw):
        return RetrievalEngine(
            field_info=field_info, doc_keys=list(corpus.keys()),
            encode_fn=encode_fn, tokenizer=tok, mixer_params=mixer,
            dense_matrix=matrix, query_max_length=64, **kw,
        )

    host_eng = build(corpus_on_host=True)
    resident = build()
    qs = list(queries.values())[:4]
    b = MicroBatcher(host_eng, max_batch=4, max_wait_ms=1.0, top_k=5).start()
    try:
        got = b.submit(qs)
    finally:
        b.stop()
    want = resident.retrieve(qs, top_k=5)
    assert [[k for k, _ in h] for h in got] == [[k for k, _ in h] for h in want]


def test_retrieve_cli_corpus_on_host(tmp_path):
    """The serving CLI with --corpus-on-host writes the same ranking as the
    default HBM-resident engine (f32, mesh off for a like-for-like single
    program), in BOTH modes (exact and the rerank compat mode, whose
    stage-2 gathers candidate rows from the host corpus)."""
    from mfar_tpu.commands import make_synth_data, retrieve as retrieve_cmd
    from mfar_tpu.data import trec

    ds = str(tmp_path / "ds")
    make_synth_data.main(["--out", ds, "--n-docs", "30", "--n-train", "6", "--n-val", "3"])
    base = [
        "--dataset-name", "amazon", "--data", ds,
        "--field-names", "title_dense,description_dense",
        "--model-name", "synthetic", "--partition", "val",
        "--recall-k", "10", "--top-k", "10", "--dense-dtype", "f32",
    ]
    out_res = str(tmp_path / "resident.qres")
    retrieve_cmd.main(base + ["--out", out_res, "--mesh", "off"])
    out_host = str(tmp_path / "host.qres")
    retrieve_cmd.main(base + ["--out", out_host, "--corpus-on-host"])

    rows = lambda p: [(r.query_id, r.doc_id, r.rank) for r in trec.QRes.from_file(p)]
    assert rows(out_host) == rows(out_res) and rows(out_host)

    out_rr = str(tmp_path / "resident_rerank.qres")
    retrieve_cmd.main(base + ["--out", out_rr, "--mesh", "off",
                              "--mode", "rerank"])
    out_hr = str(tmp_path / "host_rerank.qres")
    retrieve_cmd.main(base + ["--out", out_hr, "--corpus-on-host",
                              "--mode", "rerank"])
    assert rows(out_hr) == rows(out_rr) and rows(out_hr)

    # int8 composes with the host stream: same candidate set up to the
    # ~0.5% quantization score error (near-ties may cross the k boundary)
    out_i8 = str(tmp_path / "host_i8.qres")
    retrieve_cmd.main(base + ["--out", out_i8, "--corpus-on-host",
                              "--quantize", "int8"])
    ids = {(q, d) for q, d, _ in rows(out_res)}
    ids8 = {(q, d) for q, d, _ in rows(out_i8)}
    assert len(ids & ids8) >= int(0.8 * len(ids))
