"""Online serving daemon: micro-batching, HTTP surface, padding contract."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.synth import make_amazon_corpus, make_queries_and_qrels

from mfar_tpu.data.schema import resolve_fields
from mfar_tpu.eval.index_build import build_dense_corpus_matrix, build_sparse_indices
from mfar_tpu.eval.retrieval import RetrievalEngine
from mfar_tpu.models import Encoder, EncoderConfig, SimpleVocabTokenizer
from mfar_tpu.models.encoder import init_params
from mfar_tpu.serve import MicroBatcher, RetrievalServer


@pytest.fixture(scope="module")
def world():
    corpus = make_amazon_corpus(40)
    queries, _ = make_queries_and_qrels(corpus, n_queries=12)
    field_info = resolve_fields("title_dense,title_sparse", "amazon")
    from mfar_tpu.data.format import format_documents

    texts = []
    for fk, f in field_info.items():
        texts += [t for _, t in format_documents(corpus.pairs(), f.name, "amazon")]
    tok = SimpleVocabTokenizer.build(texts + list(queries.values()) + ["warmup"],
                                     max_length=64)
    config = EncoderConfig.tiny(vocab_size=tok.vocab_size)
    params = init_params(config)
    model = Encoder(config)

    @jax.jit
    def encode_fn(ids, mask):
        return model.apply({"params": params}, ids, mask)

    dense_fields = {k: f for k, f in field_info.items() if f.is_dense}
    matrix = build_dense_corpus_matrix(encode_fn, tok, corpus, dense_fields)
    rngW = np.random.default_rng(0)
    engine = RetrievalEngine(
        field_info=field_info,
        doc_keys=list(corpus.keys()),
        encode_fn=encode_fn,
        tokenizer=tok,
        mixer_params={"weight": jnp.asarray(
            rngW.normal(size=(config.hidden_size, 2)).astype(np.float32))},
        dense_matrix=matrix,
        sparse_indices=build_sparse_indices(corpus, field_info),
        query_max_length=64,
    )
    return dict(engine=engine, queries=list(queries.values()))


def test_microbatcher_coalesces_and_matches_engine(world):
    """Concurrent submits must coalesce into shared dispatches and return
    exactly what a direct engine call returns for each query."""
    eng, queries = world["engine"], world["queries"]
    b = MicroBatcher(eng, max_batch=8, max_wait_ms=200.0, top_k=5).start()
    try:
        results = [None] * 4
        def call(i):
            results[i] = b.submit([queries[2 * i], queries[2 * i + 1]])
        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        want = eng.retrieve(queries[:8], top_k=5)
        got = [hit for r in results for hit in r]
        for g, w in zip(got, want):
            assert [k for k, _ in g] == [k for k, _ in w]
        st = b.stats()
        assert st["queries"] == 8 and st["requests"] == 4
        # 8 queries into max_batch=8 with a wide window: ideally one
        # dispatch, but thread scheduling may split it; padding accounts
        # for any shortfall.
        assert st["batches"] >= 1
    finally:
        b.stop()


def test_microbatcher_pads_to_one_shape(world):
    """A lone small request must be padded up to max_batch (the one
    compiled shape) and per-request top_k sliced from the served depth."""
    eng, queries = world["engine"], world["queries"]
    b = MicroBatcher(eng, max_batch=8, max_wait_ms=1.0, top_k=5).start()
    try:
        out = b.submit([queries[0]], top_k=3)
        assert len(out) == 1 and len(out[0]) == 3
        st = b.stats()
        assert st["padded"] == 7 and st["queries"] == 1
        with pytest.raises(ValueError):
            b.submit([queries[0]], top_k=50)  # beyond the served depth
    finally:
        b.stop()


def test_microbatcher_oversized_request_routes_through_retrieve_many(world):
    eng, queries = world["engine"], world["queries"]
    b = MicroBatcher(eng, max_batch=4, max_wait_ms=1.0, top_k=5).start()
    try:
        out = b.submit(queries[:10])  # > max_batch in one request
        want = eng.retrieve_many(queries[:10], top_k=5, batch_size=4)
        assert [[k for k, _ in h] for h in out] == [[k for k, _ in h] for h in want]
    finally:
        b.stop()


def test_microbatcher_rejects_bad_requests(world):
    b = MicroBatcher(world["engine"], max_batch=4, top_k=5)
    with pytest.raises(ValueError):
        b.submit([])
    with pytest.raises(ValueError):
        b.submit(["q"], top_k=-1)
    with pytest.raises(ValueError):
        b.submit(["q"], top_k="10")
    with pytest.raises(ValueError):
        b.submit(["q"], top_k=50)


class _SplitLogEngine:
    """Engine stub exposing the dispatch/finish split, recording call order."""

    n_docs = 10

    def __init__(self):
        self.log = []

    def dispatch(self, queries, top_k=100, mode=None):
        self.log.append(("dispatch", queries[0]))
        return (list(queries), top_k)

    def finish(self, handle):
        queries, top_k = handle
        self.log.append(("finish", queries[0]))
        return [[("d0", 1.0)][:top_k] for _ in queries]

    def retrieve(self, queries, top_k=100, mode=None):
        return self.finish(self.dispatch(queries, top_k, mode))


def test_microbatcher_pipelines_dispatch_ahead():
    """Under a backlog, batch i+1 must be DISPATCHED before batch i is
    finished (the host prep + H2D of i+1 then overlap i's device program);
    an idle queue must drain in-flight batches rather than hold them."""
    from mfar_tpu.serve import _Pending

    eng = _SplitLogEngine()
    b = MicroBatcher(eng, max_batch=2, max_wait_ms=5.0, top_k=1,
                     pipeline_depth=2)
    # Backlog of three full batches BEFORE the dispatcher starts.
    items = [_Pending([f"q{i}a", f"q{i}b"], None) for i in range(3)]
    for it in items:
        b._q.put(it)
    b.start()
    try:
        for it in items:
            assert it.done.wait(30), "micro-batch never delivered"
            assert it.error is None and len(it.results) == 2
        log = eng.log
        assert log.index(("dispatch", "q1a")) < log.index(("finish", "q0a")), log
        # Everything delivered => the idle drain finished the tail batch.
        assert sum(1 for kind, _ in log if kind == "finish") == 3
        assert b.stats()["pipeline_depth"] == 2
    finally:
        b.stop()


def test_microbatcher_carries_overflowing_request(world):
    """A request that would push a batch past max_batch opens the NEXT
    batch instead of splitting the combined list into a second
    nearly-empty padded dispatch."""
    import queue as _q

    b = MicroBatcher(world["engine"], max_batch=4, max_wait_ms=50.0, top_k=5)
    from mfar_tpu.serve import _Pending

    big = _Pending(["a", "b", "c"], None)
    small = _Pending(["d", "e"], None)
    b._q.put(big)
    b._q.put(small)
    first_batch = b._collect()
    assert first_batch == [big] and b._carry is small
    second_batch = b._collect()
    assert second_batch == [small] and b._carry is None


def test_server_port_closed_until_started(world):
    """The listening socket must not exist before serve starts (a
    readiness probe during the 20-40 s warmup would otherwise route
    traffic into the backlog)."""
    import socket

    srv = RetrievalServer(world["engine"], port=0, max_batch=4, top_k=5)
    assert srv.port is None  # not bound yet
    srv.warmup()
    assert srv.port is None  # still unbound through warmup
    srv.start_background()
    try:
        with socket.create_connection((srv.host, srv.port), timeout=5):
            pass  # now accepting
    finally:
        srv.shutdown()


def test_http_server_end_to_end(world):
    eng, queries = world["engine"], world["queries"]
    srv = RetrievalServer(eng, port=0, max_batch=8, max_wait_ms=1.0, top_k=5)
    srv.warmup()
    srv.start_background()
    base = f"http://{srv.host}:{srv.port}"
    try:
        req = urllib.request.Request(
            base + "/retrieve",
            data=json.dumps({"queries": queries[:3], "top_k": 4}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            payload = json.loads(r.read())
        want = eng.retrieve(queries[:3], top_k=4)
        assert [[k for k, _ in h] for h in payload["results"]] == [
            [k for k, _ in h] for h in want
        ]

        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["n_docs"] == 40

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            st = json.loads(r.read())
        assert st["queries"] >= 3 and "latency_ms_p50" in st

        # malformed request -> 400, not a dead server
        bad = urllib.request.Request(base + "/retrieve", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_serve_cli_smoke(tmp_path):
    """The serve command builds its engine through the shared flag block
    and opens/answers on an ephemeral port (threaded, then shut down)."""
    from mfar_tpu.commands import serve as serve_cmd
    from mfar_tpu.commands.common import add_data_args, add_engine_args, build_engine
    from mfar_tpu.data.synth import write_dataset_dir
    import argparse

    d = tmp_path / "ds"
    write_dataset_dir(str(d), make_amazon_corpus(24))
    p = argparse.ArgumentParser()
    add_data_args(p)
    add_engine_args(p)
    args = p.parse_args([
        "--dataset-name", "amazon", "--data", str(d),
        "--model-name", "synthetic", "--field-names", "title_dense",
        "--mesh", "off",
    ])
    engine = build_engine(args, label="serve-test")
    srv = RetrievalServer(engine, port=0, max_batch=4, max_wait_ms=1.0, top_k=5)
    srv.start_background()
    try:
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/retrieve",
            data=json.dumps({"queries": ["shiny model 3"]}).encode(),
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            payload = json.loads(r.read())
        assert payload["results"] and len(payload["results"][0]) == 5
    finally:
        srv.shutdown()


def test_serve_cli_smoke_out(tmp_path):
    """`serve --smoke-out` drives the WHOLE daemon stack in-process (warmup
    -> bind on an ephemeral port -> HTTP POST of the dataset's test queries
    -> stats -> clean shutdown) and writes qids/results/stats JSON -- the
    same self-test the 2-process multihost serving test runs per worker."""
    from mfar_tpu.commands import make_synth_data
    from mfar_tpu.commands import serve as serve_cmd

    ds = str(tmp_path / "ds")
    make_synth_data.main(["--out", ds, "--n-docs", "24",
                          "--n-train", "4", "--n-val", "4"])
    out = str(tmp_path / "smoke.json")
    serve_cmd.main([
        "--dataset-name", "amazon", "--data", ds,
        "--field-names", "title_dense", "--model-name", "synthetic",
        "--mesh", "off", "--top-k", "5", "--max-batch", "4", "--port", "0",
        "--smoke-out", out,
    ])
    smoke = json.load(open(out))
    assert smoke["qids"] and len(smoke["results"]) == len(smoke["qids"])
    assert all(len(hits) == 5 for hits in smoke["results"])
    assert smoke["stats"]["queries"] == len(smoke["qids"])
    assert smoke["stats"]["errors"] == 0
