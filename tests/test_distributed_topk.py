"""Distributed retrieval on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mfar_tpu.ops.scoring import fold_queries, softmax_field_weights
from mfar_tpu.parallel.mesh import DATA_AXIS, make_mesh, pad_rows, shard_array
from mfar_tpu.parallel.topk import (
    distributed_candidate_scores,
    distributed_dense_topk,
)

B, N, F, E = 3, 101, 2, 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])


@pytest.fixture(scope="module")
def data(mesh):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, E)).astype(np.float32)
    docs = rng.normal(size=(N, F, E)).astype(np.float32)
    W = rng.normal(size=(E, F)).astype(np.float32)
    docs_flat, valid_n = pad_rows(docs.reshape(N, F * E), 8 * 4)
    docs_flat_sharded = shard_array(mesh, docs_flat, P(DATA_AXIS))
    docs_pad, _ = pad_rows(docs, 8 * 4)
    docs_sharded = shard_array(mesh, docs_pad, P(DATA_AXIS))
    return q, docs, W, docs_flat_sharded, docs_sharded, valid_n


def test_distributed_topk_matches_single_device(mesh, data):
    q, docs, W, docs_flat_sharded, _, valid_n = data
    weights = softmax_field_weights(jnp.asarray(W), jnp.asarray(q))
    qflat = fold_queries(jnp.asarray(q), weights)

    k = 7
    top_s, top_i = distributed_dense_topk(
        mesh, qflat, docs_flat_sharded, valid_n, k=k, chunk_size=8
    )

    per_field = np.einsum("be,nfe->bnf", q, docs)
    w = np.asarray(weights)
    full = np.einsum("bnf,bf->bn", per_field, w)
    want_i = np.argsort(-full, axis=1)[:, :k]
    want_s = np.take_along_axis(full, want_i, axis=1)

    np.testing.assert_allclose(np.asarray(top_s), want_s, rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(top_i), want_i)


def test_distributed_topk_excludes_padding(mesh, data):
    q, docs, W, docs_flat_sharded, _, valid_n = data
    weights = softmax_field_weights(jnp.asarray(W), jnp.asarray(q))
    qflat = fold_queries(jnp.asarray(q), weights)
    top_s, top_i = distributed_dense_topk(
        mesh, qflat, docs_flat_sharded, valid_n, k=100, chunk_size=8
    )
    idx = np.asarray(top_i)
    scores = np.asarray(top_s)
    assert (idx[np.isfinite(scores)] < N).all()
    assert np.isneginf(scores[:, N:]).all() or scores.shape[1] <= N


def test_distributed_candidate_scores_matches_gather(mesh, data):
    q, docs, _, _, docs_sharded, _ = data
    rng = np.random.default_rng(5)
    C = 9
    cand = rng.integers(0, N, size=(B, C))
    got = distributed_candidate_scores(
        mesh, jnp.asarray(q), docs_sharded, jnp.asarray(cand, jnp.int32)
    )
    want = np.einsum("be,bcfe->bcf", q, docs[cand])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


def test_candidate_scores_cross_shard_ids(mesh, data):
    """Candidates deliberately spread across every shard."""
    q, docs, _, _, docs_sharded, _ = data
    cand = np.stack([np.arange(0, 96, 12)] * B)  # one id per shard slice
    got = distributed_candidate_scores(
        mesh, jnp.asarray(q), docs_sharded, jnp.asarray(cand, jnp.int32)
    )
    want = np.einsum("be,bcfe->bcf", q, docs[cand])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


def test_distributed_topk_approx_mode(mesh, data):
    """approx=True routes the local stage through the PartialReduce op,
    which is exact on CPU -- results must match the exact mode."""
    q, docs, W, docs_flat_sharded, _, valid_n = data
    weights = softmax_field_weights(jnp.asarray(W), jnp.asarray(q))
    qflat = fold_queries(jnp.asarray(q), weights)
    k = 7
    s_ex, i_ex = distributed_dense_topk(
        mesh, qflat, docs_flat_sharded, valid_n, k=k, chunk_size=8
    )
    s_ap, i_ap = distributed_dense_topk(
        mesh, qflat, docs_flat_sharded, valid_n, k=k, chunk_size=8, approx=True
    )
    np.testing.assert_allclose(np.asarray(s_ap), np.asarray(s_ex), rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_ap), np.asarray(i_ex))


def test_make_mesh_warns_on_slice_replica_mismatch():
    """A real multi-slice topology whose slice count != n_replica must say
    loudly that the data axis will span DCN (the old silent reshape hid an
    order-of-magnitude collective slowdown)."""

    class FakeDev:
        def __init__(self, i):
            self.slice_index = i // 2  # 4 "slices" of 2 devices
            self.id = i

    devs = [FakeDev(i) for i in range(8)]
    with pytest.warns(UserWarning, match="physical slices"):
        try:
            make_mesh(n_replica=2, devices=devs)
        except Exception:
            pass  # fake devices cannot build a real Mesh; the warning fired

    # Virtual/single-slice devices (all slice 0) stay silent: that is the
    # conftest CPU-mesh case the fallback exists for.
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        make_mesh(n_replica=2, devices=jax.devices()[:8])


def test_multislice_mesh_topk():
    """Corpus sharded over ('replica', 'data') -- the multi-slice layout
    where only [B, k] merges cross slices -- matches the exact result."""
    from mfar_tpu.parallel.mesh import batch_axes, corpus_sharding, n_batch_shards

    mesh = make_mesh(n_data=2, n_model=2, n_replica=2, devices=jax.devices()[:8])
    assert batch_axes(mesh) == ("replica", "data") and n_batch_shards(mesh) == 4
    rng = np.random.default_rng(1)
    q = rng.normal(size=(B, E)).astype(np.float32)
    docs = rng.normal(size=(N, F, E)).astype(np.float32)
    W = rng.normal(size=(E, F)).astype(np.float32)
    docs_flat, valid_n = pad_rows(docs.reshape(N, F * E), 4 * 4)
    sharded = shard_array(mesh, docs_flat, corpus_sharding(mesh))
    weights = softmax_field_weights(jnp.asarray(W), jnp.asarray(q))
    qflat = fold_queries(jnp.asarray(q), weights)
    k = 7
    top_s, top_i = distributed_dense_topk(
        mesh, qflat, sharded, valid_n, k=k, chunk_size=8, axis=("replica", "data")
    )
    full = np.einsum("bnf,bf->bn", np.einsum("be,nfe->bnf", q, docs), np.asarray(weights))
    want_i = np.argsort(-full, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.asarray(top_s), np.take_along_axis(full, want_i, 1), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(top_i), want_i)

    # rerank-stage owner-computes scoring over the same layout
    docs_pad, _ = pad_rows(docs, 4 * 4)
    docs_sh = shard_array(mesh, docs_pad, corpus_sharding(mesh))
    cand = jnp.asarray(want_i, jnp.int32)
    got = distributed_candidate_scores(
        mesh, jnp.asarray(q), docs_sh, cand, axis=("replica", "data")
    )
    want = np.einsum("be,bcfe->bcf", q, docs[want_i])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


def test_distributed_hybrid_postings_matches_dense_comb(rng):
    """Postings-fed distributed hybrid == the dense-combine variant ==
    local ground truth (duplicates sum; out-of-shard ids masked)."""
    from jax.sharding import NamedSharding

    from mfar_tpu.parallel.topk import (
        distributed_hybrid_topk,
        distributed_hybrid_topk_postings,
    )

    b, n, fe, m, k = 4, 64, 16, 24, 6
    mesh = make_mesh(n_data=8)
    qflat = jnp.asarray(rng.normal(size=(b, fe)), jnp.float32)
    docs = rng.normal(size=(n, fe)).astype(np.float32)
    docs_sh = shard_array(mesh, docs, P(DATA_AXIS))
    # postings with duplicate doc ids (they must sum)
    ids = rng.integers(0, n, size=(b, m)).astype(np.int32)
    vals = rng.random(size=(b, m)).astype(np.float32)
    vals[:, -4:] = 0.0  # zero padding tail (id 0, val 0)
    ids[:, -4:] = 0

    dense_comb = np.zeros((b, n), np.float32)
    for qi in range(b):
        np.add.at(dense_comb[qi], ids[qi], vals[qi])

    sp_sh = jax.device_put(dense_comb, NamedSharding(mesh, P(None, DATA_AXIS)))
    s_dense, i_dense = distributed_hybrid_topk(
        mesh, qflat, docs_sh, sp_sh, n, k=k, chunk_size=8
    )
    s_post, i_post = distributed_hybrid_topk_postings(
        mesh, qflat, docs_sh, jnp.asarray(ids), jnp.asarray(vals), n, k=k, chunk_size=8
    )
    np.testing.assert_allclose(np.asarray(s_post), np.asarray(s_dense), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_post), np.asarray(i_dense))

    truth = np.asarray(qflat) @ docs.T + dense_comb
    want_i = np.argsort(-truth, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(i_post), want_i)


def test_engine_mesh_hybrid_uses_postings_path(monkeypatch, rng):
    """With sparse postings below the density threshold, the mesh engine
    routes through the fused postings program (not the host-dense combine)
    and still matches the single-device engine."""
    import mfar_tpu.eval.retrieval as R
    from mfar_tpu.data.schema import resolve_fields
    from mfar_tpu.sparse.bm25 import BM25Index

    n, e = 640, 8
    # sparse docs: each distinctive token hits ~8 docs -> low density
    texts = [(str(i), f"tok{i % 80} filler{i % 7}") for i in range(n)]
    bm25 = BM25Index.create(texts, backend="scipy")
    field_info = resolve_fields("title_dense,title_sparse", "amazon")
    matrix = rng.normal(size=(n, 1, e)).astype(np.float32)
    q_emb = jnp.asarray(rng.normal(size=(4, e)), jnp.float32)
    mixer_w = jnp.asarray(rng.normal(size=(e, 2)), jnp.float32)

    calls = []
    import mfar_tpu.parallel.topk as T

    orig = T.distributed_fused_hybrid_topk_postings

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(T, "distributed_fused_hybrid_topk_postings", spy)

    def mk(mesh):
        eng = R.RetrievalEngine(
            field_info=field_info,
            doc_keys=[t[0] for t in texts],
            encode_fn=lambda ids, mask: q_emb,
            tokenizer=None,
            mixer_params={"weight": mixer_w},
            dense_matrix=matrix,
            sparse_indices={"title_sparse": bm25},
            mesh=mesh,
        )
        eng.encode_queries = lambda queries: q_emb
        return eng

    queries = [f"tok{i} filler{i}" for i in range(4)]
    single = mk(None).retrieve(queries, top_k=5, mode="exact")
    sharded = mk(make_mesh(n_data=8)).retrieve(queries, top_k=5, mode="exact")
    assert calls, "postings path was not taken"
    for h1, hm in zip(single, sharded):
        assert [k for k, _ in h1] == [k for k, _ in hm]


def test_distributed_topk_ragged_shard_chunks(mesh, rng):
    """Shards whose row count is NOT a chunk multiple stream a ragged tail
    (round 3): chunk_size=8 over 88/8=11-row shards -> 1 full chunk + tail 3
    per shard, no chunk-multiple padding anywhere."""
    n, f, e = 88, 2, 16  # 88 % (8 shards * 8 chunk) != 0; 11 % 8 != 0
    q = rng.normal(size=(3, e)).astype(np.float32)
    docs = rng.normal(size=(n, f, e)).astype(np.float32)
    W = rng.normal(size=(e, f)).astype(np.float32)
    weights = softmax_field_weights(jnp.asarray(W), jnp.asarray(q))
    qflat = fold_queries(jnp.asarray(q), weights)
    docs_sharded = shard_array(mesh, docs.reshape(n, f * e), P(DATA_AXIS))

    k = 6
    top_s, top_i = distributed_dense_topk(
        mesh, qflat, docs_sharded, n, k=k, chunk_size=8
    )
    per_field = np.einsum("be,nfe->bnf", q, docs)
    full = np.einsum("bnf,bf->bn", per_field, np.asarray(weights))
    want_i = np.argsort(-full, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(top_i), want_i)
    np.testing.assert_allclose(
        np.asarray(top_s), np.take_along_axis(full, want_i, axis=1),
        rtol=2e-5, atol=1e-5,
    )


def test_distributed_int8_matches_single_chip(mesh, rng):
    """mesh + int8 (round 3): the sharded quantized ops reproduce the
    single-chip int8 rankings EXACTLY -- dense exact, hybrid (dense-comb and
    postings), and candidate rescoring."""
    from mfar_tpu.ops.scoring import (
        dense_topk_chunked_approx_int8,
        hybrid_topk_chunked_int8,
        quantize_rows_int8_np,
    )
    from mfar_tpu.parallel.topk import (
        distributed_candidate_scores_int8,
        distributed_dense_topk_int8,
        distributed_hybrid_topk_int8,
        distributed_hybrid_topk_postings_int8,
    )

    n, f, e, b, k = 64, 2, 16, 3, 5
    q = rng.normal(size=(b, e)).astype(np.float32)
    docs = rng.normal(size=(n, f, e)).astype(np.float32)
    W = rng.normal(size=(e, f)).astype(np.float32)
    weights = softmax_field_weights(jnp.asarray(W), jnp.asarray(q))
    qflat = fold_queries(jnp.asarray(q), weights).astype(jnp.float32)
    dq, ds = quantize_rows_int8_np(docs.reshape(n, f * e))
    dq_sh = shard_array(mesh, dq, P(DATA_AXIS))
    ds_sh = shard_array(mesh, ds, P(DATA_AXIS))

    # dense exact
    want_s, want_i = dense_topk_chunked_approx_int8(
        qflat, jnp.asarray(dq), jnp.asarray(ds), jnp.int32(n), k=k,
        chunk_size=16, exact=True,
    )
    got_s, got_i = distributed_dense_topk_int8(
        mesh, qflat, dq_sh, ds_sh, n, k=k, chunk_size=16, exact=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-6)

    # hybrid: dense-combined sparse tensor
    sparse = rng.normal(size=(b, n)).astype(np.float32)
    hw_s, hw_i = hybrid_topk_chunked_int8(
        qflat, jnp.asarray(dq), jnp.asarray(ds), jnp.asarray(sparse),
        jnp.int32(n), k=k, chunk_size=16,
    )
    sparse_sh = shard_array(mesh, sparse, P(None, DATA_AXIS))
    hg_s, hg_i = distributed_hybrid_topk_int8(
        mesh, qflat, dq_sh, ds_sh, sparse_sh, n, k=k, chunk_size=16,
    )
    np.testing.assert_array_equal(np.asarray(hg_i), np.asarray(hw_i))

    # hybrid: postings (scatter-add equals the dense sparse tensor)
    m = 8
    ids = rng.integers(0, n, size=(b, m)).astype(np.int32)
    vals = rng.normal(size=(b, m)).astype(np.float32)
    dense_equiv = np.zeros((b, n), np.float32)
    for i in range(b):
        for j in range(m):
            dense_equiv[i, ids[i, j]] += vals[i, j]
    pw_s, pw_i = hybrid_topk_chunked_int8(
        qflat, jnp.asarray(dq), jnp.asarray(ds), jnp.asarray(dense_equiv),
        jnp.int32(n), k=k, chunk_size=16,
    )
    pg_s, pg_i = distributed_hybrid_topk_postings_int8(
        mesh, qflat, dq_sh, ds_sh, jnp.asarray(ids), jnp.asarray(vals),
        n, k=k, chunk_size=16,
    )
    np.testing.assert_array_equal(np.asarray(pg_i), np.asarray(pw_i))

    # candidate rescoring: dequantized per-field scores
    cand = rng.integers(0, n, size=(b, 4)).astype(np.int32)
    got = distributed_candidate_scores_int8(
        mesh, jnp.asarray(q), dq_sh, ds_sh, jnp.asarray(cand), num_fields=f,
    )
    deq = (dq.astype(np.float32) * ds[:, None]).reshape(n, f, e)
    want = np.einsum("be,bcfe->bcf", q, deq[cand])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_distributed_builders_cached_across_calls(mesh, data):
    """Serving calls a distributed_* function once per batch: the shard_map
    body and merge jit must be built ONCE per configuration, not per call
    (a fresh closure per call re-traces -- and on a real backend recompiles
    -- the whole per-shard scan every batch)."""
    from mfar_tpu.parallel import topk as tk

    q, docs, W, docs_flat_sharded, _, valid_n = data
    weights = softmax_field_weights(jnp.asarray(W), jnp.asarray(q))
    qflat = fold_queries(jnp.asarray(q), weights)

    tk._build_dense_topk.cache_clear()
    for _ in range(3):
        distributed_dense_topk(
            mesh, qflat, docs_flat_sharded, valid_n, k=5, chunk_size=32
        )
    info = tk._build_dense_topk.cache_info()
    assert info.misses == 1 and info.hits == 2

    tk._build_fused_dense_topk.cache_clear()
    mask = jnp.ones((F,), jnp.float32)
    for _ in range(3):
        tk.distributed_fused_dense_topk(
            mesh, jnp.asarray(q), jnp.asarray(W), mask, docs_flat_sharded,
            valid_n, num_dense=F, k=5, chunk_size=32,
        )
    info = tk._build_fused_dense_topk.cache_info()
    assert info.misses == 1 and info.hits == 2
