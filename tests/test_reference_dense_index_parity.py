"""Direct parity against the reference's DenseFlatIndex streaming top-k.

mfar/data/index.py imports offline with the bm25s stub (torch +
sentence_transformers are installed); DenseFlatIndex.retrieve_batch accepts
raw query embeddings, so no model is needed.  The reference streams the
corpus in vector_batch_size chunks with a running torch.topk merge
(reference index.py:181-222) -- the exact computation our
ops.scoring.dense_topk_chunked lax.scan performs -- so ranked ids must agree
exactly and scores to fp32 tolerance.

Embeddings are drawn POSITIVE: the reference initializes its running top-k
at score 0 with index 0 (index.py:192-193), so any query whose true top-k
includes negative scores gets phantom (doc 0, 0.0) results.  Positive
scores keep the comparison on the semantics both sides implement.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.ref_stubs import install_reference_stubs

install_reference_stubs()

from mfar.data.index import DenseFlatIndex  # noqa: E402

from mfar_tpu.ops.scoring import dense_topk_chunked  # noqa: E402


def _make(rng, n, e, b):
    vectors = rng.uniform(0.05, 1.0, size=(n, e)).astype(np.float32)
    queries = rng.uniform(0.05, 1.0, size=(b, e)).astype(np.float32)
    keys = [f"d{i}" for i in range(n)]
    return vectors, queries, keys


@pytest.mark.parametrize(
    "n,chunk,k",
    [
        (3000, 512, 50),   # many chunks + ragged tail, both sides streaming
        (3000, 4096, 50),  # single-chunk fast path on our side
        (40, 512, 50),     # k > n: reference pads with its zero-init rows
    ],
)
def test_dense_streaming_topk_parity(n, chunk, k):
    rng = np.random.default_rng(7)
    vectors, queries, keys = _make(rng, n, e=64, b=7)
    ref = DenseFlatIndex(
        model=None, vectors=vectors, numeric_ids_to_keys=keys,
        keys_to_numeric_ids={key: i for i, key in enumerate(keys)},
        vector_batch_size=chunk,
    )
    ref_out = ref.retrieve_batch(queries, top_k=k)

    scores, idx = dense_topk_chunked(
        jnp.asarray(queries), jnp.asarray(vectors), jnp.int32(n), k, chunk_size=chunk
    )
    scores, idx = np.asarray(scores), np.asarray(idx)

    for qi, ref_row in enumerate(ref_out):
        ref_ids = [doc_id for doc_id, _ in ref_row]
        ref_scores = np.array([s for _, s in ref_row], np.float32)
        valid = min(k, n)  # past n, the reference emits its zero-init filler
        our_ids = [keys[j] for j in idx[qi][:valid]]
        assert our_ids == ref_ids[:valid], qi
        np.testing.assert_allclose(scores[qi][:valid], ref_scores[:valid],
                                   rtol=1e-5, atol=1e-5)
        assert np.all(np.asarray(scores[qi][valid:]) == -np.inf)
