"""Pallas kernels in interpret mode against the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfar_tpu.ops.pallas_kernels import (
    TILE_C,
    gather_per_field_scores_pallas,
    gather_per_field_scores_xla,
)

B, N, F, E, C = 3, 64, 4, 128, 2 * TILE_C


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, E)), jnp.float32)
    docs = jnp.asarray(rng.normal(size=(N, F, E)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, size=(B, C)), jnp.int32)
    return q, docs, ids


def test_gather_score_matches_xla(data):
    q, docs, ids = data
    got = gather_per_field_scores_pallas(q, docs.reshape(N, F * E), ids, F, interpret=True)
    want = gather_per_field_scores_xla(q, docs, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gather_score_duplicate_and_boundary_ids(data):
    q, docs, _ = data
    ids = jnp.asarray(
        [[0] * TILE_C + [N - 1] * TILE_C,
         [5] * C,
         list(range(TILE_C)) + [N - 1 - i for i in range(TILE_C)]],
        jnp.int32,
    )
    got = gather_per_field_scores_pallas(q, docs.reshape(N, F * E), ids, F, interpret=True)
    want = gather_per_field_scores_xla(q, docs, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_tiles", [1, 2, 3])  # odd counts stress slot parity
def test_gather_score_cross_row_prefetch(data, n_tiles):
    q, docs, _ = data
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, N, size=(B, n_tiles * TILE_C)), jnp.int32)
    got = gather_per_field_scores_pallas(
        q, docs.reshape(N, F * E), ids, F, interpret=True, cross_row_prefetch=True
    )
    want = gather_per_field_scores_xla(q, docs, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gather_score_megacore_semantics(data):
    """megacore=True only changes dimension_semantics (query rows are
    independent); interpret-mode output must match XLA, and the invalid
    combination with cross-row prefetch is rejected."""
    q, docs, ids = data
    got = gather_per_field_scores_pallas(
        q, docs.reshape(N, F * E), ids, F, interpret=True, megacore=True
    )
    want = gather_per_field_scores_xla(q, docs, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    with pytest.raises(AssertionError, match="sequential grid walk"):
        gather_per_field_scores_pallas(
            q, docs.reshape(N, F * E), ids, F, interpret=True,
            megacore=True, cross_row_prefetch=True,
        )


def test_rejects_unaligned_candidate_width(data):
    q, docs, _ = data
    bad = jnp.zeros((B, TILE_C + 1), jnp.int32)
    with pytest.raises(AssertionError):
        gather_per_field_scores_pallas(q, docs.reshape(N, F * E), bad, F, interpret=True)


def test_gather_score_bf16_corpus(data):
    """bf16 corpus rows ride the [N/2, 2, F*E] PAIR view (bf16 sublane
    packing forbids unit dim-1 slices); the kernel selects the candidate's
    parity row and must match the XLA gather+einsum on the SAME stored
    precision exactly (both upcast identical bf16 values before f32 dots)."""
    q, docs, ids = data
    docs_bf = docs.astype(jnp.bfloat16)
    from mfar_tpu.ops.pallas_kernels import make_row_dma_view

    view = make_row_dma_view(docs_bf.reshape(N, F * E))
    assert view.shape == (N // 2, 2, F * E)
    got = gather_per_field_scores_pallas(q, view, ids, F, interpret=True)
    want = gather_per_field_scores_xla(q, docs_bf.astype(jnp.float32), ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gather_score_bf16_odd_corpus(data):
    """An odd-row bf16 corpus pads one zero row into the pair view; every
    real candidate id (including the LAST row, whose pair block contains
    the pad) still scores correctly."""
    q, docs, _ = data
    n_odd = N - 1
    docs_bf = docs.reshape(N, F * E)[:n_odd].astype(jnp.bfloat16)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, n_odd, size=(B, 2 * TILE_C)), jnp.int32)
    ids = ids.at[0, 0].set(n_odd - 1)  # the row sharing a block with the pad
    got = gather_per_field_scores_pallas(q, docs_bf, ids, F, interpret=True)
    want = gather_per_field_scores_xla(
        q,
        docs_bf.astype(jnp.float32).reshape(n_odd, F, E),
        ids,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gather_score_rejects_int8(data):
    q, docs, ids = data
    with pytest.raises(AssertionError, match="int8"):
        gather_per_field_scores_pallas(
            q, docs.reshape(N, F * E).astype(jnp.int8), ids, F, interpret=True
        )


# ----------------------------------------------------------------------
# The auto cost-model gate (eval/retrieval.py): on iff dedicated rerank
# mode + TPU backend + lane-aligned fields + the memory model fits:
# 2 x corpus + score tile + reserve <= HBM.


def _gate(monkeypatch, *, mode="rerank", backend="tpu", emb=768,
          corpus_bytes=4 * 2**30, hbm=16 * 2**30):
    from types import SimpleNamespace

    from mfar_tpu.eval.retrieval import RetrievalEngine

    monkeypatch.setattr(jax, "default_backend", lambda: backend)
    monkeypatch.setenv("MFAR_HBM_BYTES", str(hbm))
    fake = SimpleNamespace(
        mode=mode,
        emb_dim=emb,
        # size/itemsize drive the cost model: fake a corpus of corpus_bytes
        docs_flat=SimpleNamespace(size=corpus_bytes,
                                  dtype=SimpleNamespace(itemsize=1)),
        PALLAS_GATHER_RESERVE_BYTES=RetrievalEngine.PALLAS_GATHER_RESERVE_BYTES,
    )
    return RetrievalEngine._pallas_gather_auto(fake)


def test_auto_gate_fires_for_rerank_tpu_fit(monkeypatch):
    assert _gate(monkeypatch) is True


def test_auto_gate_off_for_exact_or_auto_mode(monkeypatch):
    assert _gate(monkeypatch, mode="exact") is False
    assert _gate(monkeypatch, mode="auto") is False


def test_auto_gate_off_off_tpu(monkeypatch):
    assert _gate(monkeypatch, backend="cpu") is False


def test_auto_gate_off_unaligned_emb(monkeypatch):
    assert _gate(monkeypatch, emb=96) is False


def test_auto_gate_memory_model(monkeypatch, capsys):
    from mfar_tpu.eval.retrieval import TOPK_SCORE_TILE_BYTES, RetrievalEngine

    hbm = 16 * 2**30
    fits = (hbm - TOPK_SCORE_TILE_BYTES
            - RetrievalEngine.PALLAS_GATHER_RESERVE_BYTES) // 2
    assert _gate(monkeypatch, corpus_bytes=fits, hbm=hbm) is True
    assert _gate(monkeypatch, corpus_bytes=fits + 1, hbm=hbm) is False
    assert "auto-OFF" in capsys.readouterr().out
    # the round-5 hardware OOM shape (N=1M bf16 on a 16 GiB chip) must
    # resolve OFF: 2 x 7.68e9 + tile left <1 GB and the recall scan died
    assert _gate(monkeypatch, corpus_bytes=1_048_576 * 3840 * 2, hbm=hbm) is False


# ----------------------------------------------------------------------
# Engine-level equivalence: a forced-pallas engine's rerank results equal
# the XLA-gather engine's on a lane-aligned (E=128) dense corpus.


def test_engine_rerank_pallas_matches_xla():
    from mfar_tpu.data.format import format_documents
    from mfar_tpu.data.schema import resolve_fields
    from mfar_tpu.data.synth import make_amazon_corpus, make_queries_and_qrels
    from mfar_tpu.eval.index_build import build_dense_corpus_matrix
    from mfar_tpu.eval.retrieval import RetrievalEngine
    from mfar_tpu.models import Encoder, EncoderConfig, SimpleVocabTokenizer
    from mfar_tpu.models.encoder import init_params

    corpus = make_amazon_corpus(48)
    queries, _ = make_queries_and_qrels(corpus, n_queries=6)
    field_info = resolve_fields("title_dense,description_dense", "amazon")
    texts = []
    for fk, f in field_info.items():
        texts += [t for _, t in format_documents(corpus.pairs(), f.name, "amazon")]
    tok = SimpleVocabTokenizer.build(texts + list(queries.values()), max_length=64)
    config = EncoderConfig.tiny(vocab_size=tok.vocab_size, hidden_size=128)
    params = init_params(config)
    model = Encoder(config)

    @jax.jit
    def encode_fn(ids, mask):
        return model.apply({"params": params}, ids, mask)

    matrix = build_dense_corpus_matrix(
        encode_fn, tok, corpus, field_info, batch_size=16
    )
    mixer = {"weight": jnp.asarray(
        np.random.default_rng(0).normal(size=(128, 2)).astype(np.float32))}
    kw = dict(
        field_info=field_info, doc_keys=list(corpus.keys()),
        encode_fn=encode_fn, tokenizer=tok, mixer_params=mixer,
        dense_matrix=matrix, query_max_length=64, recall_k=10,
        mode="rerank",
    )
    eng_xla = RetrievalEngine(use_pallas_gather=False, **kw)
    eng_pl = RetrievalEngine(use_pallas_gather=True, **kw)
    assert eng_pl.docs_rows is not None and eng_xla.docs_rows is None
    qs = list(queries.values())
    got = eng_pl.retrieve(qs, top_k=5)
    want = eng_xla.retrieve(qs, top_k=5)
    for g, w in zip(got, want):
        assert [k for k, _ in g] == [k for k, _ in w]
        np.testing.assert_allclose(
            [s for _, s in g], [s for _, s in w], rtol=1e-5, atol=1e-6
        )
