"""End-to-end trainer integration on the synthetic dataset (tiny scale)."""

import json
import os

import numpy as np
import pytest

import jax

from tests.synth import make_amazon_corpus, write_dataset_dir

from mfar_tpu.data import trec
from mfar_tpu.data.format import format_documents
from mfar_tpu.data.negative_sampler import IndexNegativeSampler
from mfar_tpu.data.schema import resolve_fields
from mfar_tpu.eval.index_build import build_sparse_indices
from mfar_tpu.models import EncoderConfig, SimpleVocabTokenizer
from mfar_tpu.sparse.bm25 import BM25Index
from mfar_tpu.train.checkpoint import read_best_dir
from mfar_tpu.train.data_pipeline import ContrastiveDataset
from mfar_tpu.train.model import MFARModel
from mfar_tpu.train.optim import make_optimizer
from mfar_tpu.train.train_step import init_state
from mfar_tpu.train.trainer import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("data"))
    out_dir = str(tmp_path_factory.mktemp("out"))
    corpus = make_amazon_corpus(40)
    write_dataset_dir(data_dir, corpus, n_train=12, n_val=4)

    field_info = resolve_fields("title_dense,description_dense,title_sparse", "amazon")
    corpus_pairs = list(trec.read_corpus(os.path.join(data_dir, "corpus")))
    from mfar_tpu.data.types import Corpus

    corpus = Corpus.from_pairs(corpus_pairs, "amazon")

    texts = []
    for fk, f in field_info.items():
        texts += [t for _, t in format_documents(corpus.pairs(), f.name, "amazon")]
    queries_train = trec.read_queries(os.path.join(data_dir, "train.queries"))
    queries_val = trec.read_queries(os.path.join(data_dir, "val.queries"))
    tok = SimpleVocabTokenizer.build(
        texts + list(queries_train.values()) + list(queries_val.values()), max_length=64
    )

    model = MFARModel(
        encoder_config=EncoderConfig.tiny(
            vocab_size=tok.vocab_size, hidden_size=32, num_layers=2, num_heads=2,
            hidden_dropout=0.0, attention_dropout=0.0,
        ),
        num_fields=len(field_info),
        query_cond=True,
        temperature=0.05,
    )
    opt = make_optimizer(encoder_lr=2e-3, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)

    single = BM25Index.create(format_documents(corpus.pairs(), "single", "amazon"))
    sampler = IndexNegativeSampler(single, n_retrieve=10, n_bottom=5, n_sample=1)
    sparse_indices = build_sparse_indices(corpus, field_info)

    mk_ds = lambda queries, qrels: ContrastiveDataset(
        queries, corpus, qrels, sampler, field_info, tok,
        query_max_length=64, sparse_indices=sparse_indices,
    )
    train_ds = mk_ds(queries_train, trec.QRels.from_file(os.path.join(data_dir, "train.qrels")))
    val_ds = mk_ds(queries_val, trec.QRels.from_file(os.path.join(data_dir, "val.qrels")))

    cfg = TrainerConfig(
        out_dir=out_dir,
        max_epochs=4,
        patience=10,
        trec_val_freq=2,
        train_batch_size=6,
        dev_batch_size=8,
        index_batch_size=16,
        query_max_length=64,
        recall_k=20,
        seed=7,
    )
    trainer = Trainer(
        model=model, optimizer=opt, tokenizer=tok, field_info=field_info,
        corpus=corpus, train_dataset=train_ds, val_dataset=val_ds,
        dev_queries=queries_val,
        dev_qrels_path=os.path.join(data_dir, "val.qrels"),
        config=cfg, sparse_indices=sparse_indices,
        additional_queries=trec.read_queries(os.path.join(data_dir, "test.queries")),
        additional_qrels_path=os.path.join(data_dir, "test.qrels"),
    )
    return dict(trainer=trainer, state=state, model=model, opt=opt, out=out_dir)


def test_fit_reduces_loss_and_checkpoints(setup):
    t, state = setup["trainer"], setup["state"]
    state = t.fit(state)
    setup["state_after"] = state

    log_path = os.path.join(setup["out"], "metrics.jsonl")
    records = [json.loads(line) for line in open(log_path)]
    epochs = [r for r in records if r.get("event") == "metrics" and "train_loss" in r]
    assert len(epochs) == 4
    assert epochs[-1]["train_loss"] < epochs[0]["train_loss"]
    assert any("dev_ndcg_cut_10" in r for r in epochs)
    # Padded-token accounting: every epoch reports the static-shape padding
    # tax; synthetic docs are short and real, so SOME padding exists but
    # never everything.
    assert all(0 <= r["padding_pct"] < 100 for r in epochs)

    # checkpoints + best.txt exist
    best_dir = read_best_dir(setup["out"])
    assert os.path.isdir(best_dir)
    meta = json.load(open(os.path.join(best_dir, "meta.json")))
    assert "title_sparse" in meta["field_info"]


def test_resume_restores_state(setup):
    t = setup["trainer"]
    state = setup["state_after"]
    template = init_state(setup["model"], setup["opt"], seed=0)
    restored = t.ckpt.restore(t.ckpt.latest_step(), template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["mixer"]["weight"]),
        np.asarray(state.params["mixer"]["weight"]),
    )
    assert int(restored.step) == int(state.step)


def test_test_and_mask_fields(setup):
    t = setup["trainer"]
    state = setup["state_after"]
    out = t.test(state, verbose=False)
    assert "dev" in out and "additional" in out
    assert 0.0 <= out["dev"]["ndcg_cut_10"] <= 1.0

    t.mask_field([2])  # mask the sparse field (schema order: dense, dense, sparse)
    assert t.masked_fields_string == "title_sparse"
    out_masked = t.test(state, verbose=False)
    t.clear_mask()

    lines = [json.loads(l) for l in open(os.path.join(setup["out"], "results_dicts.jsonl"))]
    assert any(l["masked_fields"] == "title_sparse" for l in lines)
    assert any(l["masked_fields"] == "" for l in lines)


def test_trained_model_beats_random_init(setup):
    """After training, retrieval on the TRAINING queries must beat the
    random-init engine by a margin (the dev split here is 4 queries --
    too small for a stable gate; the hard material-improvement gates live
    in tests/test_quality_gates.py)."""
    t = setup["trainer"]
    trained = setup["state_after"]
    fresh = init_state(setup["model"], setup["opt"], seed=123)
    train_queries = t.train_dataset.queries
    train_qrels_path = os.path.join(os.path.dirname(t.dev_qrels_path), "train.qrels")
    m_trained = t.trec_eval(trained, train_queries, train_qrels_path, "cmp-trained")
    m_fresh = t.trec_eval(fresh, train_queries, train_qrels_path, "cmp-fresh")
    assert m_trained["ndcg_cut_10"] >= m_fresh["ndcg_cut_10"] + 0.05, (
        m_fresh["ndcg_cut_10"], m_trained["ndcg_cut_10"],
    )
