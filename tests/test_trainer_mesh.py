"""Production train/serve paths on an 8-device virtual mesh.

VERDICT round-1 item 1: the trainer and retrieval engine must run unchanged
over a mesh -- params/optimizer sharded by the path rules, batches sharded
over the batch axes, corpus rows sharded for eval -- and produce the same
metrics as the single-device run.
"""

import os

import numpy as np
import pytest

import jax

from tests.synth import make_amazon_corpus, write_dataset_dir

from mfar_tpu.data import trec
from mfar_tpu.data.format import format_documents
from mfar_tpu.data.negative_sampler import IndexNegativeSampler
from mfar_tpu.data.schema import resolve_fields
from mfar_tpu.data.types import Corpus
from mfar_tpu.eval.index_build import build_sparse_indices
from mfar_tpu.models import EncoderConfig, SimpleVocabTokenizer
from mfar_tpu.parallel.mesh import make_mesh
from mfar_tpu.sparse.bm25 import BM25Index
from mfar_tpu.train.data_pipeline import ContrastiveDataset
from mfar_tpu.train.model import MFARModel
from mfar_tpu.train.optim import make_optimizer
from mfar_tpu.train.train_step import init_state
from mfar_tpu.train.trainer import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("data"))
    corpus0 = make_amazon_corpus(40)
    write_dataset_dir(data_dir, corpus0, n_train=16, n_val=4)

    field_info = resolve_fields("title_dense,description_dense,title_sparse", "amazon")
    corpus = Corpus.from_pairs(list(trec.read_corpus(os.path.join(data_dir, "corpus"))), "amazon")

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

    single = BM25Index.create(format_documents(corpus.pairs(), "single", "amazon"))
    sampler = IndexNegativeSampler(single, n_retrieve=10, n_bottom=5, n_sample=1)
    sparse_indices = build_sparse_indices(corpus, field_info)

    mk_ds = lambda queries, qrels: ContrastiveDataset(
        queries, corpus, qrels, sampler, field_info, tok,
        query_max_length=64, sparse_indices=sparse_indices,
    )
    return dict(
        data_dir=data_dir, corpus=corpus, field_info=field_info, tok=tok,
        model=model, opt=opt, sparse_indices=sparse_indices,
        train_ds=mk_ds(queries_train, trec.QRels.from_file(os.path.join(data_dir, "train.qrels"))),
        val_ds=mk_ds(queries_val, trec.QRels.from_file(os.path.join(data_dir, "val.qrels"))),
        queries_val=queries_val,
    )


def run_fit(world, out_dir, mesh):
    w = world
    cfg = TrainerConfig(
        out_dir=out_dir, max_epochs=2, patience=10, trec_val_freq=2,
        train_batch_size=8, dev_batch_size=8, index_batch_size=16,
        query_max_length=64, recall_k=20, seed=7,
    )
    trainer = Trainer(
        model=w["model"], optimizer=w["opt"], tokenizer=w["tok"],
        field_info=w["field_info"], corpus=w["corpus"],
        train_dataset=w["train_ds"], val_dataset=w["val_ds"],
        dev_queries=w["queries_val"],
        dev_qrels_path=os.path.join(w["data_dir"], "val.qrels"),
        config=cfg, sparse_indices=w["sparse_indices"], mesh=mesh,
    )
    state = init_state(w["model"], w["opt"], seed=0)
    state = trainer.fit(state)
    dev = trainer.trec_eval(state, w["queries_val"],
                            os.path.join(w["data_dir"], "val.qrels"), "mesh-cmp")
    return trainer, state, dev


def test_mesh_fit_matches_single_device(world, tmp_path):
    mesh = make_mesh()  # all 8 virtual CPU devices
    assert int(np.prod(list(mesh.shape.values()))) == 8
    t1, s1, dev1 = run_fit(world, str(tmp_path / "single"), mesh=None)
    tm, sm, devm = run_fit(world, str(tmp_path / "mesh"), mesh=mesh)

    # sharded state: the step threaded through donation, same step count
    assert int(sm.step) == int(s1.step)
    # mixer weights track closely (same data, GSPMD reductions may reorder)
    np.testing.assert_allclose(
        np.asarray(sm.params["mixer"]["weight"]),
        np.asarray(s1.params["mixer"]["weight"]),
        rtol=1e-3, atol=1e-4,
    )
    # retrieval metrics agree
    for k in ("ndcg_cut_10", "recall_10", "recip_rank"):
        assert abs(dev1[k] - devm[k]) < 1e-6, (k, dev1[k], devm[k])


def test_mesh_tensor_parallel_step(world, tmp_path):
    """dp x tp mesh (4x2): encoder params shard over 'model'; one epoch runs
    and produces a finite loss."""
    w = world
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = TrainerConfig(
        out_dir=str(tmp_path / "tp"), max_epochs=1, train_batch_size=8,
        dev_batch_size=8, index_batch_size=16, query_max_length=64, seed=3,
        run_one_iteration=True,
    )
    trainer = Trainer(
        model=w["model"], optimizer=w["opt"], tokenizer=w["tok"],
        field_info=w["field_info"], corpus=w["corpus"],
        train_dataset=w["train_ds"], val_dataset=w["val_ds"],
        dev_queries=w["queries_val"],
        dev_qrels_path=os.path.join(w["data_dir"], "val.qrels"),
        config=cfg, sparse_indices=w["sparse_indices"], mesh=mesh,
    )
    state = trainer.place_state(init_state(w["model"], w["opt"], seed=0))
    # QKV kernels actually sharded over 'model'
    qkv = state.params["encoder"]["layers"]["layer"]["attn_q"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    state, loss, _ = trainer.train_epoch(state, epoch=0)
    assert np.isfinite(loss) and loss > 0
