"""CLI smoke tests: the full command pipeline on a tiny synthetic dataset."""

import json
import os

import numpy as np
import pytest

from mfar_tpu.commands import (
    create_sparse_index,
    make_synth_data,
    precompute_sparse_scores,
)
from mfar_tpu.commands import train as train_cmd
from mfar_tpu.commands import mask_fields as mask_cmd
from mfar_tpu.sparse.bm25 import BM25Index
from mfar_tpu.train.sparse_cache import load_field_scores


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    d = {k: str(root / k) for k in ("ds", "idx", "scores", "run", "mask")}
    make_synth_data.main(["--out", d["ds"], "--n-docs", "30", "--n-train", "8", "--n-val", "3"])
    return d


def test_create_sparse_index(dirs):
    create_sparse_index.main([
        "--data-path", dirs["ds"], "--dataset-name", "amazon",
        "--output-path", dirs["idx"], "--fields-str", "title_sparse,single_sparse",
    ])
    idx = BM25Index.load(os.path.join(dirs["idx"], "title_sparse_sparse_index"))
    assert len(idx.keys) == 30


def test_precompute_sparse_scores(dirs):
    precompute_sparse_scores.main([
        "--data-path", dirs["ds"], "--dataset-name", "amazon",
        "--corpus-path", dirs["ds"], "--output-path", dirs["scores"],
        "--index-path", dirs["idx"], "--fields-str", "title_sparse",
    ])
    scores = load_field_scores(dirs["scores"], "title_sparse")
    assert scores and all(isinstance(v, dict) for v in scores.values())
    # scores restricted to the candidate pool and nonzero
    assert all(s > 0 for per_q in scores.values() for s in per_q.values())


def test_train_and_mask_fields_cli(dirs):
    train_cmd.main([
        "--dataset-name", "amazon", "--data", dirs["ds"], "--out", dirs["run"],
        "--lexical-index", dirs["idx"], "--sparse-scores-path", dirs["scores"],
        "--field-names", "title_dense,title_sparse",
        "--model-name", "synthetic", "--weights-lr", "0.1",
        "--train-batch-size", "4", "--max-epochs", "1", "--run-one-iteration",
        "--recall-k", "10", "--dev-batch-size", "8",
    ])
    assert os.path.exists(os.path.join(dirs["run"], "best.txt"))
    results = [json.loads(l) for l in open(os.path.join(dirs["run"], "results_dicts.jsonl"))]
    assert results and "ndcg_cut_10" in results[0]

    mask_cmd.main([
        "--dataset-name", "amazon", "--data", dirs["ds"], "--out", dirs["mask"],
        "--lexical-index", dirs["idx"], "--checkpoint-dir", dirs["run"],
        "--field-names", "title_dense,title_sparse", "--model-name", "synthetic",
        "--debug", "--recall-k", "10", "--dev-batch-size", "8",
    ])
    lines = [json.loads(l) for l in open(os.path.join(dirs["mask"], "results_dicts.jsonl"))]
    assert lines[0]["masked_fields"] == ""


def test_retrieve_cli(dirs, tmp_path):
    """Serving command end-to-end: qres written, metrics printed, and the
    int8-quantized run returns the same candidate set."""
    from mfar_tpu.commands import retrieve as retrieve_cmd
    from mfar_tpu.data import trec

    out = str(tmp_path / "test.qres")
    base = [
        "--dataset-name", "amazon", "--data", dirs["ds"],
        "--lexical-index", dirs["idx"],
        "--field-names", "title_dense,title_sparse", "--model-name", "synthetic",
        "--partition", "val", "--recall-k", "10", "--top-k", "10",
    ]
    retrieve_cmd.main(base + ["--out", out])
    qres = list(trec.QRes.from_file(out))
    assert qres and all(r.rank < 10 for r in qres)

    out8 = str(tmp_path / "test8.qres")
    retrieve_cmd.main(base + ["--out", out8, "--quantize", "int8"])
    ids = {(r.query_id, r.doc_id) for r in qres}
    ids8 = {(r.query_id, r.doc_id) for r in trec.QRes.from_file(out8)}
    # candidate overlap >= 80% (near-ties may cross the k boundary)
    assert len(ids & ids8) >= int(0.8 * len(ids))

    # checkpoint-restored params (committed to one device) must serve over
    # the auto mesh too (regression: device-set mismatch in make_encode_fn)
    out_ckpt = str(tmp_path / "ckpt.qres")
    retrieve_cmd.main(base + ["--out", out_ckpt, "--checkpoint-dir", dirs["run"],
                              "--mode", "exact"])
    assert list(trec.QRes.from_file(out_ckpt))


def test_checkpoint_reload_across_prng_impls(dirs, tmp_path):
    """Eval commands must reload a checkpoint trained under a different
    PRNG impl (rng keys persist as raw data with impl-dependent shapes)."""
    import jax

    run, mask = str(tmp_path / "run"), str(tmp_path / "mask")
    train_cmd.main([
        "--dataset-name", "amazon", "--data", dirs["ds"], "--out", run,
        "--lexical-index", dirs["idx"], "--field-names", "title_dense,title_sparse",
        "--model-name", "synthetic", "--weights-lr", "0.1", "--prng", "rbg",
        "--train-batch-size", "4", "--max-epochs", "1", "--run-one-iteration",
        "--recall-k", "10", "--dev-batch-size", "8",
    ])
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    mask_cmd.main([
        "--dataset-name", "amazon", "--data", dirs["ds"], "--out", mask,
        "--lexical-index", dirs["idx"], "--checkpoint-dir", run,
        "--field-names", "title_dense,title_sparse", "--model-name", "synthetic",
        "--debug", "--recall-k", "10", "--dev-batch-size", "8",
    ])
    lines = [json.loads(l) for l in open(os.path.join(mask, "results_dicts.jsonl"))]
    assert lines and lines[0]["masked_fields"] == ""


def test_encode_corpus_then_retrieve_prebuilt(dirs, tmp_path):
    """encode_corpus -> retrieve --dense-index roundtrip: the prebuilt
    matrix must load, match the corpus keys, and produce identical results
    to the on-the-fly encode."""
    from mfar_tpu.commands import encode_corpus as encode_cmd
    from mfar_tpu.commands import retrieve as retrieve_cmd
    from mfar_tpu.data import trec

    npz = str(tmp_path / "dense.npz")
    encode_cmd.main([
        "--dataset-name", "amazon", "--data", dirs["ds"], "--out", npz,
        "--field-names", "title_dense,title_sparse", "--model-name", "synthetic",
        "--batch-size", "16",
    ])
    base = [
        "--dataset-name", "amazon", "--data", dirs["ds"],
        "--lexical-index", dirs["idx"],
        "--field-names", "title_dense,title_sparse", "--model-name", "synthetic",
        "--partition", "val", "--recall-k", "10", "--top-k", "10",
    ]
    out_pre, out_live = str(tmp_path / "pre.qres"), str(tmp_path / "live.qres")
    retrieve_cmd.main(base + ["--out", out_pre, "--dense-index", npz])
    retrieve_cmd.main(base + ["--out", out_live])
    pre = [(r.query_id, r.doc_id, r.rank) for r in trec.QRes.from_file(out_pre)]
    live = [(r.query_id, r.doc_id, r.rank) for r in trec.QRes.from_file(out_live)]
    assert pre == live and pre


def test_retrieve_cli_multi_slice(dirs, tmp_path):
    """Multi-slice serving flags: replica x data mesh with a per-slice
    corpus and query-batch sharding, same results as single-chip."""
    from mfar_tpu.commands import retrieve as retrieve_cmd
    from mfar_tpu.data import trec

    base = [
        "--dataset-name", "amazon", "--data", dirs["ds"],
        "--lexical-index", dirs["idx"],
        "--field-names", "title_dense,title_sparse", "--model-name", "synthetic",
        "--partition", "val", "--recall-k", "10", "--top-k", "10",
        "--mode", "exact",
    ]
    out_1 = str(tmp_path / "single.qres")
    retrieve_cmd.main(base + ["--out", out_1, "--mesh", "off"])
    out_ms = str(tmp_path / "multislice.qres")
    retrieve_cmd.main(base + ["--out", out_ms, "--n-replica", "2",
                              "--corpus-per-slice"])
    r1 = [(r.query_id, r.doc_id, r.rank) for r in trec.QRes.from_file(out_1)]
    rm = [(r.query_id, r.doc_id, r.rank) for r in trec.QRes.from_file(out_ms)]
    assert r1 == rm and r1


def test_underscore_flag_aliases(dirs, tmp_path):
    """The reference's fire CLI accepts underscore flags (--encoder_lr);
    its README mixes both spellings. Drop-in users keep their commands."""
    from mfar_tpu.commands import retrieve as retrieve_cmd
    from mfar_tpu.data import trec

    out = str(tmp_path / "underscore.qres")
    retrieve_cmd.main([
        "--dataset_name", "amazon", "--data", dirs["ds"],
        "--lexical_index", dirs["idx"],
        "--field_names", "title_dense,title_sparse", "--model_name", "synthetic",
        "--partition", "val", "--recall_k", "10", "--top_k", "10",
        "--out", out, "--mesh", "off",
    ])
    assert list(trec.QRes.from_file(out))
