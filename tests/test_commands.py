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
