"""End-to-end smokes for the five BASELINE.json configs (SURVEY.md section 4:
"end-to-end run_one_iteration-style integration test per config").

Each config runs the real CLI mains on a tiny schema-shaped synthetic
dataset (the offline stand-in for the STaRK downloads).
"""

import json
import os

import pytest

from mfar_tpu.commands import (
    create_sparse_index,
    make_synth_data,
    precompute_sparse_scores,
)
from mfar_tpu.commands import mask_fields as mask_cmd
from mfar_tpu.commands import train as train_cmd


def _mkds(tmp_path, name, **kw):
    out = str(tmp_path / f"ds_{name}")
    argv = ["--out", out, "--dataset-name", name, "--n-docs", str(kw.get("n_docs", 24)),
            "--n-train", "8", "--n-val", "3"]
    make_synth_data.main(argv)
    return out

def _results(run_dir):
    path = os.path.join(run_dir, "results_dicts.jsonl")
    assert os.path.exists(path), "no results written"
    return [json.loads(l) for l in open(path)]


def test_config1_prime_truncated_all_dense_frozen(tmp_path):
    """Config 1: truncated prime, all_dense (22 fields), frozen encoder,
    brute-force (exact) dense eval."""
    ds = _mkds(tmp_path, "prime", n_docs=16)
    run = str(tmp_path / "run")
    train_cmd.main([
        "--dataset-name", "prime", "--data", ds, "--out", run,
        "--lexical-index", str(tmp_path / "idx_unused"),
        "--field-names", "all_dense", "--model-name", "synthetic",
        "--weights-lr", "0.1", "--freeze-encoder",
        "--train-batch-size", "2", "--max-epochs", "1", "--run-one-iteration",
        "--recall-k", "8", "--dev-batch-size", "4",
    ])
    res = _results(run)
    assert "ndcg_cut_10" in res[0]


def test_config2_amazon_dense_query_cond(tmp_path):
    """Config 2: amazon dense-only with query-conditioned softmax mixing."""
    ds = _mkds(tmp_path, "amazon")
    run = str(tmp_path / "run")
    train_cmd.main([
        "--dataset-name", "amazon", "--data", ds, "--out", run,
        "--lexical-index", str(tmp_path / "idx_unused"),
        "--field-names", "title_dense,description_dense,review_dense",
        "--model-name", "synthetic", "--weights-lr", "0.1", "--query-cond",
        "--train-batch-size", "4", "--max-epochs", "1", "--run-one-iteration",
        "--recall-k", "10", "--dev-batch-size", "8",
    ])
    res = _results(run)
    assert res[0]["masked_fields"] == ""


def test_config3_prime_hybrid_precomputed_scores(tmp_path):
    """Config 3: prime dense+sparse hybrid with precomputed BM25 scores."""
    ds = _mkds(tmp_path, "prime")
    idx, scores, run = (str(tmp_path / d) for d in ("idx", "scores", "run"))
    create_sparse_index.main([
        "--data-path", ds, "--dataset-name", "prime", "--output-path", idx,
        "--fields-str", "name_sparse,single_sparse",
    ])
    precompute_sparse_scores.main([
        "--data-path", ds, "--dataset-name", "prime", "--corpus-path", ds,
        "--output-path", scores, "--index-path", idx, "--fields-str", "name_sparse",
    ])
    train_cmd.main([
        "--dataset-name", "prime", "--data", ds, "--out", run,
        "--lexical-index", idx, "--sparse-scores-path", scores,
        "--field-names", "name_dense,name_sparse", "--model-name", "synthetic",
        "--weights-lr", "0.1", "--train-batch-size", "4", "--max-epochs", "1",
        "--run-one-iteration", "--recall-k", "10", "--dev-batch-size", "8",
    ])
    res = _results(run)
    assert "ndcg_cut_10" in res[0]


def test_config4_mag_full_training_two_lrs(tmp_path):
    """Config 4: mag contrastive training with the two-LR split and the
    periodic trec_val loop; loss must improve over epochs."""
    ds = _mkds(tmp_path, "mag")
    idx, run = str(tmp_path / "idx"), str(tmp_path / "run")
    create_sparse_index.main([
        "--data-path", ds, "--dataset-name", "mag", "--output-path", idx,
        "--fields-str", "title_sparse,single_sparse",
    ])
    train_cmd.main([
        "--dataset-name", "mag", "--data", ds, "--out", run,
        "--lexical-index", idx,
        "--field-names", "title_dense,abstract_dense,title_sparse",
        "--model-name", "synthetic", "--encoder-lr", "1e-3", "--weights-lr", "0.1",
        "--train-batch-size", "4", "--max-epochs", "2", "--trec-val-freq", "1",
        "--recall-k", "10", "--dev-batch-size", "8",
    ])
    assert os.path.exists(os.path.join(run, "best.txt"))
    hist = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    losses = [h["train_loss"] for h in hist if "train_loss" in h]
    assert len(losses) == 2 and losses[-1] < losses[0]
    assert any("dev_ndcg_cut_10" in h for h in hist)


def test_config5_wtb_schema_mask_fields_sweep(tmp_path):
    """Config 5: bring-your-own-dataset WTB books schema + the full
    mask_fields ablation sweep on the trained checkpoint."""
    ds = _mkds(tmp_path, "whatsthatbook")
    idx, run, mask = (str(tmp_path / d) for d in ("idx", "run", "mask"))
    create_sparse_index.main([
        "--data-path", ds, "--dataset-name", "whatsthatbook", "--output-path", idx,
        "--fields-str", "title_sparse,single_sparse",
    ])
    train_cmd.main([
        "--dataset-name", "whatsthatbook", "--data", ds, "--out", run,
        "--lexical-index", idx, "--field-names", "title_dense,title_sparse",
        "--model-name", "synthetic", "--weights-lr", "0.1",
        "--train-batch-size", "4", "--max-epochs", "1", "--run-one-iteration",
        "--recall-k", "10", "--dev-batch-size", "8",
    ])
    mask_cmd.main([
        "--dataset-name", "whatsthatbook", "--data", ds, "--out", mask,
        "--lexical-index", idx, "--checkpoint-dir", run,
        "--field-names", "title_dense,title_sparse", "--model-name", "synthetic",
        "--recall-k", "10", "--dev-batch-size", "8",
    ])
    lines = [json.loads(l) for l in open(os.path.join(mask, "results_dicts.jsonl"))]
    masked = [l["masked_fields"] for l in lines]
    assert masked[0] == ""  # baseline first
    assert len(masked) >= 4  # per-index + all-sparse + all-dense + per-name