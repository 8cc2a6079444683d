"""Multi-host runtime integration: 2 processes x 4 virtual CPU devices.

The reference's runtime is multi-process by construction (Lightning DDP,
reference mfar/commands/train.py:246-250); this test proves our
jax.distributed equivalent end-to-end: the REAL train CLI runs in two
spawned processes over one 8-device global mesh (full sharded train step +
proxy validation + corpus reindex + exact hybrid retrieval eval + process-0
checkpointing), and its per-epoch metrics must match a single-process run
on an 8-device mesh -- same global math, different runtime wiring.
"""

import json
import os
import subprocess
import sys

import pytest

from mfar_tpu.commands import (
    create_sparse_index,
    make_synth_data,
    precompute_sparse_scores,
)
from mfar_tpu.commands import train as train_cmd

TRAIN_FLAGS = [
    "--field-names", "title_dense,title_sparse",
    "--model-name", "synthetic", "--weights-lr", "0.1",
    "--train-batch-size", "8", "--max-epochs", "2",
    "--trec-val-freq", "1", "--recall-k", "10", "--dev-batch-size", "8",
]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh")
    d = {k: str(root / k) for k in ("ds", "idx", "scores", "single", "p0", "p1")}
    make_synth_data.main(["--out", d["ds"], "--n-docs", "30", "--n-train", "12", "--n-val", "4"])
    create_sparse_index.main([
        "--data-path", d["ds"], "--dataset-name", "amazon",
        "--output-path", d["idx"], "--fields-str", "title_sparse,single_sparse",
    ])
    precompute_sparse_scores.main([
        "--data-path", d["ds"], "--dataset-name", "amazon",
        "--corpus-path", d["ds"], "--output-path", d["scores"],
        "--index-path", d["idx"], "--fields-str", "title_sparse",
    ])
    return d


def run_pair(d, outs, extra=()):
    """Spawn the 2-process worker pair; returns their outputs."""
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "MFAR_COORDINATOR",
                        "MFAR_NUM_PROCESSES", "MFAR_PROCESS_ID")}
    procs = []
    for pid, out in outs:
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", "29731",
             d["ds"], d["idx"], d["scores"], out, *extra],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    texts = []
    for p in procs:
        try:
            out_text, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out_text, _ = p.communicate()
        texts.append(out_text)
    for i, (p, out_text) in enumerate(zip(procs, texts)):
        assert p.returncode == 0, f"worker {i} failed:\n{out_text[-4000:]}"
    return texts


def read_metrics(out_dir):
    path = os.path.join(out_dir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    return [r for r in rows if r.get("event") == "metrics" and "train_loss" in r]


def test_two_process_train_matches_single_process(world):
    d = world
    # Baseline: single process, 8 virtual devices (conftest), mesh auto.
    train_cmd.main([
        "--dataset-name", "amazon", "--data", d["ds"], "--out", d["single"],
        "--lexical-index", d["idx"], "--sparse-scores-path", d["scores"],
        *TRAIN_FLAGS,
    ])
    base = read_metrics(d["single"])
    assert len(base) == 2

    # 2-process run of the SAME CLI via the multihost worker.
    run_pair(d, ((0, d["p0"]), (1, d["p1"])))

    # Only process 0 writes artifacts...
    mh = read_metrics(d["p0"])
    assert os.path.exists(os.path.join(d["p0"], "best.txt"))
    assert os.path.exists(os.path.join(d["p0"], "results_dicts.jsonl"))
    # ...process 1 writes nothing.
    assert not os.path.exists(os.path.join(d["p1"], "metrics.jsonl"))
    assert not os.path.exists(os.path.join(d["p1"], "results_dicts.jsonl"))
    assert not os.path.exists(os.path.join(d["p1"], "checkpoints"))

    # Same global math: per-epoch losses match the single-process mesh run
    # (tolerance covers cross-process collective reduction-order drift).
    assert len(mh) == len(base)
    for row_mh, row_base in zip(mh, base):
        for key in ("train_loss", "valid_loss", "dev_ndcg_cut_10"):
            if key in row_base:
                assert abs(row_mh[key] - row_base[key]) <= 2e-3 + 1e-3 * abs(row_base[key]), (
                    key, row_mh, row_base,
                )


def test_two_process_tensor_parallel_checkpointing(world, tmp_path):
    """n_model=2 under multihost: encoder params shard over the model axis
    ACROSS processes, and process-0 checkpointing allgathers the
    tensor-parallel leaves (collective _host_state) -- the run completes
    with a best.txt + checkpoints on process 0 only, and its metrics match
    a single-process n_model=2 run."""
    d = world
    single = str(tmp_path / "tp_single")
    # --retrieval-mode rerank additionally covers the compat serving mode
    # under multihost (stage-2 host arrays need replicated global placement).
    extra = ("--n-model", "2", "--retrieval-mode", "rerank")
    train_cmd.main([
        "--dataset-name", "amazon", "--data", d["ds"], "--out", single,
        "--lexical-index", d["idx"], "--sparse-scores-path", d["scores"],
        *TRAIN_FLAGS, *extra,
    ])
    base = read_metrics(single)

    p0, p1 = str(tmp_path / "tp_p0"), str(tmp_path / "tp_p1")
    run_pair(d, ((0, p0), (1, p1)), extra=extra)
    assert os.path.exists(os.path.join(p0, "best.txt"))
    assert not os.path.exists(os.path.join(p1, "checkpoints"))
    mh = read_metrics(p0)
    assert len(mh) == len(base)
    for row_mh, row_base in zip(mh, base):
        for key in ("train_loss", "valid_loss", "dev_ndcg_cut_10"):
            if key in row_base:
                assert abs(row_mh[key] - row_base[key]) <= 2e-3 + 1e-3 * abs(row_base[key]), (
                    key, row_mh, row_base,
                )
