"""The scripts/ analysis layer runs end-to-end on synth artifacts
(reference counterpart: /root/reference/scripts/, flagged possibly stale;
ours stays tested)."""

import importlib.util
import sys
from pathlib import Path

import pytest

from mfar_tpu.data import trec
from mfar_tpu.data.synth import make_corpus, write_dataset_dir

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scripts_ds"))
    write_dataset_dir(root, make_corpus("amazon", 20), n_train=6, n_val=2)
    # a fabricated run file: gold doc ranked 2nd for every test query
    qrels = list(trec.QRels.from_file(f"{root}/test.qrels"))
    qres = []
    for r in qrels:
        decoy = "0" if r.doc_id != "0" else "1"
        qres.append(trec.QRes(r.query_id, decoy, 2.0, rank=0))
        qres.append(trec.QRes(r.query_id, r.doc_id, 1.0, rank=1))
    trec.write_qres(f"{root}/run.qres", qres)
    return root


def test_find_failures(ds, capsys):
    _load("find_failures").main(
        ["--data-path", ds, "--partition", "test", "--qres-path", f"{ds}/run.qres", "--k", "1"]
    )
    out = capsys.readouterr().out
    assert "QUERY:" in out and "Relevant documents" in out


def test_compare_results(ds, capsys):
    _load("compare_results").main([
        "--data-path", ds, "--partition", "test",
        "--res1", f"{ds}/run.qres", "--res2", f"{ds}/run.qres", "--k", "1",
    ])
    # identical runs -> no diffs reported
    assert "QUERY" not in capsys.readouterr().out


def test_corpus_stats(ds, capsys):
    _load("corpus_stats").main(
        ["--corpus", ds, "--dataset-name", "amazon", "--field-names", "all_dense"]
    )
    out = capsys.readouterr().out
    assert "title" in out and "20 documents" in out
