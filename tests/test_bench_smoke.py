"""bench.py smoke: the driver runs this file at the end of every round, so
its code paths must not bitrot.  Constants are patched down to CPU-friendly
sizes; numbers are not asserted, only that every section produces one."""

import json

import pytest

import bench


@pytest.fixture(autouse=True)
def tiny_bench(monkeypatch):
    monkeypatch.setattr(bench, "N", 4096)
    monkeypatch.setattr(bench, "CHUNK", 1024)
    monkeypatch.setattr(bench, "B", 8)
    monkeypatch.setattr(bench, "Q", 2)
    monkeypatch.setattr(bench, "N_BASE", 512)


def test_op_and_baseline():
    docs = bench.make_docs()
    assert bench.op_qps(docs, 8, 2) > 0
    assert bench.baseline_qps() > 0


def test_engine_sections_dense_and_hybrid():
    docs = bench.make_docs()
    world = bench.engine_world(docs, num_layers=2, hidden=bench.E)
    dense = bench.make_engine(docs, world, hybrid=False)
    assert bench.engine_qps(dense, world, 8, "exact") > 0
    hybrid = bench.make_engine(docs, world, hybrid=True)
    assert bench.engine_qps(hybrid, world, 8, "exact") > 0
    assert bench.engine_qps(hybrid, world, 8, "rerank") > 0


def test_index_build_section():
    docs = bench.make_docs()
    world = bench.engine_world(docs, num_layers=2, hidden=64)
    assert bench.index_build_docs_per_s(world, n_docs=32, enc_batch=16) > 0


def test_main_json_line(monkeypatch, capsys):
    """MFAR_BENCH_FAST main prints exactly one parseable JSON line with the
    required keys."""
    monkeypatch.setenv("MFAR_BENCH_FAST", "1")
    bench.main()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline", "extra"} <= set(rec)
    assert rec["value"] > 0
