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
    # Phases run in-process here so the patches above apply; the production
    # orchestrator spawns each phase as its own process (fresh HBM).
    monkeypatch.setenv("MFAR_BENCH_INPROCESS", "1")


def test_op_and_baseline():
    docs = bench.make_docs()
    assert bench.op_qps(docs, 8, 2) > 0
    assert bench.op_qps_int8(docs, 8, 2) > 0
    assert bench.baseline_qps() > 0


def test_baseline_e2e_slower_than_scan():
    """The e2e twin adds the encode stage, so it must be strictly slower
    than the scan-only baseline (the headline's fairness invariant)."""
    scan = bench.baseline_qps()
    e2e = bench.baseline_e2e_qps(scan)
    assert 0 < e2e < scan


def test_served_soak_section():
    """The online-daemon soak serves real results and records latency."""
    docs = bench.make_docs()
    world = bench.engine_world(docs, num_layers=2, hidden=bench.E)
    engine = bench.make_engine(docs, world, hybrid=False)
    extra = {}
    qps = bench.served_soak(engine, world, extra, seconds=1.0, n_clients=2,
                            max_batch=8, wait_ms=5.0, depth=2)
    assert qps > 0
    assert extra["served_latency_ms_p50"] > 0
    assert extra["served_latency_ms_p95"] >= extra["served_latency_ms_p50"]
    assert 0 < extra["served_batch_fill"] <= 1


def test_engine_sections_dense_and_hybrid():
    docs = bench.make_docs()
    world = bench.engine_world(docs, num_layers=2, hidden=bench.E)
    dense = bench.make_engine(docs, world, hybrid=False)
    assert bench.engine_qps(dense, world, 8, "exact") > 0
    dense_i8 = bench.make_engine(docs, world, hybrid=False, quantize="int8")
    assert bench.engine_qps(dense_i8, world, 8, "exact") > 0
    hybrid = bench.make_engine(docs, world, hybrid=True)
    assert bench.engine_qps(hybrid, world, 8, "exact") > 0
    assert bench.engine_qps(hybrid, world, 8, "rerank") > 0


def test_index_build_section():
    docs = bench.make_docs()
    world = bench.engine_world(docs, num_layers=2, hidden=64)
    assert bench.index_build_docs_per_s(world, n_docs=32, enc_batch=16) > 0


def test_main_json_line(monkeypatch, capsys):
    """MFAR_BENCH_FAST main prints exactly one parseable JSON line with the
    required keys; the headline is the default-path ENGINE e2e with the op
    numbers preserved as extras."""
    monkeypatch.setenv("MFAR_BENCH_FAST", "1")
    monkeypatch.setattr(bench, "backend_probe", lambda t: (True, "patched"))
    full_world = bench.engine_world
    monkeypatch.setattr(  # CPU-sized encoder for the smoke
        bench, "engine_world",
        lambda docs: full_world(docs, num_layers=2, hidden=bench.E))
    bench.main()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline", "extra"} <= set(rec)
    assert rec["metric"] == "dense_engine_e2e_qps"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert rec["extra"]["status"] == "ok"
    assert rec["extra"]["op_topk_qps"] > 0
    assert rec["extra"]["op_vs_baseline"] > 0
    assert rec["extra"]["engine_dense_exact_qps"] == rec["value"]


def test_main_engine_failure_falls_back_to_op(monkeypatch, capsys):
    """If the engine build dies mid-run (relay), the line still carries the
    op headline, labeled engine-headline-failed."""
    monkeypatch.setenv("MFAR_BENCH_FAST", "1")
    monkeypatch.setattr(bench, "backend_probe", lambda t: (True, "patched"))

    def boom(docs):
        raise RuntimeError("relay died mid-engine-build")

    monkeypatch.setattr(bench, "engine_world", boom)
    assert bench.main() == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    rec = json.loads(lines[0])
    assert rec["metric"] == "fused_multifield_topk_qps"
    assert rec["extra"]["status"] == "engine-headline-failed"
    assert rec["value"] > 0
    assert "relay died" in rec["extra"]["engine_error"]


def test_backend_probe_real():
    """The out-of-process probe succeeds against the test backend (CPU)."""
    ok, info = bench.backend_probe(180.0)
    assert ok, info


def test_main_backend_unavailable(monkeypatch, capsys):
    """A dead relay yields a parseable status line and rc=0, not a crash
    (round-2 failure mode: BENCH_r02.json rc=1, parsed=null)."""
    monkeypatch.setattr(bench, "backend_probe", lambda t: (False, "relay gone"))
    assert bench.main() == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["extra"]["status"] == "backend-unavailable"
    assert rec["extra"]["probe"] == "relay gone"
    assert rec["value"] == 0


def test_main_headline_failure_still_emits(monkeypatch, capsys):
    """A relay dying mid-headline still produces the JSON line with rc=0."""
    monkeypatch.setenv("MFAR_BENCH_FAST", "1")
    monkeypatch.setattr(bench, "backend_probe", lambda t: (True, "patched"))

    def boom():
        raise RuntimeError("relay died mid-run")

    monkeypatch.setattr(bench, "make_docs", boom)
    assert bench.main() == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    rec = json.loads(lines[0])
    assert rec["extra"]["status"] == "headline-failed"
    assert "relay died" in rec["extra"]["error"]


def test_phase_child_protocol_bad_phase(monkeypatch):
    """The REAL subprocess protocol: an unknown phase still exits 0 with a
    parseable sentinel line carrying phase_error (the orchestrator's
    contract: a wedged/broken child never kills the one JSON line)."""
    monkeypatch.delenv("MFAR_BENCH_INPROCESS", raising=False)
    res = bench.run_child("no-such-phase", timeout_s=300.0)
    assert "phase_error" in res
    assert "KeyError" in res["phase_error"]


def test_main_merges_isolated_phases(monkeypatch, capsys):
    """The orchestrator merges per-phase extras into the one JSON line and
    records a failed phase as a null headline key instead of dying."""
    monkeypatch.delenv("MFAR_BENCH_FAST", raising=False)
    monkeypatch.setattr(bench, "backend_probe", lambda t: (True, "patched"))
    monkeypatch.setattr(
        bench, "run_phase_main",
        lambda: dict(qps=100.0, base=10.0, status="ok",
                     extra={"engine_dense_exact_qps": 100.0}))
    monkeypatch.setitem(bench.PHASE_FNS, "main", bench.run_phase_main)
    monkeypatch.setitem(
        bench.PHASE_FNS, "rerank",
        lambda: {"engine_dense_rerank_qps": 42.0})
    monkeypatch.setitem(
        bench.PHASE_FNS, "train",
        lambda: (_ for _ in ()).throw(RuntimeError("phase OOM")))
    monkeypatch.setitem(
        bench.PHASE_FNS, "dist",
        lambda: {"train_step_dist_ms": 5.0, "train_padding_pct": 50.0})
    assert bench.main() == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["value"] == 100.0
    assert rec["vs_baseline"] == 10.0
    assert rec["extra"]["engine_dense_rerank_qps"] == 42.0
    assert rec["extra"]["train_step_ms"] is None  # failed phase -> null key
    assert rec["extra"]["train_step_dist_ms"] == 5.0
    assert rec["extra"]["status"] == "ok"


def test_main_retries_timed_out_phase(monkeypatch, capsys):
    """A phase that times out retries exactly once (the compile cache makes
    the retry resume further along); hard failures don't retry."""
    monkeypatch.delenv("MFAR_BENCH_FAST", raising=False)
    monkeypatch.setattr(bench, "backend_probe", lambda t: (True, "patched"))
    monkeypatch.setattr(
        bench, "run_phase_main",
        lambda: dict(qps=100.0, base=10.0, status="ok", extra={}))
    monkeypatch.setitem(bench.PHASE_FNS, "main", bench.run_phase_main)
    calls = {"train": 0, "rerank": 0}

    def flaky_train():
        calls["train"] += 1
        if calls["train"] == 1:
            raise RuntimeError("simulated: phase train timed out after 600s")
        return {"train_step_ms": 7.0}

    def hard_fail_rerank():
        calls["rerank"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED")

    monkeypatch.setitem(bench.PHASE_FNS, "train", flaky_train)
    monkeypatch.setitem(bench.PHASE_FNS, "rerank", hard_fail_rerank)
    monkeypatch.setitem(bench.PHASE_FNS, "dist", lambda: {"train_step_dist_ms": 5.0})
    assert bench.main() == 0
    rec = json.loads([l for l in capsys.readouterr().out.strip().splitlines()
                      if l.startswith("{")][0])
    assert calls["train"] == 2  # timed out once, retried, succeeded
    assert calls["rerank"] == 1  # hard failure: no retry
    assert rec["extra"]["train_step_ms"] == 7.0
    assert rec["extra"]["engine_dense_rerank_qps"] is None


def test_main_retries_crashed_phase_and_main(monkeypatch, capsys):
    """Pre-sentinel crashes (child died at backend init: 'produced no
    result') retry once, like timeouts; the main phase gets the same
    treatment.  Measured trigger: one transient relay FAILED_PRECONDITION
    with the chip answering a matmul 60 s later."""
    monkeypatch.delenv("MFAR_BENCH_FAST", raising=False)
    monkeypatch.setattr(bench, "backend_probe", lambda t: (True, "patched"))
    calls = {"main": 0, "dist": 0}

    def flaky_main():
        calls["main"] += 1
        if calls["main"] == 1:
            raise RuntimeError("phase main produced no result (rc=1)")
        return dict(qps=100.0, base=10.0, status="ok", extra={})

    def flaky_dist():
        calls["dist"] += 1
        if calls["dist"] == 1:
            raise RuntimeError("phase dist produced no result (rc=1)")
        return {"train_step_dist_ms": 5.0}

    monkeypatch.setitem(bench.PHASE_FNS, "main", flaky_main)
    monkeypatch.setitem(bench.PHASE_FNS, "rerank",
                        lambda: {"engine_dense_rerank_qps": 42.0})
    monkeypatch.setitem(bench.PHASE_FNS, "train",
                        lambda: {"train_step_ms": 7.0})
    monkeypatch.setitem(bench.PHASE_FNS, "dist", flaky_dist)
    assert bench.main() == 0
    rec = json.loads([l for l in capsys.readouterr().out.strip().splitlines()
                      if l.startswith("{")][0])
    assert calls["main"] == 2 and calls["dist"] == 2
    assert rec["value"] == 100.0
    assert rec["extra"]["train_step_dist_ms"] == 5.0
    assert rec["extra"]["status"] == "ok"


def test_backend_probe_retries_transient(monkeypatch):
    """The probe retries transient failures instead of zeroing the round."""
    attempts = []

    def flaky_once(timeout_s):
        attempts.append(timeout_s)
        if len(attempts) == 1:
            return False, "FAILED_PRECONDITION: TPU backend error"
        return True, "PROBE_OK 2097152.0 tpu"

    monkeypatch.setattr(bench, "_backend_probe_once", flaky_once)
    ok, info = bench.backend_probe(60.0, attempts=3, backoff_s=0.0)
    assert ok and "PROBE_OK" in info
    assert len(attempts) == 2


def test_train_step_dist_section():
    """STaRK-like-lengths train section: runs tiny on CPU, stats populated
    and internally consistent (useful <= computed FLOPs, padding in (0,1))."""
    stats = {}
    ms = bench.train_step_dist(stats, b=4, num_layers=1, hidden=64)
    assert ms > 0
    assert 0 < stats["padding_pct"] < 100
    assert 0 < stats["useful_flops"] < stats["computed_flops"]
