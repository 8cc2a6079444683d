"""Online serving daemon benchmark: HTTP + micro-batching over a synthetic
corpus.

    python benchmarks/exp_server.py [N] [MAX_BATCH] [N_CLIENTS] [SECONDS]

Spins the RetrievalServer on a contriever-shape engine over an N-doc
corpus (same world as exp_engine dense), then fires N_CLIENTS closed-loop
HTTP clients (each sends one 8-query request, waits, repeats) for SECONDS.
Reports served QPS and request latency percentiles -- the number the batch
engine benchmarks can't show: what the micro-batcher + HTTP frontend cost
on top of the device scan.
"""

import http.client
import json
import sys
import threading
import time


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    MAX_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    N_CLIENTS = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    SECONDS = float(sys.argv[4]) if len(sys.argv) > 4 else 20.0
    DEPTH = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    QUERIES_PER_REQ = 8

    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_engine import make_world

    from mfar_tpu.serve import RetrievalServer

    world = make_world(N)
    engine, warr = world["engine"], world["warr"]

    srv = RetrievalServer(engine, port=0, max_batch=MAX_BATCH,
                          max_wait_ms=float(os.environ.get("MFAR_SERVE_WAIT_MS", "5")), top_k=100, pipeline_depth=DEPTH)
    t0 = time.perf_counter()
    srv.warmup()
    print(f"warmup: {time.perf_counter()-t0:.1f}s", flush=True)
    srv.start_background()

    stop = threading.Event()
    counts = [0] * N_CLIENTS
    lats: list = [[] for _ in range(N_CLIENTS)]

    import numpy as np

    def client(ci: int):
        # One persistent HTTP/1.1 connection per closed-loop client: the
        # load generator shares the 1-vCPU host with the server, so
        # per-request connects + per-connection server threads would bill
        # harness overhead to the daemon.
        qrng = np.random.default_rng(ci)
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=300)
        while not stop.is_set():
            qs = [" ".join(warr[qrng.integers(0, 5000, size=8)])
                  for _ in range(QUERIES_PER_REQ)]
            t1 = time.perf_counter()
            try:
                conn.request(
                    "POST", "/retrieve",
                    json.dumps({"queries": qs, "top_k": 100}),
                    {"Content-Type": "application/json"},
                )
                json.loads(conn.getresponse().read())
            except (OSError, http.client.HTTPException):
                if stop.is_set():
                    break  # shutdown race: server closed the keep-alive conn
                # Mid-run reset (1-vCPU host under load): reconnect like a
                # real client instead of dying and under-counting QPS.
                conn.close()
                conn = http.client.HTTPConnection(
                    srv.host, srv.port, timeout=300)
                continue
            lats[ci].append(time.perf_counter() - t1)
            counts[ci] += QUERIES_PER_REQ
        conn.close()

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(N_CLIENTS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(SECONDS)
    stop.set()
    for t in threads:
        t.join(timeout=300)
    dt = time.perf_counter() - t0

    total = sum(counts)
    all_lats = np.asarray([x for l in lats for x in l])
    print(json.dumps({
        "served_qps": round(total / dt, 1),
        "n_queries": total,
        "seconds": round(dt, 1),
        "latency_ms_p50": round(float(np.percentile(all_lats, 50)) * 1000, 1),
        "latency_ms_p95": round(float(np.percentile(all_lats, 95)) * 1000, 1),
        "server_stats": srv.batcher.stats(),
    }), flush=True)
    srv.shutdown()


if __name__ == "__main__":
    main()
