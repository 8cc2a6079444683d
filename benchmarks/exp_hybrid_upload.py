"""Hybrid postings-upload overlap breakdown (VERDICT round 4, item 4).

python benchmarks/exp_hybrid_upload.py [N] [B]

Round 4 measured the single-chip exact-hybrid e2e swinging 115-479 QPS at
B=256 across the day while the on-chip scan costs ~42 ms/batch.  The
suspect: the per-batch postings upload (ids i32 + vals f32 + fidx i8,
~36 MB at B=256 in this synthetic world) riding the rig's ~75 MB/s relay.
This experiment answers two questions the verdict asks:

1. BREAKDOWN -- per-batch cost of each serial stage measured in isolation:
   host postings prep (native BM25 + concat/pad), postings H2D upload,
   query encode, and the fused scan with PRE-STAGED device postings.  If
   e2e/batch ~= max(stages) the retrieve_many window-4 pipeline overlaps
   them; if e2e ~= sum(stages) nothing overlaps and an explicit double
   buffer is warranted.
2. VARIANCE -- five back-to-back pipelined retrieve_many runs in ONE
   process.  Round 4's 115-479 spread mixes different processes hours
   apart (relay state, host load); the in-process spread is what the
   MicroBatcher/pipeline can actually be blamed for.

Relay-safe timing: every device region ends in one scalar fetch.
"""

import json
import sys
import time


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_engine import make_world, random_queries

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mfar_tpu.ops.scoring import fused_hybrid_topk_postings_from_query
    from mfar_tpu.train.data_pipeline import clean_query

    world = make_world(N, hybrid=True)
    engine = world["engine"]
    queries = random_queries(world, B)
    cleaned = [clean_query(q) for q in queries]

    engine.retrieve(queries, top_k=100)  # compile + warm every stage
    print("warm done", flush=True)

    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    parts = {}

    # --- stage: host postings prep (native BM25 postings + concat + pad)
    raw = engine._sparse_postings_raw(cleaned)
    assert raw is not None, "synthetic postings fell on the dense path"
    parts["prep_host_ms"] = best(lambda: engine._sparse_postings_raw(cleaned))
    ids, vals, fidx = raw
    parts["upload_mb"] = round(
        (ids.nbytes + vals.nbytes + fidx.nbytes) / 2**20, 1
    )

    # --- stage: postings upload (H2D), synced by one fused scalar fetch
    sync = jax.jit(
        lambda a, b, c: a.sum() + b.sum().astype(jnp.float32)
        + c.sum(dtype=jnp.int32).astype(jnp.float32)
    )
    di, dv, df = jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(fidx)
    float(sync(dv, di, df))  # compile the sync program off the clock

    def upload():
        a, b, c = jnp.asarray(vals), jnp.asarray(ids), jnp.asarray(fidx)
        float(sync(a, b, c))

    parts["upload_ms"] = best(upload)

    # --- stage: query encode (tokenize host + device fwd + fetch)
    parts["encode_ms"] = best(lambda: float(engine.encode_queries(queries).sum()))

    # --- stage: the fused scan with everything PRE-STAGED on device
    q = engine.encode_queries(queries)
    W = engine.mixer_params["weight"]
    fd = len(engine.dense_keys)
    from mfar_tpu.eval.retrieval import topk_chunk

    chunk = topk_chunk(engine.n_docs, B)

    def scan():
        s, i = fused_hybrid_topk_postings_from_query(
            q, W, None, engine.docs_flat, di, dv, df,
            jnp.int32(engine.n_docs), fd, 100, chunk_size=chunk,
        )
        float(s[:, 0].sum())

    scan()  # warm (retrieve warmed this program already; keep it honest)
    parts["scan_ms"] = best(scan)

    parts["serial_sum_ms"] = round(
        parts["prep_host_ms"] + parts["upload_ms"] + parts["encode_ms"]
        + parts["scan_ms"], 1,
    )

    # --- e2e single-batch (no pipeline) and five back-to-back pipelined runs
    parts["e2e_batch_ms"] = best(lambda: engine.retrieve(queries, top_k=100))
    many_q = random_queries(world, B * 4)
    engine.retrieve_many(many_q, top_k=100, batch_size=B)  # warm shapes
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        engine.retrieve_many(many_q, top_k=100, batch_size=B)
        runs.append(len(many_q) / (time.perf_counter() - t0))
    parts["pipelined_qps_runs"] = [round(r, 1) for r in runs]
    parts["pipelined_variance_x"] = round(max(runs) / min(runs), 2)
    parts["pipelined_batch_ms"] = round(B / np.median(runs) * 1000, 1)

    print(
        "hybrid_upload_breakdown "
        + json.dumps({k: round(v, 1) if isinstance(v, float) else v
                      for k, v in parts.items()}),
        flush=True,
    )


if __name__ == "__main__":
    main()
