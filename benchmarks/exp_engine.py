"""Engine end-to-end serving benchmark prototype.

python benchmarks/exp_engine.py \
    [dense|dense-int8|dense-approx|hybrid|dense-host|dense-host-int8|hybrid-host\
|dense-rerank|dense-rerank-xla] [N] [B]

The dense-rerank modes run a DEDICATED rerank-mode engine (recall + stage-2
candidate gather): ``dense-rerank`` takes the engine default (the auto
cost-model gate enables the Pallas DMA gather on TPU when the corpus fits
half of HBM), ``dense-rerank-xla`` forces the XLA row-gather -- the A/B for
the gate's win.

Measures RetrievalEngine.retrieve (tokenize + encode + fold + fused top-k +
id mapping) with a contriever-base-shape random-init encoder over a
synthetic N-doc corpus (bf16 on device).  Hybrid adds one BM25 sparse field
(native engine) and uses the exact full-corpus hybrid path.  The dense-host
modes keep the corpus in HOST RAM and stream chunks per scan
(--corpus-on-host; int8 halves the streamed bytes) -- expect
H2D-bandwidth-bound numbers, priced here so the capacity escape hatch has a
measured cost.
"""

import sys
import time


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "dense"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_engine import make_world, random_queries

    rerank = mode.startswith("dense-rerank")
    world = make_world(
        N, hybrid=mode.startswith("hybrid"),
        corpus_on_host="-host" in mode,
        quantize="int8" if mode.endswith("-int8") else None,
        dense_topk="approx" if mode.endswith("-approx") else "exact",
        mode="rerank" if rerank else "exact",
        use_pallas_gather=False if mode == "dense-rerank-xla" else "auto",
    )
    engine, tok = world["engine"], world["tok"]
    sparse_indices = world["sparse_indices"]
    queries = random_queries(world, B)

    engine.retrieve(queries, top_k=100)  # compile + warm
    print("warm done", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        engine.retrieve(queries, top_k=100)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"engine_{mode}_qps N={N} B={B}: {B/dt:.0f} qps ({dt*1000:.0f} ms/batch)",
          flush=True)

    # Pipelined path (what the retrieve CLI runs): window-4 dispatch-ahead
    # hides the per-batch fetch round-trip + next batch's host prep.
    many_q = queries * 4
    engine.retrieve_many(many_q, top_k=100, batch_size=B)  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        engine.retrieve_many(many_q, top_k=100, batch_size=B)
        times.append(time.perf_counter() - t0)
    dtp = min(times)
    print(f"engine_{mode}_pipelined_qps N={N} B={B}: {len(many_q)/dtp:.0f} qps",
          flush=True)

    # Dispatch-side overhead accounting (each region timed separately,
    # relay-safe: device regions end in one tiny host fetch).
    import json

    from mfar_tpu.train.data_pipeline import clean_query

    cleaned = [clean_query(q) for q in queries]

    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    tok_ms = best(lambda: tok.encode_batch(cleaned, 64))
    enc_ms = best(lambda: float(engine.encode_queries(queries).sum()))
    parts = {"tokenize_host": tok_ms, "encode_plus_fetch": enc_ms}
    if mode.startswith("hybrid"):
        bm = sparse_indices["title_sparse"]
        parts["postings_host"] = best(lambda: bm.get_postings_batch(cleaned))
    if rerank:
        parts["dispatch_host"] = best(lambda: engine._rerank_dispatch(queries))
        parts["pallas_gather"] = engine.docs_rows is not None
    else:
        parts["dispatch_host"] = best(lambda: engine._dispatch_exact(queries, 100))
    parts["e2e_batch"] = dt * 1000
    print("breakdown ms/batch: "
          + json.dumps({k: round(v, 1) for k, v in parts.items()}), flush=True)


if __name__ == "__main__":
    main()
