"""Engine end-to-end serving benchmark prototype.

python benchmarks/exp_engine.py [dense|hybrid] [N] [B]

Measures RetrievalEngine.retrieve (tokenize + encode + fold + fused top-k +
id mapping) with a contriever-base-shape random-init encoder over a
synthetic N-doc corpus (bf16 on device).  Hybrid adds one BM25 sparse field
(native engine) and uses the exact full-corpus hybrid path.
"""

import sys
import time

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "dense"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax
    import jax.numpy as jnp


    from mfar_tpu.data.schema import resolve_fields
    from mfar_tpu.eval.index_build import make_encode_fn
    from mfar_tpu.eval.retrieval import RetrievalEngine
    from mfar_tpu.models import SimpleVocabTokenizer
    from mfar_tpu.models.encoder import Encoder, EncoderConfig, init_params

    rng = np.random.default_rng(0)
    E, FD = 768, 5
    t0 = time.perf_counter()
    # Generated ON DEVICE: host-side generation of 4B floats takes ~3 min on
    # this 1-vCPU host and the 8 GB H2D rides the relay.  The engine accepts
    # a chunk-aligned jnp matrix directly (no pad -> no host round-trip).
    matrix = jax.random.normal(jax.random.PRNGKey(0), (N, FD * E), jnp.bfloat16)
    matrix.block_until_ready()
    print(f"corpus matrix (device): {time.perf_counter()-t0:.1f}s", flush=True)

    words = [f"w{i}" for i in range(5000)]
    warr = np.array(words)
    queries = [" ".join(warr[rng.integers(0, 5000, size=8)]) for _ in range(B)]
    tok = SimpleVocabTokenizer.build([" ".join(words)], max_length=64)

    config = EncoderConfig(vocab_size=tok.vocab_size, remat=False)
    params = init_params(config, seed=0)
    encode = make_encode_fn(Encoder(config), params)

    # mag's 5 fields, dense variants (the paper's mag all_dense config)
    field_info = resolve_fields("all_dense", "mag")
    sparse_indices = {}
    n_fields = FD
    if mode == "hybrid":
        field_info = resolve_fields("all_dense,title_sparse", "mag")
        from mfar_tpu.sparse.bm25 import BM25Index

        t0 = time.perf_counter()
        texts = [" ".join(warr[rng.integers(0, 5000, size=8)]) for _ in range(N)]
        sparse_indices = {"title_sparse": BM25Index.create(
            [(str(i), t) for i, t in enumerate(texts)])}
        print(f"bm25 build ({N}): {time.perf_counter()-t0:.1f}s", flush=True)
        n_fields = FD + 1

    t0 = time.perf_counter()
    engine = RetrievalEngine(
        field_info=field_info,
        doc_keys=[str(i) for i in range(N)],
        encode_fn=encode,
        tokenizer=tok,
        mixer_params={"weight": jnp.asarray(
            rng.normal(size=(E, n_fields)).astype(np.float32))},
        dense_matrix=matrix,
        sparse_indices=sparse_indices,
        query_max_length=64,
        mode="exact",
    )
    print(f"engine build (incl H2D): {time.perf_counter()-t0:.1f}s", flush=True)

    r = engine.retrieve(queries, top_k=100)  # compile + warm
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
    if mode == "hybrid":
        bm = sparse_indices["title_sparse"]
        parts["postings_host"] = best(lambda: bm.get_postings_batch(cleaned))
    parts["dispatch_host"] = best(lambda: engine._dispatch_exact(queries, 100))
    parts["e2e_batch"] = dt * 1000
    print("breakdown ms/batch: "
          + json.dumps({k: round(v, 1) for k, v in parts.items()}), flush=True)


if __name__ == "__main__":
    main()
