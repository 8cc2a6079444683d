"""Shared synthetic serving world for the engine/server benchmarks.

One contriever-shape engine over an N-doc corpus: device-generated bf16
corpus matrix (host generation of 4B floats takes ~3 min on the 1-vCPU
host and the 8 GB H2D rides the relay), random-vocab tokenizer + encoder,
optional BM25 sparse field.  Keep exp_engine.py and exp_server.py (and any
future serving benchmark) on THIS builder so they measure the same world.
"""

import time

import numpy as np


def make_world(N: int, hybrid: bool = False, seed: int = 0,
               corpus_on_host: bool = False, quantize=None,
               dense_topk: str = "exact", mode: str = "exact",
               use_pallas_gather="auto"):
    """Returns dict(engine, warr, tok, rng) -- ready to serve."""
    import jax
    import jax.numpy as jnp

    from mfar_tpu.utils.compile_cache import enable as _cc

    _cc()

    from mfar_tpu.data.schema import resolve_fields
    from mfar_tpu.eval.index_build import make_encode_fn
    from mfar_tpu.eval.retrieval import RetrievalEngine
    from mfar_tpu.models import SimpleVocabTokenizer
    from mfar_tpu.models.encoder import Encoder, EncoderConfig, init_params

    rng = np.random.default_rng(seed)
    E, FD = 768, 5
    t0 = time.perf_counter()
    if corpus_on_host:
        # HOST bf16 corpus, built in slabs to cap peak RAM at ~N*FD*E*2
        # bytes + one f32 slab (the whole point of this mode is corpora
        # that do not fit HBM, so never materialize f32 wholesale).
        import ml_dtypes

        matrix = np.empty((N, FD * E), ml_dtypes.bfloat16)
        for lo in range(0, N, 65536):
            hi = min(N, lo + 65536)
            matrix[lo:hi] = rng.standard_normal(
                (hi - lo, FD * E), dtype=np.float32
            ).astype(ml_dtypes.bfloat16)
        print(f"corpus matrix (host bf16): {time.perf_counter()-t0:.1f}s", flush=True)
    else:
        matrix = jax.random.normal(jax.random.PRNGKey(0), (N, FD * E), jnp.bfloat16)
        matrix.block_until_ready()
        print(f"corpus matrix (device): {time.perf_counter()-t0:.1f}s", flush=True)

    words = [f"w{i}" for i in range(5000)]
    warr = np.array(words)
    tok = SimpleVocabTokenizer.build([" ".join(words) + " warmup"], max_length=64)
    config = EncoderConfig(vocab_size=tok.vocab_size, remat=False)
    encode = make_encode_fn(Encoder(config), init_params(config, seed=0))

    field_info = resolve_fields("all_dense", "mag")
    sparse_indices = {}
    n_fields = FD
    if hybrid:
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
        recall_k=100,
        mode=mode,
        corpus_on_host=corpus_on_host,
        quantize=quantize,
        dense_topk=dense_topk,
        use_pallas_gather=use_pallas_gather,
    )
    print(f"engine build: {time.perf_counter()-t0:.1f}s", flush=True)
    return dict(engine=engine, warr=warr, tok=tok, rng=rng,
                sparse_indices=sparse_indices)


def random_queries(world, n: int, terms: int = 8, seed=None):
    rng = world["rng"] if seed is None else np.random.default_rng(seed)
    warr = world["warr"]
    return [" ".join(warr[rng.integers(0, 5000, size=terms)]) for _ in range(n)]
