"""Benchmark: the serving/training engine on one TPU chip.

Headline: the DEFAULT serving path, end-to-end -- RetrievalEngine.retrieve
(tokenize + contriever-base-shape encode + field fold + exact fused top-k +
id mapping) over a 1M-doc corpus at the CLI's shipped defaults (exact
selection, bf16, B=256).  This is the number a user gets from the shipped
`retrieve` command; the reference does the same job with per-field CPU
torch matmuls over memmap chunks + python rerank
(mfar/data/index.py:181-232, mfar/modeling/contrastive.py:669-704).
`vs_baseline` is like-for-like e2e: the reference algorithm's encode
(contriever-shape torch CPU forward) + scan (torch CPU matmul + topk)
measured on this host on slices and scaled -- see baseline_e2e_qps.
`extra` adds the numbers the headline alone doesn't show:

- op_topk_qps / op_vs_baseline: the fused scoring+top-k op alone (approx
  selection), and its op-vs-op multiplier against the reference's scan --
  the headline of rounds 1-4, kept for round-over-round comparison;
- engine_hybrid_exact_qps: e2e with a BM25 sparse field streamed from host
  postings and densified on device;
- engine_dense_int8_qps: e2e with the int8 capacity engine (on-device
  quantization + the fused single-chip int8 serving program);
- served_qps / served_latency_ms_p50 / p95: the ONLINE daemon (HTTP
  frontend + pipelined MicroBatcher over the same engine) under a
  closed-loop soak -- what the batch numbers can't show;
- engine_dense_rerank_qps: a DEDICATED rerank-mode dense engine (recall +
  stage-2 candidate rerank, reference-compat semantics) at N=512K -- the
  largest power-of-two bf16 corpus whose pair view + scan workspace fit
  the auto cost-model gate, which enables the Pallas DMA-gather stage 2;
- topk_b512_qps: the fused op at B=512 with ids (the round-1 cliff);
- train_step_ms: mag all_dense-shape step (contriever-base, B=24, remat,
  rbg, attention-dropout 0, bf16 softmax -- the recommended flags);
- train_step_dist_ms / train_padding_pct / train_effective_mfu_pct: the
  same step on STaRK-like REAL token lengths under the shipped bucketed
  collation widths -- the padding tax full-length synthetic batches hide
  (train_mfu_pct counts padded tokens as useful; effective MFU does not);
- index_build_docs_per_s: corpus encoding throughput (fwd-only, seq 512).

Methodology: every timed region runs device work inside one jitted program
per dispatch round and ends with a single scalar/array host fetch -- the
TPU relay on this rig has ~35 ms round-trips and a non-blocking
block_until_ready, so per-batch fetches would dominate (see BENCH_NOTES.md).
Relay-proofing (round 3): before any device work, a SUBPROCESS probe runs a
tiny jitted matmul under a generous timeout (MFAR_BENCH_PROBE_TIMEOUT,
default 300 s); if the backend is unreachable the script still prints the
one JSON line, with extra.status="backend-unavailable", and exits 0 --
backend init cannot be interrupted in-process, which is why round 2's run
crashed (rc=1) instead of reporting.  Each section is independently
try/except'd and the headline itself is guarded: the one JSON line always
prints.

Phase isolation (round 5): the top-level invocation is an ORCHESTRATOR
that does no device work itself; it runs the probe, then each phase as a
sequential SUBPROCESS (one TPU config per process, per the relay rules)
and merges their extras into the one JSON line.  The "main" phase carries
the headline + the engine/op/daemon sections; the HBM-hungry sections --
the N=512K rerank engine (~12.9 GiB with two corpus views) and the two
train steps (~15.75 of 16 GiB) -- each get a FRESH process and therefore
fresh HBM.  Round 5's first full run proved this necessary: in one shared
process, residual device allocations from ten prior engine sections (jit
caches, encoder executables, allocator fragmentation) OOM'd exactly those
three sections even though each fits comfortably alone.  Each child is
bounded by its own timeout (MFAR_BENCH_MAIN_TIMEOUT / MFAR_BENCH_PHASE_
TIMEOUT) so a mid-run relay wedge cannot hang past the driver's clock.

Baseline: the reference's own retrieval algorithm (torch CPU matmul + topk)
measured on this host over a corpus slice and scaled linearly in N.

Set MFAR_BENCH_FAST=1 to print the headline only (~2 min instead of ~10).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

B = 256  # headline query batch
Q = 40  # batches per timed program
F = 5  # dense fields (mag all_dense)
E = 768  # contriever dim
K = 100  # retrieval depth
N = 1_048_576  # corpus size
CHUNK = 524288
N_BASE = 50_000  # baseline slice (scaled linearly)


def make_docs():
    import jax
    import jax.numpy as jnp

    return jax.random.normal(jax.random.PRNGKey(0), (N, F * E), jnp.bfloat16)


def op_qps(docs, b: int, q_batches: int) -> float:
    import jax
    import jax.numpy as jnp

    from mfar_tpu.ops.scoring import dense_topk_chunked_approx

    qs = jax.random.normal(jax.random.PRNGKey(1), (q_batches, b, F * E), jnp.bfloat16)

    @jax.jit
    def run_all(qs, d):
        def step(_, q):
            s, i = dense_topk_chunked_approx(q, d, jnp.int32(N), k=K, chunk_size=CHUNK)
            return None, s[:, 0].sum() + i[:, 0].max().astype(jnp.float32)

        _, outs = jax.lax.scan(step, None, qs)
        return outs.sum()

    float(run_all(qs, docs))  # compile + warm (host fetch = relay-safe sync)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_all(qs, docs))
        times.append(time.perf_counter() - t0)
    return q_batches * b / min(times)


def op_qps_int8(docs, b: int, q_batches: int) -> float:
    """int8 twin of :func:`op_qps`: quantized corpus (half the HBM), int8
    MXU scan (v5e peaks ~2x the bf16 rate).  Quantizes the bf16 corpus on
    device once; selection stays the PartialReduce."""
    import jax
    import jax.numpy as jnp

    from mfar_tpu.ops.scoring import (
        dense_topk_chunked_approx_int8,
        quantize_rows_int8,
    )

    docs_q, scales = jax.jit(quantize_rows_int8)(docs)
    docs_q.block_until_ready()
    qs = jax.random.normal(jax.random.PRNGKey(1), (q_batches, b, F * E), jnp.bfloat16)

    @jax.jit
    def run_all(qs, dq, ds):
        def step(_, q):
            s, i = dense_topk_chunked_approx_int8(
                q, dq, ds, jnp.int32(N), k=K, chunk_size=CHUNK
            )
            return None, s[:, 0].sum() + i[:, 0].max().astype(jnp.float32)

        _, outs = jax.lax.scan(step, None, qs)
        return outs.sum()

    float(run_all(qs, docs_q, scales))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_all(qs, docs_q, scales))
        times.append(time.perf_counter() - t0)
    return q_batches * b / min(times)


def baseline_qps() -> float:
    """Reference algorithm on this host: torch CPU matmul + topk over a
    corpus slice, scaled linearly to N rows."""
    import torch

    torch.manual_seed(0)
    docs = torch.randn(N_BASE, F * E)
    q = torch.randn(B, F * E)
    scores = q @ docs.T
    torch.topk(scores, K, dim=1)  # warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        scores = q @ docs.T
        torch.topk(scores, K, dim=1)
    dt = (time.perf_counter() - t0) / iters
    return B / (dt * (N / N_BASE))


def baseline_encode_qps() -> float:
    """Reference query-encode twin on this host: contriever-shape (=
    bert-base) torch CPU forward at the serving query length, random init
    (shape, not weights, sets the speed), measured on a small batch and
    scaled linearly in queries.  The reference encodes queries through
    exactly this stack before its CPU scan (mfar/modeling/encoders.py,
    HF BertModel), so encode + scan is its end-to-end serving cost."""
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    model = BertModel(BertConfig())
    model.eval()
    b_slice = 4
    ids = torch.randint(1000, 30000, (b_slice, 64))
    mask = torch.ones_like(ids)
    with torch.no_grad():
        model(input_ids=ids, attention_mask=mask)  # warm
        iters = 2
        t0 = time.perf_counter()
        for _ in range(iters):
            model(input_ids=ids, attention_mask=mask)
        dt = (time.perf_counter() - t0) / iters
    return b_slice / dt


def baseline_e2e_qps(scan_qps: float) -> float:
    """Per-query harmonic combination of the reference twin's two serial
    stages (encode then scan): the like-for-like denominator for the e2e
    headline."""
    enc = baseline_encode_qps()
    return 1.0 / (1.0 / enc + 1.0 / scan_qps)


def engine_world(docs, num_layers: int = 12, hidden: int = 768):
    """Shared serving world: tokenizer + contriever-shape encoder + queries
    (tests shrink the encoder via the size args)."""
    import numpy as np

    from mfar_tpu.eval.index_build import make_encode_fn
    from mfar_tpu.models import SimpleVocabTokenizer
    from mfar_tpu.models.encoder import Encoder, EncoderConfig, init_params

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(5000)]
    warr = np.array(words)
    tok = SimpleVocabTokenizer.build([" ".join(words)], max_length=64)
    config = EncoderConfig(
        vocab_size=tok.vocab_size, remat=False, num_layers=num_layers,
        hidden_size=hidden, intermediate_size=4 * hidden,
        num_heads=max(4, hidden // 64),
    )
    encode = make_encode_fn(Encoder(config), init_params(config, seed=0))
    return dict(rng=rng, warr=warr, tok=tok, encode=encode, emb=hidden)


def make_engine(docs, world, hybrid: bool, quantize=None, mode="auto",
                n=None):
    import numpy as np

    import jax.numpy as jnp

    from mfar_tpu.data.schema import resolve_fields
    from mfar_tpu.eval.retrieval import RetrievalEngine

    n = N if n is None else n  # rows in ``docs`` (the rerank section's
    #                            corpus is sized to its auto-gate, not N)
    rng, warr = world["rng"], world["warr"]
    field_info = resolve_fields("all_dense" + (",title_sparse" if hybrid else ""), "mag")
    sparse_indices = {}
    if hybrid:
        from mfar_tpu.sparse.bm25 import BM25Index

        texts = [" ".join(warr[rng.integers(0, 5000, size=8)]) for _ in range(n)]
        sparse_indices["title_sparse"] = BM25Index.create(
            [(str(i), t) for i, t in enumerate(texts)]
        )
    return RetrievalEngine(
        field_info=field_info,
        doc_keys=[str(i) for i in range(n)],
        encode_fn=world["encode"],
        tokenizer=world["tok"],
        mixer_params={"weight": jnp.asarray(
            rng.normal(size=(world.get("emb", E), F + (1 if hybrid else 0))).astype(np.float32))},
        dense_matrix=docs,  # pre-flattened [N, F*E], already on device
        sparse_indices=sparse_indices,
        query_max_length=64,
        recall_k=K,
        quantize=quantize,
        mode=mode,
    )


def engine_qps(engine, world, b: int, mode: str) -> float:
    rng, warr = world["rng"], world["warr"]
    queries = [
        " ".join(warr[rng.integers(0, 5000, size=8)]) for _ in range(b * 4)
    ]
    engine.retrieve(queries[:b], top_k=K, mode=mode)  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        engine.retrieve_many(queries, top_k=K, batch_size=b, mode=mode)
        times.append(time.perf_counter() - t0)
    return len(queries) / min(times)


def served_soak(
    engine,
    world,
    extra: dict,
    seconds: float = 15.0,
    n_clients: int = 96,
    max_batch: int = 256,
    wait_ms: float = 25.0,
    depth: int = 2,
    top_k: int = None,
) -> float:
    """Online daemon soak: RetrievalServer (HTTP/1.1 frontend + pipelined
    MicroBatcher) over the SAME warm dense engine, driven by closed-loop
    in-process clients for ``seconds``.  Reports served QPS (returned) and
    request latency percentiles + batch fill (written into ``extra``) --
    the cost of the online path on top of the batch engine.

    Config (96 clients, 25 ms window, depth 2) is the measured sweet spot
    on this rig's 1-vCPU host: deeper windows raise fill but the load
    generator shares the host with the server, so more clients start
    billing harness overhead to the daemon (BENCH_NOTES round 5).
    """
    import http.client
    import threading

    import numpy as np

    from mfar_tpu.serve import RetrievalServer

    rng, warr = world["rng"], world["warr"]
    srv = RetrievalServer(
        engine, port=0, max_batch=max_batch, max_wait_ms=wait_ms,
        top_k=top_k if top_k is not None else K, pipeline_depth=depth,
    )
    srv.warmup()  # no-op compile: the engine is already warm at this shape
    srv.start_background()
    stop = threading.Event()
    counts = [0] * n_clients
    lats: list = [[] for _ in range(n_clients)]
    queries_per_req = 8

    def client(ci: int):
        qrng = np.random.default_rng(ci)
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=300)
        while not stop.is_set():
            qs = [" ".join(warr[qrng.integers(0, 5000, size=8)])
                  for _ in range(queries_per_req)]
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
                # Mid-run reset: the 1-vCPU host under load occasionally
                # drops a keep-alive conn.  A real client reconnects; a
                # dying thread would silently under-count served QPS.
                conn.close()
                conn = http.client.HTTPConnection(
                    srv.host, srv.port, timeout=300)
                continue  # the interrupted request doesn't count
            lats[ci].append(time.perf_counter() - t1)
            counts[ci] += queries_per_req
        conn.close()

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=300)
    dt = time.perf_counter() - t0
    srv.shutdown()
    all_lats = np.asarray([x for l in lats for x in l])
    if all_lats.size:
        extra["served_latency_ms_p50"] = round(
            float(np.percentile(all_lats, 50)) * 1000, 1)
        extra["served_latency_ms_p95"] = round(
            float(np.percentile(all_lats, 95)) * 1000, 1)
    stats = srv.batcher.stats()
    if "mean_batch_fill" in stats:
        extra["served_batch_fill"] = stats["mean_batch_fill"]
    return sum(counts) / dt


def train_step_ms() -> float:
    """mag all_dense-shape step with the recommended perf flags."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from mfar_tpu.models.encoder import EncoderConfig
    from mfar_tpu.train.model import MFARModel
    from mfar_tpu.train.optim import make_optimizer
    from mfar_tpu.train.train_step import init_state, make_train_step

    b = 24
    budgets = [512, 512, 512, 64, 64]
    config = EncoderConfig(
        hidden_dropout=0.1, attention_dropout=0.0, remat=True,
        softmax_dtype=jnp.bfloat16,
    )
    model = MFARModel(encoder_config=config, num_fields=len(budgets) + 1,
                      query_cond=True, temperature=0.05)
    opt = make_optimizer(encoder_lr=1e-4, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)
    rng = np.random.default_rng(0)

    def toks(n, s):
        return {
            "input_ids": jnp.asarray(rng.integers(1000, 30000, size=(n, s)), jnp.int32),
            "attention_mask": jnp.ones((n, s), jnp.int32),
        }

    batch = {
        "query": toks(b, 64),
        "pos": {f"f{i}_dense": toks(b, s) for i, s in enumerate(budgets)},
        "neg": {f"f{i}_dense": toks(b, s) for i, s in enumerate(budgets)},
        "sparse_pos": jnp.asarray(rng.normal(size=(b, b, 1)), jnp.float32),
        "sparse_neg": jnp.asarray(rng.normal(size=(b, b, 1)), jnp.float32),
    }
    step_fn = jax.jit(make_train_step(model, opt), donate_argnums=(0,))
    state, metrics = step_fn(state, batch)
    float(metrics["loss"])  # compile + warm
    steps = 6
    t0 = time.perf_counter()
    last = None
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
        last = metrics["loss"]
    float(last)
    return (time.perf_counter() - t0) / steps * 1000


def train_step_dist(stats_out: dict, b: int = 24, num_layers: int = 12,
                    hidden: int = 768) -> float:
    """The train_step_ms step on STaRK-like REAL lengths under the shipped
    bucketed collation widths (VERDICT round-4 item 5).  The size knobs
    exist for the CPU smoke suite only; the bench runs the contriever-base
    defaults.

    train_step_ms fills every field to its full budget (mask all ones), so
    its MFU treats every computed token as useful; real STaRK field texts
    rarely fill their budgets.  This section samples per-sequence lengths
    from the documented STaRK-like distribution
    (mfar_tpu.data.synth.stark_like_token_lengths), pads each token group
    exactly the way the training collation does -- to the smallest
    power-of-two bucket >= the batch max (models/tokenizer.py) -- and runs
    the same step at those widths.  Alongside the measured ms it records in
    ``stats_out``:

    - padding_pct: padded fraction of the token arrays the hardware chews;
    - useful_flops: analytic model FLOPs at the REAL lengths (the
      numerator of effective-token MFU; main() divides by time x peak).

    Both FLOPs numbers use the same per-sequence analytic form as
    train_model_flops_per_step (24d^2 L + 4dL^2 per layer forward, x3
    fwd+bwd); attention on a padded batch still computes the full width,
    masked, which is exactly why effective MFU must not credit it.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from mfar_tpu.data.synth import stark_like_token_lengths
    from mfar_tpu.models.encoder import EncoderConfig
    from mfar_tpu.models.tokenizer import pad_to_bucket
    from mfar_tpu.train.model import MFARModel
    from mfar_tpu.train.optim import make_optimizer
    from mfar_tpu.train.train_step import init_state, make_train_step

    budgets = [512, 512, 512, 64, 64]
    config = EncoderConfig(
        num_layers=num_layers, hidden_size=hidden,
        num_heads=max(1, hidden // 64), intermediate_size=4 * hidden,
        hidden_dropout=0.1, attention_dropout=0.0, remat=True,
        softmax_dtype=jnp.bfloat16,
    )
    model = MFARModel(encoder_config=config, num_fields=len(budgets) + 1,
                      query_cond=True, temperature=0.05)
    opt = make_optimizer(encoder_lr=1e-4, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)
    rng = np.random.default_rng(1)

    d, layers = hidden, num_layers
    real_tok = total_tok = 0
    useful = computed = 0.0

    def toks(n, budget):
        """One token group at its collation bucket width, masks at REAL
        sampled lengths; accumulates the padding/FLOPs accounting."""
        nonlocal real_tok, total_tok, useful, computed
        lens = stark_like_token_lengths(budget, n, rng)
        width = pad_to_bucket(int(lens.max()), budget)
        ids = rng.integers(1000, 30000, size=(n, width)).astype(np.int32)
        mask = (np.arange(width)[None, :] < lens[:, None]).astype(np.int32)
        ids *= mask  # padded positions are PAD(0), like the tokenizer emits
        real_tok += int(lens.sum())
        total_tok += n * width
        L = lens.astype(np.float64)
        useful += float((layers * (24 * d * d * L + 4 * d * L * L)).sum())
        computed += n * layers * (24 * d * d * width + 4 * d * width * width)
        return {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)}

    batch = {
        "query": toks(b, 64),
        "pos": {f"f{i}_dense": toks(b, s) for i, s in enumerate(budgets)},
        "neg": {f"f{i}_dense": toks(b, s) for i, s in enumerate(budgets)},
        "sparse_pos": jnp.asarray(rng.normal(size=(b, b, 1)), jnp.float32),
        "sparse_neg": jnp.asarray(rng.normal(size=(b, b, 1)), jnp.float32),
    }
    stats_out["padding_pct"] = round(100.0 * (1 - real_tok / total_tok), 1)
    stats_out["useful_flops"] = 3.0 * useful
    stats_out["computed_flops"] = 3.0 * computed

    step_fn = jax.jit(make_train_step(model, opt), donate_argnums=(0,))
    state, metrics = step_fn(state, batch)
    float(metrics["loss"])  # compile + warm
    steps = 4
    t0 = time.perf_counter()
    last = None
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
        last = metrics["loss"]
    float(last)
    return (time.perf_counter() - t0) / steps * 1000


def train_model_flops_per_step() -> float:
    """Analytic model FLOPs for one train_step_ms step (the mag all_dense
    shape above): BERT-base encoder, 1 query pass (B=24, S=64) + 2F field
    passes at the per-field budgets, forward+backward = 3x forward matmul
    FLOPs (the conventional MODEL-FLOPs accounting: remat recompute is
    excluded, so this is MFU, not HFU -- remat=True means the hardware does
    ~1 extra forward that this number deliberately does not credit).

    Per token per layer forward matmul FLOPs: QKV + attn-out projections
    (8d^2) + FFN (16d^2) + attention scores/values (4*S*d).
    """
    b, budgets, d, layers = 24, [512, 512, 512, 64, 64], 768, 12
    segs = [(b, 64)] + [(2 * b, s) for s in budgets]  # query + pos/neg per field
    fwd = sum(
        n * s * layers * (24 * d * d + 4 * s * d) for n, s in segs
    )
    return 3.0 * fwd


def index_build_docs_per_s(world, n_docs: int = 2048, enc_batch: int = 256) -> float:
    """Corpus encoding at the full 512-token field budget (the serving
    world's tokenizer caps at 64 for queries, so build a 512 one here)."""
    from mfar_tpu.eval.index_build import encode_texts
    from mfar_tpu.models import SimpleVocabTokenizer

    rng, warr = world["rng"], world["warr"]
    tok512 = SimpleVocabTokenizer.build([" ".join(warr)], max_length=512)
    texts = [" ".join(warr[rng.integers(0, 5000, size=500)]) for _ in range(n_docs)]
    encode_texts(world["encode"], tok512, texts[: max(enc_batch, n_docs // 4)],
                 512, enc_batch)  # warm
    t0 = time.perf_counter()
    encode_texts(world["encode"], tok512, texts, 512, enc_batch)
    return len(texts) / (time.perf_counter() - t0)


def backend_probe(timeout_s: float, attempts: int = 3,
                  backoff_s: float = 20.0) -> tuple[bool, str]:
    """Run a tiny jitted matmul in a SUBPROCESS with a generous timeout.

    The TPU here sits behind a relay tunnel that can be wedged or gone
    entirely (round 2: backend init raised UNAVAILABLE before any section's
    try/except, so the driver got a traceback instead of a JSON line, or --
    worse -- hung past the driver timeout).  Backend init cannot be
    interrupted in-process, so probe out-of-process: if the child can't
    complete one 128x128 matmul inside the timeout, report the backend
    unavailable and let main() emit a parseable status line instead of
    crashing.

    Retries ``attempts`` times with ``backoff_s`` between: the relay also
    throws TRANSIENT errors (measured: one FAILED_PRECONDITION probe
    failure with the chip answering a matmul 60 s later) -- a single-shot
    probe would turn one hiccup into a whole round of zeros.
    """
    attempts = max(int(os.environ.get("MFAR_BENCH_PROBE_ATTEMPTS", attempts)), 1)
    last = ""
    for i in range(attempts):
        if i:
            time.sleep(backoff_s)
            print(f"[bench] probe retry {i + 1}/{attempts} (last: {last[:120]})",
                  file=sys.stderr, flush=True)
        ok, last = _backend_probe_once(timeout_s)
        if ok:
            return True, last
    return False, last


def _backend_probe_once(timeout_s: float) -> tuple[bool, str]:
    # The child must re-assert the parent's platform via jax.config AFTER
    # importing jax: this rig's sitecustomize force-registers the TPU relay
    # backend at interpreter startup and the env var alone does not win.
    platform = os.environ.get("JAX_PLATFORMS", "")
    force = (
        f"jax.config.update('jax_platforms', {platform!r})\n" if platform else ""
    )
    code = (
        "import jax\n"
        + force
        + "import jax.numpy as jnp\n"
        "x = jnp.ones((128, 128), jnp.bfloat16)\n"
        "print('PROBE_OK', float((x @ x).sum()), jax.devices()[0].platform)\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s"
    except Exception as e:  # noqa: BLE001 -- any probe failure => unavailable
        return False, f"probe failed to launch: {e}"
    if r.returncode == 0 and "PROBE_OK" in r.stdout:
        return True, r.stdout.strip().splitlines()[-1]
    tail = (r.stderr or r.stdout or "").strip().splitlines()
    return False, " | ".join(tail[-3:])[-500:] if tail else f"rc={r.returncode}"


def emit(qps, base, extra, status="ok", metric="dense_engine_e2e_qps",
         unit=None):
    """The ONE JSON line the driver parses.  Always reachable."""
    if unit is None:
        unit = ("queries/s/chip e2e, shipped defaults (tokenize+encode+"
                "score+exact topk, N=1M docs, F=5, E=768, k=100, bf16, B=256)")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(qps, 2),
                "unit": unit,
                "vs_baseline": round(qps / base, 2) if base else 0.0,
                "extra": dict(extra, status=status),
            }
        ),
        flush=True,
    )


def _peak_flops() -> float:
    """Chip peak for MFU math.  TPU v5e (this rig: 'TPU v5 lite') peaks at
    197 bf16 TFLOP/s; override for other chips."""
    return float(os.environ.get("MFAR_TPU_PEAK_TFLOPS", "197")) * 1e12


def run_phase_main() -> dict:
    """The headline + every section that shares the 1M-doc corpus (one
    process).  Returns the emit-args dict; never raises."""
    extra = {}
    # Extras stop starting once the budget is spent (a cold compile cache or
    # slow tunnel must not push the run past the driver's timeout -- the
    # headline JSON line must always print).  The clock starts AFTER the
    # headline completes: backend init on this relay costs minutes on its
    # own (round-4 lesson: counting it starved every engine section to
    # "SKIPPED (budget)"), and it is an environment cost, not a
    # measurement cost.
    budget = float(os.environ.get("MFAR_BENCH_BUDGET", "900"))
    start = None  # set when extras start (below)

    def section(name, fn):
        if time.perf_counter() - start > budget:
            print(f"[bench] {name} SKIPPED (budget)", file=sys.stderr, flush=True)
            return
        try:
            t0 = time.perf_counter()
            extra[name] = round(fn(), 2)
            print(f"[bench] {name}={extra[name]} ({time.perf_counter()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # keep the JSON line alive
            extra[name] = None
            print(f"[bench] {name} FAILED: {e}", file=sys.stderr, flush=True)

    try:
        docs = make_docs()
        op = op_qps(docs, B, Q)
        op_base = baseline_qps()
    except Exception as e:  # noqa: BLE001 -- a dead relay mid-run must still emit
        return dict(qps=0.0, base=0.0, status="headline-failed",
                    extra={"error": f"{type(e).__name__}: {e}"[:500]})
    extra["op_topk_qps"] = round(op, 2)
    extra["op_vs_baseline"] = round(op / op_base, 2) if op_base else 0.0

    # The HEADLINE: the default serving path e2e (exact engine, B=256) vs
    # the reference twin's e2e (encode + scan).  If the engine build dies
    # (relay mid-run), fall back to the op headline so the one JSON line
    # still carries a real measurement, labeled as such.
    dense_engine = []
    try:
        world = engine_world(docs)

        def get_dense():
            if not dense_engine:
                dense_engine.append(make_engine(docs, world, False))
            return dense_engine[0]

        qps = engine_qps(get_dense(), world, B, "exact")
        extra["engine_dense_exact_qps"] = round(qps, 2)
    except Exception as e:  # noqa: BLE001
        extra["engine_error"] = f"{type(e).__name__}: {e}"[:500]
        return dict(
            qps=op, base=op_base, extra=extra, status="engine-headline-failed",
            metric="fused_multifield_topk_qps",
            unit="queries/s/chip, op only (engine e2e failed -- see extra."
                 "engine_error; N=1M docs, F=5, E=768, k=100, bf16, B=256)")
    try:
        base = baseline_e2e_qps(op_base)
        extra["baseline_e2e_qps"] = round(base, 2)
    except Exception as e:  # noqa: BLE001 -- torch/transformers hiccup:
        # scan-only is FASTER than encode+scan, so using it as the
        # denominator only understates the multiplier.
        extra["baseline_e2e_error"] = f"{type(e).__name__}: {e}"[:200]
        base = op_base

    if not os.environ.get("MFAR_BENCH_FAST"):
        start = time.perf_counter()  # extras budget clock (see above)
        section("topk_b512_qps", lambda: op_qps(docs, 512, 16))
        section("topk_int8_qps", lambda: op_qps_int8(docs, B, Q))
        # throughput mode: B=512 amortizes the query encode better (the
        # e2e bottleneck once the exact scan got its round-4 rebuild)
        section("engine_dense_exact_b512_qps",
                lambda: engine_qps(get_dense(), world, 512, "exact"))
        def _approx_qps():
            eng = get_dense()
            eng.dense_topk = "approx"  # PartialReduce selection (recall>=0.95)
            try:
                return engine_qps(eng, world, 256, "exact")
            finally:
                eng.dense_topk = "exact"
        section("engine_dense_approx_qps", _approx_qps)
        # The ONLINE daemon over the same (warm) engine: HTTP + pipelined
        # micro-batching soak.  Runs while the dense engine is alive.
        section("served_qps", lambda: served_soak(get_dense(), world, extra))
        dense_engine.clear()
        # int8 capacity engine e2e (quantizes the device corpus on device,
        # ~1.4 s at N=1M; rides the round-4 fused single-chip int8 program)
        section("engine_dense_int8_qps",
                lambda: engine_qps(make_engine(docs, world, False, "int8"),
                                   world, 256, "exact"))
        hybrid_engine = []  # built once, measured in both serving modes
        def get_hybrid():
            if not hybrid_engine:
                hybrid_engine.append(make_engine(docs, world, True))
            return hybrid_engine[0]
        section("engine_hybrid_exact_qps",
                lambda: engine_qps(get_hybrid(), world, 64, "exact"))
        section("engine_hybrid_rerank_qps",
                lambda: engine_qps(get_hybrid(), world, 64, "rerank"))
        section("engine_hybrid_exact_b256_qps",
                lambda: engine_qps(get_hybrid(), world, 256, "exact"))
        section("index_build_docs_per_s", lambda: index_build_docs_per_s(world))

    return dict(qps=qps, base=base, extra=extra, status="ok")


def run_phase_rerank() -> dict:
    """DEDICATED rerank-mode dense engine: the auto cost-model gate
    (eval/retrieval.py::_pallas_gather_auto) enables the Pallas DMA-gather
    stage 2 -- the default a `retrieve --mode rerank` CLI user gets.  Runs
    at N=512K, the largest power-of-two bf16 corpus whose PAIR view + scan
    workspace fit the gate's memory model within the ~12.9 GiB the default
    XLA client fraction (0.75) lets us allocate of the 16 GiB chip
    (measured round 5; N=1M and 768K both OOM'd the recall scan with two
    copies resident) -- which is why this phase needs a FRESH process.
    Match: the reference's stage-2 gather
    (/root/reference/mfar/data/index.py:227-232)."""
    import jax
    import jax.numpy as jnp

    world = engine_world(None)
    n_rr = 524_288
    docs_rr = jax.random.normal(
        jax.random.PRNGKey(0), (n_rr, F * E), jnp.bfloat16
    )
    eng = make_engine(docs_rr, world, False, mode="rerank", n=n_rr)
    assert eng.docs_rows is not None, "auto gate failed to fire"
    return {"engine_dense_rerank_qps": round(engine_qps(eng, world, 256, "rerank"), 2)}


def run_phase_train() -> dict:
    """mag all_dense-shape train step (wants ~15.75 of 16 GiB HBM -- fresh
    process) + single-chip training MFU (analytic model FLOPs over measured
    step time vs peak)."""
    out = {"train_step_ms": round(train_step_ms(), 2)}
    out["train_mfu_pct"] = round(
        train_model_flops_per_step() / (out["train_step_ms"] / 1e3)
        / _peak_flops() * 100, 1,
    )
    return out


def run_phase_dist() -> dict:
    """STaRK-like-lengths step at the shipped bucketed collation widths:
    padding tax + effective-token MFU (VERDICT round-4 item 5) -- the train
    headline's honesty check."""
    dist_stats: dict = {}
    out = {"train_step_dist_ms": round(train_step_dist(dist_stats), 2)}
    peak = _peak_flops()
    out["train_padding_pct"] = dist_stats["padding_pct"]
    out["train_effective_mfu_pct"] = round(
        dist_stats["useful_flops"] / (out["train_step_dist_ms"] / 1e3)
        / peak * 100, 1,
    )
    # What the step WOULD score if padded tokens counted as useful
    # (the computed-FLOPs twin of train_mfu_pct at these widths)
    out["train_dist_computed_mfu_pct"] = round(
        dist_stats["computed_flops"] / (out["train_step_dist_ms"] / 1e3)
        / peak * 100, 1,
    )
    return out


PHASE_FNS = {
    "main": run_phase_main,
    "rerank": run_phase_rerank,
    "train": run_phase_train,
    "dist": run_phase_dist,
}

_PHASE_SENTINEL = "PHASE_RESULT "


def child_main(phase: str) -> int:
    """Run ONE phase in this process and hand the result dict to the
    orchestrator via a sentinel stdout line.  Always exits 0 with a
    parseable line; section prints go to stderr (inherited, so the driver
    log keeps them)."""
    try:
        from mfar_tpu.utils.compile_cache import enable as _enable_compile_cache

        _enable_compile_cache()
        result = PHASE_FNS[phase]()
    except Exception as e:  # noqa: BLE001 -- the parent records the failure
        result = {"phase_error": f"{type(e).__name__}: {e}"[:500]}
    print(_PHASE_SENTINEL + json.dumps(result), flush=True)
    return 0


def run_child(phase: str, timeout_s: float) -> dict:
    """Spawn ``bench.py`` on one phase (fresh process = fresh HBM, one TPU
    config per process) and parse its sentinel line."""
    if os.environ.get("MFAR_BENCH_INPROCESS"):
        # Test hook: run the phase in THIS process so monkeypatched
        # constants/functions apply and CPU-sized shapes stay tiny.  The
        # production path must stay out-of-process (fresh HBM per phase).
        try:
            return PHASE_FNS[phase]()
        except Exception as e:  # noqa: BLE001 -- mirrors child_main
            return {"phase_error": f"{type(e).__name__}: {e}"[:500]}
    env = dict(os.environ, MFAR_BENCH_PHASE=phase)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"phase_error": f"phase {phase} timed out after {timeout_s:.0f}s"}
    except Exception as e:  # noqa: BLE001
        return {"phase_error": f"phase {phase} failed to launch: {e}"}
    for line in reversed((r.stdout or "").splitlines()):
        if line.startswith(_PHASE_SENTINEL):
            try:
                return json.loads(line[len(_PHASE_SENTINEL):])
            except json.JSONDecodeError:
                break
    return {"phase_error": f"phase {phase} produced no result (rc={r.returncode})"}


def main():
    phase = os.environ.get("MFAR_BENCH_PHASE")
    if phase:
        return child_main(phase)

    # Orchestrator: no device work in THIS process -- probe, then run each
    # phase as a sequential subprocess and merge the extras.
    probe_timeout = float(os.environ.get("MFAR_BENCH_PROBE_TIMEOUT", "300"))
    ok, info = backend_probe(probe_timeout)
    print(f"[bench] backend probe: ok={ok} ({info})", file=sys.stderr, flush=True)
    if not ok:
        emit(0.0, 0.0, {"probe": info}, status="backend-unavailable")
        return 0

    main_timeout = float(os.environ.get("MFAR_BENCH_MAIN_TIMEOUT", "1800"))
    main_res = run_child("main", main_timeout)
    main_err = main_res.get("phase_error", "")
    if "timed out" in main_err or "produced no result" in main_err:
        print(f"[bench] main phase failed pre-results ({main_err[:120]}) "
              "-- retrying once", file=sys.stderr, flush=True)
        main_res = run_child("main", main_timeout)
    if "phase_error" in main_res:
        emit(0.0, 0.0, {"error": main_res["phase_error"]}, status="headline-failed")
        return 0
    extra = main_res.get("extra", {})
    status = main_res.get("status", "ok")

    if status == "ok" and not os.environ.get("MFAR_BENCH_FAST"):
        # Per-phase timeout defaults, sized from measured runs on this rig
        # (slow-relay day): each child pays backend init (up to ~3 min when
        # the relay crawls) + its compiles if the persistent cache is cold
        # -- the train step's full-width mag program is the biggest compile,
        # which is exactly the phase that overran the first 600 s window.
        for ph, headline_key, default_timeout in (
            ("rerank", "engine_dense_rerank_qps", 900.0),
            ("train", "train_step_ms", 1200.0),
            ("dist", "train_step_dist_ms", 900.0),
        ):
            timeout_s = float(os.environ.get(
                f"MFAR_BENCH_{ph.upper()}_TIMEOUT",
                os.environ.get("MFAR_BENCH_PHASE_TIMEOUT", str(default_timeout))))
            t0 = time.perf_counter()
            res = run_child(ph, timeout_s)
            err = res.get("phase_error", "")
            if "timed out" in err or "produced no result" in err:
                # One retry, for timeouts and pre-sentinel crashes only.
                # Timeouts: the persistent compile cache keeps every program
                # the killed attempt finished compiling, so the retry resumes
                # further along instead of repeating the same overrun.
                # No-sentinel crashes: the child died BEFORE its sections ran
                # (backend init), which on this rig is a transient relay
                # error more often than not.  Hard section failures (OOM
                # etc.) come back rc=0 WITH a sentinel and don't retry.
                print(f"[bench] phase {ph} failed pre-results ({err[:120]}) "
                      "-- retrying once", file=sys.stderr, flush=True)
                res = run_child(ph, timeout_s)
            if "phase_error" in res:
                extra[headline_key] = None
                print(f"[bench] {headline_key} FAILED: {res['phase_error']}",
                      file=sys.stderr, flush=True)
                continue
            extra.update(res)
            print(f"[bench] {headline_key}={res.get(headline_key)} "
                  f"({time.perf_counter()-t0:.0f}s, own process)",
                  file=sys.stderr, flush=True)

    emit(main_res.get("qps", 0.0), main_res.get("base", 0.0), extra,
         status=status, metric=main_res.get("metric", "dense_engine_e2e_qps"),
         unit=main_res.get("unit"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
