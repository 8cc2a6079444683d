"""Benchmark: fused multi-field full-corpus scoring + top-k QPS on one chip.

The flagship serving op -- what the reference does with per-field CPU torch
matmuls over memmap chunks + python rerank (reference:
mfar/data/index.py:181-232, mfar/modeling/contrastive.py:669-704) -- run as
folded [B, F*E] x [F*E, chunk] bf16 MXU matmuls with a fused running top-k
(``mfar_tpu.ops.scoring.dense_topk_chunked_approx``: lax.approx_max_k per
chunk, recall>=0.95, exact merge).  Chunking keeps only [B, chunk] scores
alive instead of the full [B, N] f32 matrix.

Methodology: all Q query batches run inside ONE jitted lax.scan and the
timed region ends with a single scalar host fetch, so the TPU-tunnel
round-trip (~35 ms on this rig) is paid once per measurement, not per
batch.  See BENCH_NOTES.md.

Baseline: the reference's algorithm (torch CPU matmul + topk) measured on
this host over a corpus slice and scaled linearly in N.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

B = 256  # query batch (serving sweet spot: past this, the live index
#          output of the PartialReduce top-k halves throughput)
Q = 40  # batches per timed program
F = 5  # dense fields (mag all_dense)
E = 768  # contriever dim
K = 100  # retrieval depth
N = 1_048_576  # corpus size
CHUNK = 524288
N_BASE = 50_000  # baseline slice (scaled linearly)


def tpu_qps() -> float:
    import jax
    import jax.numpy as jnp

    from mfar_tpu.ops.scoring import dense_topk_chunked_approx

    docs = jax.random.normal(jax.random.PRNGKey(0), (N, F * E), jnp.bfloat16)
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, B, F * E), jnp.bfloat16)

    @jax.jit
    def run_all(qs, d):
        def step(_, q):
            s, i = dense_topk_chunked_approx(
                q, d, jnp.int32(N), k=K, chunk_size=CHUNK
            )
            return None, s[:, 0].sum() + i[:, 0].max().astype(jnp.float32)
        _, outs = jax.lax.scan(step, None, qs)
        return outs.sum()

    float(run_all(qs, docs))  # compile + warm (host fetch = relay-safe sync)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_all(qs, docs))
        times.append(time.perf_counter() - t0)
    return Q * B / min(times)


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


def main():
    qps = tpu_qps()
    base = baseline_qps()
    print(
        json.dumps(
            {
                "metric": "fused_multifield_topk_qps",
                "value": round(qps, 2),
                "unit": "queries/s/chip (N=1M docs, F=5, E=768, k=100, bf16, B=256)",
                "vs_baseline": round(qps / base, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
