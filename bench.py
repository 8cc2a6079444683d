"""Benchmark: fused multi-field full-corpus scoring + top-k QPS on one chip.

The flagship serving op -- what the reference does with per-field CPU torch
matmuls over memmap chunks + python rerank (reference:
mfar/data/index.py:181-232, mfar/modeling/contrastive.py:669-704) -- run as
one folded [B, F*E] x [F*E, N] bf16 MXU matmul feeding the TPU-optimized
partial-reduce top-k (``lax.approx_max_k``, recall>=0.95 -- the recall stage
of retrieval; the reference's own eval is likewise a top-100 recall stage).

Baseline: the reference's algorithm (torch CPU matmul + topk) measured on
this host over a corpus slice and scaled linearly in N.  See BENCH_NOTES.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

B = 256  # query batch (serving)
F = 5  # dense fields (mag all_dense)
E = 768  # contriever dim
K = 100  # retrieval depth
N = 1_048_576  # corpus size
N_BASE = 50_000  # baseline slice (scaled linearly)


def tpu_qps() -> float:
    import jax
    import jax.numpy as jnp

    kd = jax.random.PRNGKey(0)
    docs = jax.random.normal(kd, (N, F * E), jnp.bfloat16)
    queries = [
        jax.random.normal(jax.random.PRNGKey(i + 1), (B, F * E), jnp.bfloat16)
        for i in range(10)
    ]

    @jax.jit
    def run(q, d):
        s = jnp.dot(q, d.T, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, K, recall_target=0.95)

    # compile + warm
    out = run(queries[0], docs)
    _ = float(out[0][0, 0])  # host fetch forces completion (relay-safe)

    t0 = time.perf_counter()
    outs = [run(q, docs) for q in queries]
    _ = sum(float(o[0][0, 0]) for o in outs)  # drain
    dt = time.perf_counter() - t0
    return B * len(queries) / dt


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
