"""Locate the exact-mode serving gap: time the EXACT fused dense top-k op
at the engine's production shape (N=1M, B=256, F*E=3840, k=100) across the
selection strategy x chunk-size grid, plus a matmul-only floor.

Round-4 motivation: the approx op benches at ~19.7K QPS/chip while the
engine's default exact mode serves ~1.9K e2e.  Encoding accounts for ~42 ms
of the ~133 ms pipelined batch; the rest is this op.  Variants:

  matmul   -- score matmul + per-chunk row max only (selection-free floor)
  sort     -- jax.lax.top_k (full per-row sort, the pre-round-4 exact path)
  blocks   -- exact_topk_rows (two-level exact reduction, round-4)
  approx   -- lax.approx_max_k PartialReduce (reference point, not exact)

Usage: python benchmarks/exp_exact_topk.py [N] [B] [chunk1,chunk2,...]
"""

import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
CHUNKS = ([int(c) for c in sys.argv[3].split(",")]
          if len(sys.argv) > 3 else [131072, 262144, 524288, 1048576])
FE = 5 * 768
K = 100
Q = 8  # batches per timed program

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mfar_tpu.ops import scoring  # noqa: E402


def timed(fn, *args):
    out = fn(*args)
    out.block_until_ready()
    float(out)  # relay-safe sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def variant_runner(select, chunk):
    """One jitted program: Q batches scanned over the full corpus."""

    def chunk_topk(q, chunk_docs, offset):
        c = chunk_docs.shape[0]
        s = jnp.dot(q, chunk_docs.T, preferred_element_type=jnp.float32)
        if select == "matmul":
            return s.max(axis=1, keepdims=True), jnp.zeros(
                (s.shape[0], 1), jnp.int32)
        if select == "sort":
            top_s, sel = jax.lax.top_k(s, K)
        elif select == "blocks":
            top_s, sel = scoring.exact_topk_rows(s, K)
        else:  # approx
            top_s, sel = jax.lax.approx_max_k(s, K, recall_target=0.95)
        return top_s, (offset + sel).astype(jnp.int32)

    kk = 1 if select == "matmul" else K

    @jax.jit
    def run_all(qs, d):
        def one(q):
            return scoring._stream_chunked_topk(
                lambda cd, off: chunk_topk(q, cd, off), ((d, 0),), N, chunk, kk)

        def step(_, q):
            s, i = one(q)
            return None, s[:, 0].sum() + i[:, 0].max().astype(jnp.float32)

        _, outs = jax.lax.scan(step, None, qs)
        return outs.sum()

    return run_all


def main():
    docs = jax.random.normal(jax.random.PRNGKey(0), (N, FE), jnp.bfloat16)
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, B, FE), jnp.bfloat16)
    docs.block_until_ready()
    print(f"N={N} B={B} FE={FE} K={K} Q={Q}", flush=True)
    for chunk in CHUNKS:
        for select in ("matmul", "blocks", "sort", "approx"):
            if select == "sort" and chunk > 262144:
                continue  # known-slow; don't burn relay compiles
            try:
                dt = timed(variant_runner(select, chunk), qs, docs)
                print(f"chunk={chunk:>8} {select:>7}: "
                      f"{Q * B / dt:8.0f} qps  ({dt / Q * 1e3:7.2f} ms/batch)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"chunk={chunk:>8} {select:>7}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
