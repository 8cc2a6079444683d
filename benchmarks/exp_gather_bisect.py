"""Bisect the scatter-free hybrid program's 137 ms (vs 58 ms scatter) at
N=1M B=64: every candidate-machinery piece measures ~0.1 ms in isolation
(exp_gather_parts), so the cost must come from fusion/layout interference
inside the full scan.  Reimplements the bucketed scan locally with
toggles, cumulative from the bare dense scan:

  dense      dense matmul + exact_topk_rows + k-carry (no candidates)
  carry2k    ... with the 2k-wide carry + final dedup
  gather     ... + take_along_axis(s, rel) candidates (no seg sums)
  seg        ... + segmented sums (full _posting_candidates)
  wgather    ... + in-program per-posting weight gather (the full op)

Usage: python benchmarks/exp_gather_bisect.py [N] [B] [Mc]
"""

import sys
import os
import time

BARRIER = bool(int(os.environ.get("BARRIER", "0")))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
MC = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
E = 768
FD, FS = 4, 1
FE = FD * E
K = 100
CHUNK = 131072
Q = 4

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mfar_tpu.ops import scoring  # noqa: E402
from mfar_tpu.ops.scoring import (  # noqa: E402
    _dedup_topk,
    _merge_topk,
    _pad_topk,
    _posting_candidates,
    _union_topk,
    exact_topk_rows,
    fold_queries,
    softmax_field_weights,
)


def build(level):
    kk = 2 * K if level != "dense" else K

    def run(q, W, docs, b_ids, b_vals, b_f):
        weights = softmax_field_weights(W, q, None)
        weights = jnp.broadcast_to(weights, (B, weights.shape[-1]))
        qflat = fold_queries(q, weights[:, :FD]).astype(docs.dtype)
        if level == "wgather":
            bwv = scoring._bucket_weighted_vals(weights, b_vals, b_f, FD)
        else:
            bwv = b_vals
        num_full = N // CHUNK
        chunks = jnp.moveaxis(
            docs.reshape(num_full, CHUNK, FE), 0, 0)
        bids_ch = jnp.moveaxis(b_ids, 1, 0)
        bwv_ch = jnp.moveaxis(bwv, 1, 0)
        offsets = jnp.arange(num_full, dtype=jnp.int32) * CHUNK

        def chunk_union(chunk_docs, bids, bw, offset):
            s = jnp.dot(qflat, chunk_docs.T,
                        preferred_element_type=jnp.float32)
            idx = offset + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            s = jnp.where(idx < N, s, -jnp.inf)
            if BARRIER:
                # one materialization of the chunk score tile: without it,
                # XLA duplicates the matmul into every consumer fusion
                s = jax.lax.optimization_barrier(s)
            top_s, sel = exact_topk_rows(s, K)
            top_s, top_i = _pad_topk(top_s, offset + sel, K)
            if level in ("dense", "carry2k"):
                if level == "dense":
                    return top_s, top_i
                return _pad_topk(top_s, top_i, kk)
            if level == "gather":
                rel = jnp.clip(bids - offset, 0, CHUNK - 1)
                cand_s = jnp.take_along_axis(s, rel, axis=1)
                cand_i = offset + rel
            else:
                cand_s, cand_i = _posting_candidates(s, bids, bw, offset)
            return _union_topk(top_s, top_i, cand_s, cand_i, kk)

        def step(carry, inp):
            d, bi, bw, off = inp
            return _merge_topk(carry, chunk_union(d, bi, bw, off), kk), None

        init = chunk_union(chunks[0], bids_ch[0], bwv_ch[0], offsets[0])
        out, _ = jax.lax.scan(
            step, init,
            (chunks[1:], bids_ch[1:], bwv_ch[1:], offsets[1:]))
        if level == "dense":
            return out
        return _dedup_topk(*out, K)

    @jax.jit
    def run_q(qs, W, docs, bi, bv, bf):
        def step(_, inp):
            q, i, v, f = inp
            s, ti = run(q, W, docs, i, v, f)
            return None, s[:, 0].sum() + ti[:, 0].max().astype(jnp.float32)
        _, outs = jax.lax.scan(step, None, (qs, bi, bv, bf))
        return outs.sum()

    return run_q


def main():
    rng = np.random.default_rng(0)
    nch = N // CHUNK
    docs = jax.random.normal(jax.random.PRNGKey(0), (N, FE), jnp.bfloat16)
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, B, E), jnp.float32)
    W = jax.random.normal(jax.random.PRNGKey(2), (E, FD + FS), jnp.float32)
    b_ids = jnp.asarray(np.sort(
        rng.integers(0, N, size=(Q, B, nch, MC)), axis=-1).astype(np.int32))
    b_vals = jnp.asarray(
        rng.uniform(0.1, 2.0, size=(Q, B, nch, MC)).astype(np.float32))
    b_f = jnp.asarray(np.zeros((Q, B, nch, MC), np.int8))
    docs.block_until_ready()
    print(f"N={N} B={B} Mc={MC}", flush=True)

    for level in ("dense", "carry2k", "gather", "seg", "wgather"):
        fn = build(level)
        try:
            float(fn(qs, W, docs, b_ids, b_vals, b_f))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(qs, W, docs, b_ids, b_vals, b_f))
                times.append(time.perf_counter() - t0)
            dt = min(times) / Q
            print(f"{level:>8}: {dt * 1e3:8.2f} ms/batch ({B / dt:8.0f} qps)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{level:>8}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
