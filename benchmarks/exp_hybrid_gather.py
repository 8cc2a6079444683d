"""A/B the scatter-densified vs scatter-free (bucketed gather) hybrid
serving programs on chip.

Both run the FULL fused single-chip hybrid program (weights -> fold ->
postings -> chunked scan) on device-resident inputs, isolating the
on-chip program cost from the relay postings upload (which is identical:
the bucketed feed ships the same O(nnz) ids/vals/fields plus bucket
padding).  See ops/scoring.py "Scatter-free hybrid retrieval".

Usage: python benchmarks/exp_hybrid_gather.py [N] [B] [M] [chunk]
"""

import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
M = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 131072
E = 768
FD, FS = 4, 1  # 4 dense + 1 sparse field (the mag serving shape)
K = 100
import os
Q = int(os.environ.get("Q", "4"))  # batches per timed program

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mfar_tpu.ops import scoring  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    docs = jax.random.normal(jax.random.PRNGKey(0), (N, FD * E), jnp.bfloat16)
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, B, E), jnp.float32)
    W = jax.random.normal(jax.random.PRNGKey(2), (E, FD + FS), jnp.float32)
    ids = rng.integers(0, N, size=(Q, B, M)).astype(np.int32)
    vals = rng.uniform(0.1, 2.0, size=(Q, B, M)).astype(np.float32)
    fidx = np.zeros((Q, B, M), np.int8)
    docs.block_until_ready()
    print(f"N={N} B={B} M={M} chunk={CHUNK}", flush=True)

    # --- scatter path (shipping default) -----------------------------
    @jax.jit
    def run_scatter(qs, docs, kid, kval, kf):
        def step(_, inp):
            q, i, v, f = inp
            s, ti = scoring.fused_hybrid_topk_postings_from_query(
                q, W, None, docs, i, v, f, jnp.int32(N), FD, K,
                chunk_size=CHUNK)
            return None, s[:, 0].sum() + ti[:, 0].max().astype(jnp.float32)

        _, outs = jax.lax.scan(
            step, None, (qs, kid, kval, kf))
        return outs.sum()

    # --- bucketed gather path ----------------------------------------
    bk = [scoring.bucket_postings_np(ids[i], vals[i], fidx[i], N, CHUNK)
          for i in range(Q)]
    b_ids = jnp.asarray(np.stack([b[0] for b in bk]))
    b_vals = jnp.asarray(np.stack([b[1] for b in bk]))
    b_f = jnp.asarray(np.stack([b[2] for b in bk]))
    print(f"bucket Mc={b_ids.shape[-1]} nch={b_ids.shape[-2]}", flush=True)

    @jax.jit
    def run_gather(qs, docs, bi, bv, bf):
        def step(_, inp):
            q, i, v, f = inp
            s, ti = scoring.fused_hybrid_topk_buckets_from_query(
                q, W, None, docs, i, v, f, jnp.int32(N), FD, K,
                chunk_size=CHUNK)
            return None, s[:, 0].sum() + ti[:, 0].max().astype(jnp.float32)

        _, outs = jax.lax.scan(step, None, (qs, bi, bv, bf))
        return outs.sum()

    kid, kval, kf = jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(fidx)
    for name, fn, args in (
        ("scatter", run_scatter, (qs, docs, kid, kval, kf)),
        ("gather", run_gather, (qs, docs, b_ids, b_vals, b_f)),
    ):
        try:
            out = float(fn(*args))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(*args))
                times.append(time.perf_counter() - t0)
            dt = min(times) / Q
            print(f"{name:>8}: {dt * 1e3:8.2f} ms/batch ({B / dt:8.0f} qps) "
                  f"check={out:.1f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>8}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
