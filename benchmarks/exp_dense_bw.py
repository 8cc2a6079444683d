"""Effective HBM bandwidth of the chunked dense scan vs field width.

The round-1 headline op (FE=768, N=1M, B=64) streams the corpus at
~485 GB/s effective; the 4-field serving shape (FE=3072) measured only
~165 GB/s in exp_gather_bisect's dense baseline.  This sweeps FE x
chunk_size for (a) matmul-only scan (no selection) and (b) the full
dense_topk_chunked, to locate where the bandwidth goes.

Usage: python benchmarks/exp_dense_bw.py [N] [B]
"""

import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = 100
Q = 4

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mfar_tpu.ops import scoring  # noqa: E402


def bench(fn, *args):
    # scalar float() fetch, NOT block_until_ready (relay does not block)
    float(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / Q


def main():
    print(f"N={N} B={B} (dev={jax.devices()[0].device_kind})", flush=True)
    for fe in (768, 1536, 3072):
        docs = jax.random.normal(jax.random.PRNGKey(0), (N, fe), jnp.bfloat16)
        qs = jax.random.normal(jax.random.PRNGKey(1), (Q, B, fe), jnp.bfloat16)
        docs.block_until_ready()
        gb = N * fe * 2 / 1e9
        for chunk in (65536, 131072, 262144):
            @jax.jit
            def matmul_only(qs, docs, chunk=chunk):
                nch = N // chunk
                chunks = docs.reshape(nch, chunk, docs.shape[-1])

                def outer(_, q):
                    def step(carry, d):
                        s = jnp.dot(q, d.T,
                                    preferred_element_type=jnp.float32)
                        return carry + s.max(), None
                    out, _ = jax.lax.scan(step, jnp.float32(0), chunks)
                    return None, out
                _, outs = jax.lax.scan(outer, None, qs)
                return outs.sum()

            @jax.jit
            def full_topk(qs, docs, chunk=chunk):
                def outer(_, q):
                    s, i = scoring.dense_topk_chunked(
                        q, docs, jnp.int32(N), k=K, chunk_size=chunk)
                    return None, s[:, 0].sum() + i[:, 0].max().astype(
                        jnp.float32)
                _, outs = jax.lax.scan(outer, None, qs)
                return outs.sum()

            try:
                t_mm = bench(matmul_only, qs, docs)
                t_tk = bench(full_topk, qs, docs)
                print(
                    f"FE={fe:>5} chunk={chunk:>6}: "
                    f"matmul {t_mm * 1e3:7.2f} ms ({gb / t_mm:5.0f} GB/s)  "
                    f"topk {t_tk * 1e3:7.2f} ms ({gb / t_tk:5.0f} GB/s)",
                    flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"FE={fe:>5} chunk={chunk:>6}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        del docs, qs


if __name__ == "__main__":
    main()
