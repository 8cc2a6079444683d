"""A/B the HYBRID chunked top-k's selection strategy on chip.

Round-4 regression hunt: swapping lax.top_k for exact_topk_rows sped the
dense scan up ~3x but slowed the hybrid scan ~2x (engine hybrid B=256:
262 -> 116 qps at unchanged chunking).  This measures hybrid_topk_chunked
(scatter-densified sparse add + dense matmul + selection) with each
selector at serving shapes, isolated from the engine.

Usage: python benchmarks/exp_hybrid_topk.py [N] [B] [chunk1,chunk2,...]
"""

import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
CHUNKS = ([int(c) for c in sys.argv[3].split(",")]
          if len(sys.argv) > 3 else [131072, 1048576])
FE = 5 * 768
K = 100
Q = 4
M = 16384  # postings per query (8 terms x ~1.6K docs/term at the synth shape)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mfar_tpu.ops import scoring  # noqa: E402


def main():
    docs = jax.random.normal(jax.random.PRNGKey(0), (N, FE), jnp.bfloat16)
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, B, FE), jnp.bfloat16)
    kid = jax.random.randint(jax.random.PRNGKey(2), (Q, B, M), 0, N, jnp.int32)
    kval = jax.random.uniform(jax.random.PRNGKey(3), (Q, B, M), jnp.float32)
    docs.block_until_ready()
    orig = scoring.exact_topk_rows
    print(f"N={N} B={B} M={M} K={K} Q={Q}", flush=True)

    jaxprs = {}
    for chunk in CHUNKS:
        for select in ("blocks", "sort"):
            scoring.exact_topk_rows = orig if select == "blocks" else jax.lax.top_k
            # hybrid_topk_chunked is itself @jax.jit: its traced lowering
            # (which read the module global at TRACE time) is cached across
            # monkeypatches, so without this the second variant silently
            # re-measures the first.
            scoring.hybrid_topk_chunked.clear_cache()

            @jax.jit
            def run_all(qs, d, kid, kval):
                def step(_, inp):
                    q, ids, vals = inp
                    comb = jnp.zeros((B, N), jnp.float32)
                    comb = comb.at[jnp.arange(B)[:, None], ids].add(vals)
                    s, i = scoring.hybrid_topk_chunked(
                        q, d, comb, jnp.int32(N), k=K, chunk_size=chunk)
                    return None, s[:, 0].sum() + i[:, 0].max().astype(jnp.float32)

                _, outs = jax.lax.scan(step, None, (qs, kid, kval))
                return outs.sum()

            try:
                # Self-check that the patch took: the two selectors must
                # lower to different programs for this chunk size.
                jaxprs[(chunk, select)] = str(
                    jax.make_jaxpr(run_all)(qs, docs, kid, kval)
                )
                other = jaxprs.get((chunk, "blocks" if select == "sort" else "sort"))
                if other is not None and other == jaxprs[(chunk, select)]:
                    print(f"chunk={chunk:>8} {select:>6}: WARNING identical "
                          "lowering to the other selector (patch defeated?)",
                          flush=True)
                float(run_all(qs, docs, kid, kval))
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(run_all(qs, docs, kid, kval))
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                print(f"chunk={chunk:>8} {select:>6}: {Q * B / dt:8.0f} qps "
                      f"({dt / Q * 1e3:7.2f} ms/batch)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"chunk={chunk:>8} {select:>6}: FAILED {type(e).__name__}: {e}",
                      flush=True)
    scoring.exact_topk_rows = orig
    scoring.hybrid_topk_chunked.clear_cache()


if __name__ == "__main__":
    main()
