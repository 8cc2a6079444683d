"""Piecewise timing of the scatter-free hybrid's candidate machinery.

Isolates, per chunk shape [B, c] x bucket [B, Mc]:
  gather     take_along_axis(s, rel) only
  seg        cumsum + reverse cummin segmented sums only
  union      lax.top_k over [B, k + Mc] only
  cand       full _posting_candidates
  densetopk  exact_topk_rows over [B, c] (the per-chunk dense selection)
Each timed as x8 chunks (one serving batch at N=1M, chunk=128K).

Usage: python benchmarks/exp_gather_parts.py [B] [Mc] [c]
"""

import sys
import time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MC = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
C = int(sys.argv[3]) if len(sys.argv) > 3 else 131072
K = 100
NCH = 8

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mfar_tpu.ops import scoring  # noqa: E402


def bench(name, fn, *args):
    # scalar float() fetch, NOT block_until_ready: the relay does not
    # block through block_until_ready, which silently times dispatch only
    try:
        float(fn(*args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
        print(f"{name:>10}: {min(times) * 1e3:8.2f} ms ({NCH} chunks)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:>10}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    s = jax.random.normal(jax.random.PRNGKey(0), (B, C), jnp.float32)
    rel = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(1), (B, MC), 0, C, jnp.int32),
        axis=1,
    )
    wv = jax.random.uniform(jax.random.PRNGKey(2), (B, MC), jnp.float32)
    ts = jax.random.normal(jax.random.PRNGKey(3), (B, K), jnp.float32)
    jax.block_until_ready((s, rel, wv))
    print(f"B={B} Mc={MC} c={C} x{NCH}", flush=True)

    def rep(body):
        # xs vary per step (tiled NCH-wise) so XLA cannot hoist the body
        # out of the scan as loop-invariant.
        @jax.jit
        def run(*args):
            xs = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (NCH,) + a.shape)
                + jnp.arange(NCH, dtype=a.dtype).reshape(
                    (NCH,) + (1,) * a.ndim
                ),
                args,
            )
            def step(carry, inp):
                return carry, body(*inp)
            _, ys = jax.lax.scan(step, None, xs)
            return sum(jax.tree.leaves(jax.tree.map(
                lambda y: y.sum().astype(jnp.float32), ys)))
        return run

    bench("gather", rep(lambda s, r: jnp.take_along_axis(s, r, axis=1)), s, rel)

    def seg_only(rel, wv):
        b, mc = rel.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, mc), 1)
        prev = jnp.concatenate([jnp.full((b, 1), -1, rel.dtype), rel[:, :-1]], axis=1)
        is_start = rel != prev
        csum = jnp.concatenate([jnp.zeros((b, 1), jnp.float32), jnp.cumsum(wv, axis=1)], axis=1)
        starts = jnp.where(is_start, pos, mc)
        nxt_incl = jax.lax.cummin(starts, axis=1, reverse=True)
        nxt = jnp.concatenate([nxt_incl[:, 1:], jnp.full((b, 1), mc, jnp.int32)], axis=1)
        return jnp.take_along_axis(csum, nxt, axis=1) - jnp.take_along_axis(csum, pos, axis=1)

    bench("seg", rep(seg_only), rel, wv)

    def union_only(ts, cs):
        all_s = jnp.concatenate([ts, cs], axis=1)
        return jax.lax.top_k(all_s, 2 * K)[0]

    bench("union", rep(union_only), ts, wv)
    bench("cand", rep(lambda s, r, w: scoring._posting_candidates(s, r, w, 0)[0]),
          s, rel, wv)
    bench("densetopk", rep(lambda s: scoring.exact_topk_rows(s, K)[0]), s)


if __name__ == "__main__":
    main()
