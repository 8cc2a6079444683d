"""A/B the hybrid postings scatter-add densification on chip.

The hybrid serving path densifies O(nnz) per-query postings into a
[B, N] f32 score grid with ``comb.at[row, ids].add(vals)`` before the
fused chunked scan (ops/scoring.py fused_hybrid_topk_postings_from_query).
The engine feeds CONCATENATED per-term CSR runs: ids are sorted within
each term's run but not globally, and a doc hit by several terms/fields
repeats.  XLA's TPU scatter lowers to a serial-ish loop for unsorted,
possibly-duplicated indices; telling it ``indices_are_sorted`` (after a
host or device sort -- duplicates stay legal for the add combiner) and/or
``PROMISE_IN_BOUNDS`` (engine ids are always < N; pad id is 0) may unlock
the vectorized lowering.

Variants, each timed as scatter + consume-sum (the consume adds one
~0.2 ms [B, N] HBM read, identical across variants):
  base           .at[].add, default modes (the shipping path)
  inbounds       + mode=promise_in_bounds
  sorted         ids presorted per row (host) + indices_are_sorted=True
  sorted+ib      both
  dsort          device jnp.sort by id inside the program, then sorted+ib
                 (what the serving path could do without touching the
                 native engine's output order)

Usage: python benchmarks/exp_scatter.py [N] [B] [M]
"""

import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
M = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
Q = 8  # batches per timed program (amortise dispatch)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

IB = lax.GatherScatterMode.PROMISE_IN_BOUNDS


def scatter_variant(ids, vals, sorted_=False, inbounds=False):
    comb = jnp.zeros((B, N), jnp.float32)
    rows = jnp.arange(B)[:, None]
    kw = {}
    if inbounds:
        kw["mode"] = IB
    return comb.at[rows, ids].add(
        vals, indices_are_sorted=sorted_, unique_indices=False, **kw
    )


def main():
    key = jax.random.PRNGKey(0)
    kid = jax.random.randint(key, (Q, B, M), 0, N, jnp.int32)
    kval = jax.random.uniform(jax.random.PRNGKey(1), (Q, B, M), jnp.float32)
    kid_sorted = jnp.sort(kid, axis=-1)
    kid.block_until_ready()
    kid_sorted.block_until_ready()
    print(f"N={N} B={B} M={M} Q={Q}", flush=True)

    def make(run_ids, sorted_, inbounds, device_sort=False):
        @jax.jit
        def run(kid, kval):
            def step(_, inp):
                ids, vals = inp
                if device_sort:
                    order = jnp.argsort(ids, axis=-1)
                    ids = jnp.take_along_axis(ids, order, axis=-1)
                    vals = jnp.take_along_axis(vals, order, axis=-1)
                comb = scatter_variant(ids, vals, sorted_, inbounds)
                return None, comb.sum()

            _, outs = lax.scan(step, None, (kid, kval))
            return outs.sum()

        return run, run_ids

    variants = [
        ("base", make(kid, False, False)),
        ("inbounds", make(kid, False, True)),
        ("sorted", make(kid_sorted, True, False)),
        ("sorted+ib", make(kid_sorted, True, True)),
        ("dsort", make(kid, True, True, device_sort=True)),
    ]
    ref = None
    for name, (fn, ids) in variants:
        try:
            out = float(fn(ids, kval))
            if ref is None:
                ref = out
            elif abs(out - ref) > 1e-2 * abs(ref):
                print(f"{name:>10}: MISMATCH {out} vs {ref}", flush=True)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(ids, kval))
                times.append(time.perf_counter() - t0)
            dt = min(times) / Q
            print(f"{name:>10}: {dt * 1e3:8.2f} ms/batch "
                  f"({B * M / dt / 1e6:7.1f} M postings/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>10}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
