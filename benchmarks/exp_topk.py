"""One-config top-k experiment: python benchmarks/exp_topk.py B ROW_BLOCK [CHUNK] [IDS]

Measures the fused multi-field scoring + running top-k at a given query
batch B, optionally splitting the per-chunk PartialReduce into row blocks
(ROW_BLOCK=0 keeps the fused reduce; IDS=0 drops the index output).

One config per process, and the program shape mirrors bench.py exactly
(outer lax.scan over query batches, docs as jit arguments, single scalar
fetch): killed mid-compile sessions wedge the TPU relay for minutes, so
keep each run small and reliable.
"""

import sys
import time

import jax
import jax.numpy as jnp

N, FE, K = 1_048_576, 3840, 100


def main():
    from mfar_tpu.utils.compile_cache import enable as _cc

    _cc()
    B = int(sys.argv[1])
    row_block = int(sys.argv[2])
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 524288
    with_ids = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
    Q = max(1, 8192 // B)

    docs = jax.random.normal(jax.random.PRNGKey(0), (N, FE), jnp.bfloat16)
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, B, FE), jnp.bfloat16)

    def chunk_topk(q, chunk_docs, offset):
        s = jnp.dot(q, chunk_docs.T, preferred_element_type=jnp.float32)
        if row_block and B > row_block:
            s2 = s.reshape(B // row_block, row_block, s.shape[-1])
            ts, sel = jax.lax.map(
                lambda sb: jax.lax.approx_max_k(sb, K, recall_target=0.95), s2
            )
            return ts.reshape(B, K), offset + sel.reshape(B, K)
        ts, sel = jax.lax.approx_max_k(s, K, recall_target=0.95)
        return ts, offset + sel

    def one_batch(q, docs3, offsets):
        def step(carry, inp):
            ts, ti = carry
            s, i = chunk_topk(q, *inp)
            cs = jnp.concatenate([ts, s], 1)
            ci = jnp.concatenate([ti, i], 1)
            ns, sel = jax.lax.top_k(cs, K)
            return (ns, jnp.take_along_axis(ci, sel, 1)), None

        init = chunk_topk(q, docs3[0], offsets[0])
        (ts, ti), _ = jax.lax.scan(step, init, (docs3[1:], offsets[1:]))
        if with_ids:
            return ts[:, 0].sum() + ti[:, 0].max().astype(jnp.float32)
        return ts[:, 0].sum()

    @jax.jit
    def run_all(qs, d):
        docs3 = d.reshape(N // chunk, chunk, FE)
        offsets = jnp.arange(N // chunk, dtype=jnp.int32) * chunk
        _, outs = jax.lax.scan(
            lambda _, q: (None, one_batch(q, docs3, offsets)), None, qs
        )
        return outs.sum()

    t0 = time.perf_counter()
    float(run_all(qs, docs))
    print(f"compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_all(qs, docs))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(
        f"B={B} row_block={row_block} chunk={chunk} ids={int(with_ids)}: "
        f"{Q*B/dt:.0f} qps ({dt/Q*1000:.1f} ms/batch)",
        flush=True,
    )


if __name__ == "__main__":
    main()
