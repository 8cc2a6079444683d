"""Pallas rerank-gather experiment:
python benchmarks/exp_pallas.py [VARIANT] [N] [B] [C]

VARIANT: xla | pallas | xrow | mc | mc16 | all (default all).  Validates
each variant against the XLA gather+einsum reference on a small id slice,
then times the full [B, C] candidate gather+score at rerank shapes.
``xrow`` is the cross-row DMA prefetch, ``mc`` the megacore (parallel
query-row axis) variant, and ``mc16`` megacore over a BF16 corpus view --
half the DMA bytes of this DMA-bound kernel, and the combination the
auto-gate ships by default (see ops/pallas_kernels.py) -- run these ONCE
on real hardware before changing any default.

One variant still shares the process (same corpus, sequential jits) because
every program here is a single pallas_call / jit with one scalar fetch --
the shapes are tiny next to the top-k scans, so the relay-wedging risk that
forces one-config-per-process elsewhere does not apply.  Keep N modest:
``all`` holds the f32 corpus + its f32 row view + the bf16 row view
(262144 rows at F*E=3840: ~10 GB HBM).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

F, E = 5, 768
K_WARM = 1  # compile+warm passes before timing


def main():
    from mfar_tpu.utils.compile_cache import enable as _cc

    _cc()
    variant = sys.argv[1] if len(sys.argv) > 1 else "all"
    assert variant in ("xla", "pallas", "xrow", "mc", "mc16", "all"), (
        f"unknown variant {variant!r}"
    )  # fail BEFORE paying the corpus-size row-DMA copy
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    c = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    from mfar_tpu.ops.pallas_kernels import (
        gather_per_field_scores_pallas,
        gather_per_field_scores_xla,
        make_row_dma_view,
    )

    interpret = jax.default_backend() != "tpu"
    docs = jax.random.normal(jax.random.PRNGKey(0), (n, F * E), jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(1), (b, E), jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, c), 0, n, jnp.int32)

    PALLAS_VARIANTS = (
        ("pallas", dict()),
        ("xrow", dict(cross_row_prefetch=True)),
        ("mc", dict(megacore=True)),
    )
    runners = {}
    rows = None
    if variant in ("xla", "all"):
        xla_fn = jax.jit(
            lambda q, d, i: gather_per_field_scores_xla(q, d, i).sum()
        )
        runners["xla"] = lambda: float(xla_fn(q, docs, ids))
    if variant in tuple(n for n, _ in PALLAS_VARIANTS) + ("all",):
        rows = make_row_dma_view(docs)  # built ONCE: it is a corpus-size copy
        for name, kw in PALLAS_VARIANTS:
            if variant not in (name, "all"):
                continue
            fn = jax.jit(
                lambda q, r, i, kw=kw: gather_per_field_scores_pallas(
                    q, r, i, F, interpret=interpret, **kw
                ).sum()
            )
            runners[name] = lambda fn=fn: float(fn(q, rows, ids))
    rows16 = None
    if variant in ("mc16", "all"):
        # bf16 corpus view: half the row-DMA copy AND half the kernel's DMA
        # bytes; correctness vs XLA on the SAME stored precision below.
        rows16 = make_row_dma_view(docs.astype(jnp.bfloat16))
        fn16 = jax.jit(
            lambda q, r, i: gather_per_field_scores_pallas(
                q, r, i, F, interpret=interpret, megacore=True
            ).sum()
        )
        runners["mc16"] = lambda: float(fn16(q, rows16, ids))

    # Correctness first: full-output comparison vs the XLA reference
    # (skipped when only the XLA runner was requested -- nothing to compare).
    if rows is not None:
        want = np.asarray(gather_per_field_scores_xla(q, docs, ids))
        for name, kw in PALLAS_VARIANTS:
            if variant in (name, "all"):
                got = np.asarray(
                    gather_per_field_scores_pallas(
                        q, rows, ids, F, interpret=interpret, **kw
                    )
                )
                np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
                print(f"{name}: matches XLA on [{b}, {c}, {F}]", flush=True)
    if rows16 is not None:
        want16 = np.asarray(
            gather_per_field_scores_xla(
                q, docs.astype(jnp.bfloat16).astype(jnp.float32), ids
            )
        )
        got16 = np.asarray(
            gather_per_field_scores_pallas(
                q, rows16, ids, F, interpret=interpret, megacore=True
            )
        )
        np.testing.assert_allclose(got16, want16, rtol=1e-4, atol=1e-4)
        print(f"mc16: matches XLA(bf16-stored) on [{b}, {c}, {F}]", flush=True)

    for name, run in runners.items():
        t0 = time.perf_counter()
        for _ in range(K_WARM):
            run()
        print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(
            f"{name}: N={n} B={b} C={c} -> {dt * 1e3:.2f} ms/batch "
            f"({b / dt:.0f} qps gather-score only)",
            flush=True,
        )


if __name__ == "__main__":
    main()
