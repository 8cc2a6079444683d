"""Pallas TPU kernels for the retrieval hot paths.

:func:`gather_per_field_scores_pallas` -- the stage-2 rerank gather:
given candidate row ids per query, fetch each candidate's per-field
embedding row from the HBM-resident corpus and compute the per-field dot
products, without materializing an XLA gather of the embedding rows.  The
candidate ids arrive via scalar prefetch, so each grid step starts the DMA
for its *next* candidate tile while computing the current one
(double-buffered HBM->VMEM streaming).

Layout: the kernel reads a ``[N, 1, F*E]`` row-DMA view of the corpus.  The
unit dim is load-bearing: Mosaic only allows single-row slices on axes
*above* the (8, 128)-tiled trailing two dims, so a flat ``[N, F*E]`` array
cannot be row-DMA'd (``Slice shape along dimension 0 must be aligned to
tiling (8)``).  The unit-sublane layout costs extra HBM (measured ~2.25x
read time vs flat on v5e), so the engine does NOT use this kernel by
default -- the default stage-2 path is an XLA row-gather from the single
flat matrix shared with the stage-1 fused matmul.  This kernel is the
opt-in for rerank-dominated serving, where avoiding the materialized
[B, C, F*E] gather (~3x rerank HBM traffic) outweighs the corpus-copy cost.
Per-field segments are E-aligned (E % 128 == 0), so in-kernel slicing stays
on lane boundaries -- Mosaic rejects sub-8 sublane slices like ``[F=5, E]``.

The XLA fallback (``jnp.take`` + einsum) remains the correctness reference;
``interpret=True`` runs the kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# candidates processed per grid step (DMA granularity: TILE_C rows)
TILE_C = 8


def _gather_score_kernel(
    ids_ref,  # scalar prefetch: i32[B * C]
    q_ref,  # VMEM f32[B, E] -- all query embeddings (small, fully resident)
    docs_ref,  # ANY f32[N, 1, F*E] -- row-DMA corpus view, stays in HBM
    out_ref,  # VMEM f32[1, TILE_C, F]
    scratch,  # VMEM f32[2, TILE_C, 1, F*E]
    sems,  # DMA semaphores (2,)
    *,
    c_total: int,
    num_fields: int,
    emb: int,
    cross_row_prefetch: bool,
):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    def fetch(slot, gidx):
        # One DMA per candidate row in the tile (rows are scattered in HBM).
        # ``gidx`` is the GLOBAL tile index b*n_tiles + tile: since
        # c_total == n_tiles*TILE_C, the flat ids offset b*c_total +
        # tile*TILE_C collapses to gidx*TILE_C, which also addresses the
        # first tile of the NEXT query row when gidx crosses a row boundary.
        copies = []
        for j in range(TILE_C):
            doc_id = ids_ref[gidx * TILE_C + j]
            copies.append(
                pltpu.make_async_copy(
                    docs_ref.at[doc_id],
                    scratch.at[slot, j],
                    sems.at[slot],
                )
            )
        return copies

    if cross_row_prefetch:
        # Slot parity follows the global tile index, so the double-buffer
        # alternates seamlessly across row boundaries: the last tile of row
        # b prefetches (b+1, tile 0) and no per-row warm-up stall remains.
        g = b * n_tiles + tile
        slot = jax.lax.rem(g, 2)

        @pl.when(g == 0)
        def _():
            for c in fetch(0, 0):
                c.start()

        @pl.when(g + 1 < pl.num_programs(0) * n_tiles)
        def _():
            for c in fetch(1 - slot, g + 1):
                c.start()
    else:
        # Row-local prefetch: each query row warms up its own first tile,
        # exposing one HBM fetch latency per (query, row).  Kept as the
        # default until the cross-row variant is validated on real TPU
        # hardware (interpret mode does not model DMA deadlocks).
        slot = jax.lax.rem(tile, 2)

        @pl.when(tile == 0)
        def _():
            for c in fetch(0, b * n_tiles):
                c.start()

        @pl.when(tile + 1 < n_tiles)
        def _():
            for c in fetch(1 - slot, b * n_tiles + tile + 1):
                c.start()

    for c in fetch(slot, b * n_tiles + tile):
        c.wait()

    q = q_ref[b]  # [E]
    rows = scratch[slot].reshape(TILE_C, num_fields * emb)  # [TILE_C, F*E]
    per_field = []
    for f in range(num_fields):
        seg = rows[:, f * emb : (f + 1) * emb]  # lane-aligned slice [TILE_C, E]
        per_field.append(
            jax.lax.dot_general(
                seg, q,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # f32 inputs must score at f32 precision (default MXU
                # precision truncates operands to bf16: 97% of outputs
                # drifted ~1e-2 vs the XLA reference on real TPU, round 4);
                # the kernel is DMA-bound, so the extra passes are free.
                precision=jax.lax.Precision.HIGHEST,
            )
        )  # [TILE_C]
    out_ref[0] = jnp.stack(per_field, axis=1)  # [TILE_C, F]


def make_row_dma_view(docs_flat: jax.Array) -> jax.Array:
    """[N, F*E] -> the [N, 1, F*E] layout this kernel can row-DMA.  On TPU
    this materializes a relayout COPY of the corpus; build it once at engine
    setup, only when opting into the Pallas rerank path."""
    n, fe = docs_flat.shape
    return docs_flat.reshape(n, 1, fe)


def gather_per_field_scores_pallas(
    q: jax.Array,  # [B, E] f32
    docs_rows: jax.Array,  # [N, 1, F*E] row-DMA view (or [N, F*E]: reshaped)
    cand_ids: jax.Array,  # [B, C] i32, C % TILE_C == 0
    num_fields: int,
    interpret: bool = False,
    cross_row_prefetch: bool = False,
    megacore: bool = False,
) -> jax.Array:  # [B, C, F]
    """Reads candidate rows in place via double-buffered DMA -- no
    [B, C, F*E] gather materialized in HBM (~3x less rerank HBM traffic
    than the XLA gather+einsum).

    ``cross_row_prefetch=True`` keys the double-buffer slot off the global
    tile index so the prefetch window crosses query-row boundaries (no
    per-row warm-up stall).

    ``megacore=True`` declares the query-row grid axis ``parallel``
    (``dimension_semantics``) so the two TPU megacores split the batch --
    query rows are independent when prefetch stays row-local, so this
    composes with the default prefetch but NOT with ``cross_row_prefetch``
    (whose slot parity assumes one sequential grid walk).

    All three variants validated on real TPU, round 4 (exp_pallas.py at
    N=131072 B=256 C=128): XLA 49.4 ms/batch, base 35.3, cross-row 32.3,
    megacore 29.3 -- the engine defaults to megacore.
    """
    b, e = q.shape
    if docs_rows.ndim == 2:
        docs_rows = make_row_dma_view(docs_rows)
    n, one, fe = docs_rows.shape
    assert one == 1 and fe == num_fields * e, (docs_rows.shape, num_fields, e)
    assert interpret or e % 128 == 0, (
        f"emb dim {e} must be lane-aligned (128) for in-kernel field slicing"
    )
    bb, c = cand_ids.shape
    assert bb == b and c % TILE_C == 0, f"C={c} must be a multiple of {TILE_C}"
    n_tiles = c // TILE_C

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            # whole query matrix resident in VMEM (B*E*4 bytes, small)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_C, num_fields), lambda i, j, ids: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_C, 1, fe), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _gather_score_kernel, c_total=c, num_fields=num_fields, emb=e,
        cross_row_prefetch=cross_row_prefetch,
    )
    kwargs = {}
    if megacore:
        assert not cross_row_prefetch, (
            "megacore splits the query-row axis across cores; the cross-row "
            "prefetch slot parity assumes one sequential grid walk"
        )
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, num_fields), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(
        cand_ids.reshape(-1).astype(jnp.int32),
        q.astype(jnp.float32),
        docs_rows.astype(jnp.float32),
    )


def gather_per_field_scores_xla(q, docs, cand_ids):
    """Correctness reference: gather + einsum over [N, F, E] docs."""
    if docs.ndim == 2:  # flat [N, F*E] corpus layout
        b, e = q.shape
        docs = docs.reshape(docs.shape[0], docs.shape[1] // e, e)
    rows = jnp.take(docs, cand_ids, axis=0)  # [B, C, F, E]
    return jnp.einsum("be,bcfe->bcf", q, rows,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
