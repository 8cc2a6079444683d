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
):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    def fetch(slot, tile_idx):
        # One DMA per candidate row in the tile (rows are scattered in HBM).
        copies = []
        for j in range(TILE_C):
            doc_id = ids_ref[b * c_total + tile_idx * TILE_C + j]
            copies.append(
                pltpu.make_async_copy(
                    docs_ref.at[doc_id],
                    scratch.at[slot, j],
                    sems.at[slot],
                )
            )
        return copies

    slot = jax.lax.rem(tile, 2)

    # Warm-up: the first tile of each query row starts its own DMA.
    # Known perf nit (unmeasured; opt-in kernel): prefetch stops at row
    # boundaries, exposing one HBM fetch latency per (query, row) -- a
    # cross-row prefetch of (b+1, tile 0) at the last tile would hide it,
    # but DMA/semaphore edits need real-TPU validation (interpret mode
    # does not model deadlocks), so it is left for a hardware session.
    @pl.when(tile == 0)
    def _():
        for c in fetch(0, 0):
            c.start()

    # Prefetch the next tile into the other slot while this one computes.
    @pl.when(tile + 1 < n_tiles)
    def _():
        for c in fetch(1 - slot, tile + 1):
            c.start()

    for c in fetch(slot, tile):
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
) -> jax.Array:  # [B, C, F]
    """Reads candidate rows in place via double-buffered DMA -- no
    [B, C, F*E] gather materialized in HBM (~3x less rerank HBM traffic
    than the XLA gather+einsum)."""
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
        _gather_score_kernel, c_total=c, num_fields=num_fields, emb=e
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, num_fields), jnp.float32),
        interpret=interpret,
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
    return jnp.einsum("be,bcfe->bcf", q, rows, preferred_element_type=jnp.float32)
