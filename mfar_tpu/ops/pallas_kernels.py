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

Dtypes: the corpus view may be f32 or bf16.  A bf16 corpus CANNOT use the
unit-sublane view -- bf16 packs 2 values per 32-bit sublane word, so Mosaic
requires dim-1 slices in multiples of 2 (measured on v5e, round 5: ``Slice
shape along dimension 1 must be aligned to tiling (2), but is 1``; the HBM
memref was ``[N, 2, F*E]``, i.e. the unit dim also silently pads 2x).  bf16
corpora therefore use a ``[ceil(N/2), 2, F*E]`` PAIR view: dim-1 slices of
2 are tile-aligned, the view costs exactly the corpus's own bytes (no
sublane padding), and each candidate's DMA moves its 2-row block -- the
same bytes as one f32 row, while total HBM for flat + view equals ONE f32
corpus.  The kernel computes both rows' dots and keeps the candidate's
parity; rows upcast to f32 in VMEM after the DMA and dots run at f32
HIGHEST precision, matching the XLA gather+einsum reference on the same
stored precision.

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
    docs_ref,  # ANY [N/rpb, rpb, F*E] row/pair-DMA corpus view, stays in HBM
    out_ref,  # VMEM f32[1, TILE_C, F]
    scratch,  # VMEM [2, TILE_C, rpb, F*E] in the corpus dtype
    sems,  # DMA semaphores (2,)
    *,
    c_total: int,
    num_fields: int,
    emb: int,
    cross_row_prefetch: bool,
    rpb: int,  # rows per DMA block: 1 (f32 unit view) or 2 (bf16 pair view)
):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    def fetch(slot, gidx):
        # One DMA per candidate in the tile (rows are scattered in HBM);
        # the bf16 pair view fetches the candidate's 2-row block.
        # ``gidx`` is the GLOBAL tile index b*n_tiles + tile: since
        # c_total == n_tiles*TILE_C, the flat ids offset b*c_total +
        # tile*TILE_C collapses to gidx*TILE_C, which also addresses the
        # first tile of the NEXT query row when gidx crosses a row boundary.
        copies = []
        for j in range(TILE_C):
            doc_id = ids_ref[gidx * TILE_C + j]
            copies.append(
                pltpu.make_async_copy(
                    docs_ref.at[doc_id // rpb] if rpb > 1 else docs_ref.at[doc_id],
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

    def field_dots(rows):  # [TILE_C, F*E] f32 -> [TILE_C, F]
        per_field = []
        for f in range(num_fields):
            seg = rows[:, f * emb : (f + 1) * emb]  # lane-aligned [TILE_C, E]
            per_field.append(
                jax.lax.dot_general(
                    seg, q,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    # f32 inputs must score at f32 precision (default MXU
                    # precision truncates operands to bf16: 97% of outputs
                    # drifted ~1e-2 vs the XLA reference on real TPU,
                    # round 4); the kernel is DMA-bound, so the extra
                    # passes are free.
                    precision=jax.lax.Precision.HIGHEST,
                )
            )  # [TILE_C]
        return jnp.stack(per_field, axis=1)  # [TILE_C, F]

    # bf16 corpora upcast AFTER the DMA (the pair view halves the HBM bytes
    # this DMA-bound kernel moves per stored row); the VPU cast per tile is
    # free by comparison.
    blocks = scratch[slot].astype(jnp.float32)  # [TILE_C, rpb, F*E]
    if rpb == 1:
        dots = field_dots(blocks.reshape(TILE_C, num_fields * emb))
    else:
        # Each pair block holds the candidate row at its parity position;
        # the sibling row's dots (computed for free -- the block arrived in
        # the same DMA either way) are discarded by the parity select.  The
        # planes are sliced as VALUES, not refs: a [2, F*E] trailing shape
        # is sub-tile for sublane slicing on the ref itself.
        d0 = field_dots(blocks[:, 0, :])
        d1 = field_dots(blocks[:, 1, :])
        base = (b * n_tiles + tile) * TILE_C
        # Per-candidate parity select WITHOUT 1-D vectors (Mosaic rejects
        # vector<8xi1> -> vector<8x1xi1> reshapes): each candidate's SMEM
        # parity scalar gates a 2-D row mask.
        rowid = jax.lax.broadcasted_iota(jnp.int32, (TILE_C, num_fields), 0)
        dots = d0
        for j in range(TILE_C):
            odd = ids_ref[base + j] % rpb == 1  # scalar bool
            dots = jnp.where(jnp.logical_and(rowid == j, odd), d1, dots)
    out_ref[0] = dots  # [TILE_C, F]


def make_row_dma_view(docs_flat: jax.Array) -> jax.Array:
    """[N, F*E] -> the layout this kernel can DMA per candidate: f32 rows
    become the ``[N, 1, F*E]`` unit view; bf16 rows the ``[ceil(N/2), 2,
    F*E]`` PAIR view (bf16 packs 2 values per sublane word -- Mosaic
    rejects dim-1 slices of 1, measured on v5e round 5; an odd corpus pads
    one zero row that no candidate id ever references).  On TPU either view
    materializes a relayout COPY of the corpus; build it once at engine
    setup, only when opting into the Pallas rerank path."""
    n, fe = docs_flat.shape
    if docs_flat.dtype == jnp.bfloat16:
        if n % 2:
            docs_flat = jnp.pad(docs_flat, ((0, 1), (0, 0)))
            n += 1
        return docs_flat.reshape(n // 2, 2, fe)
    return docs_flat.reshape(n, 1, fe)


def gather_per_field_scores_pallas(
    q: jax.Array,  # [B, E] f32
    docs_rows: jax.Array,  # f32 [N, 1, F*E] / bf16 [N/2, 2, F*E] DMA view
    #   (or flat [N, F*E]: make_row_dma_view is applied)
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
    assert docs_rows.dtype in (jnp.float32, jnp.bfloat16), (
        f"corpus dtype {docs_rows.dtype} (f32 or bf16; int8 rerank "
        f"dequantizes through the XLA gather)"
    )
    n_blocks, rpb, fe = docs_rows.shape
    want_rpb = 2 if docs_rows.dtype == jnp.bfloat16 else 1
    assert rpb == want_rpb and fe == num_fields * e, (
        f"view {docs_rows.shape} {docs_rows.dtype}: expected rows-per-block "
        f"{want_rpb} and F*E == {num_fields}*{e} (use make_row_dma_view)"
    )
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
            # DMA landing buffer in the CORPUS dtype: a bf16 corpus stores
            # half the bytes per row (the kernel is DMA-bound)
            pltpu.VMEM((2, TILE_C, rpb, fe), docs_rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _gather_score_kernel, c_total=c, num_fields=num_fields, emb=e,
        cross_row_prefetch=cross_row_prefetch, rpb=rpb,
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
        docs_rows,  # corpus dtype preserved: no per-call upcast copy
    )


@functools.cache
def _gather_jit(num_fields: int, interpret: bool, cross_row_prefetch: bool,
                megacore: bool):
    return jax.jit(
        functools.partial(
            gather_per_field_scores_pallas,
            num_fields=num_fields,
            interpret=interpret,
            cross_row_prefetch=cross_row_prefetch,
            megacore=megacore,
        )
    )


def gather_per_field_scores_pallas_jit(
    q, docs_rows, cand_ids, num_fields, interpret=False,
    cross_row_prefetch=False, megacore=False,
):
    """Jitted (and jit-CACHED) twin of :func:`gather_per_field_scores_pallas`
    for eager call sites.  An eager ``pallas_call`` re-traces and re-lowers
    the kernel on every invocation -- measured ~770 ms/batch of pure host
    overhead in the serving engine on a 1-vCPU host (round 5: 1028 ms/batch
    eager vs ~37 ms for the same kernel under jit)."""
    return _gather_jit(num_fields, interpret, cross_row_prefetch, megacore)(
        q, docs_rows, cand_ids
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
