"""Pallas kernels in interpret mode against the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfar_tpu.ops.pallas_kernels import (
    TILE_C,
    gather_per_field_scores_pallas,
    gather_per_field_scores_xla,
)

B, N, F, E, C = 3, 64, 4, 128, 2 * TILE_C


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, E)), jnp.float32)
    docs = jnp.asarray(rng.normal(size=(N, F, E)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, size=(B, C)), jnp.int32)
    return q, docs, ids


def test_gather_score_matches_xla(data):
    q, docs, ids = data
    got = gather_per_field_scores_pallas(q, docs.reshape(N, F * E), ids, F, interpret=True)
    want = gather_per_field_scores_xla(q, docs, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gather_score_duplicate_and_boundary_ids(data):
    q, docs, _ = data
    ids = jnp.asarray(
        [[0] * TILE_C + [N - 1] * TILE_C,
         [5] * C,
         list(range(TILE_C)) + [N - 1 - i for i in range(TILE_C)]],
        jnp.int32,
    )
    got = gather_per_field_scores_pallas(q, docs.reshape(N, F * E), ids, F, interpret=True)
    want = gather_per_field_scores_xla(q, docs, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_tiles", [1, 2, 3])  # odd counts stress slot parity
def test_gather_score_cross_row_prefetch(data, n_tiles):
    q, docs, _ = data
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, N, size=(B, n_tiles * TILE_C)), jnp.int32)
    got = gather_per_field_scores_pallas(
        q, docs.reshape(N, F * E), ids, F, interpret=True, cross_row_prefetch=True
    )
    want = gather_per_field_scores_xla(q, docs, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gather_score_megacore_semantics(data):
    """megacore=True only changes dimension_semantics (query rows are
    independent); interpret-mode output must match XLA, and the invalid
    combination with cross-row prefetch is rejected."""
    q, docs, ids = data
    got = gather_per_field_scores_pallas(
        q, docs.reshape(N, F * E), ids, F, interpret=True, megacore=True
    )
    want = gather_per_field_scores_xla(q, docs, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    with pytest.raises(AssertionError, match="sequential grid walk"):
        gather_per_field_scores_pallas(
            q, docs.reshape(N, F * E), ids, F, interpret=True,
            megacore=True, cross_row_prefetch=True,
        )


def test_rejects_unaligned_candidate_width(data):
    q, docs, _ = data
    bad = jnp.zeros((B, TILE_C + 1), jnp.int32)
    with pytest.raises(AssertionError):
        gather_per_field_scores_pallas(q, docs.reshape(N, F * E), bad, F, interpret=True)
