"""Direct parity against the reference's negative sampler + random_chunk.

Imports mfar/data/negative_sampler.py and typedef.py offline by stubbing the
unavailable packages (mashumaro, pytorch_lightning, bm25s -- none installed
here, so nothing real is shadowed; bm25s.BM25 must exist because index.py
evaluates it in a signature annotation at class-definition time).

Randomness differs by design (stdlib ``random`` vs explicit np.Generator),
so parity is asserted on the DETERMINISTIC semantics:

- the negative candidate POOL (top n_retrieve -> drop gold -> sort desc ->
  bottom n_bottom), by drawing the whole pool (n_sample == pool size);
- the widening fallback when every retrieved doc is a gold positive
  (reference negative_sampler.py:46-52);
- random_chunk's word-window arithmetic, by pinning both sides' uniform
  draw to the same value.
"""

import pytest

from tests.ref_stubs import install_reference_stubs

install_reference_stubs()

from mfar.data import typedef as ref_typedef  # noqa: E402
from mfar.data.negative_sampler import (  # noqa: E402
    IndexNegativeSampler as RefSampler,
)

from mfar_tpu.data.negative_sampler import IndexNegativeSampler as OurSampler  # noqa: E402
from mfar_tpu.data.types import random_chunk_text  # noqa: E402


class FakeIndex:
    """Deterministic scores: doc ``d{i}`` scores n_docs - i (rank order by
    construction), so the pool arithmetic is fully predictable."""

    def __init__(self, n_docs):
        self.n = n_docs

    def retrieve(self, text, top_k):
        return [(f"d{i}", float(self.n - i)) for i in range(min(top_k, self.n))]


def _pools(n_docs, n_retrieve, n_bottom, positives):
    """Draw the FULL pool from both samplers (n_sample == pool size)."""
    retrieved = [f"d{i}" for i in range(min(n_retrieve, n_docs))]
    pool_size = len([d for d in retrieved if d not in positives])
    if pool_size == 0:  # widening fallback: positives + n_bottom candidates
        wider = len(positives) + n_bottom
        pool_size = len([f"d{i}" for i in range(min(wider, n_docs))
                         if f"d{i}" not in positives])
    pool_size = min(pool_size, n_bottom)

    ref = RefSampler(
        FakeIndex(n_docs), documents={f"d{i}": f"text {i}" for i in range(n_docs)},
        n_retrieve=n_retrieve, n_bottom=n_bottom, n_sample=pool_size,
    )
    ref_docs = ref.sample(ref_typedef.Query("q0", "query text"), {"q0": positives})
    ours = OurSampler(FakeIndex(n_docs), n_retrieve=n_retrieve,
                      n_bottom=n_bottom, n_sample=pool_size)
    our_keys = ours.sample("query text", positives)
    return {d._id for d in ref_docs}, set(our_keys), pool_size


def test_negative_pool_parity_plain():
    pos = {"d3", "d7"}
    ref_pool, our_pool, size = _pools(200, 100, 50, pos)
    assert ref_pool == our_pool and size == 50
    # bottom 50 of the 98 survivors (d0..d99 minus the 2 gold docs): the two
    # dropped positives shift the window start from rank 50 to doc d50..d99
    assert ref_pool == {f"d{i}" for i in range(50, 100)}


def test_negative_pool_parity_small_corpus():
    ref_pool, our_pool, size = _pools(12, 100, 50, {"d0"})
    assert ref_pool == our_pool == {f"d{i}" for i in range(1, 12)} and size == 11


def test_negative_pool_parity_widening_fallback():
    # every retrieved doc is gold -> both widen to len(pos) + n_bottom
    pos = {f"d{i}" for i in range(4)}
    ref_pool, our_pool, size = _pools(50, 4, 3, pos)
    assert ref_pool == our_pool == {"d4", "d5", "d6"} and size == 3


@pytest.mark.parametrize("u", [0.0, 0.31, 0.77, 0.9999])
@pytest.mark.parametrize("n_words,max_length", [(100, 64), (100, 8), (5, 64), (1, 8)])
def test_random_chunk_parity(monkeypatch, u, n_words, max_length):
    text = " ".join(f"w{i}" for i in range(n_words))
    monkeypatch.setattr(ref_typedef, "random", lambda: u)
    ref_doc = ref_typedef.Document("d0", text).random_chunk(max_length)

    class FixedRng:
        def random(self):
            return u

    assert random_chunk_text(text, max_length, FixedRng()) == ref_doc.text
