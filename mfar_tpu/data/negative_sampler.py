"""BM25-mined hard negative sampling.

Reference semantics (mfar/data/negative_sampler.py:22-64, defaults wired at
mfar/commands/train.py:40): retrieve the whole-document BM25 top
``n_retrieve`` for the query, drop gold positives, keep the *bottom*
``n_bottom`` of the remaining ranked list (i.e. BM25 ranks 51-100 with the
defaults -- lexically plausible but not trivially relevant), and sample
``n_sample`` uniformly.  RNG is explicit for reproducibility.
"""

from __future__ import annotations

from typing import AbstractSet, List, Optional

import numpy as np

from mfar_tpu.sparse.bm25 import BM25Index


class IndexNegativeSampler:
    def __init__(
        self,
        index: BM25Index,
        n_retrieve: int = 100,
        n_bottom: int = 50,
        n_sample: int = 1,
    ):
        self.index = index
        self.n_retrieve = n_retrieve
        self.n_bottom = n_bottom
        self.n_sample = n_sample

    def sample(
        self,
        query_text: str,
        positives: AbstractSet[str],
        rng: Optional[np.random.Generator] = None,
    ) -> List[str]:
        """Returns sampled negative document keys."""
        rng = rng or np.random.default_rng()
        candidates = [
            (key, score)
            for key, score in self.index.retrieve(query_text, top_k=self.n_retrieve)
            if key not in positives
        ]
        if not candidates:
            # Widen the retrieval just enough to clear the positives.
            wider = len(positives) + self.n_bottom
            candidates = [
                (key, score)
                for key, score in self.index.retrieve(query_text, top_k=wider)
                if key not in positives
            ]
        candidates.sort(key=lambda x: x[1], reverse=True)
        pool = [key for key, _ in candidates[-self.n_bottom :]]
        if not pool:
            return []
        picks = rng.choice(len(pool), size=min(self.n_sample, len(pool)), replace=False)
        return [pool[int(i)] for i in picks]

    def sample_batch(
        self,
        query_texts: List[str],
        positives_per_query: List[AbstractSet[str]],
        rng: Optional[np.random.Generator] = None,
    ) -> List[List[str]]:
        rng = rng or np.random.default_rng()
        return [
            self.sample(q, pos, rng)
            for q, pos in zip(query_texts, positives_per_query)
        ]
