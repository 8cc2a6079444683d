"""Deterministic synthetic corpus generation.

Replaces the STaRK downloads in offline environments and tests (SURVEY.md
section 4): a deterministic
"amazon"-shaped semi-structured corpus whose queries are built from the title
words of their gold documents, so lexical and dense retrieval both have
learnable/retrievable signal.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np

from mfar_tpu.data import trec
from mfar_tpu.data.types import Corpus

_ADJ = "red blue green small large bright dark heavy light soft".split()
_NOUN = "shoe lamp table chair phone book kettle jacket bottle clock".split()
_VERB = "glows folds spins charges floats warms cools rolls locks sings".split()


def make_amazon_corpus(n_docs: int = 40, seed: int = 0) -> Corpus:
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        adj = _ADJ[i % len(_ADJ)]
        noun = _NOUN[(i // len(_ADJ)) % len(_NOUN)]
        verb = _VERB[int(rng.integers(len(_VERB)))]
        payload = {
            "title": f"{adj} {noun} model {i}",
            "brand": f"brand{i % 7}",
            "description": [f"a {adj} {noun} that {verb}", f"sku {i}"],
            "feature": [f"feature {verb}", f"weight {i % 5} kg"],
            "review": [
                {
                    "summary": f"{adj} and useful",
                    "reviewText": f"the {noun} really {verb}",
                    "reviewerID": f"user{i}",
                    "overall": 5,
                }
            ],
            "qa": [{"question": f"does it {verb}?", "answer": "yes"}],
            "also_buy": [f"{_ADJ[(i + 1) % len(_ADJ)]} {noun} model {i + 1}"],
            "also_view": [],
        }
        docs.append((str(i), payload))
    return Corpus.from_pairs(docs, dataset_name="amazon")


def make_queries_and_qrels(
    corpus: Corpus, n_queries: int = 16, seed: int = 1
) -> Tuple[Dict[str, str], List[trec.QRels]]:
    rng = np.random.default_rng(seed)
    queries: Dict[str, str] = {}
    qrels: List[trec.QRels] = []
    doc_ids = rng.permutation(len(corpus))[:n_queries]
    for qi, di in enumerate(doc_ids):
        doc = corpus.docs[int(di)]
        title = doc.raw["title"]
        verb = doc.raw["description"][0].split(" ")[-1]
        qid = str(1000 + qi)
        queries[qid] = f"which {title.split()[1]} {verb} and is {title.split()[0]}"
        qrels.append(trec.QRels(qid, doc.id, 1.0))
    return queries, qrels


def write_dataset_dir(path: str, corpus: Corpus, n_train: int = 10, n_val: int = 3, seed: int = 1):
    """Materialize corpus/queries/qrels files in the reference's on-disk layout."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "corpus"), "w") as f:
        for key, payload in corpus.pairs():
            f.write(f"{key}\t{json.dumps(payload)}\n")
    queries, qrels = make_queries_and_qrels(corpus, n_queries=n_train + 2 * n_val, seed=seed)
    qids = list(queries)
    splits = {
        "train": qids[:n_train],
        "val": qids[n_train : n_train + n_val],
        "test": qids[n_train + n_val :],
    }
    for split, ids in splits.items():
        with open(os.path.join(path, f"{split}.queries"), "w") as f:
            for qid in ids:
                f.write(f"{qid}\t{queries[qid]}\n")
        trec.write_qrels(
            os.path.join(path, f"{split}.qrels"),
            [r for r in qrels if r.query_id in set(ids)],
        )
    return splits
