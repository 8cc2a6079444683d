"""Shared CLI bootstrap: corpus + model + indices from flags.

The equivalent of the reference's ``modeling/util.py`` bootstrap helpers
(prepare_model / read_and_create_indices / read_sparse_scores, reference:
mfar/modeling/util.py:16-173), minus the temp-dir memmaps: dense corpus
matrices are built on demand from the encoder and live in device HBM.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

from mfar_tpu.data import trec
from mfar_tpu.data.format import format_documents
from mfar_tpu.data.schema import resolve_fields, sparse_keys
from mfar_tpu.data.types import Corpus, Field
from mfar_tpu.eval.index_build import build_sparse_indices
from mfar_tpu.models.registry import prepare_model
from mfar_tpu.sparse.bm25 import BM25Index



def normalize_argv(argv):
    """Accept the reference's underscore flag spelling (fire-style
    ``--encoder_lr``; its README mixes both forms) by rewriting flag tokens
    to argparse's hyphenated names.  Only tokens shaped like a flag
    (``--name`` or ``--name=value``) are rewritten, and nothing after a bare
    ``--`` separator -- free-text values that merely start with ``--`` pass
    through untouched."""
    import re
    import sys

    if argv is None:
        argv = sys.argv[1:]
    flag_re = re.compile(r"^--[A-Za-z0-9][A-Za-z0-9_-]*($|=)")
    out = []
    literal = False
    for tok in argv:
        if literal:
            pass
        elif tok == "--":
            literal = True
        elif isinstance(tok, str) and flag_re.match(tok):
            flag, sep, value = tok.partition("=")
            tok = flag.replace("_", "-") + sep + value
        out.append(tok)
    return out

def add_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset-name", required=True, help="mag | prime | amazon | whatsthatbook")
    p.add_argument("--data", default=None, help="directory with corpus + queries (sets both)")
    p.add_argument("--queries", default=None)
    p.add_argument("--corpus", default=None)
    p.add_argument("--field-names", default="all_dense", help="field micro-DSL, comma separated")


def resolve_data_dirs(args) -> None:
    if args.data:
        args.queries = args.data
        args.corpus = args.data
    assert args.queries and args.corpus, "pass --data or both --queries and --corpus"


def load_corpus(corpus_dir: str, dataset_name: str) -> Corpus:
    path = os.path.join(corpus_dir, "corpus")
    return Corpus.from_pairs(trec.read_corpus(path), dataset_name)


def corpus_texts_for_vocab(corpus: Corpus, field_info: Dict[str, Field], queries=None):
    texts = []
    pairs = list(corpus.pairs())
    seen_names = set()
    for f in field_info.values():
        if f.name in seen_names:
            continue
        seen_names.add(f.name)
        texts += [t for _, t in format_documents(pairs, f.name, f.dataset)]
    if queries:
        texts += list(queries)
    return texts


def load_or_build_sparse_indices(
    corpus: Corpus,
    field_info: Dict[str, Field],
    lexical_index: Optional[str],
) -> Dict[str, BM25Index]:
    """Load prebuilt per-field BM25 indices from --lexical-index when
    present, else build them in memory."""
    out: Dict[str, BM25Index] = {}
    missing: Dict[str, Field] = {}
    for fk in sparse_keys(field_info):
        path = lexical_index and os.path.join(lexical_index, f"{fk}_sparse_index")
        if path and os.path.isdir(path):
            out[fk] = BM25Index.load(path)
        else:
            missing[fk] = field_info[fk]
    if missing:
        out.update(build_sparse_indices(corpus, missing))
    return out


def load_negative_sampler_index(
    corpus: Corpus, lexical_index: Optional[str], dataset_name: str
) -> BM25Index:
    """The whole-document BM25 index used for hard-negative mining
    (reference: mfar/modeling/contrastive.py:71-77)."""
    path = lexical_index and os.path.join(lexical_index, "single_sparse_sparse_index")
    if path and os.path.isdir(path):
        return BM25Index.load(path)
    pairs = format_documents(corpus.pairs(), "single", dataset_name)
    return BM25Index.create(pairs, name="single")
