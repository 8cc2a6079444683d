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


def add_engine_args(p: argparse.ArgumentParser) -> None:
    """The serving-engine flag block shared by ``retrieve`` and ``serve``:
    model/checkpoint/index sources plus every engine knob."""
    p.add_argument("--model-name", default="facebook/contriever-msmarco")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--dense-index", default=None, help="prebuilt .npz from encode_corpus")
    p.add_argument("--lexical-index", default=None)
    p.add_argument("--recall-k", type=int, default=100)
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--quantize", default=None, choices=[None, "int8"],
                   help="int8 corpus quantization: half the HBM (2x docs per "
                        "chip or mesh), ~0.5%% per-side score precision trade")
    p.add_argument("--use-pallas-gather", nargs="?", const="on", default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas DMA rerank gather (faster stage-2; keeps a "
                        "second row-DMA corpus copy in HBM -- see "
                        "ops/pallas_kernels.py).  auto (default): on for a "
                        "dedicated --mode rerank TPU engine whose corpus "
                        "fits the cost model (2 copies + scan workspace in "
                        "HBM, f32/bf16, single chip); on: force "
                        "(incompatible with --mesh/--quantize/"
                        "--corpus-on-host); off: never")
    p.add_argument("--pallas-cross-row", action="store_true",
                   help="cross-row DMA prefetch in the Pallas rerank kernel "
                        "(removes the per-query warm-up stall); experimental")
    p.add_argument("--corpus-on-host", action="store_true",
                   help="keep the dense corpus in HOST RAM/memmap and stream "
                        "chunks to the device(s) per scan (capacity beyond "
                        "HBM, at H2D-bandwidth-bound throughput; exact mode; "
                        "hybrid-capable; composes with the mesh -- each chip "
                        "streams only its row shard -- and with --quantize "
                        "int8 for 1-byte chunks, including all together)")
    p.add_argument("--dense-topk", default="exact", choices=["exact", "approx"],
                   help="dense top-k selection in exact mode: exact sort, or "
                        "the TPU PartialReduce (recall>=0.95, ~2x faster at "
                        "1M rows; candidate scores stay exact either way)")
    p.add_argument("--dense-dtype", default="bf16", choices=["bf16", "f32"],
                   help="device dtype for the corpus matrix; bf16 (default) "
                        "halves HBM (1M 5-field docs: 7.4 GB vs 15 GB) at "
                        "bf16 rounding of each corpus embedding -- pass f32 "
                        "for bit-exact f32 scoring (reference numerics)")
    p.add_argument("--mode", default="auto", choices=["auto", "exact", "rerank"],
                   help="exact (the default) fuses full-corpus scoring "
                        "(exhaustive over every document -- 'exact' refers "
                        "to the search scope; score precision follows "
                        "--dense-dtype), hybrid-capable; rerank is the "
                        "reference-compat recall+rerank approximation")
    p.add_argument("--mesh", default="auto", choices=["auto", "off"],
                   help="auto: shard the corpus over all visible chips and "
                        "serve with distributed top-k; off: single chip")
    p.add_argument("--n-model", type=int, default=1,
                   help="tensor-parallel mesh axis size")
    p.add_argument("--n-replica", type=int, default=1,
                   help="cross-slice axis size (required for --corpus-per-slice "
                        "query-batch sharding to engage)")
    p.add_argument("--corpus-per-slice", action="store_true",
                   help="replicate the corpus per slice (shard only within a "
                        "slice over ICI); higher QPS when it fits one slice, "
                        "vs the default cross-slice sharding for capacity")


def build_engine(args, label: str = "engine"):
    """Assemble a ready-to-serve RetrievalEngine from the shared flag
    block: corpus + model/checkpoint + dense matrix (prebuilt or encoded
    now) + sparse indices + mesh, exactly the retrieve CLI's construction
    path.  ``label`` names the command in mesh log lines."""
    import jax
    import jax.numpy as jnp

    from mfar_tpu.eval.index_build import (
        build_dense_corpus_matrix,
        load_dense_matrix,
        make_encode_fn,
    )
    from mfar_tpu.eval.retrieval import RetrievalEngine
    from mfar_tpu.models import build_encoder
    from mfar_tpu.parallel.mesh import mesh_from_flag

    resolve_data_dirs(args)
    field_info = resolve_fields(args.field_names, args.dataset_name)
    corpus = load_corpus(args.corpus, args.dataset_name)
    config, params, tokenizer = prepare_model(
        args.model_name, normalize=args.normalize,
        # only the synthetic path consumes corpus_texts (see train.py)
        corpus_texts=corpus_texts_for_vocab(corpus, field_info)
        if args.model_name.startswith("synthetic") else None,
    )

    mixer_params = {"weight": jnp.ones((1, len(field_info)), jnp.float32)}
    if args.checkpoint_dir:
        from mfar_tpu.train.checkpoint import (
            CheckpointManager,
            check_field_compatibility,
            read_best_dir,
        )
        from mfar_tpu.train.model import MFARModel
        from mfar_tpu.train.optim import make_optimizer
        from mfar_tpu.train.train_step import init_state

        model = MFARModel(encoder_config=config, num_fields=len(field_info))
        opt = make_optimizer(encoder_lr=1e-4, weights_lr=1e-1)
        state = init_state(model, opt, seed=0)
        state = state._replace(params={**state.params, "encoder": jax.tree.map(jnp.asarray, params)})
        best_dir = read_best_dir(args.checkpoint_dir)
        check_field_compatibility(best_dir, field_info)
        step = int(os.path.basename(best_dir.rstrip("/")))
        state = CheckpointManager(args.checkpoint_dir).restore(step, state)
        params = state.params["encoder"]
        mixer_params = state.params["mixer"]

    encoder = build_encoder(config)

    # FORCED pallas-gather keeps a single-chip row-DMA corpus copy (forces
    # --mesh off); in auto the mesh wins and the gate resolves off.  int8
    # composes with the mesh (2x docs per MESH) and with a host corpus
    # (1-byte streamed chunks), including all three together (each chip
    # streams its int8 row shard); hybrid composes with every corpus
    # representation (per-shard postings scatter, including per streamed
    # chunk).
    mesh = None
    if args.use_pallas_gather != "on":
        mesh = mesh_from_flag(args.mesh, label,
                              n_model=args.n_model, n_replica=args.n_replica)

    encode = make_encode_fn(encoder, params, mesh=mesh)

    dense_fields = {k: f for k, f in field_info.items() if f.is_dense}
    if args.dense_index:
        matrix, keys = load_dense_matrix(args.dense_index)
        assert keys == list(corpus.keys()), "dense index keys do not match the corpus"
    else:
        matrix = build_dense_corpus_matrix(encode, tokenizer, corpus, dense_fields)

    sparse_indices = load_or_build_sparse_indices(corpus, field_info, args.lexical_index)
    return RetrievalEngine(
        field_info=field_info,
        doc_keys=list(corpus.keys()),
        encode_fn=encode,
        tokenizer=tokenizer,
        mixer_params=mixer_params,
        dense_matrix=matrix if matrix.size else None,
        sparse_indices={k: sparse_indices[k] for k in sparse_keys(field_info)},
        recall_k=args.recall_k,
        use_pallas_gather={"on": True, "off": False}.get(
            args.use_pallas_gather, "auto"
        ),
        pallas_cross_row=args.pallas_cross_row,
        quantize=args.quantize,
        mesh=mesh,
        corpus_per_slice=args.corpus_per_slice,
        mode=args.mode,
        dense_topk=args.dense_topk,
        corpus_on_host=args.corpus_on_host,
        # int8 manages its own corpus representation; the pallas gather now
        # composes with bf16 (a bf16 rowview halves the copy AND the
        # kernel's DMA bytes -- see ops/pallas_kernels.py)
        dense_dtype=jnp.bfloat16
        if args.dense_dtype == "bf16" and not args.quantize
        else None,
    )


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
