"""Serve a batch of queries against a trained retriever -> qres (+ metrics).

The reference has no standalone serving path -- retrieval exists only inside
the Lightning test loop (SURVEY.md section 1).  This command loads a
checkpoint + prebuilt/auto-built indices and answers a query file, writing a
trec run file and (when qrels are present) metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from mfar_tpu.commands.common import (  # noqa: F401
    normalize_argv,
    add_data_args,
    corpus_texts_for_vocab,
    load_corpus,
    load_or_build_sparse_indices,
    resolve_data_dirs,
)
from mfar_tpu.data import trec
from mfar_tpu.data.schema import resolve_fields, sparse_keys
from mfar_tpu.eval.index_build import build_dense_corpus_matrix, load_dense_matrix
from mfar_tpu.eval.retrieval import RetrievalEngine
from mfar_tpu.models import build_encoder
from mfar_tpu.models.registry import prepare_model


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--out", required=True, help="output qres path")
    p.add_argument("--partition", default="test")
    p.add_argument("--model-name", default="facebook/contriever-msmarco")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--dense-index", default=None, help="prebuilt .npz from encode_corpus")
    p.add_argument("--lexical-index", default=None)
    p.add_argument("--top-k", type=int, default=100)
    p.add_argument("--recall-k", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--quantize", default=None, choices=[None, "int8"],
                   help="int8 corpus quantization: half the HBM (2x docs per "
                        "chip or mesh), ~0.5%% per-side score precision trade")
    p.add_argument("--use-pallas-gather", action="store_true",
                   help="Pallas DMA rerank gather (faster stage-2; keeps a "
                        "second corpus copy in HBM -- see ops/pallas_kernels.py)")
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
    p.add_argument("--multihost", default="auto", choices=["auto", "off", "force", "pod"],
                   help="multi-process runtime (jax.distributed); see train --multihost")
    p.add_argument("--corpus-per-slice", action="store_true",
                   help="replicate the corpus per slice (shard only within a "
                        "slice over ICI); higher QPS when it fits one slice, "
                        "vs the default cross-slice sharding for capacity")
    args = p.parse_args(normalize_argv(argv))
    from mfar_tpu.parallel import multihost

    if multihost.maybe_initialize(args.multihost):
        print(f"[retrieve] multihost: process {jax.process_index()}/"
              f"{jax.process_count()}")
    resolve_data_dirs(args)

    field_info = resolve_fields(args.field_names, args.dataset_name)
    corpus = load_corpus(args.corpus, args.dataset_name)
    queries = trec.read_queries(os.path.join(args.queries, f"{args.partition}.queries"))
    config, params, tokenizer = prepare_model(
        args.model_name, normalize=args.normalize,
        corpus_texts=corpus_texts_for_vocab(corpus, field_info),
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

    from mfar_tpu.parallel.mesh import mesh_from_flag

    # pallas-gather keeps a single-chip row-DMA corpus copy and forces
    # --mesh off; int8 composes with the mesh (quantized corpus shards over
    # the corpus axes: 2x docs per MESH).
    mesh = None
    if not args.use_pallas_gather:
        mesh = mesh_from_flag(args.mesh, "retrieve",
                              n_model=args.n_model, n_replica=args.n_replica)

    from mfar_tpu.eval.index_build import make_encode_fn

    encode = make_encode_fn(encoder, params, mesh=mesh)

    dense_fields = {k: f for k, f in field_info.items() if f.is_dense}
    if args.dense_index:
        matrix, keys = load_dense_matrix(args.dense_index)
        assert keys == list(corpus.keys()), "dense index keys do not match the corpus"
    else:
        matrix = build_dense_corpus_matrix(encode, tokenizer, corpus, dense_fields)

    sparse_indices = load_or_build_sparse_indices(corpus, field_info, args.lexical_index)
    engine = RetrievalEngine(
        field_info=field_info,
        doc_keys=list(corpus.keys()),
        encode_fn=encode,
        tokenizer=tokenizer,
        mixer_params=mixer_params,
        dense_matrix=matrix if matrix.size else None,
        sparse_indices={k: sparse_indices[k] for k in sparse_keys(field_info)},
        recall_k=args.recall_k,
        use_pallas_gather=args.use_pallas_gather,
        quantize=args.quantize,
        mesh=mesh,
        corpus_per_slice=args.corpus_per_slice,
        mode=args.mode,
        dense_topk=args.dense_topk,
        # pallas gather and int8 manage their own corpus representation
        dense_dtype=jnp.bfloat16
        if args.dense_dtype == "bf16" and not args.quantize and not args.use_pallas_gather
        else None,
    )

    qids = list(queries)
    t0 = time.perf_counter()
    results = engine.retrieve_many(
        [queries[q] for q in qids], top_k=args.top_k, batch_size=args.batch_size
    )
    qres = engine.to_qres(qids, results)
    dt = time.perf_counter() - t0
    if multihost.is_primary():  # process 0 owns file I/O under multihost
        trec.write_qres(args.out, qres)
        print(f"{len(qids)} queries in {dt:.2f}s ({len(qids)/dt:.1f} q/s) -> {args.out}")

        qrels_path = os.path.join(args.queries, f"{args.partition}.qrels")
        if os.path.exists(qrels_path):
            metrics = trec.call_trec_eval_and_get_metrics(qrels_path, args.out)
            keys = ["success_1", "recall_10", "recall_100", "ndcg_cut_10", "recip_rank", "map"]
            print(json.dumps({k: round(metrics.get(k, 0.0), 4) for k in keys}))
    multihost.sync("retrieve-done")


if __name__ == "__main__":
    main()
