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

from mfar_tpu.commands.common import (
    add_data_args,
    add_engine_args,
    build_engine,
    normalize_argv,
)
from mfar_tpu.data import trec


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--out", required=True, help="output qres path")
    p.add_argument("--partition", default="test")
    p.add_argument("--top-k", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=64)
    add_engine_args(p)
    p.add_argument("--multihost", default="auto", choices=["auto", "off", "force", "pod"],
                   help="multi-process runtime (jax.distributed); see train --multihost")
    args = p.parse_args(normalize_argv(argv))
    from mfar_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    from mfar_tpu.parallel import multihost

    if multihost.maybe_initialize(args.multihost):
        print(f"[retrieve] multihost: process {jax.process_index()}/"
              f"{jax.process_count()}")

    engine = build_engine(args, label="retrieve")
    queries = trec.read_queries(os.path.join(args.queries, f"{args.partition}.queries"))

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
