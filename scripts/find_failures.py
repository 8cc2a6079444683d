"""Find queries whose relevant docs rank outside the top-k but are recovered
deeper in the list (reference: /root/reference/scripts/find_failures.py:8-43).

Usage:
    python scripts/find_failures.py --data-path DS --partition val \
        --qres-path run.qres --k 10
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mfar_tpu.data import trec  # noqa: E402


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--partition", required=True)
    p.add_argument("--qres-path", required=True)
    p.add_argument("--k", type=int, required=True)
    args = p.parse_args(argv)

    queries = trec.read_queries(f"{args.data_path}/{args.partition}.queries")
    gold = {}
    for item in trec.QRels.from_file(f"{args.data_path}/{args.partition}.qrels"):
        gold.setdefault(item.query_id, set()).add(item.doc_id)
    # Rank by sim (trec_eval re-ranks by score; run-file line order is
    # not trustworthy for externally produced files)
    by_q = {}
    for item in trec.QRes.from_file(args.qres_path):
        by_q.setdefault(item.query_id, []).append((-item.sim, item.doc_id))
    pred = {q: [d for _, d in sorted(rows)] for q, rows in by_q.items()}

    for query_id, gold_set in gold.items():
        if query_id not in pred:
            print(f"Query {query_id} not found in predictions")
            continue
        ranked = pred[query_id]
        head, tail = set(ranked[: args.k]), set(ranked[args.k :])
        if not (gold_set & head) and (gold_set & tail):
            gold_ranks = sorted(
                (i, doc_id) for i, doc_id in enumerate(ranked) if doc_id in gold_set
            )
            print(f"QUERY: {queries.get(query_id, '<unknown>')}")
            print(f"Top {args.k} retrieved: {ranked[: args.k]}")
            print(f"Relevant documents: {gold_ranks}")
            print()


if __name__ == "__main__":
    main()
