"""Diff two runs: queries where one run hits in the top-k and the other
misses (reference: /root/reference/scripts/compare_results.py:12-52).

Usage:
    python scripts/compare_results.py --data-path DS --partition val \
        --res1 a.qres --res2 b.qres --k 10
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mfar_tpu.data import trec  # noqa: E402


def emph(s: str) -> str:
    return f"\033[94;4;1m{s}\033[0m"


def _by_query(qres):
    # rank by sim (trec_eval semantics), not run-file line order
    rows = {}
    for item in qres:
        rows.setdefault(item.query_id, []).append((-item.sim, item.doc_id))
    return {q: [d for _, d in sorted(r)] for q, r in rows.items()}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--partition", required=True)
    p.add_argument("--res1", required=True)
    p.add_argument("--res2", required=True)
    p.add_argument("--k", type=int, required=True)
    args = p.parse_args(argv)

    queries = trec.read_queries(f"{args.data_path}/{args.partition}.queries")
    gold = {}
    for item in trec.QRels.from_file(f"{args.data_path}/{args.partition}.qrels"):
        gold.setdefault(item.query_id, set()).add(item.doc_id)
    pred1 = _by_query(trec.QRes.from_file(args.res1))
    pred2 = _by_query(trec.QRes.from_file(args.res2))

    for query_id, gold_set in gold.items():
        list1 = pred1.get(query_id, [])[: args.k]
        list2 = pred2.get(query_id, [])[: args.k]
        hit1 = bool(gold_set & set(list1))
        hit2 = bool(gold_set & set(list2))
        if hit1 != hit2:
            print(f"Query {query_id} has different results")
            print(f"Query: {queries.get(query_id, '<unknown>')}")
            print(f"Pred1: {', '.join(emph(x) if x in gold_set else x for x in list1)}")
            print(f"Pred2: {', '.join(emph(x) if x in gold_set else x for x in list2)}")


if __name__ == "__main__":
    main()
