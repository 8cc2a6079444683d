"""Convert a STaRK semi-structured knowledge base to the corpus tsv format.

Reference parity (mfar/commands/stark/stark_to_trec.py:40-134): walk the SKB
graph, attach the configured edge neighborhoods per dataset -- including the
two-hop author->institution join for MAG and per-node-type grouping for
Prime -- and emit one ``id\\tjson`` line per candidate document.

Requires the ``stark_qa`` package (network download); unavailable offline --
use ``mfar_tpu.commands.make_synth_data`` for a self-contained dataset.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

from mfar_tpu.utils.jsonutil import remove_irregularities

# dataset -> {edge type: neighbor attribute used as its text}
# (reference: mfar/commands/stark/stark_to_trec.py:12-38)
EDGE_FIELD_DICTS: Dict[str, Dict[str, str]] = {
    "amazon": {"also_buy": "title", "also_view": "title"},
    "mag": {
        "paper___cites___paper": "title",
        "author___writes___paper": "DisplayName",
        "paper___has_topic___field_of_study": "DisplayName",
        "author___affiliated_with___institution": "DisplayName",
    },
    "prime": {
        rel: "name"
        for rel in [
            "ppi", "carrier", "enzyme", "target", "transporter",
            "contraindication", "indication", "off-label use",
            "synergistic interaction", "associated with", "parent-child",
            "phenotype absent", "phenotype present", "side effect",
            "interacts with", "linked to", "expression present",
            "expression absent",
        ]
    },
}


def convert(dataset_name: str, out: str, max_docs: int = -1) -> None:
    try:
        from stark_qa import load_skb
    except ImportError as e:
        raise SystemExit(
            "stark_qa is not installed (network-restricted environment). "
            "Use mfar_tpu.commands.make_synth_data for an offline dataset."
        ) from e

    fields = EDGE_FIELD_DICTS[dataset_name]
    skb = load_skb(name=dataset_name, download_processed=True)
    indices: List[int] = skb.candidate_ids
    if max_docs != -1:
        indices = indices[:max_docs]
    os.makedirs(out, exist_ok=True)

    # Only MAG re-queries nodes (authors shared across papers); caching for
    # other datasets pins every neighbor list in memory for zero hits (the
    # reference disables its cache off-mag for the same reason).
    neighbor_cache: Optional[Dict] = {} if dataset_name == "mag" else None

    def neighbors_of(idx, edge_type):
        if neighbor_cache is None:
            return skb.get_neighbor_nodes(idx, edge_type)
        key = (idx, edge_type)
        if key not in neighbor_cache:
            neighbor_cache[key] = skb.get_neighbor_nodes(idx, edge_type)
        return neighbor_cache[key]

    def attr_text(node, edge_type):
        return skb.node_info[node][fields[edge_type]]

    lines = []
    for idx in indices:
        node_info = skb.node_info[idx]
        edge_info: Dict = {}
        for edge_type in skb.edge_type_dict.values():
            if edge_type not in fields and edge_type != "author___writes___paper":
                continue
            if edge_type == "author___writes___paper" and dataset_name == "mag":
                # Two-hop author -> institution join, reference-exact
                # (reference stark_to_trec.py:77-114): the author-name LIST
                # is emitted too, each author keeps only its LAST
                # institution (the reference's overwrite loop), and
                # institutionless authors are OMITTED from the join.
                authors = neighbors_of(idx, edge_type)
                edge_info[edge_type] = [
                    name for name in (
                        skb.node_info[a][fields[edge_type]] for a in authors
                    ) if name not in (-1, "-1")
                ]
                joined = {}
                for author in authors:
                    name = skb.node_info[author][fields[edge_type]]
                    if name in (-1, "-1"):
                        continue
                    insts = neighbors_of(author, "author___affiliated_with___institution")
                    if len(insts):
                        joined[name] = [
                            attr_text(insts[-1], "author___affiliated_with___institution")
                        ]
                edge_info["author___affiliated_with___institution"] = joined
            elif edge_type in fields:
                neigh = neighbors_of(idx, edge_type)
                if dataset_name == "prime":
                    # group neighbor texts by node type; a relation with no
                    # neighbors is ABSENT (the reference never creates the
                    # key; a present-but-empty dict would inject spurious
                    # 'relation: {}' lines into every formatted document)
                    grouped: Dict[str, List] = {}
                    for n, ntype in zip(neigh, skb.node_types[neigh].tolist()):
                        grouped.setdefault(skb.node_type_dict[ntype], []).append(
                            attr_text(n, edge_type)
                        )
                    if grouped:
                        edge_info[edge_type] = grouped
                else:
                    texts = (attr_text(n, edge_type) for n in neigh)
                    edge_info[edge_type] = [
                        t for t in texts if t not in (-1, "-1")
                    ]
        doc = remove_irregularities({**node_info, **edge_info})
        lines.append(f"{idx}\t{json.dumps(doc, ensure_ascii=False)}")

    with open(os.path.join(out, "corpus"), "w") as f:
        f.write("\n".join(lines))
    print(f"Corpus {dataset_name} has {len(indices)} documents.")


from mfar_tpu.commands.common import normalize_argv


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset-name", required=True, choices=list(EDGE_FIELD_DICTS))
    p.add_argument("--out", required=True)
    p.add_argument("--max-docs", type=int, default=-1)
    args = p.parse_args(normalize_argv(argv))
    convert(args.dataset_name, args.out, args.max_docs)


if __name__ == "__main__":
    main()
