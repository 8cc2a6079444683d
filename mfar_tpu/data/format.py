"""JSON document payload -> flat per-field strings.

Output-parity re-implementation of the reference formatters
(/root/reference/mfar/data/format.py:7-406): the exact strings matter because
they feed both the BM25 tokenizer and the dense encoder, so any drift changes
scores.  Covered:

- :func:`format_field_value` / :func:`format_documents`: extract one named
  field from a payload dict as a flat string (str / number / list /
  list-of-dicts / nested dict cases);
- :func:`format_stark`: whole-document serializers replicating STaRK's
  rendering for amazon / mag / prime / whatsthatbook corpora.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Sequence, Tuple

# Review/QA metadata keys dropped when flattening Amazon review dicts
# (reference: mfar/data/format.py:44).
_AMAZON_META_KEYS = frozenset(
    [
        "reviewerID",
        "style",
        "verified",
        "overall",
        "reviewTime",
        "vote",
        "questionType",
        "answerType",
        "answerTime",
    ]
)


def _format_list_of_dicts(items: Sequence[Dict[str, Any]]) -> str:
    """Each dict becomes newline-joined ``key: value`` lines (metadata keys
    dropped); dicts are then newline-joined."""
    rendered = []
    for item in items:
        kept = {k: v for k, v in item.items() if k not in _AMAZON_META_KEYS}
        rendered.append("\n".join(f"{k}: {v}" for k, v in kept.items()))
    return "\n".join(rendered)


def format_dict(item_dict: Dict[str, Any]) -> str:
    """Flatten a nested dict field (Prime relation groups) into
    ``key: value`` segments joined by ``"; "``
    (reference: mfar/data/format.py:64-110)."""
    segments: List[str] = []
    for key, value in item_dict.items():
        if isinstance(value, (str, int, float)):
            segments.append(f"{key}: {value}")
        elif isinstance(value, list):
            if len(value) == 0:
                segments.append(f"{key}: ")
            elif isinstance(value[0], dict):
                # Aggregate values per inner key across the list of dicts.
                per_key: Dict[str, List[Any]] = {}
                for item in value:
                    for k, v in item.items():
                        bucket = per_key.setdefault(k, [])
                        if isinstance(v, dict):
                            bucket.extend(list(v.values()))
                        else:
                            bucket.append(v)
                segment = ""
                for k, vals in per_key.items():
                    segment += f"{k}: {', '.join(str(v) for v in vals)}; "
                segments.append(segment)
            elif isinstance(value[0], list):
                raise NotImplementedError("Nested list not supported!")
            else:
                segments.append(f"{key}: {', '.join(str(v) for v in value)}")
        elif isinstance(value, dict):
            segments.append(", ".join(f"{k}: {value[k]}" for k in value))
        else:
            segments.append(", ".join(str(v) for v in value))
    return "; ".join(segments)


def format_field_value(value: Any) -> str:
    """Render one field's JSON value as a flat string
    (reference: mfar/data/format.py:27-59)."""
    if value is None:
        return ""
    if isinstance(value, str):
        return value
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, list):
        if len(value) == 0:
            return ""
        if isinstance(value[0], dict):
            return _format_list_of_dicts(value)
        if isinstance(value[0], list):
            raise NotImplementedError("Nested list not supported!")
        # str-mapped: a numeric list (valid JSON) must not TypeError the
        # corpus build; string lists render identically to the reference
        return ", ".join(str(v) for v in value)
    return format_dict(value)


def format_documents(
    documents: Iterable[Tuple[str, Any]],
    field_name: str,
    dataset_name: str,
) -> List[Tuple[str, str]]:
    """Per-field flat strings for (id, payload) pairs; the special field name
    ``"single"`` renders the whole STaRK document
    (reference: mfar/data/format.py:7-61)."""
    if field_name == "single":
        return [(doc_id, format_stark(payload, dataset_name)) for doc_id, payload in documents]
    out: List[Tuple[str, str]] = []
    for doc_id, payload in documents:
        if isinstance(payload, dict) and field_name in payload:
            out.append((doc_id, format_field_value(payload[field_name])))
        else:
            out.append((doc_id, ""))
    return out


# ---------------------------------------------------------------------------
# Whole-document ("single") STaRK serializers
# (reference: mfar/data/format.py:113-406; formatting inherited from
# https://github.com/snap-stanford/stark)
# ---------------------------------------------------------------------------


def format_stark(payload: Any, dataset_name: str) -> str:
    if dataset_name == "amazon":
        return format_amazon(payload)
    if dataset_name == "mag":
        return format_mag(payload)
    if dataset_name == "prime":
        return format_prime(payload)
    if dataset_name in ("whatsthatbook", "tomt"):
        return format_books(payload)
    raise ValueError("Select a valid STaRK dataset!")


def format_amazon(data: Dict[str, Any]) -> str:
    doc = f'- product: {data["title"]}\n'
    if "brand" in data:
        doc += f'- brand: {data["brand"]}\n'

    if "description" in data:
        description = " ".join(data["description"]).strip(" ")
        if description:
            doc += f"- description: {description}\n"

    feature_text = ""
    if "feature" in data:
        feature_text = "- features: \n"
        for idx, feature in enumerate(data["feature"]):
            if feature and "asin" not in feature.lower():
                feature_text += f"#{idx + 1}: {feature}\n"

    review_text = ""
    if "review" in data:
        review_text = "- reviews: \n"
        for idx, review in enumerate(data["review"]):
            review_text += f'#{idx + 1}:\nsummary: {review["summary"]}\ntext: "{review["reviewText"]}"\n'

    qa_text = ""
    if "qa" in data:
        qa_text = "- QA: \n"
        for idx, qa in enumerate(data["qa"]):
            qa_text += f'#{idx + 1}:\nquestion: {qa["question"]}\nanswer: {qa["answer"]}\n'

    doc += feature_text + review_text + qa_text
    doc += _amazon_rel_info(data)
    return doc


def _amazon_rel_info(data: Dict[str, Any], n_rel: int = -1) -> str:
    also_buy = [f"#{idx + 1}: {item}\n" for idx, item in enumerate(data.get("also_buy", []))]
    also_view = [f"#{idx + 1}: {item}\n" for idx, item in enumerate(data.get("also_view", []))]
    if n_rel > 0:
        also_buy = also_buy[:n_rel]
        also_view = also_view[:n_rel]

    doc = ""
    if also_buy:
        doc += f"  products also purchased: \n{''.join(also_buy)}"
    if also_view:
        doc += f"  products also viewed: \n{''.join(also_view)}"
    if "brand" in data:
        doc += f'  brand: {data["brand"]}\n'

    return " - relations:\n" + doc if doc else ""


def format_mag(data: Dict[str, Any]) -> str:
    doc = ""
    if data.get("type") == "paper":
        doc = f' - paper title: {data["title"]}\n'
        doc += " - abstract: " + data["abstract"].replace("\r", "").rstrip("\n") + "\n"
    doc += _mag_rel_info(data)
    return doc


def _mag_rel_info(data: Dict[str, Any]) -> str:
    parts: List[str] = []
    if "paper___cites___paper" in data:
        cited = ", ".join(f'"{title}"' for title in data["paper___cites___paper"])
        parts.append(f"paper cites paper: ({cited})")
    if "paper___has_topic___field_of_study" in data:
        topics = ", ".join(data["paper___has_topic___field_of_study"])
        parts.append(f"paper has_topic field_of_study: ({topics})")
    if "author___affiliated_with___institution" in data:
        info = data["author___affiliated_with___institution"]
        authors = [f"{author} ({', '.join(info[author])})" for author in info]
        parts.append(f"({', '.join(authors)})")

    doc = ",\n".join(p for p in parts if p)
    return " - relations:\n\n" + doc if doc else ""


# Human-readable expansions for gene/protein detail keys
# (reference: mfar/data/format.py:292-301).
_GENE_PROTEIN_KEY_EXPLAIN = {
    "name": "gene name",
    "type_of_gene": "gene types",
    "alias": "other gene names",
    "other_names": "extended other gene names",
    "genomic_pos": "genomic position",
    "generif": "PubMed text",
    "interpro": "protein family and classification information",
    "summary": "protein summary text",
}

# Relation group rendering order for Prime (reference: mfar/data/format.py:344-349).
_PRIME_RELATION_TYPES = [
    "ppi",
    "carrier",
    "enzyme",
    "target",
    "transporter",
    "contraindication",
    "indication",
    "off-label use",
    "synergistic interaction",
    "associated with",
    "parent-child",
    "phenotype absent",
    "phenotype present",
    "side effect",
    "interacts with",
    "linked to",
    "expression present",
    "expression absent",
]


def format_prime(data: Dict[str, Any]) -> str:
    if "name" not in data:
        print(f'format_prime Error: "name" not found in {data}. This should be required.')
        return ""
    doc = f'- name: {data["name"]}\n'
    doc += f'- type: {data["type"]}\n'
    doc += f'- source: {data["source"]}\n'

    feature_text = "- details: \n"
    feature_cnt = 0
    for key, value in data.get("details", {}).items():
        if str(value) in ("", "nan") or key.startswith("_") or "_id" in key:
            continue
        if data["type"] == "gene/protein" and key in _GENE_PROTEIN_KEY_EXPLAIN:
            if "interpro" in key and isinstance(value, dict):
                value = [value["desc"]]
            if "generif" in key:
                value = "; ".join(v["text"] for v in value)
                value = " ".join(value.split(" ")[:50000])
            if "genomic_pos" in key and isinstance(value, list):
                value = value[0]
            feature_text += f"  - {key} ({_GENE_PROTEIN_KEY_EXPLAIN[key]}): {value}\n"
        else:
            feature_text += f"  - {key}: {value}\n"
        feature_cnt += 1
    if feature_cnt > 0:
        doc += feature_text

    doc += _prime_rel_info(data)
    return doc


def _prime_rel_info(data: Dict[str, Any]) -> str:
    items: List[str] = []
    for relation in _PRIME_RELATION_TYPES:
        if relation not in data:
            continue
        groups = [
            f"{key.replace(' ', '_')}: ({', '.join(data[relation][key])})"
            for key in data[relation]
        ]
        items.append(f"  {relation.replace(' ', '_')}: " + "{" + ", ".join(groups) + "}")
    doc = "\n".join(p for p in items if p)
    return " - relations:\n" + doc if doc else ""


def format_books(data: Dict[str, Any]) -> str:
    doc = f'- title: {data["title"]}\n' if "title" in data else ""
    doc += f'- author: {data["author"]}\n' if "author" in data else ""
    doc += f'- author url: {data["author_url"]}\n' if "author_url" in data else ""
    doc += f'- description: {data["description"]}\n' if "description" in data else ""
    doc += f'- isbn: {data["isbn"]}\n' if "isbn" in data else ""

    if data.get("parsed_dates"):
        all_dates = [d for d in data["parsed_dates"] if d is not None]
        if all_dates:
            doc += f'- parsed dates: {", ".join(all_dates)}\n'

    doc += f'- image link: {data["image_link"]}\n' if "image_link" in data else ""
    doc += f'- number of ratings: {data["num_ratings"]}\n' if "num_ratings" in data else ""
    doc += f'- number of reviews: {data["num_reviews"]}\n' if "num_reviews" in data else ""
    if data.get("genres"):
        doc += f'- genres: {", ".join(data["genres"])}\n'
    doc += f'- id: {data["id"]}' if "id" in data else ""
    return doc
