"""Per-dataset field schema registry and the field-selection micro-DSL.

Parity with the reference's ``mfar/data/schema.py`` (see
/root/reference/mfar/data/schema.py:9-134): the same datasets, field names,
and per-field token budgets (derived from corpus token-length percentiles),
and the same CLI micro-DSL ``"{all|single|<field>}_{dense|sparse}"`` parsed by
:func:`resolve_fields`.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

from mfar_tpu.data.types import Field, FieldType

# Sparse fields score the full field text with BM25, so their "token budget"
# is effectively unbounded (reference: mfar/data/schema.py:9).
SPARSE_MAX = 1048576

# (field name, dense token budget) presets per dataset
# (reference: mfar/data/schema.py:11-69).
MAG_FIELDS: List[Tuple[str, int]] = [
    ("abstract", 512),
    ("author___affiliated_with___institution", 512),
    ("paper___cites___paper", 512),
    ("paper___has_topic___field_of_study", 64),
    ("title", 64),
]

PRIME_FIELDS: List[Tuple[str, int]] = [
    ("associated with", 256),
    ("carrier", 8),
    ("contraindication", 128),
    ("details", 512),
    ("enzyme", 64),
    ("expression absent", 64),
    ("expression present", 512),
    ("indication", 32),
    ("interacts with", 512),
    ("linked to", 8),
    ("name", 64),
    ("off-label use", 8),
    ("parent-child", 256),
    ("phenotype absent", 8),
    ("phenotype present", 512),
    ("ppi", 512),
    ("side effect", 128),
    ("source", 8),
    ("synergistic interaction", 512),
    ("target", 64),
    ("transporter", 8),
    ("type", 8),
]

AMAZON_FIELDS: List[Tuple[str, int]] = [
    ("also_buy", 512),
    ("also_view", 512),
    ("brand", 16),
    ("description", 512),
    ("feature", 512),
    ("qa", 512),
    ("review", 512),
    ("title", 128),
]

WTB_FIELDS: List[Tuple[str, int]] = [
    ("author", 16),
    ("author_url", 64),
    ("date", 64),
    ("description", 512),
    ("genres", 64),
    ("id", 16),
    ("image_link", 64),
    ("isbn_13", 16),
    ("parsed_dates", 16),
    ("ratings", 16),
    ("reviews", 16),
    ("title", 64),
]

FIELDS_DICT: Dict[str, List[Tuple[str, int]]] = {
    "mag": MAG_FIELDS,
    "prime": PRIME_FIELDS,
    "amazon": AMAZON_FIELDS,
    "whatsthatbook": WTB_FIELDS,
}
DATASET_NAMES = list(FIELDS_DICT.keys())


def generate_schema(fields: Sequence[Tuple[str, int]], dataset_name: str) -> Dict[str, Field]:
    """Every field gets a ``{name}_sparse`` + ``{name}_dense`` Field pair."""
    out: Dict[str, Field] = {}
    for name, max_seq_length in fields:
        out[f"{name}_sparse"] = Field(f"{name}_sparse", name, FieldType.SPARSE, SPARSE_MAX, dataset=dataset_name)
        out[f"{name}_dense"] = Field(f"{name}_dense", name, FieldType.DENSE, max_seq_length, dataset=dataset_name)
    return out


SCHEMAS: Dict[str, Dict[str, Field]] = {
    name: generate_schema(FIELDS_DICT[name], name) for name in DATASET_NAMES
}

# Whole-document ("single") fields: the entire STaRK-formatted document as one
# field (reference: mfar/data/schema.py:88-93).
SINGLE_SCHEMAS: Dict[str, Dict[str, Field]] = {
    name: {
        "single_sparse": Field("single_sparse", "single", FieldType.SPARSE, SPARSE_MAX, name),
        "single_dense": Field("single_dense", "single", FieldType.DENSE, 512, name),
    }
    for name in DATASET_NAMES
}


def _match_dataset(dataset: str) -> str:
    """Match a dataset spec (possibly a path) to a known schema by substring
    of its last path component (reference: mfar/data/schema.py:97-102)."""
    last = dataset.split("/")[-1]
    for valid in DATASET_NAMES:
        if valid in last:
            return valid
    raise NotImplementedError(f"Dataset {dataset} is not supported!")


def resolve_fields(field_names: Union[str, Sequence[str]], dataset: str) -> Dict[str, Field]:
    """Parse the field-selection micro-DSL into an ordered Field dict.

    Accepts a comma-separated string or a sequence.  ``.`` in a name is an
    alias for a space (CLI convenience).  Special selectors: ``all_sparse``,
    ``all_dense``, ``single_sparse``, ``single_dense``.  The result is sorted
    dense-first then sparse, alphabetically within each group -- field order
    defines the field axis of every score tensor, so it must be deterministic
    (reference: mfar/data/schema.py:96-134).
    """
    dataset_name = _match_dataset(dataset)
    valid_fields = SCHEMAS[dataset_name]

    if isinstance(field_names, str):
        field_names = [name.replace(".", " ") for name in field_names.split(",")]

    selected: Dict[str, Field] = {}
    for field_name in field_names:
        if field_name == "all_sparse":
            selected.update({k: f for k, f in valid_fields.items() if f.is_sparse})
        elif field_name == "all_dense":
            selected.update({k: f for k, f in valid_fields.items() if f.is_dense})
        elif field_name in ("single_sparse", "single_dense"):
            selected[field_name] = SINGLE_SCHEMAS[dataset_name][field_name]
        elif field_name in valid_fields:
            selected[field_name] = valid_fields[field_name]
        else:
            raise ValueError(f"Field {field_name} not found in dataset {dataset}")

    sorted_keys = sorted(selected.keys())
    dense_keys = [k for k in sorted_keys if selected[k].is_dense]
    sparse_keys = [k for k in sorted_keys if selected[k].is_sparse]
    return {k: selected[k] for k in dense_keys + sparse_keys}


def dense_keys(field_info: Dict[str, Field]) -> List[str]:
    return [k for k, f in field_info.items() if f.is_dense]


def sparse_keys(field_info: Dict[str, Field]) -> List[str]:
    return [k for k, f in field_info.items() if f.is_sparse]
