from mfar_tpu.data.types import (
    Corpus,
    Document,
    Field,
    FieldType,
    Query,
)
from mfar_tpu.data.schema import SCHEMAS, resolve_fields

__all__ = [
    "Corpus",
    "Document",
    "Field",
    "FieldType",
    "Query",
    "SCHEMAS",
    "resolve_fields",
]
