"""Core data types: queries, documents, fields, corpora.

Functional parity with the reference's ``mfar/data/typedef.py`` (see
/root/reference/mfar/data/typedef.py:13-172), re-designed for a JAX-first
framework:

- explicit RNG (``numpy.random.Generator``) instead of the global ``random()``
  for the word-window chunking used as training-time data augmentation, so the
  whole input pipeline is reproducible from one seed;
- documents carry their parsed JSON payload (``raw``) so per-field formatting
  does not need to re-parse;
- no third-party serialization mixin -- plain ``json``.
"""

from __future__ import annotations

import gzip
import json
from dataclasses import dataclass, field as dataclass_field
from enum import Enum
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

# The reference truncates by *words* before tokenizing, assuming ~0.75 words
# per token (reference: mfar/data/typedef.py:29).  We keep the same constant so
# chunk lengths match.
AVG_WORD_PER_TOKEN = 0.75


@dataclass
class Query:
    """One retrieval query. (reference: mfar/data/typedef.py:13-26)"""

    id: str
    text: str
    metadata: Any = None

    def to_json(self) -> str:
        return json.dumps({"_id": self.id, "text": self.text, "metadata": self.metadata})

    @classmethod
    def from_json(cls, s: str) -> "Query":
        d = json.loads(s)
        return cls(d["_id"], d["text"], d.get("metadata"))

    @classmethod
    def from_gzipped(cls, path: str) -> Iterator["Query"]:
        with gzip.open(path, "rt") as f:
            for line in f:
                if line.strip():  # skip blank/trailing lines (cf. trec.py)
                    yield cls.from_json(line.strip())


def random_chunk_text(text: str, max_length: int, rng: Optional[np.random.Generator]) -> str:
    """Sample a contiguous word window of roughly ``max_length`` tokens.

    Training-time augmentation: a document too long for a field's token budget
    contributes a random word window of ~``0.75 * max_length`` words
    (reference: mfar/data/typedef.py:48-67).  ``rng=None`` deterministically
    takes the prefix (used at eval).
    """
    words = text.split(" ")
    max_len_words = max(int(max_length * AVG_WORD_PER_TOKEN), 1)
    if len(words) <= max_len_words:
        return text
    if rng is None:
        start = 0
    else:
        start = int(rng.random() * (len(words) - max_len_words))
    return " ".join(words[start : start + max_len_words])


@dataclass
class Document:
    """One corpus document.

    ``text`` is the flat string form used by whole-document ("single") fields;
    ``raw`` is the parsed JSON payload (a dict for semi-structured corpora)
    from which per-field strings are formatted.
    (reference: mfar/data/typedef.py:32-67)
    """

    id: str
    text: str = ""
    raw: Any = None
    title: Optional[str] = None
    metadata: Any = None

    def random_chunk(self, max_length: int, rng: Optional[np.random.Generator] = None) -> "Document":
        return Document(self.id, random_chunk_text(self.text, max_length, rng), self.raw, self.title, self.metadata)


class FieldType(Enum):
    SPARSE = 1
    DENSE = 2


@dataclass
class Field:
    """A named field of a semi-structured document plus its scorer type.

    ``key`` is the unique field identifier (e.g. ``"title_dense"``), ``name``
    the JSON key in the document payload (e.g. ``"title"``), and
    ``max_seq_length`` the per-field token budget (reference:
    mfar/data/typedef.py:73-122, budgets from mfar/data/schema.py:11-69).
    """

    key: str
    name: str
    field_type: FieldType
    max_seq_length: int = 512
    dataset: Optional[str] = None

    def serialize(self) -> Dict[str, Any]:
        return {
            "key": self.key,
            "name": self.name,
            "field_type": self.field_type.name,
            "max_seq_length": self.max_seq_length,
            "dataset": self.dataset,
        }

    @classmethod
    def deserialize(cls, data: Dict[str, Any]) -> "Field":
        return cls(
            key=data["key"],
            name=data["name"],
            field_type=FieldType[data["field_type"]],
            max_seq_length=data["max_seq_length"],
            dataset=data.get("dataset"),
        )

    @property
    def is_dense(self) -> bool:
        return self.field_type == FieldType.DENSE

    @property
    def is_sparse(self) -> bool:
        return self.field_type == FieldType.SPARSE


@dataclass
class Corpus:
    """An ordered document collection with key<->row-id maps.

    The integer row id of a document is its position; dense corpus embedding
    matrices use the same row order, so ``key_to_id`` doubles as the map from
    external document keys to embedding rows.
    (reference: mfar/data/typedef.py:125-172)
    """

    docs: List[Document]
    dataset_name: Optional[str] = None
    key_to_id: Dict[str, int] = dataclass_field(init=False, repr=False)

    def __post_init__(self) -> None:
        self.key_to_id = {doc.id: i for i, doc in enumerate(self.docs)}

    def __len__(self) -> int:
        return len(self.docs)

    def keys(self) -> Iterator[str]:
        return (doc.id for doc in self.docs)

    def get_doc_by_id(self, doc_id: int) -> Document:
        return self.docs[doc_id]

    def get_doc_by_key(self, key: str) -> Document:
        try:
            return self.docs[self.key_to_id[key]]
        except KeyError:
            raise KeyError(f"Key {key!r} not found in corpus.")

    def get_text_by_key(self, key: str) -> str:
        return self.get_doc_by_key(key).text

    def pairs(self) -> Iterator[Tuple[str, Any]]:
        """(key, payload) pairs; payload is the parsed JSON if present else text."""
        return ((doc.id, doc.raw if doc.raw is not None else doc.text) for doc in self.docs)

    @classmethod
    def from_pairs(cls, pairs, dataset_name: Optional[str] = None) -> "Corpus":
        """Build from (key, payload) pairs as produced by ``trec.read_corpus``."""
        docs = []
        for key, payload in pairs:
            if isinstance(payload, str):
                docs.append(Document(key, text=payload, raw=payload))
            else:
                docs.append(Document(key, text="", raw=payload))
        return cls(docs, dataset_name)
