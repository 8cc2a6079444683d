"""TREC-format I/O: relevance judgments (qrels), run files (qres), corpora.

Functional parity with the reference's ``mfar/data/trec.py`` (see
/root/reference/mfar/data/trec.py:11-106): identical on-disk formats so
artifacts interoperate with the reference pipeline and with the NIST
``trec_eval`` binary.  Scoring has two paths:

- :func:`call_trec_eval_and_get_metrics` shells out to ``trec_eval -m all_trec``
  when the binary is installed (exact external ground truth, reference
  mfar/data/trec.py:84-93);
- :mod:`mfar_tpu.eval.metrics` provides the in-framework vectorized
  implementation used when the binary is absent, tested for parity.
"""

from __future__ import annotations

import csv
import json
import shutil
import subprocess
import sys
from dataclasses import dataclass
from typing import Dict, Iterable, List, Set, TextIO, Tuple, Union

csv.field_size_limit(sys.maxsize)


@dataclass
class QRels:
    """One gold relevance judgment (query_id, doc_id, relevance).

    Serialized as the 4-column tab-separated trec_eval qrels format.
    """

    query_id: str
    doc_id: str
    relevance: float
    iteration: str = "0"  # unused by trec_eval but required by the format

    def __str__(self) -> str:
        return f"{self.query_id}\t{self.iteration}\t{self.doc_id}\t{self.relevance}"

    @classmethod
    def from_str(cls, s: str) -> "QRels":
        query_id, iteration, doc_id, relevance = s.split("\t")
        return cls(query_id, doc_id, float(relevance), iteration)

    @classmethod
    def from_text_io(cls, f: TextIO) -> List["QRels"]:
        return [cls.from_str(line.strip()) for line in f if line.strip()]

    @classmethod
    def from_file(cls, path: str) -> List["QRels"]:
        with open(path) as f:
            return cls.from_text_io(f)


@dataclass
class QRes:
    """One retrieved document for a query (a run-file line)."""

    query_id: str
    doc_id: str
    sim: float
    run_id: str = "0"
    iteration: str = "0"
    rank: int = 0  # trec_eval re-ranks by sim; the rank column is ignored

    def __str__(self) -> str:
        return f"{self.query_id}\t{self.iteration}\t{self.doc_id}\t{self.rank}\t{self.sim}\t{self.run_id}"

    @classmethod
    def from_str(cls, s: str) -> "QRes":
        # Tab-split when tabs are present (our writer's format; ids may
        # contain spaces), whitespace-split otherwise (the reference's
        # parser, trec.py:54, and space-separated run files from other
        # tools).
        query_id, iteration, doc_id, rank, sim, run_id = (
            s.split("\t") if "\t" in s else s.split()
        )
        return cls(query_id, doc_id, float(sim), run_id, iteration, int(rank))

    @classmethod
    def from_text_io(cls, f: TextIO) -> List["QRes"]:
        return [cls.from_str(line.strip()) for line in f if line.strip()]

    @classmethod
    def from_file(cls, path: str) -> List["QRes"]:
        with open(path) as f:
            return cls.from_text_io(f)


_NON_METRIC_KEYS: Set[str] = {"runid", "num_q", "num_ret", "num_rel", "num_rel_ret"}


def parse_trec_eval_output(output: str) -> Dict[str, float]:
    """Parse ``trec_eval`` stdout into a metric dict."""
    metrics: Dict[str, float] = {}
    for line in output.split("\n"):
        if not line.strip():
            continue
        metric, _, value = line.strip().split("\t")
        metric = metric.strip()
        if metric not in _NON_METRIC_KEYS:
            metrics[metric] = float(value.strip())
    return metrics


def trec_eval_available() -> bool:
    return shutil.which("trec_eval") is not None


def call_trec_eval_and_get_metrics(qrels: str, qres: str) -> Dict[str, float]:
    """Score a run file against qrels.

    Uses the NIST ``trec_eval`` C binary when present (bit-exact external
    ground truth); otherwise falls back to the in-framework vectorized
    implementation (:func:`mfar_tpu.eval.metrics.evaluate_files`), which is
    parity-tested against trec_eval semantics.
    """
    if trec_eval_available():
        proc = subprocess.run(
            ["trec_eval", "-m", "all_trec", qrels, qres],
            stdout=subprocess.PIPE,
            check=True,
        )
        return parse_trec_eval_output(proc.stdout.decode("utf-8"))
    from mfar_tpu.eval import metrics as _metrics

    return _metrics.evaluate_files(qrels, qres)


def read_corpus(path: str) -> Iterable[Tuple[str, Union[str, dict, list]]]:
    """Stream a corpus tsv of ``doc_id \\t json_payload`` lines.

    Payloads that parse as JSON yield the parsed object, others the raw
    string; rows with no payload yield ``""``
    (reference: mfar/data/trec.py:96-106).
    """
    with open(path, "r") as f:
        reader = csv.reader(f, delimiter="\t")
        for row in reader:
            if len(row) < 2:
                yield row[0], ""
            else:
                try:
                    yield row[0], json.loads(row[1])
                except (json.JSONDecodeError, ValueError):
                    yield row[0], "\t".join(row[1:])


def read_queries(path: str) -> Dict[str, str]:
    """Read a ``.queries`` tsv (id \\t text) into an ordered dict."""
    out: Dict[str, str] = {}
    for key, payload in read_corpus(path):
        out[key] = payload if isinstance(payload, str) else json.dumps(payload)
    return out


def write_qres(path: str, qres: Iterable[QRes]) -> None:
    with open(path, "w") as f:
        for r in qres:
            print(r, file=f)


def write_qrels(path: str, qrels: Iterable[QRels]) -> None:
    with open(path, "w") as f:
        for r in qrels:
            print(r, file=f)
