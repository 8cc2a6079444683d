"""Direct byte-parity against the REFERENCE's own data-layer code.

tests/test_format.py pins our formatters to golden strings; this file closes
the loop the way test_reference_parity.py does for the losses: it imports the
reference's stdlib-only data modules (mfar/data/format.py, mfar/data/trec.py
-- the only data-layer files importable offline; typedef/index need
mashumaro/bm25s) and drives BOTH implementations with identical randomized
payloads, asserting byte equality.  The formatted strings feed both the BM25
tokenizer and the dense encoder, so any drift changes scores.

Generator constraints mirror reference QUIRKS (facts about its code, kept so
the comparison stays on inputs the reference itself can process):

- amazon payloads always carry ``also_buy``/``also_view`` (possibly empty):
  get_amazon_rel_info reads ``str_also_buy`` unconditionally and raises
  NameError when the key is absent (reference format.py:196-205);
- mag payloads always have ``type == "paper"``: any other type leaves
  ``doc`` unbound (reference format.py:235-239);
- prime gene/protein ``generif`` details are lists of {"text": ...} dicts
  and ``interpro`` is a dict with "desc" (reference format.py:310-316).
"""

import io
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "mfar")):  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)
sys.path.insert(0, REFERENCE)

from mfar.data import format as ref_format  # noqa: E402
from mfar.data import trec as ref_trec  # noqa: E402

from mfar_tpu.data import format as our_format  # noqa: E402
from mfar_tpu.data import trec as our_trec  # noqa: E402


# ---------------------------------------------------------------------------
# Randomized payload generators (shapes each dataset's docs actually take,
# per the reference formatters and the converters in commands/stark/)
# ---------------------------------------------------------------------------

WORDS = ["alpha", "beta", "gamma", "delta", "", "x y", "tab\tchar", "nan", "0"]


def _words(rng, lo=0, hi=4):
    return " ".join(rng.choice(WORDS, size=rng.integers(lo, hi + 1)))


def make_amazon(rng):
    d = {
        "title": _words(rng, 1, 5),
        "also_buy": [_words(rng, 1, 2) for _ in range(rng.integers(0, 3))],
        "also_view": [_words(rng, 1, 2) for _ in range(rng.integers(0, 3))],
    }
    if rng.random() < 0.7:
        d["brand"] = _words(rng, 0, 2)
    if rng.random() < 0.7:
        d["description"] = [_words(rng) for _ in range(rng.integers(0, 3))]
    if rng.random() < 0.7:
        # include falsy and asin-containing features (both get filtered)
        d["feature"] = ["", "has ASIN inside", _words(rng, 1, 3)][: rng.integers(1, 4)]
    if rng.random() < 0.7:
        d["review"] = [
            {
                "summary": _words(rng, 1, 3),
                "reviewText": _words(rng, 1, 6),
                # metadata keys the per-field path must drop
                "reviewerID": "u1",
                "vote": str(rng.integers(1, 9)),
                "overall": float(rng.integers(1, 6)),
            }
            for _ in range(rng.integers(1, 3))
        ]
    if rng.random() < 0.4:
        d["qa"] = [
            {"question": _words(rng, 1, 4), "answer": _words(rng, 1, 4)}
            for _ in range(rng.integers(1, 3))
        ]
    return d


def make_mag(rng):
    d = {"type": "paper", "title": _words(rng, 1, 6), "abstract": _words(rng, 1, 10) + "\r\n"}
    if rng.random() < 0.6:
        d["paper___cites___paper"] = [_words(rng, 1, 4) for _ in range(rng.integers(1, 3))]
    if rng.random() < 0.6:
        d["paper___has_topic___field_of_study"] = [
            _words(rng, 1, 2) for _ in range(rng.integers(1, 3))
        ]
    if rng.random() < 0.6:
        d["author___affiliated_with___institution"] = {
            f"author {i}": [_words(rng, 1, 2) for _ in range(rng.integers(1, 3))]
            for i in range(rng.integers(1, 3))
        }
    return d


def make_prime(rng):
    kind = rng.choice(["gene/protein", "disease", "drug"])
    d = {"name": _words(rng, 1, 3), "type": str(kind), "source": "SRC"}
    if rng.random() < 0.8:
        details = {
            "_hidden": "skipped",
            "some_id": "skipped",
            "empty": "",
            "plain": _words(rng, 1, 4),
        }
        if kind == "gene/protein":
            details["summary"] = _words(rng, 1, 6)
            details["alias"] = [_words(rng, 1, 2)]
            details["genomic_pos"] = [{"chr": "1"}, {"chr": "2"}]
            details["generif"] = [{"text": _words(rng, 1, 4)} for _ in range(2)]
            details["interpro"] = {"desc": _words(rng, 1, 3)}
        d["details"] = details
    for rel in ("ppi", "indication", "side effect", "interacts with"):
        if rng.random() < 0.4:
            d[rel] = {
                _words(rng, 1, 2)
                or "k": [_words(rng, 1, 2) for _ in range(rng.integers(1, 3))]
            }
    return d


def make_books(rng):
    d = {}
    for k in ("title", "author", "author_url", "description", "isbn",
              "image_link", "num_ratings", "num_reviews", "id"):
        if rng.random() < 0.7:
            d[k] = _words(rng, 1, 3)
    if rng.random() < 0.7:
        options = [None, [], ["May 1 2020", None, "June 3rd"]]
        d["parsed_dates"] = options[rng.integers(0, len(options))]
    if rng.random() < 0.7:
        d["genres"] = [_words(rng, 1, 2) for _ in range(rng.integers(0, 3))]
    return d


MAKERS = {
    "amazon": make_amazon,
    "mag": make_mag,
    "prime": make_prime,
    "whatsthatbook": make_books,
}

FIELDS = {
    "amazon": ["title", "brand", "description", "feature", "review", "qa",
               "also_buy", "also_view", "missing_field", "single"],
    "mag": ["title", "abstract", "paper___cites___paper",
            "paper___has_topic___field_of_study",
            "author___affiliated_with___institution", "single"],
    "prime": ["name", "type", "source", "details", "ppi", "indication", "single"],
    "whatsthatbook": ["title", "author", "description", "genres", "single"],
}


@pytest.mark.parametrize("dataset", sorted(MAKERS))
def test_format_documents_parity(dataset):
    rng = np.random.default_rng(hash(dataset) % 2**32)
    docs = [(f"d{i}", MAKERS[dataset](rng)) for i in range(40)]
    for field in FIELDS[dataset]:
        ours = our_format.format_documents(docs, field, dataset)
        refs = ref_format.format_documents(docs, field, dataset)
        assert list(ours) == list(refs), (dataset, field)


def test_format_field_value_edge_parity():
    """The per-field value renderer on shapes format_documents dispatches:
    scalar / float / None / empty list / str list / list-of-dicts with
    nested-dict values aggregated by format_dict."""
    payloads = [
        {"f": "plain"},
        {"f": 7},
        {"f": 7.25},
        {"f": None},
        {"f": []},
        {"f": ["a", "b", ""]},
        {"f": [{"summary": "s", "vote": "9"}, {"reviewText": "t"}]},
        {"f": {"k": "v", "nested": {"a": 1, "b": 2}, "lst": ["x", "y"],
               "lod": [{"m": {"q": "r"}}, {"m": "s"}], "empty": []}},
        {},  # missing field -> ""
    ]
    docs = [(str(i), p) for i, p in enumerate(payloads)]
    assert our_format.format_documents(docs, "f", "prime") == \
        ref_format.format_documents(docs, "f", "prime")


def test_format_rejects_nested_lists_like_reference():
    docs = [("0", {"f": [["nested"]]})]
    with pytest.raises(NotImplementedError):
        ref_format.format_documents(docs, "f", "amazon")
    with pytest.raises(NotImplementedError):
        our_format.format_documents(docs, "f", "amazon")


# ---------------------------------------------------------------------------
# TREC I/O parity
# ---------------------------------------------------------------------------


def test_qrels_line_parity():
    ours = our_trec.QRels("q1", "d9", 1.0)
    refs = ref_trec.QRels("q1", "d9", 1.0)
    assert str(ours) == str(refs)
    # cross-parse each other's serialization
    assert our_trec.QRels.from_str(str(refs)) == ours
    r2 = ref_trec.QRels.from_str(str(ours))
    assert (r2.query_id, r2.doc_id, r2.relevance) == ("q1", "d9", 1.0)


def test_qres_line_parity():
    ours = our_trec.QRes("q1", "d9", 3.5, rank=4)
    refs = ref_trec.QRes("q1", "d9", 3.5, _rank=4)
    assert str(ours) == str(refs)
    r2 = ref_trec.QRes.from_str(str(ours))
    assert (r2.query_id, r2.doc_id, r2.sim, r2._rank) == ("q1", "d9", 3.5, 4)
    o2 = our_trec.QRes.from_str(str(refs))
    assert (o2.query_id, o2.doc_id, o2.sim, o2.rank) == ("q1", "d9", 3.5, 4)


def test_parse_trec_eval_output_parity():
    blob = (
        "runid\tall\trun0\n"
        "num_q\tall\t3\n"
        "num_ret\tall\t300\n"
        "num_rel\tall\t9\n"
        "num_rel_ret\tall\t7\n"
        "map\tall\t0.5123\n"
        "recip_rank\tall\t0.6667\n"
        "ndcg_cut_10\tall\t0.4821\n"
        "\n"
    )
    assert our_trec.parse_trec_eval_output(blob) == ref_trec.parse_trec_eval_output(blob)


def test_read_corpus_parity(tmp_path):
    """TSV rows: JSON payload, non-JSON free text (with embedded tabs), and a
    short row with no payload column."""
    p = tmp_path / "corpus"
    rows = [
        'a\t{"title": "t", "n": 3}',
        "b\tfree text not json",
        "c\tcol1\tcol2",
        "d",
    ]
    p.write_text("\n".join(rows) + "\n")
    assert list(our_trec.read_corpus(str(p))) == list(ref_trec.read_corpus(str(p)))


def test_remove_irregularities_parity():
    """The JSON sanitizer (reference mfar/data/util.py:62-75) drives the
    corpus tsv writer; byte parity on nested payloads with control chars,
    numpy bools, and the unsupported-type error."""
    import importlib.util

    # util.py imports pytorch_lightning at module top for an unrelated
    # logger wrapper; load it with the stub (not installed here for real).
    import sys
    import types

    for name, attrs in [("pytorch_lightning", {}),
                        ("pytorch_lightning.loggers", {"MLFlowLogger": object})]:
        mod = types.ModuleType(name)
        mod.__mfar_tpu_test_stub__ = True
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
    spec = importlib.util.spec_from_file_location(
        "ref_util", os.path.join(REFERENCE, "mfar", "data", "util.py")
    )
    ref_util = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_util)

    from mfar_tpu.utils.jsonutil import remove_irregularities as ours

    payload = {
        "s": "  line1\nline2\tx\ryz  ",
        "nested": [{"a": np.bool_(True), "b": [1, 2.5, None, False]}, "ok\n"],
        "n": 7,
    }
    assert ours(payload) == ref_util.remove_irregularities(payload)
    for bad in ({1, 2}, object()):
        with pytest.raises(ValueError):
            ref_util.remove_irregularities(bad)
        with pytest.raises(ValueError):
            ours(bad)


def test_qres_text_io_roundtrip_parity(tmp_path):
    rows = [our_trec.QRes(f"q{i}", f"d{i}", 1.0 / (i + 1), rank=i) for i in range(5)]
    blob = "\n".join(str(r) for r in rows) + "\n"
    ref_rows = ref_trec.QRes.from_text_io(io.StringIO(blob))
    assert [(r.query_id, r.doc_id, r.sim, r._rank) for r in ref_rows] == \
        [(r.query_id, r.doc_id, r.sim, r.rank) for r in rows]
