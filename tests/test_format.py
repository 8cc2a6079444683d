from mfar_tpu.data.format import (
    format_amazon,
    format_books,
    format_dict,
    format_documents,
    format_field_value,
    format_mag,
    format_prime,
    format_stark,
)


def test_field_value_scalars():
    assert format_field_value("abc") == "abc"
    assert format_field_value(3) == "3"
    assert format_field_value(2.5) == "2.5"
    assert format_field_value(None) == ""
    assert format_field_value([]) == ""
    assert format_field_value(["a", "b"]) == "a, b"


def test_field_value_list_of_dicts_filters_metadata():
    value = [
        {"summary": "s1", "reviewText": "t1", "vote": "3", "reviewerID": "u"},
        {"summary": "s2", "reviewText": "t2"},
    ]
    assert (
        format_field_value(value)
        == "summary: s1\nreviewText: t1\nsummary: s2\nreviewText: t2"
    )


def test_format_dict_cases():
    d = {
        "a": "x",
        "b": [],
        "c": ["p", "q"],
        "d": [{"k": "v1"}, {"k": {"n": "v2"}}],
        "e": {"x": 1},
    }
    # Note: dict-valued entries render without the outer key
    # (reference: mfar/data/format.py:104-106).
    assert format_dict(d) == "a: x; b: ; c: p, q; k: v1, v2; ; x: 1"


def test_format_documents_missing_field_empty():
    pairs = [("0", {"title": "t"}), ("1", {"other": "x"})]
    out = format_documents(pairs, "title", "amazon")
    assert out == [("0", "t"), ("1", "")]


AMAZON_PAYLOAD = {
    "title": "Red Shoe",
    "brand": "Acme",
    "description": ["Comfy", "shoe"],
    "feature": ["Light", "asin B00X"],
    "review": [{"summary": "Great", "reviewText": "Loved it", "reviewerID": "X"}],
    "qa": [{"question": "Fits?", "answer": "Yes"}],
    "also_buy": ["Blue Shoe"],
    "also_view": [],
}

AMAZON_EXPECTED = (
    "- product: Red Shoe\n"
    "- brand: Acme\n"
    "- description: Comfy shoe\n"
    "- features: \n"
    "#1: Light\n"
    "- reviews: \n"
    '#1:\nsummary: Great\ntext: "Loved it"\n'
    "- QA: \n"
    "#1:\nquestion: Fits?\nanswer: Yes\n"
    " - relations:\n"
    "  products also purchased: \n"
    "#1: Blue Shoe\n"
    "  brand: Acme\n"
)


def test_format_amazon_golden():
    assert format_amazon(AMAZON_PAYLOAD) == AMAZON_EXPECTED


def test_format_mag_golden():
    payload = {
        "type": "paper",
        "title": "T",
        "abstract": "A\r\n",
        "paper___cites___paper": ["P1", "P2"],
        "paper___has_topic___field_of_study": ["F"],
        "author___affiliated_with___institution": {"Auth": ["Inst1", "Inst2"]},
    }
    expected = (
        " - paper title: T\n"
        " - abstract: A\n"
        " - relations:\n\n"
        'paper cites paper: ("P1", "P2"),\n'
        "paper has_topic field_of_study: (F),\n"
        "(Auth (Inst1, Inst2))"
    )
    assert format_mag(payload) == expected


def test_format_prime_golden():
    payload = {
        "name": "N",
        "type": "disease",
        "source": "S",
        "details": {"x": "1", "_skip": "z", "empty": ""},
        "ppi": {"gene/protein": ["G1", "G2"]},
    }
    expected = (
        "- name: N\n"
        "- type: disease\n"
        "- source: S\n"
        "- details: \n"
        "  - x: 1\n"
        " - relations:\n"
        "  ppi: {gene/protein: (G1, G2)}"
    )
    assert format_prime(payload) == expected


def test_format_prime_gene_details():
    payload = {
        "name": "G",
        "type": "gene/protein",
        "source": "S",
        "details": {
            "summary": "does things",
            "interpro": {"desc": "family A"},
            "generif": [{"text": "r1"}, {"text": "r2"}],
        },
    }
    out = format_prime(payload)
    assert "  - summary (protein summary text): does things\n" in out
    assert "  - interpro (protein family and classification information): ['family A']\n" in out
    assert "  - generif (PubMed text): r1; r2\n" in out


def test_format_books_golden():
    payload = {
        "title": "B",
        "author": "A",
        "parsed_dates": ["2001", None],
        "genres": ["g1", "g2"],
        "num_ratings": 5,
        "id": "7",
    }
    expected = (
        "- title: B\n"
        "- author: A\n"
        "- parsed dates: 2001\n"
        "- number of ratings: 5\n"
        "- genres: g1, g2\n"
        "- id: 7"
    )
    assert format_books(payload) == expected


def test_format_stark_dispatch():
    assert format_stark(AMAZON_PAYLOAD, "amazon") == AMAZON_EXPECTED
    single = format_documents([("0", AMAZON_PAYLOAD)], "single", "amazon")
    assert single == [("0", AMAZON_EXPECTED)]
