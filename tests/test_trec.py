import json

from mfar_tpu.data import trec
from mfar_tpu.data.types import Corpus, random_chunk_text

import numpy as np


def test_qrels_roundtrip(tmp_path):
    items = [trec.QRels("1", "d1", 1.0), trec.QRels("2", "d9", 2.0)]
    path = tmp_path / "x.qrels"
    trec.write_qrels(str(path), items)
    back = trec.QRels.from_file(str(path))
    assert back == items


def test_qres_roundtrip(tmp_path):
    items = [trec.QRes("1", "d1", 0.53), trec.QRes("1", "d2", -1.25)]
    path = tmp_path / "x.qres"
    trec.write_qres(str(path), items)
    back = trec.QRes.from_file(str(path))
    assert [(r.query_id, r.doc_id, r.sim) for r in back] == [
        ("1", "d1", 0.53),
        ("1", "d2", -1.25),
    ]


def test_read_corpus_payload_types(tmp_path):
    path = tmp_path / "corpus"
    with open(path, "w") as f:
        f.write('0\t{"title": "x"}\n')
        f.write("1\tplain text here\n")
        f.write("2\n")
        f.write("3\t[1, 2]\n")
    rows = list(trec.read_corpus(str(path)))
    assert rows[0] == ("0", {"title": "x"})
    assert rows[1] == ("1", "plain text here")
    assert rows[2] == ("2", "")
    assert rows[3] == ("3", [1, 2])


def test_parse_trec_eval_output():
    out = "runid\tall\trun0\nnum_q\tall\t5\nmap\tall\t0.5000\nndcg_cut_10\tall\t0.7\n"
    metrics = trec.parse_trec_eval_output(out)
    assert metrics == {"map": 0.5, "ndcg_cut_10": 0.7}


def test_corpus_from_pairs():
    corpus = Corpus.from_pairs([("a", {"t": 1}), ("b", "text")], "amazon")
    assert len(corpus) == 2
    assert corpus.key_to_id == {"a": 0, "b": 1}
    assert corpus.get_doc_by_key("b").text == "text"
    assert corpus.get_doc_by_id(0).raw == {"t": 1}
    assert corpus.dataset_name == "amazon"


def test_random_chunk_text():
    text = " ".join(str(i) for i in range(100))
    # max_length 40 tokens -> 30 word window
    rng = np.random.default_rng(0)
    chunk = random_chunk_text(text, 40, rng)
    words = chunk.split(" ")
    assert len(words) == 30
    # contiguous window
    start = int(words[0])
    assert words == [str(start + i) for i in range(30)]
    # deterministic prefix when rng is None
    assert random_chunk_text(text, 40, None).split(" ")[0] == "0"
    # short text unchanged
    assert random_chunk_text("a b", 512, rng) == "a b"


def test_write_dataset_dir(tmp_path):
    from tests.synth import make_amazon_corpus, write_dataset_dir

    corpus = make_amazon_corpus(20)
    splits = write_dataset_dir(str(tmp_path), corpus, n_train=6, n_val=2)
    rows = list(trec.read_corpus(str(tmp_path / "corpus")))
    assert len(rows) == 20
    assert isinstance(rows[0][1], dict)
    train_q = trec.read_queries(str(tmp_path / "train.queries"))
    assert len(train_q) == 6
    qrels = trec.QRels.from_file(str(tmp_path / "train.qrels"))
    assert {r.query_id for r in qrels} == set(splits["train"])
