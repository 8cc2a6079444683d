"""Direct token-level parity against the reference's training collation.

Drives the reference's ContrastiveTrainingDataset / QueryDataset
(mfar/data/dataset.py:138-297) and our ContrastiveDataset over the SAME
corpus, queries, qrels, HF tokenizer, and a deterministic negative sampler
(n_bottom=1 -> pool of exactly one, so the only random draw is trivial on
both sides; random_chunk off), then compares the UNPADDED token sequences
per instance and field.  Padding strategies differ by design (the
reference's dynamic 'longest' vs our static power-of-two buckets), so the
content under the attention mask is the parity surface: it is exactly what
the encoder sees.

Covers the reference semantics that are easy to drift on: one instance per
qrel, the <5-char query -> "what" substitution, per-field formatting before
tokenization, per-field max_seq_length truncation, and the optional
'{field name}: ' prefix applied AFTER chunking with ___ -> ' ' replacement.
"""

import numpy as np
import pytest

from tests.ref_stubs import install_reference_stubs

install_reference_stubs()

from mfar.data import dataset as ref_dataset  # noqa: E402
from mfar.data import schema as ref_schema  # noqa: E402
from mfar.data import trec as ref_trec  # noqa: E402
from mfar.data import typedef as ref_typedef  # noqa: E402
from mfar.data.negative_sampler import IndexNegativeSampler as RefSampler  # noqa: E402

from mfar_tpu.data import trec as our_trec  # noqa: E402
from mfar_tpu.data.negative_sampler import IndexNegativeSampler as OurSampler  # noqa: E402
from mfar_tpu.data.schema import resolve_fields  # noqa: E402
from mfar_tpu.data.types import Corpus, Document  # noqa: E402
from mfar_tpu.models.tokenizer import HFTokenizer  # noqa: E402
from mfar_tpu.train.data_pipeline import ContrastiveDataset  # noqa: E402

FIELD_NAMES = "title_dense,description_dense,also_buy_dense"

PAYLOADS = {
    "d0": {"title": "the red lamp", "description": ["glows warm red light"],
           "also_buy": ["blue book"], "also_view": []},
    "d1": {"title": "a blue book about lamps", "description": [],
           "also_buy": [], "also_view": ["the red lamp"]},
    "d2": {"title": "warm light reading", "description": ["a very long story " * 150],
           "also_buy": ["the red lamp", "blue book"], "also_view": []},
    "d3": {"title": "spare part", "description": ["replacement glows"],
           "also_buy": [], "also_view": []},
}
QUERIES = {"q0": "which lamp glows red", "q1": "hi", "q2": "book about lamps"}
QRELS = [("q0", "d0"), ("q1", "d1"), ("q2", "d2")]


@pytest.fixture(scope="module")
def hf_tokenizer():
    from tokenizers import Tokenizer
    from tokenizers.models import WordPiece
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    words = ("the red lamp glows warm light blue book about lamps a very long "
             "story spare part replacement which what title description also "
             "buy : , reading").split()
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(WordPiece(vocab=vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]", special_tokens=[("[CLS]", 2), ("[SEP]", 3)]
    )
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="[PAD]", unk_token="[UNK]",
        cls_token="[CLS]", sep_token="[SEP]",
    )


class FakeIndex:
    """doc d{i} scores n - i for every query: rank order by construction."""

    def __init__(self, n):
        self.n = n

    def retrieve(self, text, top_k):
        return [(f"d{i}", float(self.n - i)) for i in range(min(top_k, self.n))]


def _unpadded(enc):
    """Rows of real token ids from {input_ids, attention_mask} (np or torch)."""
    ids = np.asarray(enc["input_ids"])
    mask = np.asarray(enc["attention_mask"])
    return [list(ids[i][mask[i] == 1]) for i in range(ids.shape[0])]


@pytest.mark.parametrize("prefix", [False, True])
def test_training_collate_parity(hf_tokenizer, prefix):
    keys = sorted(PAYLOADS)
    ref_corpus = ref_typedef.Corpus(
        [ref_typedef.Document(k, PAYLOADS[k]) for k in keys], "amazon"
    )
    our_corpus = Corpus([Document(k, raw=PAYLOADS[k]) for k in keys], "amazon")
    ref_fields = ref_schema.resolve_fields(FIELD_NAMES, "amazon")
    our_fields = resolve_fields(FIELD_NAMES, "amazon")

    # n_bottom=1 -> the single lowest-ranked non-positive candidate: the one
    # random draw is from a 1-element pool on both sides.
    ref_ds = ref_dataset.ContrastiveTrainingDataset(
        tokenizer=hf_tokenizer,
        queries=dict(QUERIES),
        documents=ref_corpus,
        qrels=[ref_trec.QRels(q, d, 1.0) for q, d in QRELS],
        negative_sampler=RefSampler(
            FakeIndex(len(keys)), documents=dict(PAYLOADS),
            n_retrieve=len(keys), n_bottom=1, n_sample=1,
        ),
        max_length=512,
        field_info=ref_fields,
        field_types={ref_typedef.FieldType.DENSE},
        prefix=prefix,
        random_chunk=False,
    )
    ref_batch = ref_ds.collate([ref_ds[i] for i in range(len(QRELS))])

    ours = ContrastiveDataset(
        queries=QUERIES,
        corpus=our_corpus,
        qrels=[our_trec.QRels(q, d, 1.0) for q, d in QRELS],
        negative_sampler=OurSampler(
            FakeIndex(len(keys)), n_retrieve=len(keys), n_bottom=1, n_sample=1
        ),
        field_info=our_fields,
        tokenizer=HFTokenizer(hf_tokenizer, max_length=512),
        query_max_length=512,
        prefix=prefix,
        random_chunk=False,
    )
    our_batch = ours.make_batch(range(len(QRELS)), np.random.default_rng(0))

    # queries (incl. the <5-char 'hi' -> 'what' substitution at row 1)
    ref_q = _unpadded(ref_batch.query[ref_typedef.FieldType.DENSE])
    assert _unpadded(our_batch["query"]) == ref_q
    what_ids = hf_tokenizer(["what"])["input_ids"][0]
    assert ref_q[1] == list(what_ids)

    for fk in our_fields:
        ref_pos = _unpadded(ref_batch.pos_cand[ref_typedef.FieldType.DENSE][fk])
        ref_neg = _unpadded(ref_batch.neg_cands[ref_typedef.FieldType.DENSE][fk])
        assert _unpadded(our_batch["pos"][fk]) == ref_pos, fk
        assert _unpadded(our_batch["neg"][fk]) == ref_neg, fk

    # the long d2 description must have hit the per-field truncation relief
    # valve on both sides (budget 512 tokens incl. [CLS]/[SEP])
    d2_desc = _unpadded(our_batch["pos"]["description_dense"])[2]
    assert len(d2_desc) == 512


def test_query_dataset_parity(hf_tokenizer):
    ref_qds = ref_dataset.QueryDataset(
        tokenizer=hf_tokenizer, queries=dict(QUERIES), max_length=512
    )
    ref_batch = ref_qds.collate([ref_qds[i] for i in range(len(QUERIES))])
    ref_rows = _unpadded(ref_batch.query[ref_typedef.FieldType.DENSE])

    from mfar_tpu.train.data_pipeline import clean_query

    tok = HFTokenizer(hf_tokenizer, max_length=512)
    ordered = [QUERIES[qid] for qid in QUERIES]
    ours = tok.encode_batch([clean_query(t) for t in ordered], 512)
    assert _unpadded(ours) == ref_rows
