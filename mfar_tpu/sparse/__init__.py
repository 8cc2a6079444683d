from mfar_tpu.sparse.bm25 import BM25Index
from mfar_tpu.sparse.stemmer import porter2_stem
from mfar_tpu.sparse.tokenize import tokenize

__all__ = ["BM25Index", "porter2_stem", "tokenize"]
