"""ctypes bindings for the native C++ sparse engine.

Loads ``libmfar_native.so`` (built by ``make -C mfar_tpu/native``) and
exposes :class:`NativeBM25` plus stemmer/tokenizer entry points.  When the
library is absent everything degrades to the scipy/python implementations in
:mod:`mfar_tpu.sparse` -- the native engine is a drop-in accelerator, not a
hard dependency.  Parity between the two is enforced by
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmfar_native.so")
_lib = None


def bucket_width(m: int, base: int = 128) -> int:
    """Round a postings width up to the next power-of-two multiple of
    ``base``.  Postings tensors feed jitted serving programs, and every
    DISTINCT width traces (and on TPU remotely recompiles, ~20-40 s) a new
    program; batch-max padding alone makes nearly every real-query batch a
    new width.  Geometric buckets bound the number of compiled programs to
    ~log2 of the width range (~16 ever) at <=2x zero-padding on an O(nnz)
    transfer."""
    w = base
    while w < m:
        w *= 2
    return w


def load_library():
    global _lib
    # env check FIRST: the switch must work even after an earlier call in
    # the same process cached the library (e.g. a monkeypatched test)
    if os.environ.get("MFAR_DISABLE_NATIVE"):
        # Forced scipy/python fallback: lets tests (and operators debugging
        # a suspect .so) exercise the degraded path without deleting the
        # built library.
        return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mfar_bm25_build.restype = ctypes.c_void_p
    lib.mfar_bm25_build.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_double, ctypes.c_double,
    ]
    lib.mfar_bm25_free.argtypes = [ctypes.c_void_p]
    lib.mfar_bm25_n_docs.restype = ctypes.c_int32
    lib.mfar_bm25_n_docs.argtypes = [ctypes.c_void_p]
    lib.mfar_bm25_vocab_size.restype = ctypes.c_int64
    lib.mfar_bm25_vocab_size.argtypes = [ctypes.c_void_p]
    lib.mfar_bm25_score.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
    ]
    lib.mfar_bm25_retrieve.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.mfar_bm25_score_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
    ]
    # Symbols added after round 1: a stale libmfar_native.so must degrade
    # (scatter(nonzero(dense scores)) is an exact postings substitute), not
    # take the whole native engine down.
    try:
        lib.mfar_bm25_postings_size.restype = ctypes.c_int64
        lib.mfar_bm25_postings_size.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.mfar_bm25_postings.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        lib.mfar_has_postings = True
    except AttributeError:
        print("[native] libmfar_native.so predates the postings API; "
              "rebuild with `make -C mfar_tpu/native` for faster hybrid "
              "serving (dense-scores fallback in use)")
        lib.mfar_has_postings = False
    # Round-3 symbols: batched + threaded postings/scoring (one call per
    # query batch instead of a serial python loop per query).
    try:
        lib.mfar_bm25_postings_batch_sizes.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        lib.mfar_bm25_postings_batch_fill.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.mfar_bm25_score_batch_mt.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.mfar_has_batched_postings = True
    except AttributeError:
        lib.mfar_has_batched_postings = False
    lib.mfar_bm25_save.restype = ctypes.c_int32
    lib.mfar_bm25_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mfar_bm25_load.restype = ctypes.c_void_p
    lib.mfar_bm25_load.argtypes = [ctypes.c_char_p]
    lib.mfar_stem.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32]
    lib.mfar_tokenize.restype = ctypes.c_int64
    lib.mfar_tokenize.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def build_native_library(force: bool = False) -> bool:
    """Compile the shared library with make; returns availability."""
    if available() and not force:
        return True
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(__file__)],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[native] build failed: {e}")
        return False
    global _lib
    _lib = None
    return available()


def native_stem(word: str) -> str:
    lib = load_library()
    # A stem is never longer than its input; a fixed 64-byte buffer
    # silently truncated long tokens into a parity divergence vs
    # porter2_stem.
    n = len(word.encode("utf-8")) + 1
    buf = ctypes.create_string_buffer(max(n, 64))
    lib.mfar_stem(word.encode("utf-8"), buf, max(n, 64))
    return buf.value.decode("utf-8")


def native_tokenize(text: str) -> List[str]:
    lib = load_library()
    encoded = text.encode("utf-8")
    need = lib.mfar_tokenize(encoded, None, 0)
    buf = ctypes.create_string_buffer(int(need))
    lib.mfar_tokenize(encoded, buf, need)
    s = buf.value.decode("utf-8")
    return s.split("\n") if s else []


def _c_str_array(texts: Sequence[str]):
    arr = (ctypes.c_char_p * len(texts))()
    encoded = [t.encode("utf-8") for t in texts]
    arr[:] = encoded
    return arr, encoded  # keep encoded alive


class NativeBM25:
    """Native-engine twin of :class:`mfar_tpu.sparse.bm25.BM25Index`'s
    scoring core.  Keys<->row-id mapping stays in Python."""

    def __init__(self, handle, n_docs: int):
        self._lib = load_library()
        self._handle = handle
        self.n_docs = n_docs

    @classmethod
    def create(cls, texts: Sequence[str], k1: float = 1.2, b: float = 0.75) -> "NativeBM25":
        lib = load_library()
        assert lib is not None, "native library not built (make -C mfar_tpu/native)"
        arr, _keep = _c_str_array(texts)
        handle = lib.mfar_bm25_build(arr, len(texts), k1, b)
        return cls(handle, len(texts))

    @property
    def vocab_size(self) -> int:
        return int(self._lib.mfar_bm25_vocab_size(self._handle))

    def get_scores(self, query: str) -> np.ndarray:
        out = np.zeros(self.n_docs, np.float32)
        self._lib.mfar_bm25_score(
            self._handle, query.encode("utf-8"),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def get_scores_batch(self, queries: Sequence[str], n_threads: int = 0) -> np.ndarray:
        out = np.zeros((len(queries), self.n_docs), np.float32)
        arr, _keep = _c_str_array(queries)
        if getattr(self._lib, "mfar_has_batched_postings", False):
            self._lib.mfar_bm25_score_batch_mt(
                self._handle, arr, len(queries),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n_threads,
            )
        else:
            self._lib.mfar_bm25_score_batch(
                self._handle, arr, len(queries),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        return out

    def get_postings_batch(
        self, queries: Sequence[str], pad_multiple: int = 128, n_threads: int = 0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched, THREADED postings: one native call sizes every query,
        one fills the zero-padded [B, M] (ids, impacts) pair -- replacing
        the per-query python loop that serialized hybrid serving's host
        half.  Returns None when the library predates the batched API (the
        caller falls back to per-query calls)."""
        if not getattr(self._lib, "mfar_has_batched_postings", False):
            return None
        b = len(queries)
        arr, _keep = _c_str_array(queries)
        sizes = np.zeros(b, np.int64)
        self._lib.mfar_bm25_postings_batch_sizes(
            self._handle, arr, b,
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads,
        )
        m = int(sizes.max()) if b else 0
        m = bucket_width(m, pad_multiple)
        ids = np.zeros((b, m), np.int32)
        vals = np.zeros((b, m), np.float32)
        self._lib.mfar_bm25_postings_batch_fill(
            self._handle, arr, b, m,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
        )
        return ids, vals

    def get_postings(self, query: str) -> Tuple[np.ndarray, np.ndarray]:
        """Concatenated (doc_ids, impacts) of the query's terms -- one entry
        per term occurrence (consumers scatter-add).  With a stale library
        (no postings symbols), the nonzeros of the dense score vector are an
        exact substitute (duplicates already summed)."""
        if not getattr(self._lib, "mfar_has_postings", False):
            scores = self.get_scores(query)
            (nz,) = np.nonzero(scores)
            return nz.astype(np.int32), scores[nz].astype(np.float32)
        q = query.encode("utf-8")
        n = int(self._lib.mfar_bm25_postings_size(self._handle, q))
        ids = np.zeros(n, np.int32)
        vals = np.zeros(n, np.float32)
        if n:
            self._lib.mfar_bm25_postings(
                self._handle, q,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        return ids, vals

    def retrieve(self, query: str, top_k: int) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.full(top_k, -1, np.int32)
        scores = np.zeros(top_k, np.float32)
        self._lib.mfar_bm25_retrieve(
            self._handle, query.encode("utf-8"), top_k,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return ids, scores

    def save(self, path: str) -> None:
        rc = self._lib.mfar_bm25_save(self._handle, path.encode("utf-8"))
        assert rc == 0, f"native save failed: {path}"

    @classmethod
    def load(cls, path: str) -> "NativeBM25":
        lib = load_library()
        handle = lib.mfar_bm25_load(path.encode("utf-8"))
        assert handle, f"native load failed: {path}"
        return cls(handle, int(lib.mfar_bm25_n_docs(handle)))

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.mfar_bm25_free(self._handle)
            self._handle = None
