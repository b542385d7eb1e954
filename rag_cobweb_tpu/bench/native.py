"""ctypes bindings for the native baselines library (native/annlib.cpp).

Provides the C++ CPU baselines the reference got from FAISS / hnswlib
(benchmark_utils.py:536-566) — a multithreaded exact flat top-k and an HNSW
graph index — built from first-party source (``make -C native``), loaded
lazily.  If the shared library is missing, ``available()`` is False and the
harness falls back to the on-device flat index.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libannlib.so")

METRIC_IP, METRIC_L2, METRIC_COSINE = 0, 1, 2
_metrics = {"ip": METRIC_IP, "l2": METRIC_L2, "cosine": METRIC_COSINE}


def _load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(_SO_PATH)],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ann_flat_topk.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, f32p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, i64p, f32p,
    ]
    lib.ann_hnsw_create.restype = ctypes.c_void_p
    lib.ann_hnsw_create.argtypes = [ctypes.c_int] * 4 + [ctypes.c_int]
    lib.ann_hnsw_add.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    lib.ann_hnsw_search.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        i64p, f32p,
    ]
    lib.ann_hnsw_set_ef.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ann_hnsw_size.restype = ctypes.c_int64
    lib.ann_hnsw_size.argtypes = [ctypes.c_void_p]
    lib.ann_hnsw_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def flat_topk(corpus: np.ndarray, queries: np.ndarray, k: int,
              metric: str = "ip", threads: int = 0):
    """Exact top-k over the corpus: (nq, k) ids + scores.  L2 scores are
    negative squared distances (larger = closer, like the device baseline)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native annlib not built (make -C native)")
    corpus = np.ascontiguousarray(corpus, np.float32)
    queries = np.ascontiguousarray(np.atleast_2d(queries), np.float32)
    n, d = corpus.shape
    nq = len(queries)
    k = min(k, n)
    threads = threads or (os.cpu_count() or 1)
    ids = np.empty((nq, k), np.int64)
    scores = np.empty((nq, k), np.float32)
    lib.ann_flat_topk(_f32p(corpus), n, d, _f32p(queries), nq, k,
                      _metrics[metric], threads, _i64p(ids), _f32p(scores))
    return ids, scores


class NativeHNSW:
    """First-party HNSW graph index (hnswlib role: space='cosine', M=16,
    ef_construction=100, ef=50 defaults matching benchmark_utils.py:559-566)."""

    def __init__(self, dim: int, M: int = 16, ef_construction: int = 100,
                 ef: int = 50, metric: str = "cosine"):
        lib = _load()
        if lib is None:
            raise RuntimeError("native annlib not built (make -C native)")
        self._lib = lib
        self.dim = dim
        self._h = ctypes.c_void_p(lib.ann_hnsw_create(
            dim, M, ef_construction, ef, 1 if metric == "cosine" else 0
        ))

    def add(self, xs: np.ndarray):
        xs = np.ascontiguousarray(np.atleast_2d(xs), np.float32)
        assert xs.shape[1] == self.dim
        self._lib.ann_hnsw_add(self._h, _f32p(xs), len(xs))

    def set_ef(self, ef: int):
        self._lib.ann_hnsw_set_ef(self._h, ef)

    def __len__(self):
        return int(self._lib.ann_hnsw_size(self._h))

    def search(self, queries: np.ndarray, k: int, threads: int = 0):
        queries = np.ascontiguousarray(np.atleast_2d(queries), np.float32)
        nq = len(queries)
        threads = threads or (os.cpu_count() or 1)
        ids = np.empty((nq, k), np.int64)
        scores = np.empty((nq, k), np.float32)
        self._lib.ann_hnsw_search(self._h, _f32p(queries), nq, k, threads,
                                  _i64p(ids), _f32p(scores))
        return ids, scores

    def __del__(self):
        try:
            self._lib.ann_hnsw_free(self._h)
        except Exception:
            pass


def make_native_flat_retriever(corpus_embs, metric: str = "ip"):
    corpus = np.ascontiguousarray(corpus_embs, np.float32)

    def retrieve(q, k):
        ids, _ = flat_topk(corpus, q, k, metric)
        return ids

    return retrieve


def make_native_hnsw_retriever(corpus_embs, M: int = 16,
                               ef_construction: int = 100, ef: int = 50):
    corpus = np.ascontiguousarray(corpus_embs, np.float32)
    index = NativeHNSW(corpus.shape[1], M, ef_construction, ef)
    index.add(corpus)

    def retrieve(q, k):
        ids, _ = index.search(q, k)
        return ids

    retrieve.index = index
    return retrieve
