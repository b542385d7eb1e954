"""Retrieval baselines for the eval harness.

The reference benchmarks Cobweb against FAISS flat IP/L2, exact torch dot,
HNSWlib, and (set up but unused) Annoy (benchmark_utils.py:529-614).  The
TPU-native exact baseline is a device matmul + ``lax.top_k`` ("flat index"),
which fills FAISS's role; the C++ ANN baselines are kept as optional CPU
comparisons, gated on their packages being installed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "l2"))
def _flat_topk(q, embs, sq_norms, k: int, l2: bool):
    scores = jnp.dot(q, embs.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    if l2:
        scores = 2.0 * scores - sq_norms[None, :]  # 2qc - ||c||^2 ~ -d2
    return jax.lax.top_k(scores, k)


class FlatIndex:
    """Exact on-device flat index: IP / cosine / L2 via one GEMM + top-k.

    TPU equivalent of setup_faiss/setup_torch_dot + retrieve_*
    (benchmark_utils.py:536-546, 569-571, 576-587).
    """

    def __init__(self, corpus_embs: np.ndarray, metric: str = "ip"):
        if metric not in ("ip", "l2", "cosine"):
            raise ValueError(f"unknown metric {metric}")
        self.metric = metric
        embs = jnp.asarray(np.asarray(corpus_embs, np.float32))
        if metric == "cosine":
            embs = embs / jnp.maximum(
                jnp.linalg.norm(embs, axis=1, keepdims=True), 1e-12
            )
        self.embs = embs
        self._sq_norms = jnp.sum(jnp.square(embs), axis=1)

    def search_device(self, queries, k: int):
        """(B, D) -> (B, k) ids as a DEVICE array (no host sync) — lets
        evaluators pipeline batches and timers measure device time only."""
        q = jnp.asarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None, :]
        if self.metric == "cosine":
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True),
                                1e-12)
        _, ids = _flat_topk(q, self.embs, self._sq_norms,
                            min(k, self.embs.shape[0]), self.metric == "l2")
        return ids

    def search(self, queries: np.ndarray, k: int) -> np.ndarray:
        return np.asarray(self.search_device(queries, k))

    __call__ = search


def make_flat_retriever(corpus_embs, metric="ip"):
    idx = FlatIndex(corpus_embs, metric)
    return lambda q, k: idx.search(q, k)


# -- optional C++ ANN baselines (CPU; parity with the reference harness) ----

def faiss_available() -> bool:
    try:
        import faiss  # noqa: F401
        return True
    except ImportError:
        return False


def hnswlib_available() -> bool:
    try:
        import hnswlib  # noqa: F401
        return True
    except ImportError:
        return False


def make_faiss_retriever(corpus_embs, metric: str = "ip"):
    """FAISS IndexFlatIP/L2 (reference setup_faiss :536-546)."""
    import faiss

    embs = np.ascontiguousarray(np.asarray(corpus_embs, np.float32))
    d = embs.shape[1]
    index = faiss.IndexFlatIP(d) if metric == "ip" else faiss.IndexFlatL2(d)
    index.add(embs)

    def retrieve(q, k):
        q = np.ascontiguousarray(np.atleast_2d(np.asarray(q, np.float32)))
        _, ids = index.search(q, k)
        return ids

    return retrieve


def make_hnswlib_retriever(corpus_embs, M: int = 16, ef_construction: int = 100,
                           ef: int = 50):
    """hnswlib cosine graph (reference setup_hnswlib :559-566)."""
    import hnswlib

    embs = np.asarray(corpus_embs, np.float32)
    n, d = embs.shape
    index = hnswlib.Index(space="cosine", dim=d)
    index.init_index(max_elements=n, M=M, ef_construction=ef_construction)
    index.add_items(embs, np.arange(n))
    index.set_ef(ef)

    def retrieve(q, k):
        q = np.atleast_2d(np.asarray(q, np.float32))
        ids, _ = index.knn_query(q, k=k)
        return ids

    return retrieve


def make_annoy_retriever(corpus_embs, n_trees: int = 10):
    """Annoy angular trees (reference setup_annoy :549-556)."""
    from annoy import AnnoyIndex

    embs = np.asarray(corpus_embs, np.float32)
    n, d = embs.shape
    index = AnnoyIndex(d, "angular")
    for i in range(n):
        index.add_item(i, embs[i])
    index.build(n_trees)

    def retrieve(q, k):
        q = np.atleast_2d(np.asarray(q, np.float32))
        return np.asarray(
            [index.get_nns_by_vector(row, k) for row in q], np.int64
        )

    return retrieve
