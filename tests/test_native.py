"""Native baselines (C++ annlib via ctypes): exact top-k parity with numpy
and HNSW recall sanity."""

import numpy as np
import pytest

from rag_cobweb_tpu.bench import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native annlib not built"
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(2000, 32)).astype(np.float32)
    queries = rng.normal(size=(50, 32)).astype(np.float32)
    return corpus, queries


def test_flat_ip_matches_numpy(data):
    corpus, queries = data
    ids, scores = native.flat_topk(corpus, queries, k=10, metric="ip")
    want = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(
        scores, np.take_along_axis(queries @ corpus.T, want, 1), rtol=1e-4
    )


def test_flat_l2_matches_numpy(data):
    corpus, queries = data
    ids, _ = native.flat_topk(corpus, queries, k=5, metric="l2")
    d2 = ((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1)[:, :5]
    np.testing.assert_array_equal(ids, want)


def test_flat_cosine_matches_numpy(data):
    corpus, queries = data
    ids, _ = native.flat_topk(corpus, queries, k=5, metric="cosine")
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    want = np.argsort(-(qn @ cn.T), axis=1)[:, :5]
    np.testing.assert_array_equal(ids, want)


def test_hnsw_recall(data):
    corpus, queries = data
    idx = native.NativeHNSW(32, M=16, ef_construction=200, ef=100)
    idx.add(corpus)
    assert len(idx) == 2000
    ids, _ = idx.search(queries, k=10)
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    exact = np.argsort(-(qn @ cn.T), axis=1)[:, :10]
    recall = np.mean([
        len(set(ids[i]) & set(exact[i])) / 10 for i in range(len(queries))
    ])
    assert recall > 0.85, recall


def test_hnsw_incremental_add(data):
    corpus, queries = data
    idx = native.NativeHNSW(32)
    idx.add(corpus[:1000])
    idx.add(corpus[1000:])
    assert len(idx) == 2000
    ids, _ = idx.search(queries[:3], k=5)
    assert ids.shape == (3, 5)
    assert (ids >= 0).all()


def test_retriever_wrappers(data):
    corpus, queries = data
    r = native.make_native_flat_retriever(corpus, "ip")
    ids = r(queries[:4], 7)
    assert ids.shape == (4, 7)
    rh = native.make_native_hnsw_retriever(corpus)
    ids = rh(queries[:4], 7)
    assert ids.shape == (4, 7)
