"""Labeled-Cobweb classifier tests: learnable clusters, probability
calibration sanity, incremental fitting, and persistence."""

import numpy as np
import pytest

from rag_cobweb_tpu.core.classifier import CobwebClassifier
from rag_cobweb_tpu.core.config import TreeConfig


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=4.0, size=(4, 12))
    X, y = [], []
    for ci, c in enumerate(centers):
        X.append(c + 0.4 * rng.normal(size=(30, 12)))
        y += [f"class_{ci}"] * 30
    X = np.concatenate(X).astype(np.float32)
    order = rng.permutation(len(X))
    return X[order], [y[i] for i in order], centers


def test_classifier_learns_blobs(blobs):
    X, y, centers = blobs
    clf = CobwebClassifier(TreeConfig(dim=12), capacity=1024, seed=0)
    clf.fit(X[:100], y[:100])
    acc = clf.score(X[100:], y[100:])
    assert acc >= 0.9, acc


def test_predict_probs_shape_and_simplex(blobs):
    X, y, _ = blobs
    clf = CobwebClassifier(TreeConfig(dim=12), capacity=1024, seed=0)
    clf.fit(X[:80], y[:80])
    p = clf.predict_probs(X[80:90])
    assert p.shape == (10, 4)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-4)
    assert (p >= 0).all()


def test_max_nodes_budget(blobs):
    X, y, _ = blobs
    clf = CobwebClassifier(TreeConfig(dim=12), capacity=1024, seed=0)
    clf.fit(X[:80], y[:80])
    full = clf.predict(X[80:100])
    budget = clf.predict(X[80:100], max_nodes=20)
    agree = np.mean([a == b for a, b in zip(full, budget)])
    assert agree > 0.8  # greedy budget approximates the full posterior


def test_incremental_partial_fit(blobs):
    X, y, _ = blobs
    clf = CobwebClassifier(TreeConfig(dim=12), capacity=1024, seed=0)
    clf.partial_fit(X[:50], y[:50])
    clf.partial_fit(X[50:100], y[50:100])
    assert clf.score(X[100:], y[100:]) >= 0.9
    assert clf.n_labels == 4


def test_unlabeled_dims_new_label_added_on_the_fly():
    rng = np.random.default_rng(1)
    X1 = rng.normal(size=(20, 6)).astype(np.float32) + 3
    X2 = rng.normal(size=(20, 6)).astype(np.float32) - 3
    clf = CobwebClassifier(TreeConfig(dim=6), capacity=512, seed=0)
    clf.partial_fit(X1, ["a"] * 20)
    assert clf.n_labels == 1
    clf.partial_fit(X2, ["b"] * 20)
    assert clf.n_labels == 2
    assert clf.predict(X2[:3]) == ["b"] * 3


def test_json_round_trip(blobs):
    X, y, _ = blobs
    clf = CobwebClassifier(TreeConfig(dim=12), capacity=1024, seed=0)
    clf.fit(X[:60], y[:60])
    blob = clf.dump_json()
    clf2 = CobwebClassifier.load_json(blob)
    np.testing.assert_allclose(
        clf.predict_probs(X[60:70]), clf2.predict_probs(X[60:70]), rtol=1e-4
    )
    assert clf2.reverse_labels == clf.reverse_labels
