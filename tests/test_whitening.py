"""Whitening tests: decorrelation/unit-variance properties, sklearn PCA
numeric parity (sklearn is available in this image but is NOT a runtime
dependency), fractional pca_dim semantics, ICA non-Gaussianity recovery,
save/load, and the fused jit transform."""

import numpy as np
import pytest

from rag_cobweb_tpu.whitening import (
    PCAICAWhiteningModel,
    PCAZCAWhiteningModel,
    ZCAWhiteningModel,
    fastica,
)


def correlated_data(rng, n=2000, d=16):
    A = rng.normal(size=(d, d))
    z = rng.normal(size=(n, d))
    return (z @ A.T + rng.normal(size=d)).astype(np.float32)


def test_zca_whitens_to_identity_cov():
    rng = np.random.default_rng(0)
    X = correlated_data(rng)
    m = ZCAWhiteningModel.fit(X)
    W = m.transform(X)
    cov = np.cov(W, rowvar=False)
    np.testing.assert_allclose(cov, np.eye(16), atol=0.15)


def test_pca_zca_whitens_and_preserves_basis():
    rng = np.random.default_rng(1)
    X = correlated_data(rng)
    m = PCAZCAWhiteningModel.fit(X, pca_dim=16)
    W = m.transform(X)
    cov = np.cov(W, rowvar=False)
    np.testing.assert_allclose(cov, np.eye(16), atol=0.15)


def test_pca_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.decomposition")
    rng = np.random.default_rng(2)
    X = correlated_data(rng, n=500, d=12)
    from rag_cobweb_tpu.whitening.models import _pca_fit

    mean, comps, ev = _pca_fit(X, 5)
    sk = sklearn.PCA(n_components=5).fit(X - X.mean(0))
    np.testing.assert_allclose(ev, sk.explained_variance_, rtol=1e-4)
    # components match up to sign
    for i in range(5):
        dot = abs(float(np.dot(comps[i], sk.components_[i])))
        assert dot == pytest.approx(1.0, abs=1e-4)


def test_fractional_pca_dim_selects_by_variance():
    rng = np.random.default_rng(3)
    # 3 strong directions + tiny noise in the rest
    X = np.zeros((1000, 10), np.float32)
    X[:, :3] = rng.normal(scale=[10.0, 8.0, 6.0], size=(1000, 3))
    X[:, 3:] = 0.01 * rng.normal(size=(1000, 7))
    from rag_cobweb_tpu.whitening.models import _pca_fit

    _, comps, _ = _pca_fit(X, 0.96)
    assert comps.shape[0] == 3


def test_fastica_recovers_independent_sources():
    """Mix two non-Gaussian (uniform) sources; ICA must un-mix them
    (correlation of recovered with true sources ~1 up to permutation/sign)."""
    rng = np.random.default_rng(4)
    S = rng.uniform(-1, 1, size=(4000, 2))
    A = np.array([[2.0, 1.0], [1.0, 3.0]])
    X = S @ A.T
    res = fastica(X, max_iter=2000, tol=1e-4, seed=0)
    assert res.converged
    rec = (X - res.mean) @ res.components.T
    C = np.corrcoef(rec.T, S.T)[:2, 2:]
    # each recovered component matches exactly one source
    best = np.abs(C).max(axis=1)
    assert (best > 0.95).all(), C


def test_pca_ica_pipeline_output_is_white():
    rng = np.random.default_rng(5)
    X = correlated_data(rng, n=3000, d=20)
    m = PCAICAWhiteningModel.fit(X, pca_dim=10, seed=0)
    W = m.transform(X)
    assert W.shape == (3000, 10)
    cov = np.cov(W, rowvar=False)
    np.testing.assert_allclose(np.diag(cov), np.ones(10), atol=0.1)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 0.1


def test_transform_single_vs_batch():
    rng = np.random.default_rng(6)
    X = correlated_data(rng, n=500, d=8)
    m = PCAICAWhiteningModel.fit(X, pca_dim=6, seed=0)
    single = m.transform(X[0])
    batch = m.transform(X[:3])
    assert single.shape == (6,)
    np.testing.assert_allclose(single, batch[0], rtol=1e-5)
    # is_ica=False returns normalized PCA coordinates (reference :49-53)
    pca_only = m.transform(X[:3], is_ica=False)
    assert pca_only.shape == (3, 6)


def test_transform_jit_matches_numpy():
    rng = np.random.default_rng(7)
    X = correlated_data(rng, n=500, d=8)
    m = PCAICAWhiteningModel.fit(X, pca_dim=6, seed=0)
    want = m.transform(X[:5])
    got = np.asarray(m.transform_jit(X[:5]))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_save_load_round_trip(tmp_path):
    rng = np.random.default_rng(8)
    X = correlated_data(rng, n=300, d=8)
    for cls, kw in [
        (PCAICAWhiteningModel, dict(pca_dim=4)),
        (PCAZCAWhiteningModel, dict(pca_dim=4)),
        (ZCAWhiteningModel, dict()),
    ]:
        m = cls.fit(X, **kw)
        p = tmp_path / f"{cls.__name__}.pkl"
        m.save(str(p))
        m2 = cls.load(str(p))
        np.testing.assert_allclose(m.transform(X[:4]), m2.transform(X[:4]),
                                   rtol=1e-6)


def test_fastica_jax_matches_properties():
    """The device (lax.while_loop) FastICA also decorrelates to unit
    variance."""
    from rag_cobweb_tpu.whitening.fastica import fastica_jax

    rng = np.random.default_rng(9)
    S = rng.uniform(-1, 1, size=(2000, 3))
    A = rng.normal(size=(3, 3)) + np.eye(3)
    X = (S @ A.T).astype(np.float32)
    comps, mean, it, converged = fastica_jax(X, max_iter=1000, tol=1e-3)
    rec = (X - np.asarray(mean)) @ np.asarray(comps).T
    cov = np.cov(rec, rowvar=False)
    np.testing.assert_allclose(np.diag(cov), np.ones(3), atol=0.15)
