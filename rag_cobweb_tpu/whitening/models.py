"""Whitening models with reference API parity.

PCAICAWhiteningModel / PCAZCAWhiteningModel / ZCAWhiteningModel mirror the
reference classes (pca_ica.py:10-123, pca_zca.py:5-101, zca.py:9-87):
``fit(X, pca_dim, ...)`` / ``transform(x)`` / pickle ``save``/``load``.

Differences by design:
  * no sklearn — PCA is an eigendecomposition of the covariance (host f64),
    ICA is the native FastICA in whitening/fastica.py;
  * ``pca_dim`` accepts an int (component count) or a float in (0, 1)
    (explained-variance fraction — callers of the reference pass 0.90/0.96,
    base_benchmark.py:301);
  * ``transform`` runs as XLA matmuls when given jax arrays (and is exposed
    as ``transform_jit`` for fusing into encode paths); numpy in, numpy out
    otherwise (reference-compatible);
  * the reference's ``encode_and_whiten_zca`` referenced undefined globals
    (zca.py:79,84) — fixed here with explicit arguments.
"""

from __future__ import annotations

import pickle
from typing import Callable, Optional

import numpy as np

from rag_cobweb_tpu.whitening.fastica import fastica


def _pca_fit(X: np.ndarray, pca_dim):
    """Host-precision PCA: returns (mean, components (k, d), explained_var (k,)).

    ``pca_dim``: int -> k components; float in (0,1) -> smallest k whose
    cumulative explained-variance ratio reaches the fraction (sklearn
    n_components-float semantics, used by the reference with 0.90/0.96).
    """
    X = np.asarray(X, np.float64)
    mean = X.mean(axis=0)
    Xc = X - mean
    n = X.shape[0]
    cov = (Xc.T @ Xc) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    eigvals = np.maximum(eigvals[order], 0.0)
    eigvecs = eigvecs[:, order]
    if isinstance(pca_dim, float):
        if not 0.0 < pca_dim < 1.0:
            raise ValueError(f"fractional pca_dim must be in (0,1): {pca_dim}")
        ratio = np.cumsum(eigvals) / max(eigvals.sum(), 1e-30)
        k = int(np.searchsorted(ratio, pca_dim) + 1)
    else:
        k = int(pca_dim)
    k = max(1, min(k, X.shape[1], n))
    return mean, eigvecs[:, :k].T, eigvals[:k]


def _maybe_single(x):
    x = np.asarray(x)
    single = x.ndim == 1
    return (x[None, :] if single else x), single


class PCAICAWhiteningModel:
    """PCA -> normalize by sqrt(eigenvalue) -> ICA rotation
    (reference pca_ica.py:10-123)."""

    def __init__(self, mean, pca_components, ica_unmixing,
                 pca_explained_var, eps: float = 1e-8):
        self.mean = np.asarray(mean)
        self.pca_components = np.asarray(pca_components)
        self.pca_explained_var = np.asarray(pca_explained_var)
        self.ica_unmixing = np.asarray(ica_unmixing)
        self.eps = eps
        self._jax_cache = None

    def __repr__(self):
        return (
            f"{type(self).__name__}(mean={self.mean.shape}, "
            f"pca={self.pca_components.shape}, "
            f"ica={self.ica_unmixing.shape}, eps={self.eps})"
        )

    @property
    def dim_out(self) -> int:
        return self.ica_unmixing.shape[0]

    def transform(self, x, is_ica: bool = True) -> np.ndarray:
        """Whiten a single embedding or a batch (reference :30-53)."""
        x, single = _maybe_single(x)
        x_pca = (x - self.mean) @ self.pca_components.T
        x_pca = x_pca / np.sqrt(self.pca_explained_var + self.eps)
        out = x_pca @ self.ica_unmixing.T if is_ica else x_pca
        out = out.astype(np.float32)
        return out[0] if single else out

    def transform_jit(self, x):
        """Fused single-matmul device transform: precomposes
        center->project->scale->unmix into one (d_in, d_out) matrix."""
        import jax
        import jax.numpy as jnp

        if self._jax_cache is None:
            scale = 1.0 / np.sqrt(self.pca_explained_var + self.eps)
            M = (self.pca_components.T * scale[None, :]) @ self.ica_unmixing.T
            b = -(self.mean @ M)
            self._jax_cache = (jnp.asarray(M, jnp.float32),
                              jnp.asarray(b, jnp.float32))
        M, b = self._jax_cache
        # HIGHEST: the TPU default (bf16 accumulate) drifts ~1e-2 per
        # element, visible as top-k tie flips downstream in scoring
        return jnp.matmul(jnp.asarray(x), M,
                          precision=jax.lax.Precision.HIGHEST) + b

    @classmethod
    def fit(cls, X, pca_dim=256, eps: float = 1e-8,
            ica_max_iter: int = 5000, ica_tol: float = 1e-3, seed: int = 0,
            ica_sample_size: int = 20000):
        """PCA -> unit-variance normalize -> FastICA (reference :55-76).

        ``ica_sample_size``: the FastICA fixed point costs O(n * k^2) per
        iteration; above this many rows the ICA stage fits on a random
        subsample (the PCA stage always uses all rows).  Pass 0 to disable.
        """
        mean, components, explained_var = _pca_fit(X, pca_dim)
        Xp = (np.asarray(X, np.float64) - mean) @ components.T
        Xp = Xp / np.sqrt(explained_var + eps)
        if ica_sample_size and len(Xp) > ica_sample_size:
            sel = np.random.default_rng(seed).choice(
                len(Xp), ica_sample_size, replace=False
            )
            Xp = Xp[sel]
        res = fastica(Xp, n_components=components.shape[0],
                      max_iter=ica_max_iter, tol=ica_tol, seed=seed)
        # fold ICA's internal centering of the (already ~zero-mean) PCA
        # coordinates into the unmixing's effective behavior: the residual
        # mean is ~0, matching the reference which ignores it too.
        return cls(mean, components, res.components, explained_var, eps)

    def save(self, filepath: str):
        with open(filepath, "wb") as f:
            pickle.dump({
                "mean": self.mean,
                "pca_components": self.pca_components,
                "pca_explained_var": self.pca_explained_var,
                "ica_unmixing": self.ica_unmixing,
                "eps": self.eps,
            }, f)

    @classmethod
    def load(cls, filepath: str):
        with open(filepath, "rb") as f:
            d = pickle.load(f)
        return cls(d["mean"], d["pca_components"], d["ica_unmixing"],
                   d["pca_explained_var"], d["eps"])


class PCAZCAWhiteningModel:
    """PCA-whiten then rotate back to the original basis
    (reference pca_zca.py:5-101)."""

    def __init__(self, mean, pca_components, pca_explained_var,
                 eps: float = 1e-8):
        self.mean = np.asarray(mean)
        self.pca_components = np.asarray(pca_components)
        self.pca_explained_var = np.asarray(pca_explained_var)
        self.eps = eps

    def __repr__(self):
        return (
            f"{type(self).__name__}(mean={self.mean.shape}, "
            f"pca={self.pca_components.shape}, eps={self.eps})"
        )

    def transform(self, x) -> np.ndarray:
        x, single = _maybe_single(x)
        scale = 1.0 / np.sqrt(self.pca_explained_var + self.eps)
        zca = (self.pca_components.T * scale[None, :]) @ self.pca_components
        out = ((x - self.mean) @ zca).astype(np.float32)
        return out[0] if single else out

    def transform_jit(self, x):
        """Fused affine device transform (see PCAICAWhiteningModel)."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_jax_cache", None) is None:
            scale = 1.0 / np.sqrt(self.pca_explained_var + self.eps)
            M = (self.pca_components.T * scale[None, :]) @ self.pca_components
            self._jax_cache = (jnp.asarray(M, jnp.float32),
                               jnp.asarray(-(self.mean @ M), jnp.float32))
        M, b = self._jax_cache
        # HIGHEST: the TPU default (bf16 accumulate) drifts ~1e-2 per
        # element, visible as top-k tie flips downstream in scoring
        return jnp.matmul(jnp.asarray(x), M,
                          precision=jax.lax.Precision.HIGHEST) + b

    @classmethod
    def fit(cls, X, pca_dim=256, eps: float = 1e-8):
        mean, components, explained_var = _pca_fit(X, pca_dim)
        return cls(mean, components, explained_var, eps)

    def save(self, filepath: str):
        with open(filepath, "wb") as f:
            pickle.dump({
                "mean": self.mean,
                "pca_components": self.pca_components,
                "pca_explained_var": self.pca_explained_var,
                "eps": self.eps,
            }, f)

    @classmethod
    def load(cls, filepath: str):
        with open(filepath, "rb") as f:
            d = pickle.load(f)
        return cls(d["mean"], d["pca_components"], d["pca_explained_var"],
                   d["eps"])


class ZCAWhiteningModel:
    """Full-rank ZCA: E L^{-1/2} E^T of the covariance (reference zca.py:9-87)."""

    def __init__(self, mean, whitening_matrix, eps: float = 1e-8):
        self.mean = np.asarray(mean)
        self.whitening_matrix = np.asarray(whitening_matrix)
        self.eps = eps

    def transform(self, x) -> np.ndarray:
        x, single = _maybe_single(x)
        out = ((x - self.mean) @ self.whitening_matrix.T).astype(np.float32)
        return out[0] if single else out

    def transform_jit(self, x):
        """Fused affine device transform (see PCAICAWhiteningModel)."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_jax_cache", None) is None:
            M = self.whitening_matrix.T
            self._jax_cache = (jnp.asarray(M, jnp.float32),
                               jnp.asarray(-(self.mean @ M), jnp.float32))
        M, b = self._jax_cache
        # HIGHEST: the TPU default (bf16 accumulate) drifts ~1e-2 per
        # element, visible as top-k tie flips downstream in scoring
        return jnp.matmul(jnp.asarray(x), M,
                          precision=jax.lax.Precision.HIGHEST) + b

    @classmethod
    def fit(cls, X, eps: float = 1e-8):
        X = np.asarray(X, np.float64)
        mean = X.mean(axis=0)
        Xc = X - mean
        cov = np.cov(Xc, rowvar=False)
        eigvals, eigvecs = np.linalg.eigh(cov)
        W = (eigvecs * (1.0 / np.sqrt(eigvals + eps))[None, :]) @ eigvecs.T
        return cls(mean, W, eps)

    def save(self, filepath: str):
        with open(filepath, "wb") as f:
            pickle.dump({
                "mean": self.mean,
                "whitening_matrix": self.whitening_matrix,
                "eps": self.eps,
            }, f)

    @classmethod
    def load(cls, filepath: str):
        with open(filepath, "rb") as f:
            d = pickle.load(f)
        return cls(d["mean"], d["whitening_matrix"], d["eps"])


def _encode(sentences, encode_func: Optional[Callable]):
    first = sentences[0]
    if isinstance(first, str):
        if encode_func is None:
            raise ValueError("text input needs an encode_func")
        return np.asarray(encode_func(sentences))
    return np.asarray(sentences)


def encode_and_whiten_pcaica(sentences, encode_func, whitening_model,
                             is_ica: bool = True) -> np.ndarray:
    """Encode (or pass through embeddings) then whiten
    (reference pca_ica.py:102-123, with the encoder injected explicitly)."""
    return whitening_model.transform(_encode(sentences, encode_func),
                                     is_ica=is_ica)


def encode_and_whiten_pcazca(sentences, encode_func,
                             whitening_model) -> np.ndarray:
    return whitening_model.transform(_encode(sentences, encode_func))


def encode_and_whiten_zca(sentences, encode_func, whitening_model) -> np.ndarray:
    """Fixed version of the reference's broken helper (zca.py:73-87, which
    read undefined module globals)."""
    return whitening_model.transform(_encode(sentences, encode_func))
