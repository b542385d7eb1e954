"""VICReg embedding whitening/projection trainer (flax/optax).

The reference *intended* a VICReg whitening stage —
scripts/whitening/whitening_vicreg.sh targets src/whitening/
whitening_vicreg.py, which does not exist (SURVEY.md reference-quirks) —
and BASELINE.json config #4 names "Beta-VAE / VICReg latent-space embeddings
feeding the Cobweb tree".  This is the working implementation: a projector
trained with the VICReg objective (Bardes, Ponce & LeCun 2022)

    L = lambda * invariance(z, z') + mu * variance(z) + nu * covariance(z)

on embedding pairs (two noisy views, or paraphrase pairs such as STS/QQP
duplicates).  The covariance term drives exactly the decorrelation that
PCA+ICA provides statically — this is the *learned* member of the whitening
family, and its projector composes into the encode path as one matmul chain.
"""

from __future__ import annotations

import os
import pickle
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class Projector(nn.Module):
    out_dim: int
    hidden: int = 1024

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hidden)(x))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(self.out_dim)(h)


def vicreg_loss(za, zb, sim_coeff=25.0, std_coeff=25.0, cov_coeff=1.0,
                gamma=1.0, eps=1e-4):
    """The three VICReg terms for a pair of projected views (B, D)."""
    inv = jnp.mean(jnp.square(za - zb))

    def var_term(z):
        std = jnp.sqrt(jnp.var(z, axis=0) + eps)
        return jnp.mean(jnp.maximum(gamma - std, 0.0))

    def cov_term(z):
        zc = z - z.mean(axis=0)
        n, d = z.shape
        cov = (zc.T @ zc) / (n - 1)
        off = cov - jnp.diag(jnp.diag(cov))
        return jnp.sum(jnp.square(off)) / d

    var = 0.5 * (var_term(za) + var_term(zb))
    cov = 0.5 * (cov_term(za) + cov_term(zb))
    return (sim_coeff * inv + std_coeff * var + cov_coeff * cov,
            {"invariance": inv, "variance": var, "covariance": cov})


class VICRegState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class VICRegWhitener:
    """Trainable whitening projector with the same transform surface as the
    static whitening models (``transform`` single/batch, ``save``/``load``)."""

    def __init__(self, in_dim: int, out_dim: int = 128, hidden: int = 1024,
                 lr: float = 1e-3, sim_coeff: float = 25.0,
                 std_coeff: float = 25.0, cov_coeff: float = 1.0,
                 seed: int = 0):
        self.in_dim, self.out_dim, self.hidden = in_dim, out_dim, hidden
        self.coeffs = (sim_coeff, std_coeff, cov_coeff)
        self.net = Projector(out_dim=out_dim, hidden=hidden)
        self.tx = optax.adam(lr)
        params = self.net.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, in_dim)))
        self.state = VICRegState(params, self.tx.init(params),
                                 jnp.zeros((), jnp.int32))

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: VICRegState, xa: jnp.ndarray,
                   xb: jnp.ndarray):
        sim, std, cov = self.coeffs

        def loss_fn(params):
            za = self.net.apply(params, xa)
            zb = self.net.apply(params, xb)
            return vicreg_loss(za, zb, sim, std, cov)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return (VICRegState(params, opt_state, state.step + 1),
                dict(metrics, loss=loss))

    def fit(self, views_a: np.ndarray, views_b: Optional[np.ndarray] = None,
            epochs: int = 10, batch_size: int = 256, noise: float = 0.1,
            seed: int = 0, log_every: int = 0):
        """Train on paired views.  Without explicit pairs, the second view is
        a noisy copy (embedding-space augmentation)."""
        views_a = np.asarray(views_a, np.float32)
        rng = np.random.default_rng(seed)
        if views_b is None:
            views_b = views_a + noise * views_a.std(0) * rng.normal(
                size=views_a.shape
            ).astype(np.float32)
        views_b = np.asarray(views_b, np.float32)
        n = (len(views_a) // batch_size) * batch_size
        history = []
        for epoch in range(1, epochs + 1):
            order = rng.permutation(len(views_a))[:n]
            for s in range(0, n, batch_size):
                sel = order[s:s + batch_size]
                self.state, m = self.train_step(
                    self.state, jnp.asarray(views_a[sel]),
                    jnp.asarray(views_b[sel]),
                )
            history.append({k: float(v) for k, v in m.items()})
            if log_every:
                print(f"[vicreg epoch {epoch}] " + " ".join(
                    f"{k}={v:.4f}" for k, v in history[-1].items()
                ))
        return history

    def transform(self, x) -> np.ndarray:
        x = np.asarray(x, np.float32)
        single = x.ndim == 1
        out = np.asarray(self.net.apply(
            self.state.params, jnp.asarray(np.atleast_2d(x))
        ))
        return out[0] if single else out

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({
                "in_dim": self.in_dim, "out_dim": self.out_dim,
                "hidden": self.hidden, "coeffs": self.coeffs,
                "params": jax.device_get(self.state.params),
            }, f)

    @classmethod
    def load(cls, path: str, lr: float = 1e-3):
        with open(path, "rb") as f:
            d = pickle.load(f)
        obj = cls(d["in_dim"], d["out_dim"], d["hidden"], lr=lr,
                  sim_coeff=d["coeffs"][0], std_coeff=d["coeffs"][1],
                  cov_coeff=d["coeffs"][2])
        obj.state = obj.state._replace(
            params=jax.tree.map(jnp.asarray, d["params"])
        )
        return obj
