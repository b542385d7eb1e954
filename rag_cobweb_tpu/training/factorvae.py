"""FactorVAE disentanglement trainer (flax/optax).

TPU-native rebuild of the reference trainer (src/training/factorvae_train.py):
MLP encoder (hidden 1024 -> 512, heads mu/logvar, z_dim=392 default,
:57-70), mirrored decoder (:74-86), TC discriminator (256-256-1, :92-104),
dimension-wise batch permutation (:40-52), adversarial objective
``recon_mse + kl + gamma * tc`` with gamma=10 and Adam lr=1e-4 (:253-296),
per-epoch latent-correlation diagnostics (:298-315) and per-epoch
checkpoints (:317-326).

Redesigned for XLA: the discriminator step and the VAE step fuse into ONE
jitted ``train_step`` (two optax updates, stop_gradient where the reference
detaches), and the whole epoch runs as a scan-free python loop over
device-resident batches — no DataLoader workers, no host sync per batch.
"""

from __future__ import annotations

import os
import pickle
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class MLPEncoder(nn.Module):
    z_dim: int = 392
    hidden: int = 1024

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hidden)(x))
        h = nn.relu(nn.Dense(self.hidden // 2)(h))
        return nn.Dense(self.z_dim)(h), nn.Dense(self.z_dim)(h)


class MLPDecoder(nn.Module):
    output_dim: int
    hidden: int = 1024

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.hidden // 2)(z))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(self.output_dim)(h)


class Discriminator(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.hidden)(z))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(1)(h)[..., 0]


def permute_dims(key, z):
    """Independently permute each latent dimension across the batch
    (reference permute_dims_across_batch :40-52), vectorized: one argsort of
    uniform noise per dimension instead of a Python loop over dims."""
    B, D = z.shape
    noise = jax.random.uniform(key, (D, B))
    perm = jnp.argsort(noise, axis=1)            # (D, B) independent perms
    return jnp.take_along_axis(z.T, perm, axis=1).T


def reparameterize(key, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(key, mu.shape)


def kl_divergence(mu, logvar):
    return -0.5 * jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar),
                          axis=1)


class FactorVAEState(NamedTuple):
    enc_params: Any
    dec_params: Any
    disc_params: Any
    opt_vae: Any
    opt_disc: Any
    step: jnp.ndarray


class FactorVAE:
    """Host handle bundling the three modules, their params, and the jitted
    fused train step."""

    def __init__(self, input_dim: int, z_dim: int = 392, gamma: float = 10.0,
                 lr: float = 1e-4, hidden: int = 1024, seed: int = 42):
        self.input_dim = input_dim
        self.z_dim = z_dim
        self.gamma = gamma
        self.encoder = MLPEncoder(z_dim=z_dim, hidden=hidden)
        self.decoder = MLPDecoder(output_dim=input_dim, hidden=hidden)
        self.disc = Discriminator()
        self.tx_vae = optax.adam(lr)
        self.tx_disc = optax.adam(lr)

        key = jax.random.PRNGKey(seed)
        k_e, k_d, k_c, self._key = jax.random.split(key, 4)
        x0 = jnp.zeros((1, input_dim))
        z0 = jnp.zeros((1, z_dim))
        enc_p = self.encoder.init(k_e, x0)
        dec_p = self.decoder.init(k_d, z0)
        disc_p = self.disc.init(k_c, z0)
        self.state = FactorVAEState(
            enc_params=enc_p, dec_params=dec_p, disc_params=disc_p,
            opt_vae=self.tx_vae.init((enc_p, dec_p)),
            opt_disc=self.tx_disc.init(disc_p),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------ #
    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: FactorVAEState, batch: jnp.ndarray,
                   key: jax.Array):
        """One fused FactorVAE step: discriminator BCE update on
        (z.detach, permuted z.detach), then VAE update with the TC estimate
        (reference :259-289)."""
        k_z, k_perm1, k_perm2 = jax.random.split(key, 3)

        def encode_decode(enc_p, dec_p):
            mu, logvar = self.encoder.apply(enc_p, batch)
            z = reparameterize(k_z, mu, logvar)
            recon = self.decoder.apply(dec_p, z)
            return mu, logvar, z, recon

        # ---- discriminator update on detached z ----
        mu, logvar, z, _ = encode_decode(state.enc_params, state.dec_params)
        z_det = jax.lax.stop_gradient(z)
        z_perm = permute_dims(k_perm1, z_det)

        def disc_loss_fn(disc_p):
            real = self.disc.apply(disc_p, z_det)
            perm = self.disc.apply(disc_p, z_perm)
            return 0.5 * (
                optax.sigmoid_binary_cross_entropy(
                    real, jnp.ones_like(real)).mean()
                + optax.sigmoid_binary_cross_entropy(
                    perm, jnp.zeros_like(perm)).mean()
            )

        disc_loss, disc_grads = jax.value_and_grad(disc_loss_fn)(
            state.disc_params
        )
        disc_updates, opt_disc = self.tx_disc.update(
            disc_grads, state.opt_disc, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, disc_updates)

        # ---- VAE update (with updated discriminator, reference order) ----
        def vae_loss_fn(params):
            enc_p, dec_p = params
            mu, logvar, z, recon = encode_decode(enc_p, dec_p)
            recon_loss = jnp.mean(jnp.square(recon - batch))
            kl = kl_divergence(mu, logvar).mean()
            real_logits = self.disc.apply(disc_params, z)
            perm_logits = self.disc.apply(
                disc_params, permute_dims(k_perm2, z)
            )
            tc = (real_logits - perm_logits).mean()
            loss = recon_loss + kl + self.gamma * tc
            return loss, {"recon_mse": recon_loss, "kl": kl, "tc": tc}

        (vae_loss, metrics), vae_grads = jax.value_and_grad(
            vae_loss_fn, has_aux=True
        )((state.enc_params, state.dec_params))
        vae_updates, opt_vae = self.tx_vae.update(
            vae_grads, state.opt_vae, (state.enc_params, state.dec_params)
        )
        enc_params, dec_params = optax.apply_updates(
            (state.enc_params, state.dec_params), vae_updates
        )

        metrics = dict(metrics, disc=disc_loss, vae=vae_loss)
        return FactorVAEState(
            enc_params=enc_params, dec_params=dec_params,
            disc_params=disc_params, opt_vae=opt_vae, opt_disc=opt_disc,
            step=state.step + 1,
        ), metrics

    # ------------------------------------------------------------------ #
    def encode(self, x, sample: bool = False, key=None):
        mu, logvar = self.encoder.apply(
            self.state.enc_params, jnp.asarray(np.asarray(x, np.float32))
        )
        if sample:
            key = key if key is not None else jax.random.PRNGKey(0)
            return reparameterize(key, mu, logvar)
        return mu

    def fit(self, embeddings: np.ndarray, epochs: int = 20,
            batch_size: int = 256, log_every: int = 0,
            save_dir: str | None = None, seed: int = 42,
            diag_samples: int = 4096):
        """Full training loop with per-epoch correlation diagnostics and
        checkpoints (reference :253-328).  Returns the diagnostics history."""
        embeddings = np.asarray(embeddings, np.float32)
        n = (len(embeddings) // batch_size) * batch_size  # drop_last=True
        rng = np.random.default_rng(seed)
        history = []
        for epoch in range(1, epochs + 1):
            order = rng.permutation(len(embeddings))[:n]
            for s in range(0, n, batch_size):
                batch = jnp.asarray(embeddings[order[s:s + batch_size]])
                self._key, sub = jax.random.split(self._key)
                self.state, metrics = self.train_step(self.state, batch, sub)
            z = np.asarray(self.encode(embeddings[:diag_samples]))
            diag = latent_correlation_diagnostics(z)
            diag["epoch"] = epoch
            diag.update({k: float(v) for k, v in metrics.items()})
            history.append(diag)
            if log_every:
                print(f"[epoch {epoch}] mean_abs_offdiag_corr="
                      f"{diag['mean_abs_offdiag']:.6f} "
                      f"recon={diag['recon_mse']:.5f}")
            if save_dir:
                self.save(os.path.join(save_dir,
                                       f"factorvae_epoch{epoch}.pkl"))
        return history

    # ------------------------------------------------------------------ #
    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = {
            "input_dim": self.input_dim,
            "z_dim": self.z_dim,
            "gamma": self.gamma,
            "hidden": self.encoder.hidden,
            "params": jax.device_get(
                (self.state.enc_params, self.state.dec_params,
                 self.state.disc_params)
            ),
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)

    @classmethod
    def load(cls, path: str, lr: float = 1e-4):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        obj = cls(blob["input_dim"], z_dim=blob["z_dim"],
                  gamma=blob["gamma"], hidden=blob.get("hidden", 1024),
                  lr=lr)
        enc_p, dec_p, disc_p = jax.tree.map(jnp.asarray, blob["params"])
        obj.state = obj.state._replace(
            enc_params=enc_p, dec_params=dec_p, disc_params=disc_p
        )
        return obj


def latent_correlation_diagnostics(z: np.ndarray, top_k: int = 10) -> dict:
    """Mean |off-diagonal| latent correlation + top correlated pairs
    (reference latent_correlation_diagnostics :173-217)."""
    z = np.asarray(z)
    c = np.corrcoef(z, rowvar=False)
    c = np.nan_to_num(c)
    d = c.shape[0]
    off = np.abs(c - np.diag(np.diag(c)))
    iu = np.triu_indices(d, k=1)
    vals = off[iu]
    order = np.argsort(vals)[::-1][:top_k]
    pairs = [(int(iu[0][i]), int(iu[1][i]), float(c[iu[0][i], iu[1][i]]))
             for i in order]
    return {
        "mean_abs_offdiag": float(vals.mean()) if len(vals) else 0.0,
        "top_pairs": pairs,
    }
