"""End-to-end query-encoder fine-tuning: a flax text encoder in front of
the projection head, trained through the differentiable Cobweb rank scores.

The reference fine-tunes its SentenceTransformer base *and* the MLP head
(src/training/cobweb_query_train.py:89-102 QueryEncoderWithProjection;
:163-169 backprops through both).  This module is the TPU-native
equivalent: a compact flax transformer encoder (hash-token embeddings +
self-attention blocks + masked mean-pool) feeding the projection head,
with ONE jitted value_and_grad spanning encoder -> head -> rank_scores,
so encoder weights receive gradients from the retrieval objective.

Zero-egress image: no pretrained HF weights, so the encoder here is small
and trained from scratch in tests/benchmarks; swapping in a larger flax
encoder (same `apply(params, ids, mask) -> (B, H)` contract) changes
nothing else.
"""

from __future__ import annotations

import hashlib
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.core.wrapper import CobwebIndex
from rag_cobweb_tpu.training.query_train import ProjectionHead


def hash_tokenize(texts, vocab_size: int = 8192, max_len: int = 32):
    """Deterministic vocabulary-free tokenizer: whitespace words hashed into
    ``vocab_size`` buckets (id 0 reserved for padding).  Returns
    (ids (B, L) int32, mask (B, L) float32)."""
    B = len(texts)
    ids = np.zeros((B, max_len), np.int32)
    mask = np.zeros((B, max_len), np.float32)
    for b, t in enumerate(texts):
        words = str(t).lower().split()[:max_len]
        for i, w in enumerate(words):
            h = int.from_bytes(
                hashlib.md5(w.encode()).digest()[:4], "little"
            )
            ids[b, i] = 1 + h % (vocab_size - 1)
            mask[b, i] = 1.0
    return ids, mask


class EncoderBlock(nn.Module):
    d_model: int
    n_heads: int = 4

    @nn.compact
    def __call__(self, x, mask):
        attn_mask = mask[:, None, None, :] > 0          # (B, 1, 1, L)
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * self.d_model)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model)(h)
        return x + h


class TinyTextEncoder(nn.Module):
    """Hash-token transformer encoder -> masked mean-pooled embedding.

    Fills the role of the reference's SentenceTransformer base (a
    mean-pooled transformer, cobweb_query_train.py:96-100) at a size that
    trains from scratch on-device."""

    vocab_size: int = 8192
    d_model: int = 128
    n_layers: int = 2
    max_len: int = 32

    @nn.compact
    def __call__(self, ids, mask):
        x = nn.Embed(self.vocab_size, self.d_model)(ids)
        pos = self.param(
            "pos", nn.initializers.normal(0.02), (self.max_len, self.d_model)
        )
        x = x + pos[None, : ids.shape[1]]
        for _ in range(self.n_layers):
            x = EncoderBlock(self.d_model)(x, mask)
        x = nn.LayerNorm()(x)
        denom = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
        return (x * mask[..., None]).sum(1) / denom      # (B, d_model)


class E2ETrainState(NamedTuple):
    enc_params: Any
    head_params: Any
    opt_state: Any
    step: jnp.ndarray


class EndToEndQueryTrainer:
    """Encoder + head trained jointly through the Cobweb rank scores.

    Reference parity: QueryEncoderWithProjection + FixedDocsRankingLoss
    (cobweb_query_train.py:89-126) with the base encoder UNFROZEN — the
    gradient flows rank_scores -> head -> encoder in one jitted step."""

    def __init__(self, db: CobwebIndex, vocab_size: int = 8192,
                 d_model: int = 128, n_layers: int = 2, max_len: int = 32,
                 hidden_dim: int = 512, temperature: float = 1.0,
                 lr: float = 1e-3, seed: int = 0):
        self.db = db
        self.index = db.build_prediction_index()
        self.temperature = temperature
        self.max_len = max_len
        self.vocab_size = vocab_size
        self.encoder = TinyTextEncoder(
            vocab_size=vocab_size, d_model=d_model, n_layers=n_layers,
            max_len=max_len,
        )
        self.head = ProjectionHead(out_dim=db.cfg.dim, hidden_dim=hidden_dim)
        k_enc, k_head = jax.random.split(jax.random.PRNGKey(seed))
        ids0 = jnp.zeros((1, max_len), jnp.int32)
        m0 = jnp.ones((1, max_len), jnp.float32)
        enc_params = self.encoder.init(k_enc, ids0, m0)
        head_params = self.head.init(
            k_head, jnp.zeros((1, d_model), jnp.float32)
        )
        self.tx = optax.adamw(lr)
        both = (enc_params, head_params)
        self.state = E2ETrainState(
            enc_params=enc_params, head_params=head_params,
            opt_state=self.tx.init(both), step=jnp.zeros((), jnp.int32),
        )

    def encode(self, texts) -> np.ndarray:
        ids, mask = hash_tokenize(texts, self.vocab_size, self.max_len)
        emb = self.encoder.apply(self.state.enc_params, jnp.asarray(ids),
                                 jnp.asarray(mask))
        return np.asarray(self.head.apply(self.state.head_params, emb))

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: E2ETrainState, ids, mask, labels):
        def loss_fn(both):
            enc_params, head_params = both
            emb = self.encoder.apply(enc_params, ids, mask)     # (B, H)
            proj = self.head.apply(head_params, emb)            # (B, D)
            logits = index_mod.rank_scores(self.index, proj)
            logits = logits / self.temperature
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

        both = (state.enc_params, state.head_params)
        loss, grads = jax.value_and_grad(loss_fn)(both)
        updates, opt_state = self.tx.update(grads, state.opt_state, both)
        enc_params, head_params = optax.apply_updates(both, updates)
        enc_grad_norm = optax.global_norm(grads[0])
        return (E2ETrainState(enc_params, head_params, opt_state,
                              state.step + 1),
                loss, enc_grad_norm)

    def fit(self, query_texts, gold_rows, epochs: int = 3,
            batch_size: int = 16, seed: int = 0, log_every: int = 0):
        """Returns (per-epoch mean CE losses, per-epoch mean encoder grad
        norms) — the latter proves the base encoder is actually training."""
        ids, mask = hash_tokenize(query_texts, self.vocab_size, self.max_len)
        gold_rows = np.asarray(gold_rows, np.int32)
        rng = np.random.default_rng(seed)
        n = max((len(gold_rows) // batch_size) * batch_size, batch_size)
        losses, grad_norms = [], []
        for epoch in range(1, epochs + 1):
            order = rng.permutation(len(gold_rows))
            order = np.resize(order, n)
            tot, gtot = 0.0, 0.0
            for s in range(0, n, batch_size):
                sel = order[s:s + batch_size]
                self.state, loss, gn = self.train_step(
                    self.state, jnp.asarray(ids[sel]),
                    jnp.asarray(mask[sel]), jnp.asarray(gold_rows[sel]),
                )
                tot += float(loss)
                gtot += float(gn)
            steps = n // batch_size
            losses.append(tot / steps)
            grad_norms.append(gtot / steps)
            if log_every:
                print(f"[epoch {epoch}] CE {losses[-1]:.4f} "
                      f"enc-grad-norm {grad_norms[-1]:.4f}")
        return losses, grad_norms

    def fit_dp(self, query_texts, gold_rows, mesh, axis_name: str = "shard",
               epochs: int = 3, batch_size=None, seed: int = 0,
               log_every: int = 0):
        """Data-parallel ``fit``: token/label batches sharded over the
        mesh, encoder+head params and optimizer state replicated; GSPMD
        inserts the gradient all-reduce (same placement recipe as
        query_train.CobwebQueryTrainer.fit_dp, so the full end-to-end
        encoder gradient flows through the mesh too)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(mesh.shape[axis_name])
        batch_size = batch_size or 4 * n_dev
        if batch_size % n_dev:
            raise ValueError(
                f"batch_size {batch_size} must divide over {n_dev} devices")
        repl = NamedSharding(mesh, P())
        row_sh = NamedSharding(mesh, P(axis_name, None))
        lbl_sh = NamedSharding(mesh, P(axis_name))
        self.state = jax.device_put(self.state, repl)

        ids, mask = hash_tokenize(query_texts, self.vocab_size, self.max_len)
        gold_rows = np.asarray(gold_rows, np.int32)
        rng = np.random.default_rng(seed)
        n = max((len(gold_rows) // batch_size) * batch_size, batch_size)
        losses, grad_norms = [], []
        for epoch in range(1, epochs + 1):
            order = np.resize(rng.permutation(len(gold_rows)), n)
            tot, gtot = 0.0, 0.0
            for s in range(0, n, batch_size):
                sel = order[s:s + batch_size]
                self.state, loss, gn = self.train_step(
                    self.state,
                    jax.device_put(jnp.asarray(ids[sel]), row_sh),
                    jax.device_put(jnp.asarray(mask[sel]), row_sh),
                    jax.device_put(jnp.asarray(gold_rows[sel]), lbl_sh),
                )
                tot += float(loss)
                gtot += float(gn)
            steps = n // batch_size
            losses.append(tot / steps)
            grad_norms.append(gtot / steps)
            if log_every:
                print(f"[dp epoch {epoch}] CE {losses[-1]:.4f} "
                      f"enc-grad-norm {grad_norms[-1]:.4f}")
        return losses, grad_norms

    def evaluate(self, query_texts, gold_rows, k: int = 10) -> dict:
        proj = jnp.asarray(self.encode(query_texts))
        scores = np.asarray(index_mod.rank_scores(self.index, proj))
        order = np.argsort(-scores, axis=1)
        ranks = np.asarray([
            int(np.where(order[i] == gold_rows[i])[0][0]) + 1
            for i in range(len(gold_rows))
        ])
        return {
            f"recall@{k}": float((ranks <= k).mean()),
            "mrr": float((1.0 / ranks).mean()),
            "mean_gold_rank": float(ranks.mean()),
        }

    def save(self, path: str):
        import os
        import pickle

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({
                "enc_params": jax.device_get(self.state.enc_params),
                "head_params": jax.device_get(self.state.head_params),
                "temperature": self.temperature,
            }, f)
