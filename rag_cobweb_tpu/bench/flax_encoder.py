"""HF-on-JAX encoder path: flax BERT-family forward passes on the TPU.

Covers the reference's encoder stage (benchmark_utils.py:218-346 — the
per-family tokenize/pool conventions) with the forward pass as ONE jitted
flax apply on the accelerator, so encode -> whiten -> insert runs as a
device pipeline: the torch path in ``encoders.py`` round-trips every
batch through host CPU, this one only touches host for tokenization.

Zero-egress gating follows the rest of the bench layer: loading by model
NAME requires locally cached HF weights (``make_flax_hf_encoder``);
tests and synthetic runs construct a randomly initialized model from a
config (``make_random_flax_encoder``) with the vocabulary-free hash
tokenizer from ``training.text_encoder``.

Shape discipline for the remote compile service (one program per distinct
shape): token lengths round up to ``_LEN_BUCKET`` multiples and batches
pad to the fixed ``batch_size``, so a whole corpus encodes with a handful
of compiled programs regardless of text lengths.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rag_cobweb_tpu.bench.encoders import infer_model_type

_LEN_BUCKET = 32


def flax_transformers_available() -> bool:
    try:
        from transformers import FlaxAutoModel  # noqa: F401
        return True
    except Exception:
        return False


class FlaxEncoder:
    """Jitted flax encoder with the reference's per-family pooling.

    ``family``: "bert" pools the CLS token (reference benchmark_utils
    :266-279); everything else masked-mean-pools the last hidden state
    (:281-309; T5 additionally prefixes "Summarize :", :311).

    ``whitening``: optional fitted whitening model (PCAICA / ZCA / ...);
    its ``transform_jit`` fuses into the SAME jitted program as the
    encoder forward, so pooled embeddings never leave the device between
    encode and whiten.
    """

    def __init__(self, model, tokenizer=None, family: str = "bert",
                 max_length: int = 128, batch_size: int = 256,
                 vocab_size: Optional[int] = None, whitening=None):
        self.model = model
        self.tokenizer = tokenizer
        self.family = family
        self.max_length = max_length
        self.batch_size = batch_size
        self.whitening = whitening
        if vocab_size is None and hasattr(model, "config"):
            vocab_size = int(model.config.vocab_size)
        self.vocab_size = vocab_size or 8192

        def fwd(params, ids, mask):
            out = model.module.apply(
                {"params": params}, input_ids=ids, attention_mask=mask,
                deterministic=True)
            h = out.last_hidden_state
            if self.family == "bert":
                emb = h[:, 0]
            else:
                m = mask[..., None].astype(h.dtype)
                emb = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            emb = emb.astype(jnp.float32)
            if self.whitening is not None:
                emb = self.whitening.transform_jit(emb)
            return emb

        self._fwd = jax.jit(fwd)

    # ---------------------------------------------------------------- #

    def _tokenize(self, texts):
        """(ids, mask) int32/float32 numpy, length-bucketed."""
        texts = [str(t) for t in texts]
        if self.family == "t5":
            texts = ["Summarize :" + t for t in texts]
        if self.tokenizer is not None:
            enc = self.tokenizer(texts, padding=True, truncation=True,
                                 max_length=self.max_length,
                                 return_tensors="np")
            ids = enc["input_ids"].astype(np.int32)
            mask = enc["attention_mask"].astype(np.float32)
        else:
            from rag_cobweb_tpu.training.text_encoder import hash_tokenize
            ids, mask = hash_tokenize(texts, vocab_size=self.vocab_size,
                                      max_len=self.max_length)
        L = ids.shape[1]
        Lb = min(self.max_length, -(-max(L, 1) // _LEN_BUCKET) * _LEN_BUCKET)
        if L < Lb:
            pad = ((0, 0), (0, Lb - L))
            ids = np.pad(ids, pad)
            mask = np.pad(mask, pad)
        else:
            ids, mask = ids[:, :Lb], mask[:, :Lb]
        return ids, mask

    def encode_device(self, texts) -> jnp.ndarray:
        """(B_texts, H or whitened D) embeddings, left ON DEVICE.  Batches
        are padded to ``batch_size`` so every call reuses the same compiled
        program per length bucket; dispatches stay async until the caller
        consumes the result."""
        params = self.model.params
        outs = []
        bs = self.batch_size
        for s in range(0, len(texts), bs):
            ids, mask = self._tokenize(texts[s:s + bs])
            n = ids.shape[0]
            if n < bs:
                ids = np.pad(ids, ((0, bs - n), (0, 0)))
                mask = np.pad(mask, ((0, bs - n), (0, 0)))
            outs.append(self._fwd(params, jnp.asarray(ids),
                                  jnp.asarray(mask))[:n])
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def __call__(self, texts) -> np.ndarray:
        """encoders.py ``encode_func`` contract: numpy float32 out."""
        return np.asarray(jax.device_get(self.encode_device(texts)),
                          np.float32)


def make_flax_hf_encoder(model_name: str, max_length: int = 128,
                         batch_size: int = 256, whitening=None,
                         dtype=None) -> FlaxEncoder:
    """Load a locally cached HF checkpoint as a flax model (zero egress:
    a name that is not in the local cache raises — callers gate on
    ``flax_transformers_available()`` + cache presence, mirroring the
    torch path's gating)."""
    from transformers import AutoTokenizer, FlaxAutoModel

    family = infer_model_type(model_name)
    kw = {"dtype": dtype} if dtype is not None else {}
    if family == "t5":
        from transformers import FlaxT5EncoderModel
        model = FlaxT5EncoderModel.from_pretrained(model_name, **kw)
    else:
        model = FlaxAutoModel.from_pretrained(model_name, **kw)
    tok = AutoTokenizer.from_pretrained(model_name)
    if family == "gpt2" and tok.pad_token is None:
        tok.pad_token = tok.eos_token
    return FlaxEncoder(model, tok, family=family, max_length=max_length,
                       batch_size=batch_size, whitening=whitening)


def make_random_flax_encoder(hidden_size: int = 64, n_layers: int = 2,
                             n_heads: int = 2, vocab_size: int = 4096,
                             max_length: int = 64, batch_size: int = 64,
                             family: str = "bert", seed: int = 0,
                             whitening=None) -> FlaxEncoder:
    """Randomly initialized flax BERT + hash tokenizer: the hermetic stand-
    in this image can actually run (same role as the synthetic datasets)."""
    from transformers import BertConfig, FlaxBertModel

    cfg = BertConfig(vocab_size=vocab_size, hidden_size=hidden_size,
                     num_hidden_layers=n_layers,
                     num_attention_heads=n_heads,
                     intermediate_size=4 * hidden_size,
                     max_position_embeddings=max(max_length, 64))
    model = FlaxBertModel(cfg, seed=seed)
    return FlaxEncoder(model, None, family=family, max_length=max_length,
                       batch_size=batch_size, vocab_size=vocab_size,
                       whitening=whitening)


def encode_whiten_insert(encoder: FlaxEncoder, db, texts,
                         batch_size: Optional[int] = None) -> np.ndarray:
    """The one-device-pipeline ingest: encode (+ fused whiten) on device,
    insert the device batch into ``db`` (CobwebIndex).  Returns the leaf /
    sentence ids array from ``add_sentences``."""
    embs = encoder.encode_device(texts)
    return db.add_sentences(list(texts), np.asarray(embs))
