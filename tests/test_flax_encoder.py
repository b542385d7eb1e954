"""HF-on-JAX encoder path (bench/flax_encoder.py).

Hermetic: a randomly initialized flax BERT + the hash tokenizer stands in
for a cached HF checkpoint (zero egress), exactly like the synthetic
datasets stand in for QQP/MS-MARCO.  Covers the reference's encoder stage
(benchmark_utils.py:218-346) running as one jitted device program.
"""

import numpy as np
import pytest

pytest.importorskip("transformers")

from rag_cobweb_tpu.bench.flax_encoder import (  # noqa: E402
    FlaxEncoder, encode_whiten_insert, flax_transformers_available,
    make_random_flax_encoder)


@pytest.fixture(scope="module")
def enc():
    if not flax_transformers_available():
        pytest.skip("flax transformers unavailable")
    return make_random_flax_encoder(hidden_size=32, n_layers=1, n_heads=2,
                                    vocab_size=512, max_length=32,
                                    batch_size=4)


TEXTS = ["the cat sat on the mat", "dogs chase cats",
         "quantum computing uses qubits", "the cat sat on a mat",
         "stock markets fell sharply today"]


def test_encode_shape_and_determinism(enc):
    a = enc(TEXTS)
    b = enc(TEXTS)
    assert a.shape == (5, 32) and a.dtype == np.float32
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_batch_padding_invariance(enc):
    """Padding a short batch up to batch_size must not change embeddings,
    and multi-batch encode must equal single-batch (same length bucket)."""
    full = enc(TEXTS)              # 5 texts, batch_size=4 -> two batches
    singles = np.concatenate([enc([t]) for t in TEXTS])
    np.testing.assert_allclose(full, singles, rtol=1e-4, atol=1e-5)


def test_mean_pool_family(enc):
    m = FlaxEncoder(enc.model, None, family="mean", max_length=32,
                    batch_size=4, vocab_size=512)
    out = m(TEXTS[:3])
    assert out.shape == (3, 32)
    assert not np.allclose(out, enc(TEXTS[:3]))   # CLS != mean pooling


def test_whitening_fuses_into_forward(enc):
    from rag_cobweb_tpu.whitening.models import ZCAWhiteningModel
    rng = np.random.default_rng(0)
    fit = rng.standard_normal((64, 32)).astype(np.float32)
    wm = ZCAWhiteningModel.fit(fit)
    wenc = FlaxEncoder(enc.model, None, family="bert", max_length=32,
                       batch_size=4, vocab_size=512, whitening=wm)
    raw = enc(TEXTS)
    np.testing.assert_allclose(wenc(TEXTS), np.asarray(wm.transform(raw)),
                               rtol=2e-2, atol=2e-3)


def test_encode_whiten_insert_pipeline(enc):
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex
    db = CobwebIndex(config=TreeConfig(dim=32), encode_func=enc)
    encode_whiten_insert(enc, db, TEXTS)
    assert len(db.sentences) == 5
    got = db.predict(TEXTS[0], k=1)
    assert got[0] == TEXTS[0]
