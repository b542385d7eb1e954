"""At-rest bf16 stats compression (VERDICT r4 #1).

The 8M single-chip story: means/m2s are ~92% of the forest state bytes,
so casting them to bf16 AFTER the build halves the resident state — the
headroom the 8M fused-index build needs.  Compression is at-rest by
design; ``test_bf16_welford_accumulation_breaks`` is the measured
demonstration (required by the verdict) of why bf16 STORAGE during
Welford accumulation is not an option: increments underflow the bf16
rounding threshold once counts grow, freezing the statistics.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import ml_dtypes

from rag_cobweb_tpu.bench.datasets import synthetic_retrieval
from rag_cobweb_tpu.bench.metrics import retrieval_metrics
from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.wrapper import CobwebIndex


@pytest.fixture(scope="module")
def built():
    data = synthetic_retrieval(2048, 128, 64, seed=3)
    db = CobwebIndex(config=TreeConfig(dim=64), capacity=4 * 2048 + 16,
                     n_subtrees=4, seed=0)
    db.add_sentences([None] * 2048, data.corpus_embs)
    return db, data


def _recall(db, data, k=10):
    ids = np.asarray(db.query_ids(data.query_embs, k, rerank=256))
    return retrieval_metrics(ids, data.target_ids, k)[f"recall@{k}"], ids


def test_compress_after_build_preserves_serving(built):
    db, data = built
    r_f32, ids_f32 = _recall(db, data)

    db.compress_stats()
    assert db.forest.state.means.dtype == jnp.bfloat16
    assert db.forest.state.m2s.dtype == jnp.bfloat16
    r_bf16, ids_bf16 = _recall(db, data)

    # the exact re-rank store is untouched, so final rankings can move
    # only where bf16 pool membership shifts a near-tie
    assert r_bf16 >= r_f32 - 0.01
    overlap = np.mean([
        len(set(a) & set(b)) / len(a)
        for a, b in zip(ids_f32.tolist(), ids_bf16.tolist())
    ])
    assert overlap >= 0.9


def test_add_into_compressed_state_still_works(built):
    db, data = built
    db.compress_stats()
    n0 = len(db.sentences)
    extra = data.corpus_embs[:64] + 0.05
    leaves = db.add_sentences([None] * 64, extra.astype(np.float32))
    assert (np.asarray(leaves) >= 0).all()
    ids = np.asarray(db.query_ids(extra[:8], 5))
    # the fresh rows are retrievable (pending closed form or rebuild)
    assert (ids >= n0).any()


def test_offload_state_serving_and_readd(built):
    db, data = built
    db.query_ids(data.query_embs[:8], 5)       # serving index exists
    db.offload_state()
    assert isinstance(db.forest.state.counts, np.ndarray)
    r, _ = _recall(db, data)
    assert r > 0.5
    # adds after offload re-upload transparently
    leaves = db.add_sentences([None] * 8, data.corpus_embs[:8])
    assert (np.asarray(leaves) >= 0).all()


def test_bf16_emb_store_recall(built):
    db, data = built
    r_f32, _ = _recall(db, data)
    db.emb_store_dtype = "bfloat16"
    db._emb_dev_cache = None
    db._emb_dev_n = -1
    r_bf16, _ = _recall(db, data)
    assert db._emb_device().dtype == jnp.bfloat16
    assert r_bf16 >= r_f32 - 0.02


def test_bf16_welford_accumulation_breaks():
    """The measured demonstration (VERDICT r4 #1): Welford with bf16
    STORAGE freezes once per-step increments drop below the rounding
    threshold — at N=4096 unit-variance draws the bf16-accumulated m2
    underestimates the true second moment by >20% (the mean freezes too),
    while one at-rest rounding of the f32 result is exact to ~2^-9.
    This is why compression happens after the build, not during."""
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(4096,)).astype(np.float32)

    def welford(store_dtype):
        mean = np.array(0.0, store_dtype)
        m2 = np.array(0.0, store_dtype)
        for i, x in enumerate(xs, 1):
            # f32 math, storage-rounded write-back (what bf16 state
            # arrays would do on every insert)
            d = np.float32(x) - np.float32(mean)
            mean = np.array(np.float32(mean) + d / np.float32(i),
                            store_dtype)
            d2 = np.float32(x) - np.float32(mean)
            m2 = np.array(np.float32(m2) + d * d2, store_dtype)
        return float(mean), float(m2)

    _, m2_f32 = welford(np.float32)
    _, m2_bf16 = welford(ml_dtypes.bfloat16)
    true_m2 = float(np.sum(np.square(xs - xs.mean(), dtype=np.float64)))

    assert abs(m2_f32 - true_m2) / true_m2 < 0.01
    # the broken accumulation: m2 saturates around count ~512
    assert m2_bf16 < 0.8 * true_m2
    # ...while AT-REST rounding of the converged f32 value is benign
    at_rest = float(np.array(m2_f32, ml_dtypes.bfloat16))
    assert abs(at_rest - true_m2) / true_m2 < 0.01
