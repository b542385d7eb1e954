"""Proximity backstop pool (VERDICT r3 #4): union_candidates dedup
semantics, backstop_topk masking, and the wrapper integration — the union
pool must never emit duplicate ids and must recover golds the path-score
pool misses.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.wrapper import CobwebIndex
from rag_cobweb_tpu.whitening import PCAICAWhiteningModel


def test_union_candidates_dedups_and_keeps_both_pools():
    cand_a = jnp.asarray([[1, 2, 3], [7, 8, 9]])
    cs_a = jnp.asarray([[3.0, 2.0, 1.0], [3.0, 2.0, 1.0]])
    cand_b = jnp.asarray([[2, 5, 3], [9, 9, 4]])
    cs_b = jnp.asarray([[9.0, 8.0, 7.0], [9.0, -jnp.inf, 7.0]])
    cand, cs = index_mod.union_candidates(cand_a, cs_a, cand_b, cs_b)
    for row, want in enumerate([{1, 2, 3, 5}, {7, 8, 9, 4}]):
        live = [int(c) for c, s in zip(cand[row], cs[row])
                if np.isfinite(float(s))]
        assert sorted(live) == sorted(want), (row, live)
        assert len(live) == len(set(live))  # no duplicate live ids


def test_union_candidates_invalid_never_collides():
    # an -inf entry whose id matches a live id must not kill the live one
    cand_a = jnp.asarray([[4, 6]])
    cs_a = jnp.asarray([[-jnp.inf, 1.0]])
    cand_b = jnp.asarray([[4, 5]])
    cs_b = jnp.asarray([[2.0, 3.0]])
    cand, cs = index_mod.union_candidates(cand_a, cs_a, cand_b, cs_b)
    live = {int(c) for c, s in zip(cand[0], cs[0]) if np.isfinite(float(s))}
    assert live == {4, 5, 6}


def test_backstop_topk_masks_and_ranks_by_l2():
    rng = np.random.default_rng(0)
    W = rng.normal(size=(64, 8)).astype(np.float32)
    q = W[:4] + 0.01 * rng.normal(size=(4, 8)).astype(np.float32)
    half = 0.5 * (W * W).sum(1)
    top, ids = index_mod.backstop_topk(
        jnp.asarray(W, jnp.bfloat16), jnp.asarray(half), jnp.asarray(q),
        5, jnp.asarray(32, jnp.int32), approx=False)
    ids = np.asarray(ids)
    assert (ids < 32).all()          # masked rows never surface
    for b in range(4):
        assert ids[b, 0] == b        # nearest row wins


@pytest.fixture(scope="module")
def raw_db():
    rng = np.random.default_rng(3)
    centers = rng.normal(scale=3.0, size=(12, 32))
    docs = np.concatenate(
        [c + 0.3 * rng.normal(size=(50, 32)) for c in centers]
    ).astype(np.float32)
    wh = PCAICAWhiteningModel.fit(docs, pca_dim=16, ica_max_iter=200,
                                  seed=0)
    db = CobwebIndex(corpus=None, corpus_embeddings=docs,
                     config=TreeConfig(dim=wh.dim_out), whitener=wh)
    return db, docs


def test_wrapper_backstop_recovers_pool_misses(raw_db):
    """With a tiny fused pool the path score alone misses self-retrieval
    for some rows; the backstop union must recover them."""
    db, docs = raw_db
    db.blocked_threshold = 64       # force the engine (blocked/fused) path
    q = docs[::10][:32]
    gold = np.arange(len(docs))[::10][:32]

    db.backstop_pool = 0
    ids_off = np.asarray(db.query_ids(q, 10, rerank=16))
    db.backstop_pool = 64
    ids_on = np.asarray(db.query_ids(q, 10, rerank=16))
    db.backstop_pool = "auto"       # restore

    def recall(ids):
        return np.mean([g in row for g, row in zip(gold, ids)])

    assert recall(ids_on) >= recall(ids_off)
    assert recall(ids_on) == 1.0, recall(ids_on)
    for row in ids_on:              # union pool never emits duplicates
        live = [i for i in row if i >= 0]
        assert len(live) == len(set(live))


def test_wrapper_backstop_auto_gates_on_scale(raw_db):
    db, docs = raw_db
    assert db.backstop_pool == "auto"
    # below backstop_threshold auto resolves to 0
    assert db._backstop_k(64, len(docs)) == 0
    db.backstop_threshold = 100
    try:
        assert db._backstop_k(64, len(docs)) == 64
    finally:
        db.backstop_threshold = type(db).backstop_threshold


def test_backstop_without_whitener_uses_store():
    """Non-whitener mode: the backstop keys directly on the f32 re-rank
    store (tree space == store space), no second copy."""
    rng = np.random.default_rng(7)
    docs = rng.normal(size=(300, 16)).astype(np.float32)
    db = CobwebIndex(corpus=None, corpus_embeddings=docs,
                     config=TreeConfig(dim=16))
    db.blocked_threshold = 64
    db.backstop_pool = 32
    wemb, half = db._wemb_device()
    assert wemb is db._emb_device()          # shared buffer, no copy
    ids = np.asarray(db.query_ids(docs[:16], 5, rerank=8))
    for b in range(16):
        assert b in ids[b]
        live = [i for i in ids[b] if i >= 0]
        assert len(live) == len(set(live))
