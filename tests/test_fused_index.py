"""Fused flat scoring (core/index.FusedIndex): the W contraction
pre-associated into per-sentence coefficients so the corpus sweep is ONE
[q, q^2] @ (2D, S) GEMM.  Scores must equal the gather path's (same math,
re-associated), and the wrapper must serve it by default above
``blocked_threshold``."""

import numpy as np
import jax.numpy as jnp
import pytest

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.core.wrapper import CobwebIndex


def clustered(rng, n_clusters=6, per=15, dim=16, spread=0.25):
    centers = rng.normal(scale=3.0, size=(n_clusters, dim))
    xs = np.concatenate(
        [c + spread * rng.normal(size=(per, dim)) for c in centers]
    ).astype(np.float32)
    return xs[rng.permutation(len(xs))]


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(0)
    xs = clustered(rng)
    tree = CobwebTree(TreeConfig(dim=16), capacity=1024, seed=0)
    leaves = tree.fit(xs)
    idx = index_mod.build_index(tree, leaves)
    return tree, idx, xs, leaves


def test_fused_scores_match_rank_scores(built):
    tree, idx, xs, leaves = built
    fidx = index_mod.build_fused_index(idx)
    q = jnp.asarray(xs[:5])
    want = np.asarray(index_mod.rank_scores(idx, q))       # (B, S)
    got = np.asarray(index_mod.fused_scores(fidx, q))      # (B, Sp)
    S = want.shape[1]
    valid = np.asarray(fidx.valid)
    assert valid[:S].all() and not valid[S:].any()
    np.testing.assert_allclose(got[:, :S], want, rtol=1e-3, atol=1e-2)
    assert np.all(got[:, S:] == -np.inf)


def test_grouped_pool_topk_membership():
    """The strided two-level pool (index.grouped_pool_topk): near-exact
    top-k membership on random scores, and NO loss on adjacent-id
    near-duplicate clusters (the case contiguous grouping would break —
    dup clusters sit on adjacent sentence ids)."""
    rng = np.random.default_rng(0)
    B, Sp, k = 4, 1 << 19, 512
    scores = rng.normal(size=(B, Sp)).astype(np.float32)
    # plant an adjacent cluster of 64 dominant ids per row
    j0 = 12345
    scores[:, j0:j0 + 64] += 20.0
    top, ids = index_mod.grouped_pool_topk(jnp.asarray(scores), k)
    ids = np.asarray(ids)
    exact = np.argsort(-scores, axis=1)[:, :k]
    for b in range(B):
        got = set(ids[b].tolist())
        # every planted adjacent id is in the pool (strided groups)
        assert all(j in got for j in range(j0, j0 + 64))
        # overall membership vs exact top-k
        overlap = len(got & set(exact[b].tolist())) / k
        assert overlap >= 0.99
        # returned scores are the true scores of the returned ids
        np.testing.assert_allclose(np.asarray(top)[b],
                                   scores[b, ids[b]], rtol=0, atol=0)


def test_fused_query_topk_agrees(built):
    tree, idx, xs, leaves = built
    fidx = index_mod.build_fused_index(idx)
    q = jnp.asarray(xs[:8])
    _, want = index_mod.query_topk(idx, q, 5)
    _, got = index_mod.fused_query_topk(fidx, q, 5)
    for b in range(8):   # same top-5 sets (near-tie order may differ)
        assert set(np.asarray(got)[b]) == set(np.asarray(want)[b])


def test_fused_matches_blocked_scores(built):
    """Fused and blocked are the same contraction associated differently —
    per-sentence scores must agree to f32 roundoff."""
    tree, idx, xs, leaves = built
    fidx = index_mod.build_fused_index(idx)
    bidx = index_mod.build_blocked_index(idx, block_size=16, node_pad=8)
    q = jnp.asarray(xs[:5])
    fs = np.asarray(index_mod.fused_scores(fidx, q))
    bs = np.asarray(index_mod.blocked_scores(bidx, q))
    sid = np.asarray(bidx.sid_of_slot)
    valid = np.asarray(bidx.valid)
    nb_i, t_i = np.nonzero(valid)
    np.testing.assert_allclose(bs[:, nb_i, t_i], fs[:, sid[nb_i, t_i]],
                               rtol=1e-3, atol=1e-2)


def test_fused_bf16_pool_plus_exact_rerank(built):
    """bf16 fused sweep -> candidate pool -> exact re-rank retrieves each
    point for itself (the serving configuration)."""
    tree, idx, xs, leaves = built
    f16 = index_mod.build_fused_index(idx, dtype=jnp.bfloat16)
    assert f16.GT.dtype == jnp.bfloat16
    q = jnp.asarray(xs[:16])
    cs, cand = index_mod.fused_query_topk(f16, q, 32)
    _, ids = index_mod.exact_rerank(jnp.asarray(xs), q,
                                    cand.astype(jnp.int32), cs, 5)
    for b in range(16):
        assert b in np.asarray(ids)[b]


def test_wrapper_serves_fused_engine(built):
    """Above blocked_threshold predict_fast must route through the fused
    index (default engine) and keep retrieval exact; rerank=0 must build
    the separate f32 exact index."""
    tree, idx, xs, leaves = built
    db = CobwebIndex(corpus_embeddings=xs)
    db.blocked_threshold = 16
    db.rerank_threshold = 16
    assert db.use_fused
    got = db.predict_fast(xs[:12], k=1, is_embedding=True, return_ids=True)
    assert [g[0] for g in got] == list(range(12))
    assert db._fused is not None and db._fused.GT.dtype == jnp.bfloat16
    assert getattr(db, "_blocked", None) is None   # blocked never built
    # rerank=0: exact f32 path-score ranking — same top-5 SET as the
    # gather engine (near-tie order may differ across associations)
    _, want = index_mod.query_topk(db._flat_pred_index(),
                                   jnp.asarray(xs[:6]), 5)
    got0 = db.predict_fast(xs[:6], k=5, is_embedding=True, return_ids=True,
                           rerank=0)
    assert getattr(db, "_fused_f32", None) is not None
    assert db._fused_f32.GT.dtype == jnp.float32
    for b in range(6):
        assert set(got0[b]) == set(np.asarray(want)[b])


def test_wrapper_fused_rebuilds_after_flush(built):
    """Once the pending buffer flushes into the tree the fused index must
    be rebuilt from the NEW structure, not served stale."""
    rng = np.random.default_rng(7)
    xs = clustered(rng, n_clusters=4, per=12, dim=16)
    db = CobwebIndex(corpus_embeddings=xs)
    db.blocked_threshold = 16
    db.rerank_threshold = 16
    db.predict_fast(xs[0], k=1, is_embedding=True)
    old = db._fused
    assert old is not None
    fresh = clustered(rng, n_clusters=2, per=4, dim=16) - 9.0
    db.add_sentences([None] * len(fresh), fresh)
    db._flush_pending()
    assert db._fused is None                  # invalidated with the tree
    got = db.predict_fast(fresh, k=1, is_embedding=True, return_ids=True)
    assert [g[0] for g in got] == list(range(len(xs), len(xs) + len(fresh)))
    assert db._fused is not None and db._fused is not old
    assert db._fused.num_slots >= len(xs) + len(fresh)


def test_wrapper_fused_stale_serving(built):
    """Pending adds must keep serving correctly through the fused engine
    (stale index + closed-form pending merge)."""
    rng = np.random.default_rng(3)
    xs = clustered(rng, n_clusters=4, per=12, dim=16)
    db = CobwebIndex(corpus_embeddings=xs)
    db.blocked_threshold = 16
    db.rerank_threshold = 16
    db.predict_fast(xs[0], k=1, is_embedding=True)   # build the index
    fresh = clustered(rng, n_clusters=2, per=3, dim=16) + 8.0
    db.add_sentences([None] * len(fresh), fresh)
    assert db._unindexed_count() > 0
    got = db.predict_fast(fresh, k=1, is_embedding=True, return_ids=True)
    assert [g[0] for g in got] == list(range(len(xs), len(xs) + len(fresh)))


def test_fused_chunked_matches_unchunked(built):
    """Query-batch chunking (fused_score_budget) must match the one-shot
    sweep row for row — per-row top-k cannot see other rows — including
    the zero-padded ragged tail (B=150 with a 64-row chunk -> 64/64/22).
    Scores agree to GEMM reassociation tolerance (different batch shapes
    tile the contraction differently), so sets + close scores, not bits."""
    rng = np.random.default_rng(5)
    xs = clustered(rng, n_clusters=10, per=20, dim=16)
    db = CobwebIndex(corpus_embeddings=xs)
    db.blocked_threshold = 16
    db.rerank_threshold = 16
    q = jnp.asarray(xs[:150])
    fidx = db._fused_index()
    want_s, want_ids = index_mod.fused_query_topk(
        fidx, q, 8, approx=db.approx_pool,
        recall_target=db.approx_recall_target,
        score_dtype=db.fused_score_dtype)
    db.fused_score_budget = 1        # bmax floor 64 < B=150 -> 3 chunks
    got_s, got_ids = db._fused_chunked(
        fidx, q, 8, approx=db.approx_pool,
        score_dtype=db.fused_score_dtype)
    got_ids, want_ids = np.asarray(got_ids), np.asarray(want_ids)
    for b in range(150):
        assert set(got_ids[b]) == set(want_ids[b])
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-3, atol=1e-2)


def test_fused_chunked_wrapper_multi_chunk():
    """End-to-end: a batch larger than the 64-row chunk floor under a
    1-byte budget must split into multiple fused dispatches and still
    retrieve every row for itself."""
    rng = np.random.default_rng(11)
    xs = clustered(rng, n_clusters=10, per=20, dim=16)   # 200 rows
    db = CobwebIndex(corpus_embeddings=xs)
    db.blocked_threshold = 16
    db.rerank_threshold = 16
    db.fused_score_budget = 1          # bmax = 64 < B = 150
    got = db.predict_fast(xs[:150], k=1, is_embedding=True,
                          return_ids=True)
    assert [g[0] for g in got] == list(range(150))
    # rerank=0 exact path chunks too: same answers as the one-shot sweep
    # (raw path score can't split same-leaf near-dups — self-retrieval
    # misses are inherent to rerank=0, not to chunking)
    got0 = db.predict_fast(xs[:150], k=1, is_embedding=True,
                           return_ids=True, rerank=0)
    db.fused_score_budget = 2 << 30
    want0 = db.predict_fast(xs[:150], k=1, is_embedding=True,
                            return_ids=True, rerank=0)
    assert sum(g[0] == w[0] for g, w in zip(got0, want0)) >= 148


def test_pallas_fused_topk_interpret_matches(built):
    """The fused-form Pallas pool kernel (interpret mode on CPU) must
    agree with the XLA fused top-k when block_k covers k per slab."""
    from rag_cobweb_tpu.ops.pallas_query import pallas_fused_topk

    tree, idx, xs, leaves = built
    fidx = index_mod.build_fused_index(idx)
    q = jnp.asarray(xs[:6])
    want_s, want_ids = index_mod.fused_query_topk(fidx, q, 5)
    got_s, got_ids = pallas_fused_topk(fidx, q, 5, interpret=True,
                                       block_k=8)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-4)
    for b in range(6):
        assert set(np.asarray(got_ids)[b]) == set(np.asarray(want_ids)[b])


def test_pallas_fused_group_topk_interpret_covers(built):
    """The group-max pool variant keeps the top `per_group` of every 128
    adjacent rows.  This tiny corpus (90 rows) lives in ONE group, so the
    pool is exactly the group's top `per_group` — with per_group=4 it
    must contain the exact top-3 and score them identically."""
    from rag_cobweb_tpu.ops.pallas_query import pallas_fused_group_topk

    tree, idx, xs, leaves = built
    fidx = index_mod.build_fused_index(idx)
    q = jnp.asarray(xs[:6])
    want_s, want_ids = index_mod.fused_query_topk(fidx, q, 3)
    got_s, got_ids = pallas_fused_group_topk(fidx, q, 16, interpret=True,
                                             per_group=4)
    em = np.asarray(want_s)
    for b in range(6):
        pool = set(np.asarray(got_ids)[b])
        assert set(np.asarray(want_ids)[b]) <= pool
        # scores of contained ids match the exact sweep
        pm = {int(t): float(s) for t, s in
              zip(np.asarray(got_ids)[b], np.asarray(got_s)[b])}
        for j, t in enumerate(np.asarray(want_ids)[b]):
            assert abs(pm[int(t)] - em[b, j]) < 1e-3
