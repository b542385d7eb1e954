"""Stats-free fused build (core/index.build_fused_from_state): parity
with the flatten-then-fuse path, chase-depth escalation, and the
wrapper's lazy-flat serving route.

The stats-free build is the 4M-scale serving-index path: it must produce
the same coefficients as ``build_fused_index(build_flat_forest_index(...))``
without ever materializing the (D, N_nodes) stats arrays.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.wrapper import CobwebIndex
from rag_cobweb_tpu.parallel.vforest import VForest


def _clustered(n, d, seed=0, n_clusters=6, scale=0.2):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=3.0, size=(n_clusters, d))
    x = centers[rng.integers(0, n_clusters, n)] + scale * rng.normal(
        size=(n, d))
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def forest():
    xs = _clustered(600, 16)
    vf = VForest(TreeConfig(dim=16), n_subtrees=4, capacity_per_tree=1024,
                 seed=0)
    vf.add(xs)
    return vf, xs


def test_fused_state_matches_flatten_path(forest):
    vf, xs = forest
    ref = index_mod.build_fused_index(vf.flat_index())
    got = vf.fused_index()
    S = vf.n_sentences
    assert got.c.shape[0] >= S
    np.testing.assert_allclose(np.asarray(got.GT[:, :S]),
                               np.asarray(ref.GT[:, :S]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.c[:S]),
                               np.asarray(ref.c[:S]), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.valid[:S]),
                                  np.ones(S, bool))
    assert not bool(np.asarray(got.valid[S:]).any())


def test_fused_state_topk_matches(forest):
    vf, xs = forest
    ref = index_mod.build_fused_index(vf.flat_index())
    got = vf.fused_index()
    q = jnp.asarray(xs[:32])
    _, ids_ref = index_mod.fused_query_topk(ref, q, 5)
    _, ids_got = index_mod.fused_query_topk(got, q, 5)
    np.testing.assert_array_equal(np.asarray(ids_ref), np.asarray(ids_got))


def test_fused_state_bf16_dtype(forest):
    vf, _ = forest
    got = vf.fused_index(dtype=jnp.bfloat16)
    assert got.GT.dtype == jnp.bfloat16
    assert got.c.dtype == jnp.float32


def test_chase_depth_escalation():
    """Deep fringe chains (duplicate inserts, no absorb) force the parent
    chase past its starting budget; the build must escalate, not truncate."""
    rng = np.random.default_rng(1)
    base = _clustered(64, 8, seed=2)
    dups = np.repeat(base[:2], 20, axis=0)  # two 20-deep duplicate chains
    xs = np.concatenate([base, dups + 1e-4 * rng.normal(
        size=dups.shape).astype(np.float32)])
    vf = VForest(TreeConfig(dim=8), n_subtrees=2, capacity_per_tree=2048,
                 seed=0)
    vf.add(xs.astype(np.float32))
    ref = index_mod.build_fused_index(vf.flat_index())
    got = index_mod.build_fused_from_state(
        vf.cfg, vf.state, vf._leaf_global(), chase_depth=8)
    S = vf.n_sentences
    np.testing.assert_allclose(np.asarray(got.GT[:, :S]),
                               np.asarray(ref.GT[:, :S]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.c[:S]),
                               np.asarray(ref.c[:S]), rtol=1e-5, atol=1e-4)


def test_wrapper_serves_fused_without_flat():
    """At scale (forest, fused engine, stored embeddings) the product
    path must never build the flat PredictionIndex — the stats-free fused
    route is what keeps 4M-sentence serving inside HBM."""
    xs = _clustered(512, 16, seed=3)
    db = CobwebIndex([f"s{i}" for i in range(len(xs))], xs, n_subtrees=4)
    db.blocked_threshold = 64  # force the engine path at test scale
    db.rerank_threshold = 64   # auto exact re-rank on at test scale
    ids = np.asarray(db.query_ids(xs[:16], k=3))
    assert db._flat_cache is None, "product path built the flat index"
    assert db.forest._flat_index is None
    # self-retrieval through the fused+exact-rerank engine
    np.testing.assert_array_equal(ids[:, 0], np.arange(16))

    # reference: identical wrapper forced through the flatten-then-fuse
    # path — rankings must match exactly (same engine, same association)
    db2 = CobwebIndex([f"s{i}" for i in range(len(xs))], xs, n_subtrees=4)
    db2.blocked_threshold = 64
    db2.rerank_threshold = 64
    db2._flat_pred_index()          # retained -> fused builds from flat
    ids2 = np.asarray(db2.query_ids(xs[:16], k=3))
    np.testing.assert_array_equal(ids, ids2)


def test_fused_only_stale_serving():
    """Adds on top of a fused-only serving index must accrue as pending
    (bounded staleness), not invalidate — and the merged serve stays
    exact for the fresh rows."""
    xs = _clustered(512, 16, seed=4)
    db = CobwebIndex([f"s{i}" for i in range(len(xs))], xs, n_subtrees=4)
    db.blocked_threshold = 64
    db.rerank_threshold = 64
    db.query_ids(xs[:4], k=3)       # builds the stats-free fused index
    assert db._fused is not None and db._flat_cache is None
    fused_before = db._fused
    extra = _clustered(32, 16, seed=5) + 7.0   # well-separated fresh rows
    db.add_sentences([f"x{i}" for i in range(32)], extra)
    assert db._unindexed_count() == 32, "fused-only staleness not retained"
    assert db._fused is fused_before, "add invalidated the serving index"
    ids = np.asarray(db.query_ids(extra, k=1))
    np.testing.assert_array_equal(ids[:, 0], 512 + np.arange(32))
    # the flat index still was never built
    assert db._flat_cache is None


def test_flat_rebuild_clears_pending_bookkeeping():
    """If an exact-index consumer forces a flat rebuild while fused-only
    pending rows exist, the rebuild covers those rows — their pending
    bookkeeping must clear or _merge_pending would double-count them."""
    xs = _clustered(512, 16, seed=6)
    db = CobwebIndex([f"s{i}" for i in range(len(xs))], xs, n_subtrees=4)
    db.blocked_threshold = 64
    db.rerank_threshold = 64
    db.query_ids(xs[:4], k=3)
    db.add_sentences(["y0"], _clustered(1, 16, seed=7) + 9.0)
    assert db._unindexed_count() == 1
    idx = db._flat_pred_index()     # forces a fresh snapshot
    assert db._unindexed_count() == 0
    assert idx.num_sentences == 513
