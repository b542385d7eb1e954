"""Content-routed forest: nearest-centroid lane assignment with
power-of-two-choices balancing, the skew-tail insert path, per-query lane
selection for beam search, and checkpoint round-trips.

The reference has no sharding at all (SURVEY.md §2c); content routing is
the TPU-native design that lets a forest beam visit L ≪ K lanes per query
(round-robin lanes are statistically identical, so every lane must be
searched)."""

import numpy as np
import pytest

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.wrapper import CobwebIndex
from rag_cobweb_tpu.parallel.vforest import VForest


K, D = 8, 16


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(1)
    centers = rng.normal(scale=4.0, size=(12, D))
    xs = np.concatenate(
        [c + 0.25 * rng.normal(size=(50, D)) for c in centers]
    ).astype(np.float32)
    order = rng.permutation(len(xs))
    return xs[order]


@pytest.fixture(scope="module")
def routed(data):
    vf = VForest(TreeConfig(dim=D), n_subtrees=K, capacity_per_tree=512,
                 seed=0, routing="content")
    vf.add(data)
    return vf


def test_routing_inserts_everything(routed, data):
    assert routed.n_sentences == len(data)
    assert sum(len(l) for l in routed._leaf_of_local) == len(data)
    # every sentence's recorded leaf is a live node of its lane
    import jax
    st = jax.device_get(routed.state)
    for sid in range(0, len(data), 37):
        lane = routed.shard_of[sid]
        leaf = routed._leaf_of_local[lane][routed.local_sid[sid]]
        assert st.counts[lane, leaf] >= 1


def test_routing_balance_bounded(routed, data):
    """Content-first assignment with the route_cap_factor hard cap: loads
    may skew toward content lanes (spills stay content-local rather than
    being dealt uniformly), but no lane exceeds the documented cap."""
    loads = np.asarray([len(l) for l in routed._leaf_of_local])
    assert loads.sum() == len(data)
    mean = len(data) / K
    cap = int(routed.route_cap_factor * mean) + 16
    assert loads.max() <= cap, (loads.tolist(), cap)
    assert loads.min() >= 1


def test_routing_is_content_coherent(routed, data):
    """Rows closest to the same centroid should mostly share a lane: the
    router must beat random assignment by a wide margin."""
    s = routed._lane_scores(data)
    nearest = np.argmax(s, axis=1)
    actual = np.asarray(routed.shard_of)
    frac_nearest = float(np.mean(nearest == actual))
    assert frac_nearest > 0.5, frac_nearest  # random would be 1/K = 0.125


def test_query_retrieves_own_points(routed, data):
    _, gids = routed.query_topk(data[:64], k=1)
    hit = np.mean([g in row for g, row in zip(range(64), gids)])
    assert hit >= 0.95


def test_lane_selected_beam_matches_full_beam(routed, data):
    """Descending only the L=2 nearest lanes must find the same gold rows
    the all-lane beam finds (the gold's lane is by construction among the
    query's nearest centroids)."""
    q = data[:64] + 0.05 * np.random.default_rng(3).normal(
        size=(64, D)).astype(np.float32)
    full = routed.beam_topk(q, k=5, beam_width=8, lanes_per_query=K)
    sel = routed.beam_topk(q, k=5, beam_width=8, lanes_per_query=2)
    hit_full = np.mean([g in row for g, row in zip(range(64), full)])
    hit_sel = np.mean([g in row for g, row in zip(range(64), sel)])
    assert hit_full >= 0.9
    assert hit_sel >= hit_full - 0.05  # lane selection must not cost recall


def test_select_lanes_shape(routed, data):
    sel = routed.select_lanes(data[:10], 3)
    assert sel.shape == (10, 3)
    assert (sel >= 0).all() and (sel < K).all()
    # selected lanes are distinct per row
    for row in sel:
        assert len(set(row.tolist())) == 3


def test_skew_tail_insert(data):
    """A batch concentrated in one region forces the ragged-tail masked
    multi-round path (R_tail > 1); everything must still insert and
    retrieve."""
    vf = VForest(TreeConfig(dim=D), n_subtrees=K, capacity_per_tree=512,
                 seed=0, routing="content")
    vf.add(data[:200])                       # establish centroids
    rng = np.random.default_rng(5)
    skew = (data[0] + 0.05 * rng.normal(size=(60, D))).astype(np.float32)
    gids = vf.add(skew)
    assert len(gids) == 60
    assert vf.n_sentences == 260
    # the 60 rows are near-duplicates of each other: ANY of them is the
    # right answer (specific-row top-3 is a coin flip among the group)
    _, got = vf.query_topk(skew[:16], k=3)
    group = set(int(g) for g in gids)
    hit = np.mean([bool(group & set(int(x) for x in row)) for row in got])
    assert hit >= 0.9


def test_wrapper_content_routing_end_to_end(data):
    db = CobwebIndex(corpus=None, corpus_embeddings=data,
                     config=TreeConfig(dim=D), n_subtrees=K,
                     routing="content")
    ids = np.asarray(db.query_ids(data[:32], k=1))
    hit = np.mean([i in row for i, row in zip(range(32), ids)])
    assert hit >= 0.95
    out = db.predict(data[:8], k=3, return_ids=True, is_embedding=True,
                     beam_lanes=2)
    hit_b = np.mean([i in row for i, row in zip(range(8), out)])
    assert hit_b >= 0.8


def test_routing_save_load_roundtrip(routed, data, tmp_path):
    p = str(tmp_path / "routed.npz")
    routed.save_npz(p)
    vf2, _ = VForest.load_npz(p)
    assert vf2.routing == "content"
    assert vf2._centroids is not None
    np.testing.assert_allclose(vf2._centroids, routed._centroids,
                               rtol=1e-6)
    assert (vf2._lane_total == routed._lane_total).all()
    # adds after load keep routing (and don't crash on fresh device caches)
    more = (data[:16] + 0.01).astype(np.float32)
    gids = vf2.add(more)
    assert len(gids) == 16
    _, got = vf2.query_topk(more[:8], k=3)
    hit = np.mean([g in row for g, row in zip(gids[:8], got)])
    assert hit >= 0.7


def test_small_forest_exact_rerank_k1(data):
    """Below blocked_threshold the forest path must still serve the exact
    stored-embedding re-rank: same-leaf near-duplicates have IDENTICAL
    leaf log-probs, so without it k=1 self-retrieval is a coin flip among
    each dup group (observed 0.84-0.89 on the real chip)."""
    rng = np.random.default_rng(7)
    # one tight 40-member near-dup group per centroid: leaves swallow
    # whole groups, so ordering inside the leaf is the whole battle
    groups = rng.normal(scale=4.0, size=(4, D))
    xs = np.concatenate([
        g + 0.02 * rng.normal(size=(40, D)) for g in groups
    ]).astype(np.float32)
    for routing in ("round_robin", "content"):
        db = CobwebIndex(corpus=None, corpus_embeddings=xs,
                         config=TreeConfig(dim=D), n_subtrees=4,
                         routing=routing)
        ids = np.asarray(db.query_ids(xs, k=1))
        hit = np.mean([i in row for i, row in zip(range(len(xs)), ids)])
        assert hit == 1.0, (routing, hit)
        # explicit rerank=0 keeps raw leaf-lp order (semantics preserved)
        ids0 = np.asarray(db.query_ids(xs[:8], k=1, rerank=0))
        assert ids0.shape == (8, 1)


def test_round_robin_unchanged(data):
    """Default routing stays exactly gid % K (reference-parity layout)."""
    vf = VForest(TreeConfig(dim=D), n_subtrees=4, capacity_per_tree=512)
    gids = vf.add(data[:100])
    assert vf.shard_of == [int(g) % 4 for g in gids]
