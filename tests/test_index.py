"""Tests for the prediction index and batched query paths: numerical parity
of the indexed scoring with a direct per-sentence computation, retrieval
quality against exact nearest-neighbor, and beam-search sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.core import index as index_mod


def clustered(rng, n_clusters=6, per=15, dim=16, spread=0.25):
    centers = rng.normal(scale=3.0, size=(n_clusters, dim))
    xs = np.concatenate(
        [c + spread * rng.normal(size=(per, dim)) for c in centers]
    ).astype(np.float32)
    order = rng.permutation(len(xs))
    return xs[order]


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(0)
    xs = clustered(rng)
    tree = CobwebTree(TreeConfig(dim=16), capacity=1024, seed=0)
    leaves = tree.fit(xs)
    idx = index_mod.build_index(tree, leaves)
    return tree, idx, xs, leaves


def test_paths_are_root_to_leaf(built):
    tree, idx, xs, leaves = built
    paths = np.asarray(idx.paths)
    assert (paths[:, 0] == 0).all()  # compact root is 0
    # each path's last valid entry must be the sentence's leaf
    weights = np.asarray(idx.path_weights)
    for s in range(0, len(xs), 17):
        valid = paths[s][paths[s] >= 0]
        assert len(valid) >= 2
        # the per-path weights sum to ~len(level_weights cover)/path_len * path_len
        w = weights[s][paths[s] >= 0]
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)


def test_rank_scores_match_direct_computation(built):
    """Indexed scores == sum over the sentence's path of node log-probs
    (computed here straightforwardly from tree stats)."""
    tree, idx, xs, leaves = built
    st = tree._host_arrays()
    cfg = tree.cfg
    q = xs[3] + 0.05
    scores = np.asarray(index_mod.rank_scores(idx, jnp.asarray(q[None, :])))[0]

    # direct: follow parent pointers in the raw tree
    def node_lp(n):
        count = max(float(st.counts[n]), 1.0)
        var = st.m2s[n] / count + cfg.prior_var
        d = q - st.means[n]
        return -0.5 * float(np.sum(np.log(var) + d * d / var))

    for s in range(0, len(xs), 13):
        chain = []
        n = int(leaves[s])
        while n >= 0:
            chain.append(n)
            n = int(st.parent[n])
        want = sum(node_lp(n) for n in chain) / len(chain)
        assert scores[s] == pytest.approx(want, rel=1e-3, abs=1e-2)


def test_query_topk_retrieves_inserted_point(built):
    tree, idx, xs, leaves = built
    B = 8
    qs = jnp.asarray(xs[:B])  # query the corpus points themselves
    _, top = index_mod.query_topk(idx, qs, 5)
    top = np.asarray(top)
    for b in range(B):
        assert b in top[b], f"query {b} did not retrieve itself: {top[b]}"


def test_recall_vs_exact_nn(built):
    """Indexed retrieval should agree closely with exact top-k on clustered
    data (reference reaches ~0.99 recall at this scale, BASELINE.md row 3)."""
    tree, idx, xs, leaves = built
    rng = np.random.default_rng(1)
    qs = xs[rng.choice(len(xs), 30, replace=False)] + \
        0.05 * rng.normal(size=(30, 16)).astype(np.float32)
    _, top = index_mod.query_topk(idx, jnp.asarray(qs), 10)
    top = np.asarray(top)
    # exact euclidean top-10
    d2 = ((qs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    exact = np.argsort(d2, axis=1)[:, :10]
    recall = np.mean([
        len(set(top[i]) & set(exact[i])) / 10 for i in range(len(qs))
    ])
    assert recall > 0.7, f"recall@10 vs exact NN too low: {recall}"


def test_beam_search_finds_same_leaves(built):
    tree, idx, xs, leaves = built
    qs = jnp.asarray(xs[:6])
    lscores, lnodes = index_mod.beam_search_topk(idx, qs, k=5, beam_width=32,
                                                 max_depth=16)
    sids = index_mod.leaves_to_sentence_ids(idx, np.asarray(lnodes), 5)
    for b in range(6):
        assert b in sids[b], f"beam search missed own point for query {b}"


def test_rank_scores_differentiable(built):
    tree, idx, xs, leaves = built

    def loss(q):
        s = index_mod.rank_scores(idx, q[None, :])
        return -s[0, 0]

    g = jax.grad(loss)(jnp.asarray(xs[0]))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_blocked_index_matches_rank_scores(built):
    """The gather-free blocked formulation must reproduce the per-sentence
    path scores exactly (same math, different data layout)."""
    tree, idx, xs, leaves = built
    bidx = index_mod.build_blocked_index(idx, block_size=16, node_pad=8)
    q = jnp.asarray(xs[:5])
    want = np.asarray(index_mod.rank_scores(idx, q))          # (B, S)
    got = np.asarray(index_mod.blocked_scores(bidx, q))        # (B, NB, TS)
    sid = np.asarray(bidx.sid_of_slot)
    valid = np.asarray(bidx.valid)
    for b in range(5):
        for nb in range(sid.shape[0]):
            for t in range(sid.shape[1]):
                if valid[nb, t]:
                    assert got[b, nb, t] == pytest.approx(
                        want[b, sid[nb, t]], rel=1e-3, abs=1e-2)


def test_blocked_query_topk_agrees(built):
    tree, idx, xs, leaves = built
    bidx = index_mod.build_blocked_index(idx, block_size=32, node_pad=16)
    q = jnp.asarray(xs[:8])
    _, want = index_mod.query_topk(idx, q, 5)
    _, got = index_mod.blocked_query_topk(bidx, q, 5)
    # same top-5 sets (ordering may differ on near-ties)
    for b in range(8):
        assert set(np.asarray(got)[b]) == set(np.asarray(want)[b])


def test_blocked_query_topk_approx_pool(built):
    """approx=True (jax.lax.approx_max_k candidate selection) must return
    a pool whose top entries cover the exact pool's — the serving path
    re-ranks the pool with an exact key, so membership is the contract.
    (On CPU the approx primitive falls back to exact selection; this pins
    shapes/dtypes and the recall_target plumbing.)"""
    tree, idx, xs, leaves = built
    bidx = index_mod.build_blocked_index(idx, block_size=32, node_pad=16)
    q = jnp.asarray(xs[:8])
    s_e, ids_e = index_mod.blocked_query_topk(bidx, q, 16)
    s_a, ids_a = index_mod.blocked_query_topk(bidx, q, 16, approx=True,
                                              recall_target=0.95)
    assert ids_a.shape == ids_e.shape and s_a.dtype == s_e.dtype
    for b in range(8):
        got = set(np.asarray(ids_a)[b])
        want = set(np.asarray(ids_e)[b][:8])   # top half must be covered
        assert len(want - got) == 0, (b, want - got)


def test_pallas_blocked_topk_interpret_matches(built):
    """The Pallas fused query kernel (interpret mode on CPU) must agree with
    the XLA blocked path."""
    from rag_cobweb_tpu.ops.pallas_query import pallas_blocked_topk

    tree, idx, xs, leaves = built
    bidx = index_mod.build_blocked_index(idx, block_size=32, node_pad=16)
    q = jnp.asarray(xs[:4])
    want_s, want_ids = index_mod.blocked_query_topk(bidx, q, 5)
    got_s, got_ids = pallas_blocked_topk(bidx, q, 5, interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-4)
    for b in range(4):
        assert set(np.asarray(got_ids)[b]) == set(np.asarray(want_ids)[b])


def test_query_topk_rerank_agrees_on_clean_data(built):
    """On well-separated clusters the hybrid re-rank must retrieve the same
    gold neighbor as the pure path-score top-k (the candidate sweep keeps
    it; the leaf-lp re-rank cannot drop it)."""
    import jax.numpy as jnp
    tree, idx, xs, leaves = built
    q = jnp.asarray(xs[:16])
    _, rer = index_mod.query_topk_rerank(idx, q, 5, rerank=32)
    for b in range(16):
        assert b in np.asarray(rer)[b], (b, np.asarray(rer)[b])


def test_blocked_rerank_matches_gather_rerank(built):
    import jax.numpy as jnp
    tree, idx, xs, leaves = built
    bidx = index_mod.build_blocked_index(idx, block_size=64)
    q = jnp.asarray(xs[:8])
    _, a = index_mod.query_topk_rerank(idx, q, 5, rerank=32)
    _, b = index_mod.blocked_query_topk_rerank(bidx, idx, q, 5, rerank=32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blocked_bf16_rerank_retrieves_own_points(built):
    """bf16 sweep + f32 leaf-lp re-rank: approximate candidate scores,
    exact final ranking (the half-HBM-traffic mode for 500k+)."""
    import jax.numpy as jnp
    tree, idx, xs, leaves = built
    b16 = index_mod.build_blocked_index(idx, block_size=64,
                                        dtype=jnp.bfloat16)
    assert b16.ivt_b.dtype == jnp.bfloat16
    q = jnp.asarray(xs[:16])
    _, ids = index_mod.blocked_query_topk_rerank(b16, idx, q, 5, rerank=32)
    for b in range(16):
        assert b in np.asarray(ids)[b]
    # agreement with the f32 engine after re-rank (same candidate pool on
    # well-separated data)
    bf32 = index_mod.build_blocked_index(idx, block_size=64)
    _, want = index_mod.blocked_query_topk_rerank(bf32, idx, q, 5, rerank=32)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want))


def test_device_struct_parity_with_host():
    """The jitted device structure pass (_derive_paths_device /
    _leaf_layout_device) must reproduce the host numpy path derivation
    bit-for-bit, and the fully-device blocked build must serve the same
    top-k as the host-built blocked index."""
    import jax.numpy as jnp
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.tree import CobwebTree
    from rag_cobweb_tpu.core import index as index_mod

    rng = np.random.default_rng(3)
    centers = rng.normal(scale=3.0, size=(7, 20))
    xs = np.concatenate(
        [c + 0.25 * rng.normal(size=(50, 20)) for c in centers]
    ).astype(np.float32)
    tree = CobwebTree(TreeConfig(dim=20), capacity=4096, seed=0)
    leaves = tree.fit(xs)
    idx = index_mod.build_index(tree, leaves)
    S, P = idx.paths.shape

    # --- device path derivation vs the host-built index ---------------
    st = __import__("jax").tree.map(np.asarray, tree.state)
    compact_of = {}
    # recover parent_compact from the index itself: parent of paths[s][d]
    # is paths[s][d-1]; instead rebuild from tree arrays like the builder
    levels = [np.asarray([int(st.root)], np.int32)]
    while True:
        kids = st.children[levels[-1]].ravel()
        kids = kids[kids >= 0]
        if kids.size == 0:
            break
        levels.append(np.asarray(kids, np.int32))
    order_arr = np.concatenate(levels)
    compact = np.full((st.children.shape[0],), -1, np.int32)
    compact[order_arr] = np.arange(len(order_arr), dtype=np.int32)
    parent_compact = np.full((len(order_arr),), -1, np.int32)
    lp = st.parent[order_arr]
    parent_compact[lp >= 0] = compact[lp[lp >= 0]]
    leaf_compact = compact[np.asarray(leaves, np.int32)]

    lw = np.ones((P,), np.float32)
    dflt = list(index_mod.DEFAULT_LEVEL_WEIGHTS)[:P]
    lw[:len(dflt)] = dflt
    Sb = 512  # small bucket for the test
    leaf_pad = np.full((Sb,), -1, np.int32)
    leaf_pad[:S] = leaf_compact
    paths_d, weights_d, _ = index_mod._derive_paths_device(
        jnp.asarray(parent_compact), jnp.asarray(leaf_pad), P,
        jnp.asarray(lw))
    np.testing.assert_array_equal(np.asarray(paths_d)[:S],
                                  np.asarray(idx.paths))
    np.testing.assert_allclose(np.asarray(weights_d)[:S],
                               np.asarray(idx.path_weights), rtol=1e-6)

    n_pad = 1024
    order_d, start_d, count_d = index_mod._leaf_layout_device(
        jnp.asarray(leaf_pad), paths_d, n_pad)
    # same leaf grouping (order may tie-break differently; compare groups)
    got_leaves = leaf_compact[np.asarray(order_d)[:S]]
    want_leaves = leaf_compact[np.asarray(idx.sentence_order)]
    np.testing.assert_array_equal(got_leaves, want_leaves)
    n_live = len(order_arr)
    np.testing.assert_array_equal(
        np.asarray(count_d)[:n_live], np.asarray(idx.leaf_sentence_count))
    np.testing.assert_array_equal(
        np.asarray(start_d)[:n_live], np.asarray(idx.leaf_sentence_start))

    # --- fully-device blocked build vs host blocked build --------------
    bidx_host = index_mod.build_blocked_index(idx, block_size=64)
    bidx_dev = index_mod._build_blocked_index_device(
        idx, 64, 128, jnp.float32, index_mod._PhaseTimer("t"))
    q = jnp.asarray(xs[:16])
    _, want = index_mod.blocked_query_topk(bidx_host, q, 5)
    _, got = index_mod.blocked_query_topk(bidx_dev, q, 5)
    for b in range(16):
        assert set(np.asarray(got)[b].tolist()) == \
            set(np.asarray(want)[b].tolist()), b


def test_beam_pack_matches_oracle(built):
    """Packed beam with an untruncated candidate budget (C = W*F) expands
    EXACTLY the oracle's candidate set, so the retrievable-leaf ranking
    must agree with beam_search_topk (f32 pack, HIGHEST precision)."""
    tree, idx, xs, leaves = built
    qs = jnp.asarray(xs[:6])
    W, F = 16, idx.children.shape[1]
    ls_o, ln_o = index_mod.beam_search_topk(idx, qs, k=5, beam_width=W,
                                            max_depth=16)
    bidx = index_mod.build_beam_index(idx, pack_dtype=jnp.float32)
    ls_p, ln_p = index_mod.beam_pack_topk(bidx, qs, k=5, beam_width=W,
                                          max_depth=16, cand_budget=W * F)
    for b in range(6):
        want = {int(n) for n, s in zip(np.asarray(ln_o)[b],
                                       np.asarray(ls_o)[b]) if n >= 0}
        got = {int(n) for n, s in zip(np.asarray(ln_p)[b],
                                      np.asarray(ls_p)[b]) if n >= 0}
        # the oracle emits leaf_cap = W*depth/2+k entries, the packed engine
        # max(2W, k): compare the shared top-W prefix sets
        want_top = {int(n) for n in np.asarray(ln_o)[b][:W] if n >= 0}
        got_top = {int(n) for n in np.asarray(ln_p)[b][:W] if n >= 0}
        assert want_top == got_top, (b, want_top, got_top)


def test_beam_query_ids_finds_own_points(built):
    tree, idx, xs, leaves = built
    bidx = index_mod.build_beam_index(idx)
    sids = np.asarray(index_mod.beam_query_ids(bidx, xs[:6], k=5,
                                               beam_width=32, max_depth=16))
    for b in range(6):
        assert b in sids[b], f"packed beam missed own point for query {b}"


def test_beam_pack_truncated_budget_still_finds_points(built):
    """A tight candidate budget (C = 2W) must degrade gracefully, not
    break: the best-parent runs are kept (truncation drops the tail)."""
    tree, idx, xs, leaves = built
    bidx = index_mod.build_beam_index(idx)
    sids = np.asarray(index_mod.beam_query_ids(bidx, xs[:6], k=5,
                                               beam_width=8, max_depth=16,
                                               cand_budget=16))
    hits = np.mean([b in sids[b] for b in range(6)])
    assert hits >= 0.5, f"truncated-budget beam collapsed: {hits}"


def test_pallas_tiled_topk_interpret_matches(built):
    """The one-dispatch 2D-grid sweep (blocks x query tiles) must agree
    with the XLA blocked path; exercises the ragged-B padding and the
    per-block candidate merge."""
    from rag_cobweb_tpu.ops.pallas_query import pallas_blocked_topk_tiled

    tree, idx, xs, leaves = built
    bidx = index_mod.build_blocked_index(idx, block_size=32, node_pad=16)
    q = jnp.asarray(xs[:7])          # ragged: not a multiple of the tile
    want_s, want_ids = index_mod.blocked_query_topk(bidx, q, 5)
    got_s, got_ids = pallas_blocked_topk_tiled(bidx, q, 5, interpret=True,
                                               block_k=8)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-4)
    for b in range(7):
        assert set(np.asarray(got_ids)[b]) == set(np.asarray(want_ids)[b])
