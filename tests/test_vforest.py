"""Single-device vmapped forest: correctness of round-robin inserts, lane
independence, query merge, and recall parity with a single tree."""

import numpy as np
import jax
import pytest

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.parallel.vforest import VForest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=3.0, size=(10, 16))
    xs = np.concatenate(
        [c + 0.2 * rng.normal(size=(33, 16)) for c in centers]
    ).astype(np.float32)
    order = rng.permutation(len(xs))
    return xs[order]


def test_vforest_insert_counts(data):
    vf = VForest(TreeConfig(dim=16), n_subtrees=4, capacity_per_tree=512,
                 seed=0)
    gids = vf.add(data)  # 330 items, not divisible by 4 -> ragged round
    assert len(gids) == 330
    st = jax.device_get(vf.state)
    per_lane = [0, 0, 0, 0]
    for g in gids:
        per_lane[g % 4] += 1
    for s in range(4):
        root = int(st.root[s])
        assert float(st.counts[s, root]) == per_lane[s]


def test_vforest_lane_equals_standalone_tree(data):
    """A vmapped lane IS the exact per-tree insert: driving the internal
    ``vinsert_rounds`` with explicit keys must produce node-for-node the
    same tree (ids, counts, stats, children order, leaf sequence) as the
    sequential exact path (``insert_one_jit``) given the same keys."""
    import jax.numpy as jnp
    from rag_cobweb_tpu.core import tree as tree_mod
    from rag_cobweb_tpu.parallel import vforest as vf_mod

    K, R, D = 4, 80, 16
    cfg = TreeConfig(dim=16)
    xs = data[:K * R].reshape(R, K, D).transpose(1, 0, 2)  # lane k: data[k::K]
    keys = jax.random.split(jax.random.PRNGKey(7), K * R).reshape(K, R, 2)
    states = [tree_mod.init_state(512, D, cfg.max_fanout) for _ in range(K)]
    st0 = jax.tree.map(lambda *a: jnp.stack(a), *states)
    st, leaves = vf_mod.vinsert_rounds(st0, jnp.asarray(xs), keys, cfg)
    leaves = np.asarray(leaves)
    assert (leaves >= 0).all()
    st = jax.device_get(st)

    for lane in (0, 2):
        solo = tree_mod.init_state(512, D, cfg.max_fanout)
        for r in range(R):
            solo, leaf = tree_mod.insert_one_jit(
                solo, jnp.asarray(xs[lane, r]), keys[lane, r], cfg)
            assert int(leaf) == leaves[lane, r], (lane, r)
        solo = jax.device_get(solo)
        assert int(solo.root) == int(st.root[lane])
        assert int(solo.n_alloc) == int(st.n_alloc[lane])
        stack = [int(solo.root)]
        while stack:
            n = stack.pop()
            assert float(solo.counts[n]) == float(st.counts[lane, n])
            np.testing.assert_allclose(solo.means[n], st.means[lane, n],
                                       atol=1e-6)
            np.testing.assert_allclose(solo.m2s[n], st.m2s[lane, n],
                                       atol=1e-5)
            nc = int(solo.n_children[n])
            assert nc == int(st.n_children[lane, n])
            for i in range(nc):
                c = int(solo.children[n, i])
                assert c == int(st.children[lane, n, i])
                assert int(solo.parent[c]) == int(st.parent[lane, c]) == n
                stack.append(c)


def test_vforest_query_retrieves_own_points(data):
    vf = VForest(TreeConfig(dim=16), n_subtrees=4, capacity_per_tree=512,
                 seed=0)
    vf.add(data)
    scores, gids = vf.query_topk(data[:12], k=5)
    assert gids.shape == (12, 5)
    for b in range(12):
        assert b in gids[b], f"query {b}: {gids[b]}"


def test_vforest_recall_parity_with_single_tree(data):
    rng = np.random.default_rng(1)
    qs = data[:60] + 0.05 * rng.normal(size=(60, 16)).astype(np.float32)

    vf = VForest(TreeConfig(dim=16), n_subtrees=4, capacity_per_tree=512,
                 seed=0)
    vf.add(data)
    _, f_ids = vf.query_topk(qs, k=10)

    tree = CobwebTree(TreeConfig(dim=16), capacity=2048, seed=0)
    leaves = tree.fit(data)
    idx = index_mod.build_index(tree, leaves)
    import jax.numpy as jnp
    _, t_ids = index_mod.query_topk(idx, jnp.asarray(qs), 10)

    def recall(ids):
        return np.mean([1.0 if b in np.asarray(ids)[b] else 0.0
                        for b in range(60)])

    assert recall(f_ids) >= recall(t_ids) - 0.1


def test_vforest_incremental(data):
    vf = VForest(TreeConfig(dim=16), n_subtrees=4, capacity_per_tree=512,
                 seed=0)
    vf.add(data[:100])
    gids = vf.add(data[100:200])
    assert gids[0] == 100
    _, out = vf.query_topk(data[150:152], k=3)
    assert 150 in out[0]


class TestForestModeWrapper:
    """CobwebIndex(n_subtrees=K) — the forest-mode facade (VERDICT round-1
    item #3: VForest integrated behind the standard wrapper API)."""

    @pytest.fixture(scope="class")
    def db(self, data):
        from rag_cobweb_tpu.core.wrapper import CobwebIndex
        return CobwebIndex(corpus_embeddings=data, n_subtrees=4, seed=0)

    def test_fast_and_beam_retrieve_own_points(self, db, data):
        rng = np.random.default_rng(3)
        qs = data[:40] + 0.03 * rng.normal(size=(40, 16)).astype(np.float32)
        fast = db.predict_fast(qs, k=5, return_ids=True, is_embedding=True)
        beam = db.predict(qs, k=5, return_ids=True, is_embedding=True)
        fast_hit = np.mean([b in row for b, row in enumerate(fast)])
        beam_hit = np.mean([b in row for b, row in enumerate(beam)])
        assert fast_hit >= 0.95
        assert beam_hit >= 0.95

    def test_rank_scores_shape_and_grad(self, db, data):
        import jax
        import jax.numpy as jnp
        qs = jnp.asarray(data[:4])
        scores = db.rank_scores(qs, is_embedding=True)
        assert scores.shape == (4, len(db))
        # differentiable w.r.t. the query embedding (forest path)
        def loss(q):
            s = db.forest.rank_scores(q[None, :])
            return -jax.nn.log_softmax(s, axis=-1)[0, 0]
        g = jax.grad(loss)(qs[0])
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_save_load_roundtrip_and_incremental(self, db, data, tmp_path):
        from rag_cobweb_tpu.core.wrapper import CobwebIndex
        p = str(tmp_path / "forest.npz")
        db.save(p)
        db2 = CobwebIndex.load(p)
        assert db2.n_subtrees == 4
        qs = data[:10]
        assert db2.predict_fast(qs, k=5, return_ids=True,
                                is_embedding=True) == \
            db.predict_fast(qs, k=5, return_ids=True, is_embedding=True)
        n0 = len(db2)
        db2.add_sentences([None] * 8, data[:8])
        assert len(db2) == n0 + 8
        out = db2.predict_fast(data[:2], k=3, return_ids=True,
                               is_embedding=True)
        assert len(out) == 2

    def test_single_tree_introspection_guarded(self, db):
        with pytest.raises(ValueError):
            db.dump_json()
        with pytest.raises(ValueError):
            db.print_tree()


def test_flat_index_matches_vforest_query(data):
    """merge_stacked_to_flat: the flattened single PredictionIndex over the
    whole forest retrieves the same neighborhoods as the per-lane query
    (and feeds the blocked/Pallas engines)."""
    import jax.numpy as jnp
    from rag_cobweb_tpu.core import index as index_mod

    vf = VForest(TreeConfig(dim=16), n_subtrees=4, capacity_per_tree=512,
                 seed=0)
    vf.add(data)
    flat = vf.flat_index()
    assert flat.num_sentences == len(data)
    qs = jnp.asarray(data[:40])
    # raw path-sums are NOT calibrated across differently shaped lane trees
    # (forest merges by leaf log-prob for this reason) -> the flat index is
    # always queried with the leaf-lp re-rank, which restores calibration
    _, rids = index_mod.query_topk_rerank(flat, qs, 5, rerank=64)
    rhits = np.mean([b in np.asarray(rids)[b] for b in range(40)])
    assert rhits >= 0.95
    # engine equivalence on the same flat index: gather vs blocked vs pallas
    _, ids = index_mod.query_topk(flat, qs, 5)
    bidx = index_mod.build_blocked_index(flat, block_size=64)
    _, bids = index_mod.blocked_query_topk(bidx, qs, 5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(bids))
    _, brids = index_mod.blocked_query_topk_rerank(bidx, flat, qs, 5,
                                                   rerank=64)
    np.testing.assert_array_equal(np.asarray(rids), np.asarray(brids))
    # pallas kernel (interpret mode on CPU) agrees with the blocked engine
    from rag_cobweb_tpu.ops.pallas_query import pallas_blocked_topk
    _, pids = pallas_blocked_topk(bidx, qs, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(bids), np.asarray(pids))


def test_exact_path_retry_on_scan_budget(data):
    """Descents deeper than the scan budget retry through the exact path;
    the leaf buffer must be writable (np.array copy of the device output —
    regression: np.asarray gives a read-only jax view, crashing the first
    1M-scale build whose trees exceeded _MAX_STEPS)."""
    from rag_cobweb_tpu.parallel import vforest as vf_mod
    old = vf_mod._MAX_STEPS
    try:
        vf_mod._MAX_STEPS = 3  # force truncation -> retries
        vf = VForest(TreeConfig(dim=16), n_subtrees=4,
                     capacity_per_tree=512, seed=0)
        vf.add(data[:120])
        st = jax.device_get(vf.state)
        for s in range(4):
            assert float(st.counts[s, int(st.root[s])]) == 30
        _, gids = vf.query_topk(data[:8], k=5)
        assert all(b in gids[b] for b in range(8))
    finally:
        vf_mod._MAX_STEPS = old


def test_host_structure_mirror_sync():
    """The incrementally-synced host mirror of (children, parent, root)
    must match a full device_get after every add — including after
    capacity growth (full refetch) and a second diff-only sync."""
    import jax
    from rag_cobweb_tpu.parallel.vforest import VForest
    from rag_cobweb_tpu.core.config import TreeConfig

    rng = np.random.default_rng(0)
    vf = VForest(TreeConfig(dim=12), n_subtrees=4, capacity_per_tree=1024,
                 seed=0)
    for step in range(3):
        vf.add(rng.normal(size=(40, 12)).astype(np.float32))
        ch, pa, rt = vf._sync_host_structure()
        np.testing.assert_array_equal(
            ch, np.asarray(jax.device_get(vf.state.children)), step)
        np.testing.assert_array_equal(
            pa, np.asarray(jax.device_get(vf.state.parent)), step)
        np.testing.assert_array_equal(
            rt, np.asarray(jax.device_get(vf.state.root)), step)
    # idempotent sync with zero changes
    ch2, pa2, _ = vf._sync_host_structure()
    np.testing.assert_array_equal(ch2, ch)
    np.testing.assert_array_equal(pa2, pa)


def test_vforest_truncated_descents_recover_via_exact_path():
    """Forest analog of the round-3 dead-leaf regression: shrink the
    retry-wave budget so descents truncate, and assert every recorded
    leaf is a live node (the exact path's _EXACT_STEPS cap must recover
    them — silently recorded -1 leaves made sentences unretrievable and
    broke the flat-index build)."""
    import rag_cobweb_tpu.parallel.vforest as vfm
    from rag_cobweb_tpu.parallel.vforest import VForest

    rng = np.random.default_rng(9)
    centers = rng.normal(scale=4.0, size=(6, 12))
    xs = np.concatenate([
        c + 0.2 * rng.normal(size=(40, 12)) for c in centers
    ]).astype(np.float32)
    vf = VForest(TreeConfig(dim=12), n_subtrees=4, capacity_per_tree=1024,
                 seed=0, routing="content")
    saved = vfm._DEEP_STEPS
    vfm._DEEP_STEPS = 4          # waves truncate -> exact path recovers
    try:
        vf._budget = 2           # primary rounds truncate aggressively
        vf.add(xs)
    finally:
        vfm._DEEP_STEPS = saved
    import jax
    st = jax.device_get(vf.state)
    for lane in range(vf.K):
        lv = np.asarray(vf._leaf_of_local[lane], np.int64)
        if len(lv):
            assert (lv >= 0).all(), (lane, np.nonzero(lv < 0)[0])
            assert (st.counts[lane, lv] >= 1).all(), lane
    vf.flat_index()              # must not raise 'dead tree nodes'


def test_warmup_insert_programs_is_a_noop_on_state(data):
    """``warmup_insert_programs`` runs the insert programs against the
    LIVE state with all-off masks and discards every output (it no longer
    copies the state — the throwaway replica OOM'd K=512 x 2M warmups).
    It must leave the forest bit-identical and later inserts intact."""
    vf = VForest(TreeConfig(dim=16), n_subtrees=4, capacity_per_tree=512,
                 seed=0)
    vf.add(data[:40])
    before = jax.device_get(vf.state)
    vf.warmup_insert_programs(64)
    after = jax.device_get(vf.state)
    for name in before._fields:
        np.testing.assert_array_equal(getattr(before, name),
                                      getattr(after, name),
                                      err_msg=f"field {name}")
    # inserts after warmup still land and retrieve
    gids = vf.add(data[40:80])
    assert len(gids) == 40


def test_vforest_device_pinned_build_and_promote():
    """Cold-start path: build with the forest state pinned to an explicit
    device (the CPU backend stands in for the host side of the cpu-build
    -> promote-to-chip flow), then to_device() and keep querying."""
    import jax

    rng = np.random.default_rng(11)
    xs = rng.normal(size=(160, 16)).astype(np.float32)
    f = VForest(TreeConfig(dim=16), n_subtrees=4, capacity_per_tree=256,
                seed=0, device=jax.devices()[0])
    f.add(xs[:100])
    assert f._device is not None
    f.to_device()          # promote to the default backend
    assert f._device is None
    # post-promotion: querying and further adds still work
    _, ids = f.query_topk(xs[:8], k=5)
    for b in range(8):
        assert b in np.asarray(ids)[b]
    f.add(xs[100:])
    _, ids2 = f.query_topk(xs[150:152], k=3)
    assert 150 in np.asarray(ids2)[0]
