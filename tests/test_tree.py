"""Behavioral-parity tests: the flat-array TPU tree must produce the same
tree (same structure, same sufficient statistics) as an independent numpy
implementation of the reference algorithm, on data without score ties."""

import numpy as np
import pytest

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree

from reference_oracle import OracleTree


def tpu_tree_signature(tree: CobwebTree):
    st = tree._host_arrays()

    def sig(n):
        nc = int(st.n_children[n])
        child_sigs = tuple(sorted(sig(int(st.children[n, i])) for i in range(nc)))
        return (
            round(float(st.counts[n]), 4),
            tuple(round(float(v), 4) for v in st.means[n]),
            child_sigs,
        )

    return sig(int(st.root))


def build_both(xs, cfg=None, **oracle_kw):
    cfg = cfg or TreeConfig(dim=xs.shape[1])
    tree = CobwebTree(cfg, capacity=4 * len(xs) + 16, seed=0)
    tree.fit(xs)
    oracle = OracleTree(xs.shape[1], **oracle_kw)
    for x in xs:
        oracle.ifit(x)
    return tree, oracle


@pytest.mark.parametrize("n,dim,seed", [(8, 4, 0), (30, 6, 1), (60, 5, 2)])
def test_tree_matches_oracle_random_data(n, dim, seed):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(n, dim)).astype(np.float32)
    tree, oracle = build_both(xs)
    assert tpu_tree_signature(tree) == oracle.signature()


def test_tree_matches_oracle_clustered_data():
    rng = np.random.default_rng(3)
    centers = rng.normal(scale=3.0, size=(5, 6))
    xs = np.concatenate(
        [c + 0.2 * rng.normal(size=(12, 6)) for c in centers]
    ).astype(np.float32)
    order = rng.permutation(len(xs))
    tree, oracle = build_both(xs[order])
    assert tpu_tree_signature(tree) == oracle.signature()


def test_tree_matches_oracle_score_variants():
    rng = np.random.default_rng(4)
    xs = rng.normal(size=(25, 4)).astype(np.float32)
    for kw, cfg in [
        (dict(use_info=True, use_kl=False),
         TreeConfig(dim=4, use_info=True, use_kl=False)),
        (dict(use_info=False),
         TreeConfig(dim=4, use_info=False)),
        (dict(acuity_cutoff=True),
         TreeConfig(dim=4, acuity_cutoff=True)),
    ]:
        tree = CobwebTree(cfg, capacity=256, seed=0)
        tree.fit(xs)
        oracle = OracleTree(4, **kw)
        for x in xs:
            oracle.ifit(x)
        assert tpu_tree_signature(tree) == oracle.signature(), kw


def test_exact_duplicate_instances_share_a_leaf():
    """Exact-match leaves absorb duplicates (CobwebTorchTree.py:184-188)."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(6, 4)).astype(np.float32)
    xs = np.concatenate([base, base[:2]])  # two duplicates
    cfg = TreeConfig(dim=4)
    tree = CobwebTree(cfg, capacity=128, seed=0)
    leaves = tree.fit(xs)
    assert leaves[6] == leaves[tuple(np.where((base == base[6 % 6]).all(1))[0])[0]] \
        if False else True  # structural check below is the real assertion
    # duplicate of base[0] must land on the same leaf as base[0]
    assert leaves[6] == leaves[0]
    assert leaves[7] == leaves[1]
    st = tree._host_arrays()
    assert float(st.counts[leaves[0]]) == 2.0


def test_insert_counts_are_consistent():
    """Root count equals number of inserts; every internal node's count equals
    the sum of its children's counts."""
    rng = np.random.default_rng(6)
    xs = rng.normal(size=(40, 5)).astype(np.float32)
    tree = CobwebTree(TreeConfig(dim=5), capacity=512, seed=0)
    tree.fit(xs)
    st = tree._host_arrays()
    assert float(st.counts[int(st.root)]) == 40.0
    for n in tree.live_nodes():
        nc = int(st.n_children[n])
        if nc:
            s = sum(float(st.counts[int(st.children[n, i])]) for i in range(nc))
            assert float(st.counts[n]) == pytest.approx(s, abs=1e-3)


def test_batched_equals_sequential_ifit():
    """fit() (one device computation) must equal repeated ifit() calls."""
    rng = np.random.default_rng(7)
    xs = rng.normal(size=(20, 4)).astype(np.float32)
    t1 = CobwebTree(TreeConfig(dim=4), capacity=256, seed=0)
    t1.fit(xs)
    t2 = CobwebTree(TreeConfig(dim=4), capacity=256, seed=0)
    for x in xs:
        t2.ifit(x)
    assert tpu_tree_signature(t1) == tpu_tree_signature(t2)


def test_structure_analysis_reports_leaves():
    rng = np.random.default_rng(8)
    xs = rng.normal(size=(40, 5)).astype(np.float32)
    tree = CobwebTree(TreeConfig(dim=5), capacity=512, seed=0)
    tree.fit(xs)
    s = tree.analyze_structure()
    assert s["leaf_count"] == 40  # no duplicates in random normal data
    assert s["num_nodes"] <= 2 * 40 - 1


def test_json_round_trip():
    rng = np.random.default_rng(9)
    xs = rng.normal(size=(25, 4)).astype(np.float32)
    tree = CobwebTree(TreeConfig(dim=4), capacity=256, seed=0)
    leaves = tree.fit(xs)
    sids = {}
    for i, leaf in enumerate(leaves):
        sids.setdefault(int(leaf), []).append(i)
    blob = tree.dump_json(sids)
    tree2, sids2 = CobwebTree.load_json(blob)
    assert tpu_tree_signature(tree) == tpu_tree_signature(tree2)
    assert {tuple(v) for v in sids.values()} == {tuple(v) for v in sids2.values()}


def test_capacity_growth():
    rng = np.random.default_rng(10)
    xs = rng.normal(size=(50, 4)).astype(np.float32)
    tree = CobwebTree(TreeConfig(dim=4), capacity=8, seed=0)  # deliberately tiny
    tree.fit(xs, batch_size=16)
    st = tree._host_arrays()
    assert float(st.counts[int(st.root)]) == 50.0


def test_vmapped_insert_matches_sequential():
    """vmap over stacked trees must do exactly what per-tree sequential
    inserts do (the deferred descent makes this shape-safe)."""
    import jax
    import jax.numpy as jnp
    from rag_cobweb_tpu.core import tree as tree_mod

    rng = np.random.default_rng(11)
    K, n, dim = 4, 15, 6
    xs = rng.normal(size=(K, n, dim)).astype(np.float32)
    cfg = TreeConfig(dim=dim)
    keys = jax.random.split(jax.random.PRNGKey(0), K * n).reshape(K, n, -1)

    states = [tree_mod.init_state(256, dim, cfg.max_fanout)
              for _ in range(K)]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *states)

    vstep = jax.jit(jax.vmap(
        lambda s, x, k: tree_mod._insert_one(s, x, k, cfg)
    ))
    for i in range(n):
        stacked, _ = vstep(stacked, jnp.asarray(xs[:, i]), keys[:, i])

    step = jax.jit(lambda s, x, k: tree_mod._insert_one(s, x, k, cfg))
    for lane in range(K):
        st = states[lane]
        for i in range(n):
            st, _ = step(st, jnp.asarray(xs[lane, i]), keys[lane, i])
        for field in ("counts", "means", "parent", "children",
                      "n_children", "root", "n_alloc", "free_top"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st, field)),
                np.asarray(getattr(stacked, field)[lane]),
                err_msg=f"lane {lane} field {field}",
            )


def test_truncated_descent_escalates_to_exact_path():
    """Descents the batch scan budget truncates must escalate to the
    _EXACT_STEPS exact path instead of recording leaf=-1 (the round-3
    dead-leaf bug: content routing concentrated near-duplicate groups
    into descents deeper than 48 steps, the dropped rows vanished from
    every index, and flat-index builds failed with 'sentences map to
    dead tree nodes').  Forcing a tiny budget makes MOST descents
    truncate, exercising the recovery on every tree shape."""
    import rag_cobweb_tpu.core.tree as tm

    rng = np.random.default_rng(3)
    centers = rng.normal(scale=4.0, size=(6, 8))
    xs = np.concatenate([
        c + 0.2 * rng.normal(size=(30, 8)) for c in centers
    ]).astype(np.float32)
    cfg = TreeConfig(dim=8)
    tree = CobwebTree(cfg, capacity=2048, seed=0)
    orig = tm.insert_batch
    calls = {"deep": 0}
    orig_one = tm.insert_one_jit

    def spy_one(*a, **kw):
        if kw.get("max_steps", 48) > 48:
            calls["deep"] += 1
        return orig_one(*a, **kw)

    tm.insert_batch = lambda st, x, k, n, c: orig(st, x, k, n, c,
                                                  max_steps=2)
    tm.insert_one_jit = spy_one
    try:
        leaves = tree.fit(xs)
    finally:
        tm.insert_batch = orig
        tm.insert_one_jit = orig_one
    assert calls["deep"] > 0, "escalation path never exercised"
    assert (leaves >= 0).all(), np.nonzero(leaves < 0)[0]
    st = tree._host_arrays()
    assert (st.counts[leaves] >= 1).all()
    # EXACT count conservation: a truncated descent must apply NOTHING
    # (the escalated retry re-runs the whole insert) — a partial apply
    # would double-count the walked path's ancestors
    assert int(st.counts[int(st.root)]) == len(xs)
