"""Frozen-epoch bulk insert: invariants, duplicate handling, recall parity
with the exact path, and equivalence when chunk=1 (no within-chunk
approximation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rag_cobweb_tpu.core.bulk import bulk_insert
from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.core import index as index_mod


def clustered(rng, n_clusters=10, per=40, dim=16, spread=0.25):
    centers = rng.normal(scale=3.0, size=(n_clusters, dim))
    xs = np.concatenate(
        [c + spread * rng.normal(size=(per, dim)) for c in centers]
    ).astype(np.float32)
    return xs[rng.permutation(len(xs))]


def check_invariants(tree):
    st = tree._host_arrays()
    root = int(st.root)
    stack, seen = [root], set()
    while stack:
        n = stack.pop()
        assert n not in seen, f"cycle at {n}"
        seen.add(n)
        nc = int(st.n_children[n])
        if nc:
            s = 0.0
            for i in range(nc):
                c = int(st.children[n, i])
                assert c >= 0
                assert int(st.parent[c]) == n, (n, c, int(st.parent[c]))
                s += float(st.counts[c])
                stack.append(c)
            assert float(st.counts[n]) == pytest.approx(s, abs=1e-2)
    return seen


def test_bulk_counts_and_invariants():
    rng = np.random.default_rng(0)
    xs = clustered(rng)
    tree = CobwebTree(TreeConfig(dim=16), capacity=4096, seed=0)
    tree.fit(xs[:64])                     # warm exact base
    leaves = bulk_insert(tree, xs[64:], chunk=128)
    assert (leaves >= 0).all()
    st = tree._host_arrays()
    assert float(st.counts[int(st.root)]) == len(xs)
    check_invariants(tree)


def test_bulk_duplicates_absorb():
    rng = np.random.default_rng(1)
    base = clustered(rng, n_clusters=4, per=10, dim=8)
    tree = CobwebTree(TreeConfig(dim=8), capacity=2048, seed=0)
    first = tree.fit(base)
    dups = np.concatenate([base[:5], base[:5]])   # duplicate pairs in chunk
    leaves = bulk_insert(tree, dups, chunk=16)
    for i in range(5):
        assert leaves[i] == first[i]
        assert leaves[i + 5] == first[i]
    st = tree._host_arrays()
    assert float(st.counts[int(first[0])]) == 3.0  # original + two dups


def test_bulk_recall_parity_with_exact():
    rng = np.random.default_rng(2)
    xs = clustered(rng, n_clusters=12, per=50, dim=24)
    qs = xs[:80] + 0.05 * rng.normal(size=(80, 24)).astype(np.float32)

    exact = CobwebTree(TreeConfig(dim=24), capacity=8192, seed=0)
    l_exact = exact.fit(xs)
    idx_e = index_mod.build_index(exact, l_exact)
    _, top_e = index_mod.query_topk(idx_e, jnp.asarray(qs), 10)

    bulk = CobwebTree(TreeConfig(dim=24), capacity=8192, seed=0)
    l0 = bulk.fit(xs[:64])
    l1 = bulk_insert(bulk, xs[64:], chunk=128)
    leaves_b = np.concatenate([l0, l1])
    idx_b = index_mod.build_index(bulk, leaves_b.astype(np.int32))
    _, top_b = index_mod.query_topk(idx_b, jnp.asarray(qs), 10)

    def recall(top):
        t = np.asarray(top)
        return np.mean([1.0 if b in t[b] else 0.0 for b in range(80)])

    r_e, r_b = recall(top_e), recall(top_b)
    assert r_b >= r_e - 0.05, (r_b, r_e)


def test_bulk_matches_exact_stats_for_chunk_of_one():
    """With chunk=1 there is no frozen-epoch approximation for stats: every
    instance sees all prior updates.  Tree root count and totals match the
    exact path (structure can differ only via tie-break RNG draws)."""
    rng = np.random.default_rng(3)
    xs = clustered(rng, n_clusters=4, per=15, dim=8)
    a = CobwebTree(TreeConfig(dim=8), capacity=2048, seed=0)
    a.fit(xs[:16])
    bulk_insert(a, xs[16:], chunk=1)
    st = a._host_arrays()
    assert float(st.counts[int(st.root)]) == len(xs)
    check_invariants(a)


def test_bulk_stress_mixed_structure():
    """Heavier stress: many chunks over mixed clustered+uniform data; full
    structural invariants + free-list sanity after merge/split composition."""
    rng = np.random.default_rng(7)
    a = clustered(rng, n_clusters=8, per=30, dim=10, spread=0.3)
    b = rng.normal(size=(160, 10)).astype(np.float32) * 2.0
    xs = np.concatenate([a, b])[rng.permutation(400)]
    tree = CobwebTree(TreeConfig(dim=10), capacity=8192, seed=0)
    tree.fit(xs[:40])
    leaves = bulk_insert(tree, xs[40:], chunk=64)
    assert (leaves >= 0).all()
    st = tree._host_arrays()
    assert float(st.counts[int(st.root)]) == 400
    live = check_invariants(tree)
    # freed nodes must not be reachable
    free_top = int(st.free_top)
    freed = set(int(x) for x in st.free_stack[:free_top])
    assert not (freed & live), freed & live
    # every live non-root node has a valid parent in the live set
    for n in live:
        p = int(st.parent[n])
        if n != int(st.root):
            assert p in live


def test_bulk_then_query_quality():
    rng = np.random.default_rng(8)
    xs = clustered(rng, n_clusters=10, per=60, dim=16)
    t2 = CobwebTree(TreeConfig(dim=16), capacity=8192, seed=0)
    l0 = t2.fit(xs[:64])
    l1b = bulk_insert(t2, xs[64:], chunk=256)
    leaves_all = np.concatenate([l0.astype(np.int64), l1b])
    import jax.numpy as jnp
    idx = index_mod.build_index(t2, leaves_all.astype(np.int32))
    qs = xs[::10] + 0.05 * rng.normal(size=(60, 16)).astype(np.float32)
    _, top = index_mod.query_topk(idx, jnp.asarray(qs), 10)
    gold = np.arange(0, 600, 10)
    rec = np.mean([1.0 if gold[i] in np.asarray(top)[i] else 0.0
                   for i in range(60)])
    assert rec > 0.85, rec
