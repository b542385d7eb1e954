"""Multi-shard forest tests on the 8-device virtual CPU mesh: sharded
inserts, cross-shard query merge correctness, and recall parity with a
single-tree build."""

import numpy as np
import jax
import pytest

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.parallel.forest import CobwebForest, make_mesh


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=3.0, size=(10, 16))
    xs = np.concatenate(
        [c + 0.2 * rng.normal(size=(40, 16)) for c in centers]
    ).astype(np.float32)
    order = rng.permutation(len(xs))
    return xs[order]


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_forest_insert_balances_shards(data):
    forest = CobwebForest(TreeConfig(dim=16), capacity_per_shard=512, seed=0)
    gids = forest.add(data)
    assert len(gids) == 400
    counts = np.bincount(np.asarray(forest.shard_of), minlength=8)
    assert counts.min() == 50 and counts.max() == 50  # round robin

    # every shard's root count equals its share
    st = jax.device_get(forest.state)
    for s in range(8):
        root = int(st.root[s])
        assert float(st.counts[s, root]) == 50.0


def test_forest_query_retrieves_own_points(data):
    forest = CobwebForest(TreeConfig(dim=16), capacity_per_shard=512, seed=0)
    forest.add(data)
    qs = data[:16]
    scores, gids = forest.query_topk(qs, k=5)
    assert gids.shape == (16, 5)
    for b in range(16):
        assert b in gids[b], f"query {b}: {gids[b]}"
    # scores sorted descending
    assert (np.diff(scores, axis=1) <= 1e-5).all()


def test_forest_merge_is_global(data):
    """The merged top-k must span multiple shards (round-robin guarantees
    neighbors of a cluster live on different shards)."""
    forest = CobwebForest(TreeConfig(dim=16), capacity_per_shard=512, seed=0)
    forest.add(data)
    _, gids = forest.query_topk(data[:8], k=8)
    shards_hit = {int(g) % 8 for row in gids for g in row if g >= 0}
    assert len(shards_hit) >= 4


def test_forest_recall_close_to_single_tree(data):
    rng = np.random.default_rng(1)
    qs = data[:50] + 0.05 * rng.normal(size=(50, 16)).astype(np.float32)

    forest = CobwebForest(TreeConfig(dim=16), capacity_per_shard=512, seed=0)
    forest.add(data)
    _, f_ids = forest.query_topk(qs, k=10)

    tree = CobwebTree(TreeConfig(dim=16), capacity=2048, seed=0)
    leaves = tree.fit(data)
    idx = index_mod.build_index(tree, leaves)
    import jax.numpy as jnp
    _, t_ids = index_mod.query_topk(idx, jnp.asarray(qs), 10)
    t_ids = np.asarray(t_ids)

    def recall(ids):
        return np.mean([1.0 if b in ids[b] else 0.0 for b in range(50)])

    r_forest, r_tree = recall(f_ids), recall(t_ids)
    assert r_forest >= r_tree - 0.1, (r_forest, r_tree)


def test_forest_incremental_add(data):
    forest = CobwebForest(TreeConfig(dim=16), capacity_per_shard=512, seed=0)
    forest.add(data[:200])
    gids2 = forest.add(data[200:])
    assert gids2[0] == 200
    _, gids = forest.query_topk(data[300:302], k=3)
    assert 300 in gids[0]
