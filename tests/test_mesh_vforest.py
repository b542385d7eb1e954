"""Composed layout tests (VERDICT r3 #5): a K-lane vmapped VForest inside
EVERY mesh shard (N devices x K lanes) on the 8-device virtual CPU mesh —
the multi-chip insert-throughput layout the vforest docstring promises.
"""

import numpy as np
import jax
import pytest

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.parallel.forest import make_mesh
from rag_cobweb_tpu.parallel.mesh_vforest import MeshVForest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=3.0, size=(10, 16))
    xs = np.concatenate(
        [c + 0.2 * rng.normal(size=(40, 16)) for c in centers]
    ).astype(np.float32)
    return xs[rng.permutation(len(xs))]


@pytest.fixture(scope="module")
def mvf(data):
    f = MeshVForest(TreeConfig(dim=16), lanes_per_shard=4,
                    capacity_per_lane=256, seed=0)
    f.add(data)
    return f


def test_composed_lane_count(mvf):
    assert mvf.n_shards == 8 and mvf.K == 4 and mvf.L == 32
    # state leading axis is the total lane count, sharded over the mesh
    assert mvf.state.counts.shape[0] == 32
    shard_sizes = {d.data.shape[0]
                   for d in mvf.state.counts.addressable_shards}
    assert shard_sizes == {4}, shard_sizes


def test_composed_insert_balances_lanes(mvf, data):
    counts = np.bincount(np.asarray(mvf.shard_of), minlength=32)
    assert counts.min() > 0 and counts.max() - counts.min() <= 1
    # every lane's root count equals its share
    st = jax.device_get(mvf.state)
    for lane in range(32):
        root = int(st.root[lane])
        assert float(st.counts[lane, root]) == counts[lane]


def test_composed_query_retrieves_own_points(mvf, data):
    scores, gids = mvf.query_topk(data[:16], k=5)
    assert gids.shape == (16, 5)
    for b in range(16):
        assert b in gids[b], f"query {b}: {gids[b]}"
    assert (np.diff(scores, axis=1) <= 1e-5).all()


def test_composed_merge_spans_shards_and_lanes(mvf, data):
    _, gids = mvf.query_topk(data[:8], k=8)
    lanes_hit = {int(g) % 32 for row in gids for g in row if g >= 0}
    # candidates must cross both device shards and lanes within a shard
    shards_hit = {lane % 8 for lane in lanes_hit}
    assert len(shards_hit) >= 4, shards_hit
    assert len(lanes_hit) >= 8, lanes_hit


def test_composed_recall_close_to_single_tree(mvf, data):
    rng = np.random.default_rng(1)
    qs = data[:50] + 0.05 * rng.normal(size=(50, 16)).astype(np.float32)
    _, f_ids = mvf.query_topk(qs, k=10)

    tree = CobwebTree(TreeConfig(dim=16), capacity=2048, seed=0)
    leaves = tree.fit(data)
    idx = index_mod.build_index(tree, leaves)
    import jax.numpy as jnp
    _, t_ids = index_mod.query_topk(idx, jnp.asarray(qs), 10)
    t_ids = np.asarray(t_ids)

    def recall(ids):
        return np.mean([1.0 if b in np.asarray(ids)[b] else 0.0
                        for b in range(50)])

    r_mesh, r_tree = recall(f_ids), recall(t_ids)
    assert r_mesh >= r_tree - 0.1, (r_mesh, r_tree)


def test_composed_deep_descent_escalates(data, monkeypatch):
    """ADVICE r4: descents past the composed layout's deep budget must
    escalate to the per-lane exact path (the single-device VForest rule)
    instead of aborting mid-batch.  A tiny budget forces EVERY mature
    descent over it; the distinct dim keys a fresh _mesh_vinsert cache
    entry so the patched budget is actually traced in."""
    from rag_cobweb_tpu.parallel import vforest as vf

    monkeypatch.setattr(vf, "_DEEP_STEPS", 3)
    xs = np.repeat(data[:4], 24, axis=0).astype(np.float32)
    xs = np.ascontiguousarray(xs[:, :12])     # dim 12 -> fresh jit cache
    xs += 0.001 * np.random.default_rng(2).normal(
        size=xs.shape).astype(np.float32)     # near-dup fringe chains
    f = MeshVForest(TreeConfig(dim=12), lanes_per_shard=1,
                    capacity_per_lane=512, seed=0)
    gids = f.add(xs)                           # must NOT raise
    assert len(gids) == len(xs)
    # every instance landed on a real leaf and is retrievable
    _, got = f.query_topk(xs[:4], k=4)
    assert (got >= 0).any(axis=1).all()


def test_composed_incremental_add(data):
    f = MeshVForest(TreeConfig(dim=16), lanes_per_shard=2,
                    capacity_per_lane=256, seed=0)
    f.add(data[:200])
    gids2 = f.add(data[200:])
    assert gids2[0] == 200
    _, gids = f.query_topk(data[300:302], k=3)
    assert 300 in gids[0]
