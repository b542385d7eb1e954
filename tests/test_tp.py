"""Within-tree tensor parallelism (parallel/tp.py) on the 8-device virtual
CPU mesh: the D-sharded psum GEMM + S-sharded path-sum must reproduce the
single-device query exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.parallel.forest import make_mesh
from rag_cobweb_tpu.parallel.tp import (
    TPFusedPredictionIndex, TPPredictionIndex, shard_fused_index, shard_index)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=3.0, size=(10, 20))  # D=20: 20 % 8 != 0 -> D pad
    xs = np.concatenate(
        [c + 0.2 * rng.normal(size=(21, 20)) for c in centers]  # S=210 pad
    ).astype(np.float32)
    order = rng.permutation(len(xs))
    xs = xs[order]
    tree = CobwebTree(TreeConfig(dim=20), capacity=2048, seed=0)
    leaves = tree.fit(xs)
    idx = index_mod.build_index(tree, leaves)
    return idx, xs


def test_shard_index_shapes(built):
    idx, xs = built
    tp = shard_index(idx, 8)
    assert tp.ivt.shape[0] == 8
    assert tp.ivt.shape[1] * 8 >= idx.inv_var_T.shape[0]
    assert tp.paths.shape[0] == 8
    sid = np.asarray(tp.sid).reshape(-1)
    assert set(sid[sid >= 0].tolist()) == set(range(len(xs)))


def test_tp_query_matches_single_device(built):
    idx, xs = built
    mesh = make_mesh(8)
    tp = TPPredictionIndex(idx, mesh)
    q = jnp.asarray(xs[:32])
    want_s, want_ids = index_mod.query_topk(idx, q, 5)
    got_s, got_ids = tp.query_topk(np.asarray(q), 5)
    # same candidate sets; scores agree up to f32 accumulation order (the
    # TP path-sum gathers from the psum'd nlp, a different reduction order)
    np.testing.assert_allclose(np.sort(got_s, 1), np.sort(np.asarray(want_s), 1),
                               rtol=1e-4, atol=1e-3)
    for b in range(32):
        assert set(got_ids[b]) == set(np.asarray(want_ids)[b].tolist()), b


def test_tp_query_rerank_retrieves_own_point(built):
    idx, xs = built
    mesh = make_mesh(8)
    tp = TPPredictionIndex(idx, mesh)
    _, ids = tp.query_topk(xs[:24], 5, rerank=32)
    for b in range(24):
        assert b in ids[b]


def test_forest_mesh_single_host():
    from rag_cobweb_tpu.parallel.distributed import (
        forest_mesh, initialize, local_shard_count,
    )
    initialize()  # single-process no-op
    mesh = forest_mesh()
    assert local_shard_count(mesh) == len(jax.devices())
    mesh2 = forest_mesh(shards_per_host=4)
    assert local_shard_count(mesh2) == 4


def test_shard_fused_index_shapes(built):
    idx, xs = built
    fidx = index_mod.build_fused_index(idx)
    tp = shard_fused_index(fidx, 8)   # Sp=2048 -> 256 columns per shard
    assert tp.GT.shape[0] == 8
    assert tp.GT.shape[1] == fidx.GT.shape[0]
    assert tp.GT.shape[0] * tp.GT.shape[2] >= fidx.GT.shape[1]
    sid = np.asarray(tp.sid).reshape(-1)
    assert set(sid[sid >= 0].tolist()) == set(range(len(xs)))


def test_tp_fused_query_matches_single_device(built):
    idx, xs = built
    fidx = index_mod.build_fused_index(idx)
    mesh = make_mesh(8)
    tp = TPFusedPredictionIndex(fidx, mesh)
    q = jnp.asarray(xs[:32])
    want_s, want_ids = index_mod.fused_query_topk(fidx, q, 5)
    got_s, got_ids = tp.query_topk(np.asarray(q), 5)
    np.testing.assert_allclose(got_s, np.asarray(want_s),
                               rtol=1e-4, atol=1e-3)
    for b in range(32):
        assert set(got_ids[b]) == set(np.asarray(want_ids)[b].tolist()), b


def test_tp_fused_exact_rerank_matches_single_device_ordering(built):
    """bf16 slab sweep for the pool, exact stored-row L2 as the merge key:
    the sharded ordering must equal the single-device exact re-rank."""
    idx, xs = built
    fidx = index_mod.build_fused_index(idx, dtype=jnp.bfloat16)
    mesh = make_mesh(8)
    tp = TPFusedPredictionIndex(fidx, mesh, embeddings=xs)
    q = jnp.asarray(xs[:16] + 0.01)
    _, want = index_mod.exact_rerank(
        jnp.asarray(xs), q,
        jnp.broadcast_to(jnp.arange(len(xs), dtype=jnp.int32),
                         (16, len(xs))),
        jnp.zeros((16, len(xs))), 5)
    _, got = tp.query_topk(np.asarray(q), 5, rerank=64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tp_exact_rerank_matches_single_device_ordering(built):
    """With stored embeddings, the TP cross-shard merge key is the exact
    stored-vector L2 — globally calibrated, so the merged ORDERING must
    equal the single-device exact re-rank (not just the candidate set).
    This pins the semantics the leaf-lp fallback cannot guarantee."""
    idx, xs = built
    mesh = make_mesh(8)
    tp = TPPredictionIndex(idx, mesh, embeddings=xs)
    q = jnp.asarray(xs[:16] + 0.01)
    _, want = index_mod.exact_rerank(
        jnp.asarray(xs), q,
        jnp.broadcast_to(jnp.arange(len(xs), dtype=jnp.int32),
                         (16, len(xs))),
        jnp.zeros((16, len(xs))), 5)
    _, got = tp.query_topk(np.asarray(q), 5, rerank=64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
