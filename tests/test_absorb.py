"""Depth-bounded leaf absorb (chain compaction, TreeConfig.absorb_depth).

Tight near-duplicate groups build one-leaf-per-duplicate fringe CHAINS
(each insert descends to the deepest leaf and fringe-splits it — depth 96+
measured under content routing on the hard corpus, RESULTS.md).  The
reference absorbs only EXACT matches (CobwebTorchTree.py:184-188);
``absorb_depth`` generalizes that: a leaf reached at depth >= the bound
absorbs the instance into its statistics, so tree depth stays bounded and
the sentences stay retrievable through leaf sentence runs + the exact
stored-embedding re-rank.  Default is 0 = off (reference parity — pinned
by the oracle tests in test_tree.py).
"""

import numpy as np

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.core.wrapper import CobwebIndex
from rag_cobweb_tpu.parallel.vforest import VForest

D = 12


def _near_dups(n, rng, center=None, eps=0.01):
    c = center if center is not None else rng.normal(size=D)
    return (c + eps * rng.normal(size=(n, D))).astype(np.float32)


def test_absorb_depth_bounds_chain():
    """A geometrically contracting sequence (every point far closer to the
    newest leaf than to its siblings) forces descend-then-fringe each
    insert — the chain pathology in miniature.  With the bound, depth
    stays at absorb_depth (small slack for merge-inserted levels)."""
    rng = np.random.default_rng(0)
    c = rng.normal(size=D).astype(np.float32)
    xs = np.asarray([c + (0.7 ** i) * rng.normal(size=D)
                     for i in range(60)], np.float32)

    deep = CobwebTree(TreeConfig(dim=D), capacity=512, seed=0)
    for x in xs:
        assert deep.ifit(x) >= 0
    d0 = deep.analyze_structure()["max_depth"]

    bounded = CobwebTree(TreeConfig(dim=D, absorb_depth=6), capacity=512,
                         seed=0)
    leaves = [bounded.ifit(x) for x in xs]
    assert all(l >= 0 for l in leaves)
    d1 = bounded.analyze_structure()["max_depth"]

    assert d0 > 15, d0          # the pathology is real on this input
    assert d1 <= 6 + 3, (d0, d1)


def test_absorbed_sentences_share_leaves_and_stats_hold():
    """Beyond the bound, inserts land in existing leaves whose Welford
    stats absorb them (count grows, mean tracks the group)."""
    rng = np.random.default_rng(1)
    xs = _near_dups(40, rng)
    t = CobwebTree(TreeConfig(dim=D, absorb_depth=4), capacity=256, seed=0)
    leaves = [t.ifit(x) for x in xs]
    import jax
    st = jax.device_get(t.state)
    counts = st.counts[np.asarray(leaves)]
    assert counts.max() >= 2          # at least one leaf absorbed multiple
    total = sum(float(st.counts[l]) for l in sorted(set(leaves)))
    assert total == len(xs)           # every instance counted exactly once
    # leaf means sit inside the group's tight ball
    for l in set(leaves):
        assert np.linalg.norm(st.means[l] - xs.mean(0)) < 0.2


def test_absorbed_rows_stay_retrievable_exact_rerank():
    """Shared-leaf rows are distinguished by the exact stored-embedding
    re-rank: k=1 self-retrieval must stay perfect."""
    rng = np.random.default_rng(2)
    groups = rng.normal(scale=4.0, size=(3, D))
    xs = np.concatenate([_near_dups(30, rng, g, eps=0.02) for g in groups])
    db = CobwebIndex(corpus=None, corpus_embeddings=xs,
                     config=TreeConfig(dim=D, absorb_depth=5))
    ids = np.asarray(db.query_ids(xs, k=1))
    hit = np.mean([i in row for i, row in zip(range(len(xs)), ids)])
    assert hit == 1.0, hit


def test_content_routing_defaults_absorb_depth():
    vf = VForest(TreeConfig(dim=D), n_subtrees=4, capacity_per_tree=256,
                 routing="content")
    assert vf.cfg.absorb_depth == 24
    rr = VForest(TreeConfig(dim=D), n_subtrees=4, capacity_per_tree=256)
    assert rr.cfg.absorb_depth == 0
    # explicit value wins
    vf2 = VForest(TreeConfig(dim=D, absorb_depth=8), n_subtrees=4,
                  capacity_per_tree=256, routing="content")
    assert vf2.cfg.absorb_depth == 8


def test_content_routing_dup_flood_stays_shallow():
    """The RESULTS.md pathology in miniature: a dup flood routed to one
    content lane must not build a deep chain, and everything inserts."""
    rng = np.random.default_rng(3)
    spread = rng.normal(scale=4.0, size=(100, D)).astype(np.float32)
    vf = VForest(TreeConfig(dim=D), n_subtrees=4, capacity_per_tree=1024,
                 seed=0, routing="content")
    vf.add(spread)                       # establish centroids
    flood = _near_dups(120, rng, center=spread[0], eps=0.005)
    gids = vf.add(flood)
    assert len(gids) == 120
    assert vf.max_depth() <= 24 + 4, vf.max_depth()
    _, got = vf.query_topk(flood[:16], k=3)
    group = set(int(g) for g in gids)
    hit = np.mean([bool(group & set(int(x) for x in row)) for row in got])
    assert hit >= 0.9


def test_config_json_roundtrip_absorb_depth():
    cfg = TreeConfig(dim=D, absorb_depth=7)
    d = cfg.to_json_dict()
    assert d["absorb_depth"] == 7
    assert TreeConfig.from_json_dict(d).absorb_depth == 7
    # absent key (older checkpoints) -> off
    d.pop("absorb_depth")
    assert TreeConfig.from_json_dict(d).absorb_depth == 0
