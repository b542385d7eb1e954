"""Utility-layer tests: binary checkpoints, logger, phase timer."""

import numpy as np

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.core.wrapper import CobwebIndex
from rag_cobweb_tpu.utils.logging import get_logger
from rag_cobweb_tpu.utils.profiling import PhaseTimer


def test_tree_npz_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(50, 8)).astype(np.float32)
    tree = CobwebTree(TreeConfig(dim=8), capacity=256, seed=0)
    tree.fit(xs)
    p = str(tmp_path / "tree.npz")
    tree.save_npz(p)
    tree2, extras = CobwebTree.load_npz(p)
    assert tree2.cfg == tree.cfg
    assert tree2.num_nodes() == tree.num_nodes()
    np.testing.assert_allclose(
        np.asarray(tree.state.means), np.asarray(tree2.state.means)
    )


def test_wrapper_binary_checkpoint(tmp_path):
    rng = np.random.default_rng(1)
    embs = rng.normal(size=(40, 8)).astype(np.float32)
    sentences = [f"s{i}" if i % 3 else None for i in range(40)]
    db = CobwebIndex(sentences, embs)
    p = str(tmp_path / "db.npz")
    db.save(p)
    db2 = CobwebIndex.load(p)
    assert len(db2) == 40
    assert db2.sentences[0] is None and db2.sentences[1] == "s1"
    a = db.predict_fast(embs[5], k=5, is_embedding=True, return_ids=True)
    b = db2.predict_fast(embs[5], k=5, is_embedding=True, return_ids=True)
    assert a == b


def test_logger_idempotent_and_writes_file(tmp_path, capsys):
    log_file = str(tmp_path / "x.log")
    lg1 = get_logger("rct_test", level="DEBUG", log_file=log_file)
    lg2 = get_logger("rct_test")
    assert lg1 is lg2
    assert len(lg1.handlers) == 2
    lg1.info("hello world")
    assert "hello world" in open(log_file).read()


def test_phase_timer_accumulates():
    t = PhaseTimer(sync=False)
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    s = t.summary()
    assert "a" in s and "mean_ms" in s
    d = t.as_dict()
    assert d["a"]["calls"] == 2


def test_roofline_product_path_model():
    """Composite product-path model: sequential stage-sum bound, dominant
    stage names the bound, measured-gather-cost term scales with rows and
    row bytes."""
    from rag_cobweb_tpu.bench import roofline as rl

    m = rl.product_path_model(1024, 1_000_000, 128, 512, 128)
    assert m.min_time_override_s > 0
    # the re-rank gather dominates this configuration; the POOL stage
    # (score READ charged sequentially at full bandwidth — r5 refinement)
    # is present but smaller
    assert m.bound() == "GATHER"
    # the POOL stage scales the bound with corpus size even at a fixed
    # gather (same pool), beyond the sweep's own HBM growth
    m2 = rl.product_path_model(1024, 2_000_000, 128, 512, 128)
    assert m2.min_time_override_s > 1.35 * m.min_time_override_s
    rep = m.report(2 * m.min_time_override_s, 1024)
    assert abs(rep["roofline_frac"] - 0.5) < 0.01

    big = rl.product_path_model(512, 4_000_000, 128, 512, 128)
    assert big.bound() == "HBM"   # the (B, Sp) score traffic dominates
    with_bs = rl.product_path_model(512, 4_000_000, 128, 512, 128,
                                    backstop=256)
    assert with_bs.min_time_override_s > big.min_time_override_s

    # gather cost: linear in rows, increasing in row bytes
    assert rl.gather_time_s(2000, 512) == 2 * rl.gather_time_s(1000, 512)
    assert rl.gather_time_s(1000, 3072) > rl.gather_time_s(1000, 512)
