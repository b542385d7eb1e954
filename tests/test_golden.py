"""Golden-number regression (SURVEY.md §4 "regression-by-artifact").

Two layers:
  1. the reference's committed benchmark artifacts are parsed by
     ``bench.report.parse_reference_results_file`` and pinned against the
     numbers BASELINE.md claims (validating our baseline provenance);
  2. our own harness run on the hermetic synthetic dataset is pinned with
     tolerance bands, so recall/format regressions fail CI.
"""

import os

import numpy as np
import pytest

from rag_cobweb_tpu.bench import report

REF_QQP_ARTIFACT = (
    "/root/reference/outputs/qqp/"
    "benchmark_all-roberta-large-v1_validation_all-roberta-large-v1_"
    "qqp_validation_c10000_t1000_k20_d21a8956.txt"
)


@pytest.mark.skipif(not os.path.exists(REF_QQP_ARTIFACT),
                    reason="reference artifacts not present")
def test_reference_artifact_pins_baseline_numbers():
    """The flagship QQP c=10000 artifact must contain exactly the numbers
    BASELINE.md (and bench.py's vs_baseline denominator) are built on."""
    rows = report.parse_reference_results_file(REF_QQP_ARTIFACT)
    assert "FAISS" in rows
    assert rows["FAISS"]["recall@10"] == pytest.approx(0.913, abs=1e-3)
    assert rows["FAISS"]["avg_latency_ms"] == pytest.approx(3.96, abs=0.01)
    fast = rows["Cobweb PCA + ICA Fast"]
    assert fast["recall@10"] == pytest.approx(0.906, abs=1e-3)
    assert fast["avg_latency_ms"] == pytest.approx(53.1, abs=0.1)
    basic = rows["Cobweb Basic"]
    assert basic["recall@10"] == pytest.approx(0.146, abs=1e-3)
    # every method block carries the full k ladder up to 20
    for r in rows.values():
        for k in (2, 3, 5, 10, 20):
            assert f"recall@{k}" in r
            assert f"mrr@{k}" in r
            assert f"ndcg@{k}" in r


@pytest.mark.skipif(not os.path.isdir("/root/reference/outputs"),
                    reason="reference artifacts not present")
def test_reference_artifacts_parse_broadly():
    import glob
    files = sorted(glob.glob("/root/reference/outputs/*/benchmark_*.txt"))
    assert files
    parsed = 0
    for f in files:
        rows = report.parse_reference_results_file(f)
        for r in rows.values():
            assert 0.0 <= r.get("recall@10", 0.0) <= 1.0
            parsed += 1
    assert parsed >= 20  # the recorded regression surface is substantial


GOLDEN = {
    # synthetic harness goldens (seed=42, c=2000 t=250 dim=256 -> PCA+ICA):
    # bands wide enough for cross-platform jitter, tight enough to catch
    # a real recall/latency regression (recall drops >2pts, ties broken)
    "Flat IP (TPU)": {"recall@10": (0.97, 1.0)},
    "Cobweb PCA+ICA Fast (TPU)": {"recall@10": (0.95, 1.0)},
    "Cobweb PCA+ICA (beam) (TPU)": {"recall@10": (0.95, 1.0)},
}


@pytest.fixture(scope="module")
def harness_run(tmp_path_factory):
    from rag_cobweb_tpu.bench.harness import BenchmarkRunner
    root = tmp_path_factory.mktemp("golden_run")
    runner = BenchmarkRunner("synthetic", root=str(root))
    results = runner.run(
        model_name="synthetic", subset_size=2000, target_size=250,
        top_k=10, method="golden", dim=256, seed=42,
    )
    return root, results


def test_synthetic_goldens(harness_run, monkeypatch):
    _, results = harness_run
    by_method = {r["method"]: r for r in results}
    for method, bands in GOLDEN.items():
        assert method in by_method, (method, list(by_method))
        for metric, (lo, hi) in bands.items():
            val = by_method[method][metric]
            assert lo <= val <= hi, (method, metric, val)


def test_results_table_roundtrip(harness_run):
    """Our written artifact parses back to the same numbers (the
    regression-by-artifact loop closes: write -> parse -> compare)."""
    root, results = harness_run
    import glob
    files = glob.glob(str(root) + "/outputs/synthetic/benchmark_*.txt")
    assert len(files) == 1
    rows = report.parse_results_file(files[0])
    assert len(rows) == len(results)
    by_method = {r["method"]: r for r in rows}
    for res in results:
        got = by_method[res["method"]]
        assert got["recall@10"] == pytest.approx(res["recall@10"], abs=5e-5)
        assert got["avg_latency_ms"] == pytest.approx(
            res["avg_latency_ms"], abs=5e-4)


# --------------------------------------------------------------------------- #
# hard-mode dataset goldens (VERDICT r2 #1: a benchmark that can fail)        #
# --------------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def hard_run():
    from rag_cobweb_tpu.bench.datasets import synthetic_retrieval_hard
    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex

    data = synthetic_retrieval_hard(3000, 300, 256, seed=0)

    def recall(ids, k=10):
        return float(np.mean([
            g in row[:k] for row, g in zip(np.asarray(ids), data.target_ids)
        ]))

    exact_raw = recall(FlatIndex(data.corpus_embs, metric="l2")
                       .search(data.query_embs, 10))
    wh = PCAICAWhiteningModel.fit(data.corpus_embs, pca_dim=96,
                                  ica_max_iter=300, seed=0,
                                  ica_sample_size=3000)
    cw = wh.transform(data.corpus_embs)
    qw = wh.transform(data.query_embs)
    whitened_exact = recall(FlatIndex(cw, metric="l2").search(qw, 10))
    db = CobwebIndex(config=TreeConfig(dim=cw.shape[1]),
                     capacity=4 * len(cw) + 16, n_subtrees=8)
    db.add_sentences([None] * len(cw), cw)
    cobweb = recall(db.query_ids(qw, 10, rerank=256))
    return exact_raw, whitened_exact, cobweb


def test_hard_dataset_difficulty_is_calibrated(hard_run):
    """The hard synthetic must be HARD for exact search — a saturated
    metric cannot detect ranking regressions.  (Measured: 0.910 at
    c=3000/d=256 seed=0; the c=10000/d=768 bench config lands 0.906,
    matching the reference's QQP regime of FAISS 0.913.)"""
    exact_raw, whitened_exact, _ = hard_run
    assert 0.83 <= exact_raw <= 0.95, exact_raw
    assert 0.80 <= whitened_exact <= 0.95, whitened_exact


def test_cobweb_is_lossless_vs_whitened_exact(hard_run):
    """With the stored-embedding exact re-rank, the cobweb engine must be
    LOSSLESS relative to exact search in its own (whitened) input space:
    any gap means the candidate sweep dropped the gold from the pool.
    (Measured: exactly equal on seeds 0/1 — 0.8567/0.8767.)"""
    _, whitened_exact, cobweb = hard_run
    assert cobweb >= whitened_exact - 0.005, (cobweb, whitened_exact)
