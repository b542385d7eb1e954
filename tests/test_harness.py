"""Harness-layer tests: metrics math, results-table round trip, unique ids,
launcher script generation, case-study diff, and a small end-to-end
synthetic benchmark run through BenchmarkRunner."""

import json
import os

import numpy as np
import pytest

from rag_cobweb_tpu.bench import metrics, report
from rag_cobweb_tpu.bench.case_study import retrieval_diff
from rag_cobweb_tpu.bench.encoders import generate_unique_id, infer_model_type
from rag_cobweb_tpu.bench.launcher import (
    load_experiments, run_experiments, write_slurm_script,
)


def test_retrieval_metrics_known_ranks():
    retrieved = np.array([
        [7, 1, 2, 3, 4],   # gold 7 at rank 1
        [9, 8, 5, 0, 1],   # gold 5 at rank 3
        [1, 2, 3, 4, 6],   # gold 0 absent
    ])
    gold = np.array([7, 5, 0])
    m = metrics.retrieval_metrics(retrieved, gold, top_k=5)
    assert m["recall@2"] == pytest.approx(1 / 3)
    assert m["recall@5"] == pytest.approx(2 / 3)
    assert m["mrr@5"] == pytest.approx((1.0 + 1 / 3 + 0.0) / 3)
    # single-relevant nDCG: 1/log2(1+rank)
    want_ndcg = (1.0 + 1 / np.log2(4) + 0.0) / 3
    assert m["ndcg@5"] == pytest.approx(want_ndcg)


def test_evaluate_retrieval_weather_control():
    """The in-window relay-weather control: control fields appear in the
    result, and a control breaching the threshold re-measures exactly once
    (VERDICT r4 #5 — the bench.py weather logic, now inside the
    evaluator)."""
    rng = np.random.default_rng(0)
    q = rng.normal(size=(40, 8)).astype(np.float32)
    gold = np.arange(40)
    calls = {"main": 0, "ctrl": 0}

    def retrieve(qb, k):
        calls["main"] += 1
        return np.tile(np.arange(k), (len(qb), 1))

    def control(qb, k):
        calls["ctrl"] += 1
        return np.tile(np.arange(k), (len(qb), 1))

    r = metrics.evaluate_retrieval(
        "m", retrieve, q, gold, 5, batch_size=16,
        control_fn=control, control_threshold_ms=1e9)
    assert "control_batch_ms" in r and "control_ms" in r
    assert r["latency_vs_control"] > 0
    assert r["control_requeued"] is False
    base_ctrl = calls["ctrl"]

    calls["main"] = calls["ctrl"] = 0
    # impossible threshold -> exactly ONE requeue, then accept
    r2 = metrics.evaluate_retrieval(
        "m", retrieve, q, gold, 5, batch_size=16,
        control_fn=control, control_threshold_ms=-1.0)
    assert r2["control_requeued"] is True
    assert calls["ctrl"] == 2 * base_ctrl - 1  # both windows (warmup once)

    # no control -> no control fields (back-compat)
    r3 = metrics.evaluate_retrieval("m", retrieve, q, gold, 5,
                                    batch_size=16)
    assert "control_batch_ms" not in r3 and "control_requeued" not in r3


def test_metrics_table_round_trip(tmp_path):
    rows = [
        {"method": "Flat IP (TPU)", "recall@5": 0.91, "recall@10": 0.95,
         "mrr@5": 0.8, "mrr@10": 0.81, "ndcg@5": 0.85, "ndcg@10": 0.86,
         "avg_latency_ms": 1.234, "qps": 810.0},
        {"method": "Cobweb PCA+ICA Fast (TPU)", "recall@5": 0.90,
         "recall@10": 0.94, "mrr@5": 0.79, "mrr@10": 0.80, "ndcg@5": 0.84,
         "ndcg@10": 0.85, "avg_latency_ms": 0.2, "qps": 5000.0},
    ]
    out = tmp_path / "benchmark_m_synthetic_train_c1000_t100_k10.txt"
    metrics.print_metrics_table(rows, str(out), k_values=(5, 10), top_k=10)
    parsed = report.parse_results_file(str(out))
    assert len(parsed) == 2
    assert parsed[0]["method"] == "Flat IP (TPU)"
    assert parsed[0]["recall@10"] == pytest.approx(0.95)
    assert parsed[1]["qps"] == pytest.approx(5000.0)

    results = report.collect_results(str(tmp_path))
    tex = report.latex_metrics_table(results)
    assert "\\begin{tabular}" in tex and "Cobweb" in tex
    tex_rt = report.latex_runtime_table(results)
    assert "latency" in tex_rt


def test_unique_id_readable_and_hashed():
    short = generate_unique_id("m", "qqp", "train", 100, 10, top_k=5)
    assert "=" not in short and "/" not in short
    long = generate_unique_id(
        "sentence-transformers/all-roberta-large-v1", "qqp", "train",
        10000, 1000, top_k=20, target_dim=0.96, extra="x" * 60,
    )
    assert long.endswith(tuple("0123456789abcdef")) and "_c10000_" in long


def test_model_type_heuristics():
    assert infer_model_type("all-roberta-large-v1") == "sentence_transformer"
    assert infer_model_type("gtr-t5-large") == "sentence_transformer"
    assert infer_model_type("openai-community/gpt2") == "gpt2"
    assert infer_model_type("google/t5-v1_1-base") == "t5"
    assert infer_model_type("facebook/dpr-question_encoder") == "dpr"
    assert infer_model_type("some-bert-thing") == "bert"


def test_launcher_merges_defaults_and_generates_scripts(tmp_path):
    cfg = {
        "defaults": {"script": "scripts/synthetic_benchmark.py",
                     "slurm": {"partition": "tpu"}},
        "experiments": [
            {"name": "a", "args": {"subset_size": 100}},
            {"name": "b", "slurm": {"time": "00:10:00"},
             "args": {"subset_size": 200}},
        ],
    }
    path = tmp_path / "exps.json"
    path.write_text(json.dumps(cfg))
    exps = load_experiments(str(path))
    assert exps[0]["slurm"]["partition"] == "tpu"
    assert exps[1]["slurm"]["time"] == "00:10:00"
    script = write_slurm_script(exps[1], str(tmp_path / "jobs"), 1)
    text = open(script).read()
    assert "#SBATCH --time=00:10:00" in text and "--subset_size 200" in text
    cmds = run_experiments(str(path), mode="local", dry_run=True)
    assert len(cmds) == 2 and "--subset_size" in cmds[0]


def test_case_study_diff():
    ids_a = np.array([[1, 2], [3, 4], [5, 6]])
    ids_b = np.array([[9, 2], [3, 9], [9, 9]])
    gold = np.array([1, 3, 6])
    d = retrieval_diff(ids_a, ids_b, gold, k=2)
    assert list(d["a_only"]) == [0, 2]
    assert list(d["both"]) == [1]


def test_benchmark_runner_synthetic_end_to_end(tmp_path):
    from rag_cobweb_tpu.bench.harness import BenchmarkRunner

    runner = BenchmarkRunner("synthetic", root=str(tmp_path))
    results = runner.run(
        model_name="synthetic", subset_size=400, target_size=60,
        split="train", top_k=10, method="scale", dim=64, batch_size=64,
    )
    by_name = {r["method"]: r for r in results}
    assert any("Flat IP" in k for k in by_name)
    cob = next(v for k, v in by_name.items() if "Cobweb" in k)
    assert cob["recall@10"] > 0.7
    # results file written and parseable
    files = report.collect_results(str(tmp_path / "outputs"))
    assert len(files) == 1


def test_launcher_multihost_scripts(tmp_path, monkeypatch):
    """--mode slurm-multihost (VERDICT r3 #8): one N-node job per
    experiment with the coordinator/worker env contract
    parallel.distributed.initialize consumes."""
    from rag_cobweb_tpu.bench.launcher import write_multihost_slurm_script

    cfg = {
        "defaults": {"script": "scripts/million_benchmark.py",
                     "slurm": {"partition": "tpu", "nodes": 4}},
        "experiments": [{"name": "pod", "args": {"size": 1000000}}],
    }
    path = tmp_path / "exps.json"
    path.write_text(json.dumps(cfg))
    scripts = run_experiments(str(path), mode="slurm-multihost",
                              script_dir=str(tmp_path / "jobs"),
                              dry_run=True)
    assert len(scripts) == 1
    text = open(scripts[0]).read()
    assert "#SBATCH --nodes=4" in text
    assert "#SBATCH --ntasks-per-node=1" in text
    assert "scontrol show hostnames" in text
    assert "export JAX_COORDINATOR_ADDRESS=" in text
    assert "export JAX_NUM_PROCESSES=" in text
    assert "srun --kill-on-bad-exit=1" in text and "--size 1000000" in text

    # the env contract the script exports is exactly what initialize()
    # derives its jax.distributed args from (SLURM_PROCID per srun task)
    from rag_cobweb_tpu.parallel import distributed as dist

    seen = {}
    monkeypatch.setattr(
        dist.jax.distributed, "initialize",
        lambda coordinator_address=None, num_processes=None,
        process_id=None: seen.update(
            addr=coordinator_address, n=num_processes, pid=process_id),
    )
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "node0:12321")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("SLURM_PROCID", "3")
    dist.initialize()
    assert seen == {"addr": "node0:12321", "n": 4, "pid": 3}


def test_ingress_rehearsal_drop_in_cache(tmp_path):
    """VERDICT r3 #9: a drop-in embedding+sentence cache in the reference
    layout produces a full benchmark artifact via the UNMODIFIED qqp
    benchmark script (cold subprocess), parseable by report tooling."""
    import subprocess
    import sys as _sys

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts",
                                       "ingress_rehearsal.py"),
         "--cpu", "--root", str(tmp_path), "--subset-size", "600",
         "--target-size", "60", "--method", "scale"],
        capture_output=True, text=True, timeout=540, cwd=repo,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "OK: drop-in cache -> full artifact" in r.stdout
    from rag_cobweb_tpu.bench import encoders, report
    uid = encoders.generate_unique_id(
        "all-roberta-large-v1", "qqp", "validation", 600, 60, top_k=10)
    rows = report.parse_results_file(
        encoders.results_path(str(tmp_path), "qqp", uid))
    methods = {row["method"] for row in rows}
    assert any("Cobweb" in m for m in methods), methods
    assert any("Flat" in m for m in methods), methods


def test_exact_scan_streaming_fold(tmp_path):
    """scripts/exact_scan.py's chunked running-top-k must equal the
    one-shot exact scan (it produces the recall ceilings RESULTS cites)."""
    import subprocess
    import sys as _sys

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(1000, 16)).astype(np.float32)
    queries = corpus[::50][:20] + 0.01 * rng.normal(size=(20, 16)).astype(
        np.float32)
    target_ids = np.arange(1000)[::50][:20]
    cache = tmp_path / "cache.npz"
    np.savez(cache, corpus_w=corpus, queries_w=queries,
             target_ids=target_ids)
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    r = subprocess.run(
        [_sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "import sys, runpy; sys.argv=['exact_scan.py','--cache',"
         f"{str(cache)!r},'--chunk','256']; "
         f"runpy.run_path({os.path.join(repo,'scripts','exact_scan.py')!r},"
         "run_name='__main__')"],
        capture_output=True, text=True, timeout=300, cwd=repo)
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-800:]
    # self-retrieval with 0.01 noise: the fold must find every planted gold
    assert "recall@10 = 1.0000" in r.stdout, r.stdout[-500:]
