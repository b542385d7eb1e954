#!/usr/bin/env python
"""Real-data ingress rehearsal (VERDICT r3 #9): prove a DROP-IN embedding
cache in the reference's exact layout produces a full benchmark artifact
with no code edits and no network access.

Steps:
  1. synthesize a "real-shaped" dataset (text corpus/queries/targets plus
     768-d embeddings) and write it into the content-addressed cache slots
     (reference benchmark_utils.py:143-168 naming:
     data/embeddings/{corpus,queries}_<uid>.npy, data/sentences/*_<uid>.txt),
  2. run ``scripts/qqp_benchmark.py`` COLD in a subprocess with matching
     CLI args — it must find every cache and never touch HF,
  3. parse the produced ``outputs/qqp/benchmark_<uid>.txt`` back with
     ``bench.report.parse_results_file`` and print the rows.

Someone with real QQP/roberta embeddings reproduces step 1 with their own
arrays + question text and gets the identical flow.
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def write_cache(root: str, model_name: str, subset_size: int,
                target_size: int, split: str, top_k: int,
                dim: int = 768, seed: int = 0) -> str:
    """Synthesize and persist the full cache set; returns the unique id."""
    from rag_cobweb_tpu.bench import encoders
    from rag_cobweb_tpu.bench.datasets import synthetic_retrieval_hard

    uid = encoders.generate_unique_id(model_name, "qqp", split,
                                      subset_size, target_size, top_k=top_k)
    data = synthetic_retrieval_hard(subset_size, target_size, dim, seed=seed)
    # text roles: corpus row i is a distinct "question"; query j's gold is
    # corpus row target_ids[j] — targets must be MEMBERS of the corpus text
    corpus_text = [f"question {i}: synthetic passage body {i}"
                   for i in range(subset_size)]
    queries_text = [f"query {j} paraphrase" for j in range(target_size)]
    targets_text = [corpus_text[t] for t in data.target_ids]

    np.save(_ensure(encoders.embedding_cache_path(root, "corpus", uid)),
            data.corpus_embs)
    np.save(_ensure(encoders.embedding_cache_path(root, "queries", uid)),
            data.query_embs)
    encoders.save_sentences(
        encoders.sentences_cache_path(root, "corpus", uid), corpus_text)
    encoders.save_sentences(
        encoders.sentences_cache_path(root, "queries", uid), queries_text)
    encoders.save_sentences(
        encoders.sentences_cache_path(root, "targets", uid), targets_text)
    return uid


def _ensure(path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ingress_rehearsal")
    ap.add_argument("--model-name", default="all-roberta-large-v1")
    ap.add_argument("--subset-size", type=int, default=2000)
    ap.add_argument("--target-size", type=int, default=200)
    ap.add_argument("--split", default="validation")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--method", default="golden")
    ap.add_argument("--cpu", action="store_true",
                    help="force the subprocess onto CPU (tests)")
    args = ap.parse_args()

    uid = write_cache(args.root, args.model_name, args.subset_size,
                      args.target_size, args.split, args.top_k)
    print(f"[rehearsal] cache written under {args.root} (uid {uid})")

    # cold subprocess: the benchmark script itself, unmodified
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    prelude = ("import jax; jax.config.update('jax_platforms','cpu'); "
               if args.cpu else "")
    code = (
        prelude
        + "import sys, runpy; "
        + f"sys.argv = ['qqp_benchmark.py', '--model_name', "
        f"{args.model_name!r}, '--subset_size', '{args.subset_size}', "
        f"'--target_size', '{args.target_size}', '--split', "
        f"{args.split!r}, '--top_k', '{args.top_k}', '--method', "
        f"{args.method!r}]; "
        + f"runpy.run_path({os.path.join(repo, 'scripts', 'qqp_benchmark.py')!r},"
        " run_name='__main__')"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=args.root,
                       capture_output=True, text=True, timeout=3000)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        raise SystemExit(f"benchmark subprocess failed rc={r.returncode}")

    from rag_cobweb_tpu.bench import encoders, report
    out = encoders.results_path(args.root, "qqp", uid)
    rows = report.parse_results_file(out)
    assert rows, f"no parseable rows in {out}"
    print(f"[rehearsal] artifact {out} parsed: "
          f"{json.dumps(rows, indent=1)[:1200]}")
    print("[rehearsal] OK: drop-in cache -> full artifact, no code edits")


if __name__ == "__main__":
    main()
