#!/usr/bin/env python
"""Streaming-scale benchmark (BASELINE.json config #5: incremental inserts
at large corpus sizes, indexed + beam queries vs exact and native-HNSW
baselines at equal index memory).

Streams the corpus in chunks through ``CobwebIndex.add_sentences``, and at
each checkpoint size reports steady-state insert rate, index build time,
recall@10 and pipelined QPS for: cobweb-fast (indexed), cobweb beam search,
exact flat (device), and native C++ HNSW.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-size", type=int, default=100000)
    p.add_argument("--checkpoints", type=str, default="10000,40000,100000")
    p.add_argument("--queries", type=int, default=1000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--pca-dim", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--beam-width", type=int, default=128)
    p.add_argument("--chunk", type=int, default=2048)
    p.add_argument("--vforest", type=int, default=0, metavar="K",
                   help="K-subtree forest build (vmapped inserts)")
    p.add_argument("--rerank", type=int, default=128,
                   help="leaf-lp re-rank candidates for the hybrid fast "
                        "path (0 = pure path-score)")
    p.add_argument("--skip-beam", action="store_true")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from rag_cobweb_tpu.bench.datasets import synthetic_retrieval
    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.bench.metrics import evaluate_retrieval
    from rag_cobweb_tpu.bench import native
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex
    from rag_cobweb_tpu.core import index as index_mod
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel

    sizes = sorted(int(s) for s in args.checkpoints.split(","))
    sizes = [s for s in sizes if s <= args.max_size]
    data = synthetic_retrieval(args.max_size, args.queries, args.dim,
                               n_clusters=max(256, args.max_size // 256))
    # fit whitening on the first checkpoint's worth (streaming setting:
    # whitening is fit once on an initial sample)
    wh = PCAICAWhiteningModel.fit(data.corpus_embs[: sizes[0]],
                                  pca_dim=args.pca_dim, ica_max_iter=300)
    corpus_w = wh.transform(data.corpus_embs)
    queries_w = wh.transform(data.query_embs)

    db = CobwebIndex(corpus=None, corpus_embeddings=None,
                     config=TreeConfig(dim=corpus_w.shape[1]),
                     capacity=4 * args.max_size + 16,
                     n_subtrees=args.vforest or 1)
    inserted = 0
    results = []
    for size in sizes:
        t0 = time.perf_counter()
        while inserted < size:
            n = min(args.chunk, size - inserted)
            db.add_sentences([None] * n, corpus_w[inserted:inserted + n])
            inserted += n
        dt = time.perf_counter() - t0
        rate = (size - (results[-1]["size"] if results else 0)) / dt
        t0 = time.perf_counter()
        db.build_prediction_index()
        index_s = time.perf_counter() - t0

        # only queries whose gold is already inserted
        mask = data.target_ids < size
        q = queries_w[mask]
        gold = data.target_ids[mask]

        flat = FlatIndex(data.corpus_embs[:size], metric="l2")
        row = {"size": size, "insert_rate": round(rate, 1),
               "index_build_s": round(index_s, 2)}
        if args.vforest:
            from rag_cobweb_tpu.parallel.vforest import _vforest_query
            fidx = db.forest.build_index()

            def cobweb_fast(qb, k):
                _, ids = _vforest_query(fidx, jnp.asarray(qb), k)
                return ids

            def cobweb_beam(qb, k):
                return db.forest.beam_topk(qb, k,
                                           beam_width=args.beam_width)
        else:
            bidx = db._blocked_index()

            def cobweb_fast(qb, k):
                if args.rerank:
                    _, ids = index_mod.blocked_query_topk_rerank(
                        bidx, db._index, jnp.asarray(qb), k,
                        rerank=args.rerank)
                else:
                    _, ids = index_mod.blocked_query_topk(
                        bidx, jnp.asarray(qb), k)
                return ids

            def cobweb_beam(qb, k):
                md = -(-max(db.max_depth, 1) // 4) * 4
                return np.asarray(index_mod.beam_query_ids(
                    db._beam_index(), jnp.asarray(qb), k,
                    beam_width=args.beam_width, max_depth=md))

        evals = [
            ("cobweb_fast", cobweb_fast, q, gold),
            ("flat_exact", lambda qb, k: flat.search(qb, k),
             data.query_embs[mask], gold),
        ]
        if not args.skip_beam:
            evals.insert(1, ("cobweb_beam", cobweb_beam, q, gold))
        if native.available() and size <= 200_000:
            # HNSW on the whitened (low-dim) vectors — the reference's
            # "HNSW PCA+ICA" configuration, and 6x cheaper per distance.
            # (single-core build; skipped at the largest sizes)
            hnsw = native.make_native_hnsw_retriever(corpus_w[:size], ef=100)
            evals.append(("hnsw_cpp", hnsw, q, gold))
        # relay-weather control (VERDICT r4 #5): tiny whitened exact scan
        # probed in each row's window; >90 ms/batch (vs the ~30 ms clean
        # dispatch floor) = degraded relay -> that row re-measures once
        ctrl = FlatIndex(corpus_w[:min(size, 10000)], metric="l2")
        for name, fn, qq, gg in evals:
            in_w = qq is q   # control only for whitened-space rows
            r = evaluate_retrieval(
                name, fn, qq, gg, args.k, batch_size=args.batch,
                control_fn=((lambda qb, k: ctrl.search_device(qb, k))
                            if in_w else None),
                control_threshold_ms=90.0)
            row[f"{name}_recall@{args.k}"] = round(
                r.get(f"recall@{args.k}", 0.0), 4)
            row[f"{name}_qps"] = round(r["qps"], 1)
            row[f"{name}_ms"] = round(r["avg_latency_ms"], 4)
            if "control_batch_ms" in r:
                row[f"{name}_control_batch_ms"] = round(
                    r["control_batch_ms"], 2)
                row[f"{name}_vs_control"] = round(
                    r["latency_vs_control"], 2)
                if r.get("control_requeued"):
                    row[f"{name}_control_requeued"] = True
        del ctrl
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
