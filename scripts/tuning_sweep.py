#!/usr/bin/env python
"""Tuning-surface validation (VERDICT r2 #10): measure recall-vs-rerank-
pool and recall-vs-beam-width curves on the HARD dataset so the serving
defaults (rerank_candidates, rerank_threshold, beam_width) come from
measured curves instead of constants.

Usage:
  python scripts/tuning_sweep.py --corpus-size 100000 \
      [--out outputs/tuning_100k.json]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-size", type=int, default=100000)
    p.add_argument("--queries", type=int, default=1000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--pca-dim", type=float, default=0.96)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--lanes", type=int, default=64)
    p.add_argument("--pools", type=str, default="0,64,128,256,512,1024,2048")
    p.add_argument("--widths", type=str, default="2,4,8,16,32")
    p.add_argument("--beam-lanes", type=str, default="0",
                   help="comma list of lanes_per_query for the beam curve "
                        "(0 = all lanes; content routing makes small "
                        "values viable)")
    p.add_argument("--routing", choices=["round_robin", "content"],
                   default="round_robin")
    p.add_argument("--dataset", choices=["hard", "easy"], default="hard")
    p.add_argument("--skip-beam", action="store_true")
    p.add_argument("--skip-pools", action="store_true")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    from rag_cobweb_tpu.bench.datasets import (
        synthetic_retrieval, synthetic_retrieval_hard)
    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    pca_dim = args.pca_dim if args.pca_dim < 1 else int(args.pca_dim)
    gen = (synthetic_retrieval_hard if args.dataset == "hard"
           else synthetic_retrieval)
    data = gen(args.corpus_size, args.queries, args.dim)
    gold = data.target_ids

    def recall(ids):
        return float(np.mean([
            g in row[:args.k] for row, g in zip(np.asarray(ids), gold)
        ]))

    exact_raw = recall(FlatIndex(data.corpus_embs, metric="l2")
                       .search(data.query_embs, args.k))
    wh = PCAICAWhiteningModel.fit(
        data.corpus_embs[:100_000], pca_dim=pca_dim, ica_max_iter=500,
        seed=0, ica_sample_size=10000)
    cw = wh.transform(data.corpus_embs)
    qw = wh.transform(data.query_embs)
    exact_w = recall(FlatIndex(cw, metric="l2").search(qw, args.k))
    log(f"[sweep] exact raw {exact_raw} whitened {exact_w} "
        f"(dim {cw.shape[1]})")

    db = CobwebIndex(config=TreeConfig(dim=cw.shape[1]),
                     capacity=4 * len(cw) + 16, n_subtrees=args.lanes,
                     routing=args.routing)
    db.forest.warmup_insert_programs(len(cw))
    t0 = time.perf_counter()
    db.add_sentences([None] * len(cw), cw)
    log(f"[sweep] build {time.perf_counter()-t0:.1f}s")

    out = {"corpus_size": args.corpus_size, "dim": int(cw.shape[1]),
           "dataset": data.name, "routing": args.routing,
           "exact_raw": exact_raw, "exact_whitened": exact_w,
           "pool_curve": [], "beam_curve": []}
    for pool in ([] if args.skip_pools
                 else [int(x) for x in args.pools.split(",")]):
        import jax
        jax.block_until_ready(db.query_ids(qw, args.k, rerank=pool))
        t0 = time.perf_counter()
        ids = db.query_ids(qw, args.k, rerank=pool)
        jax.block_until_ready(ids)
        dt = (time.perf_counter() - t0) * 1e3 / len(qw)
        r = recall(ids)
        out["pool_curve"].append(
            {"pool": pool, "recall": round(r, 4),
             "ms_per_query": round(dt, 4)})
        log(f"[sweep] pool={pool}: recall {r:.4f} ({dt:.3f} ms/q warm)")

    if not args.skip_beam:
        lane_list = [int(x) for x in args.beam_lanes.split(",")]
        for w in [int(x) for x in args.widths.split(",")]:
            for L in lane_list:
                lpq = None if L == 0 else L
                # warm the compiled program for this (width, lanes) so the
                # curve records steady-state latency
                db.forest.beam_topk(qw, args.k, beam_width=w,
                                    lanes_per_query=lpq)
                t0 = time.perf_counter()
                ids = db.forest.beam_topk(qw, args.k, beam_width=w,
                                          lanes_per_query=lpq)
                r = recall(ids)
                dt = (time.perf_counter() - t0) * 1e3 / len(qw)
                out["beam_curve"].append(
                    {"beam_width": w, "lanes_per_query": L,
                     "recall": round(r, 4), "ms_per_query": round(dt, 4)})
                log(f"[sweep] beam={w} lanes={L or 'all'}: recall {r:.4f} "
                    f"({dt:.3f} ms/q)")

    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
