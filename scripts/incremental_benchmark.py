#!/usr/bin/env python
"""Add-then-query freshness benchmark (VERDICT round-1 item #4).

Builds a c-sized index, times ONE warm query, then measures: add 1k new
sentences -> query again.  With the bounded-staleness pending buffer the
refresh cost is the pending-scoring merge (~ms), not an O(N) index
rebuild (the reference rebuilds its whole prediction index per mutation,
CobwebWrapper.py:80-91; round 1 measured ~15 s at c=100k)."""

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
    p.add_argument("--size", type=int, default=100_000)
    p.add_argument("--add", type=int, default=1000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--pca-dim", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--vforest", type=int, default=64)
    p.add_argument("--cache", type=str, default=None,
                   help=".npz with a precomputed whitened corpus_w (e.g. "
                        "million_benchmark's /tmp/mb_cache_*.npz) — skips "
                        "the ~10 min single-core generation at 1M")
    args = p.parse_args()

    from rag_cobweb_tpu.bench.datasets import synthetic_retrieval
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel

    total = args.size + args.add
    if args.cache:
        with np.load(args.cache) as z:
            corpus_w = z["corpus_w"]
        assert len(corpus_w) >= total, (len(corpus_w), total)
        corpus_w = np.ascontiguousarray(corpus_w[:total])
    else:
        data = synthetic_retrieval(total, 256, args.dim,
                                   n_clusters=max(256, total // 256))
        wh = PCAICAWhiteningModel.fit(data.corpus_embs[:50_000],
                                      pca_dim=args.pca_dim, ica_max_iter=300)
        corpus_w = wh.transform(data.corpus_embs)

    lanes = max(1, args.vforest)
    # ~2 nodes per sentence (leaf + amortized internals), same sizing the
    # 1M benchmark uses — 4x leaves OOMs a 16 GB chip at 1M (the warmup
    # holds a throwaway state of the same capacity alongside the real one)
    cap = (lanes * max(2048, (2 * total) // lanes + 64) if lanes > 1
           else 4 * total + 16)
    db = CobwebIndex(corpus=None, corpus_embeddings=None,
                     config=TreeConfig(dim=corpus_w.shape[1]),
                     capacity=cap,
                     n_subtrees=lanes)
    if lanes > 1:
        db.forest.warmup_insert_programs(args.size)
    t0 = time.perf_counter()
    for s in range(0, args.size, 8192):
        n = min(8192, args.size - s)
        db.add_sentences([None] * n, corpus_w[s:s + n])
    build_s = time.perf_counter() - t0

    q = corpus_w[:256] + 0.01 * np.random.default_rng(0).normal(
        size=(256, corpus_w.shape[1])).astype(np.float32)
    t0 = time.perf_counter()
    db.predict_fast(q, k=args.k, is_embedding=True)   # builds index
    first_q = time.perf_counter() - t0
    t0 = time.perf_counter()
    db.predict_fast(q, k=args.k, is_embedding=True)
    warm_q = time.perf_counter() - t0

    # --- the measured event: add 1k, then query ---------------------------
    new_w = corpus_w[args.size:args.size + args.add]
    t0 = time.perf_counter()
    db.add_sentences([None] * args.add, new_w)
    add_s = time.perf_counter() - t0
    stale = bool(db._pending_sids)
    t0 = time.perf_counter()
    got = db.predict_fast(new_w[:256], k=args.k, is_embedding=True,
                          return_ids=True)
    fresh_q = time.perf_counter() - t0
    # warm repeat (the compile-free steady state)
    t0 = time.perf_counter()
    got = db.predict_fast(new_w[:256], k=args.k, is_embedding=True,
                          return_ids=True)
    fresh_q_warm = time.perf_counter() - t0
    hit = np.mean([args.size + i in row
                   for i, row in enumerate(got[:len(new_w)])])

    # --- the overflow cliff (VERDICT r2 #9): push pending past
    # stale_pending_limit so the next query pays the index refresh, and
    # time THAT — the number that must stay ~seconds at 1M ---------------
    n_over = db.stale_pending_limit - len(db._pending_sids) + 1
    over_s = cliff_q_s = cliff_warm_s = -1.0
    if n_over > 0 and args.size >= n_over:
        over_w = corpus_w[:n_over] + np.float32(0.02)   # reuse rows as adds
        t0 = time.perf_counter()
        db.add_sentences([None] * n_over, over_w)
        over_s = time.perf_counter() - t0
        overflowed = not db._pending_sids   # limit hit -> invalidated
        t0 = time.perf_counter()
        db.predict_fast(q, k=args.k, is_embedding=True)
        cliff_q_s = time.perf_counter() - t0            # pays the rebuild
        t0 = time.perf_counter()
        db.predict_fast(q, k=args.k, is_embedding=True)
        cliff_warm_s = time.perf_counter() - t0
    else:
        overflowed = False

    print(json.dumps({
        "size": args.size, "added": args.add,
        "build_s": round(build_s, 1),
        "index_build_plus_query_s": round(first_q, 2),
        "warm_query_s": round(warm_q, 3),
        "add_s": round(add_s, 2),
        "stale_served": stale,
        "add_then_query_s": round(fresh_q, 3),
        "add_then_query_warm_s": round(fresh_q_warm, 3),
        "new_sentence_self_hit@10": round(float(hit), 4),
        "overflow_adds": int(max(n_over, 0)),
        "overflow_invalidated": overflowed,
        "overflow_add_s": round(over_s, 2),
        "overflow_rebuild_query_s": round(cliff_q_s, 2),
        "overflow_warm_query_s": round(cliff_warm_s, 3),
    }))


if __name__ == "__main__":
    main()
