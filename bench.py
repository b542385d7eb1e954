"""Headline benchmark: the reference's flagship configuration (QQP-like,
c=10000 corpus / t=1000 queries / encoder-dim 768, PCA+ICA whitening,
Cobweb "Fast" indexed retrieval at k=10) on one TPU chip, against the
reference's measured CPU numbers (BASELINE.md: Cobweb PCA+ICA Fast =
recall@10 0.906 @ 53.1 ms/query).

Zero-egress image -> the corpus is a synthetic anisotropic Gaussian-mixture
embedding set (bench/datasets.synthetic_retrieval) with known gold
neighbors; recall is reported against the planted gold and gated against
the exact flat-index baseline computed on device.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline = reference latency / our latency (x-fold speedup) at
matched-or-better recall@10.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus-size", type=int, default=10000)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--pca-dim", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--bulk", action="store_true",
                    help="build with the frozen-epoch bulk insert path")
    ap.add_argument("--vforest", type=int, default=0, metavar="K",
                    help="build a K-subtree forest (vmapped inserts, ~K× "
                         "insert throughput; queries merge across lanes)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    log = (lambda *a: print(*a, file=sys.stderr, flush=True)) if True else None

    from rag_cobweb_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # the insert program is compile-heavy

    from rag_cobweb_tpu.bench.datasets import synthetic_retrieval
    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.bench.metrics import evaluate_retrieval
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex

    data = synthetic_retrieval(args.corpus_size, args.queries, args.dim)
    log(f"[bench] corpus {data.corpus_embs.shape}, "
        f"queries {data.query_embs.shape}")

    t0 = time.perf_counter()
    whitener = PCAICAWhiteningModel.fit(
        data.corpus_embs, pca_dim=args.pca_dim, ica_max_iter=500, seed=0, ica_sample_size=10000
    )
    corpus_w = whitener.transform(data.corpus_embs)
    queries_w = whitener.transform(data.query_embs)
    log(f"[bench] PCA+ICA fit+transform: {time.perf_counter()-t0:.1f}s "
        f"-> dim {corpus_w.shape[1]}")

    # build in two stages so steady-state insert throughput is visible
    # separately from the one-off XLA compile of the insert program
    warm_n = min(2048, len(corpus_w))
    t0 = time.perf_counter()
    db = CobwebIndex(
        corpus=None, corpus_embeddings=corpus_w[:warm_n],
        config=TreeConfig(dim=corpus_w.shape[1]),
        capacity=4 * len(corpus_w) + 16,
        n_subtrees=args.vforest or 1,
    )
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    if len(corpus_w) > warm_n:
        if args.bulk and not args.vforest:
            from rag_cobweb_tpu.core.bulk import bulk_insert
            leaves = bulk_insert(db.tree, corpus_w[warm_n:])
            db.sentences.extend([None] * (len(corpus_w) - warm_n))
            db.leaf_of_sentence.extend(int(l) for l in leaves)
            db._invalidate_index()
        else:
            db.add_sentences([None] * (len(corpus_w) - warm_n),
                             corpus_w[warm_n:])
    steady_s = max(time.perf_counter() - t0, 1e-9)
    build_s = warm_s + steady_s
    steady_rate = (len(corpus_w) - warm_n) / steady_s if \
        len(corpus_w) > warm_n else warm_n / warm_s
    log(f"[bench] tree build: {build_s:.1f}s total "
        f"(first {warm_n} incl. compile {warm_s:.1f}s; "
        f"steady-state {steady_rate:.0f} inserts/s)")

    db.build_prediction_index()
    if args.vforest:
        from rag_cobweb_tpu.parallel.vforest import _vforest_query
        fidx = db.forest.build_index()

        def cobweb_retrieve(q, k):
            import jax.numpy as jnp
            _, ids = _vforest_query(fidx, jnp.asarray(q), k)
            return ids
    else:
        use_blocked = len(db) >= db.blocked_threshold
        blocked = db._blocked_index() if use_blocked else None

        def cobweb_retrieve(q, k):
            import jax.numpy as jnp
            from rag_cobweb_tpu.core import index as index_mod
            if use_blocked:
                _, ids = index_mod.blocked_query_topk(blocked,
                                                      jnp.asarray(q), k)
            else:
                _, ids = index_mod.query_topk(db._index, jnp.asarray(q), k)
            return ids  # device array: lets the evaluator pipeline batches

    res = evaluate_retrieval(
        "Cobweb PCA+ICA Fast (TPU)", cobweb_retrieve, queries_w,
        data.target_ids, args.k, batch_size=args.batch,
    )
    log(f"[bench] cobweb: recall@10={res.get('recall@10'):.4f} "
        f"latency={res['avg_latency_ms']:.3f} ms/query "
        f"({res['qps']:.0f} qps)")

    flat = FlatIndex(data.corpus_embs, metric="l2")
    exact = evaluate_retrieval(
        "Exact flat (TPU)", lambda q, k: flat.search(q, k),
        data.query_embs, data.target_ids, args.k, batch_size=args.batch,
    )
    log(f"[bench] exact:  recall@10={exact.get('recall@10'):.4f} "
        f"latency={exact['avg_latency_ms']:.3f} ms/query")

    ref_latency_ms = 53.1    # BASELINE.md: Cobweb PCA+ICA Fast, QQP c=10000
    ref_recall = 0.906
    ours_ms = res["avg_latency_ms"]
    print(json.dumps({
        "metric": "cobweb_pca_ica_fast_query_latency_c10000",
        "value": round(ours_ms, 4),
        "unit": "ms/query",
        "vs_baseline": round(ref_latency_ms / ours_ms, 2),
        "recall@10": round(res.get("recall@10", 0.0), 4),
        "exact_recall@10": round(exact.get("recall@10", 0.0), 4),
        "ref_recall@10": ref_recall,
        "recall_vs_exact": round(
            res.get("recall@10", 0.0) / max(exact.get("recall@10", 1e-9),
                                            1e-9), 4),
        "build_inserts_per_s": round(steady_rate, 1),
        "build_total_s": round(build_s, 1),
        "qps": round(res["qps"], 1),
    }))


if __name__ == "__main__":
    main()
