"""Headline benchmark: the reference's flagship configuration (QQP-like,
c=10000 corpus / t=1000 queries / encoder-dim 768, PCA+ICA whitening,
Cobweb "Fast" indexed retrieval at k=10) on one TPU chip, against the
reference's measured CPU numbers (BASELINE.md: Cobweb PCA+ICA Fast =
recall@10 0.906 @ 53.1 ms/query; FAISS exact = 0.913).

Zero-egress image -> the corpus is the CALIBRATED HARD synthetic
(bench/datasets.synthetic_retrieval_hard): overlapping heavy-tailed
clusters + near-duplicate distractor groups at a log-uniform margin
spectrum, tuned so exact flat recall@10 lands ~0.91 at c=10000 — the same
regime as the reference's QQP result, so the tracked metric is the
cobweb-vs-exact recall DELTA (reference: 0.913 - 0.906 = 0.007), not a
saturated 1.000.  ``--dataset easy`` selects the legacy well-separated
mixture.

The build defaults to the K-subtree forest (the repo's fastest build
path) with the insert programs pre-compiled against a throwaway state, so
``build_total_s`` measures insert throughput, not the remote compile
service.  Queries are served through ``CobwebIndex.query_ids`` — the SAME
engine dispatch ``predict_fast`` uses (the fused one-GEMM sweep +
``approx_max_k`` candidate pool + exact stored-embedding re-rank; XLA
blocked and Pallas remain selectable ablation engines).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline = reference latency / our latency (x-fold speedup) at
matched-or-better recall-delta-vs-exact.
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
    ap.add_argument("--pca-dim", type=float, default=0.96,
                    help="PCA dim (int) or variance fraction (<1); the "
                         "reference's callers use 0.90/0.96 fractions. "
                         "0.96 keeps dim ~248 at D=768; the wrapper-owned "
                         "RAW-space exact re-rank removes the whitening "
                         "information loss from the final ranking, so the "
                         "delta vs raw exact is ~0.000 despite the "
                         "whitened-exact ceiling being 0.895")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dataset", choices=["hard", "easy"], default="hard",
                    help="hard = calibrated difficulty (exact ~0.91 at "
                         "c=10k); easy = legacy separated mixture")
    ap.add_argument("--vforest", type=int, default=-1, metavar="K",
                    help="subtree-forest lane count for the build "
                         "(-1 = auto: 32 at c>=10k; 0/1 = single tree)")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip insert-program pre-compilation (the compile "
                         "then lands inside build_total_s)")
    ap.add_argument("--build-dev", choices=["auto", "tpu", "cpu"],
                    default="auto",
                    help="auto: start the chip insert-program warmup in a "
                         "background thread and wait up to --warm-wait s "
                         "(warm persistent cache -> finishes in seconds "
                         "-> true chip build); on a cold cache fall back "
                         "to a CPU-backend build promoted to the chip for "
                         "serving (the background compile keeps running "
                         "and seeds the cache for the next run).  The "
                         "serving engine + all latency/recall metrics run "
                         "on the chip in every mode")
    ap.add_argument("--warm-wait", type=float, default=75.0,
                    help="auto mode: seconds to wait for the chip insert "
                         "program before falling back to the CPU build")
    ap.add_argument("--eval-warm-wait", type=float, default=120.0,
                    help="auto mode, cold cache: extra seconds to let the "
                         "background chip compile drain BEFORE the timed "
                         "serving eval (the compile service serializes; a "
                         "concurrent compile pollutes latency 3-4x).  If "
                         "still compiling after this, the run proceeds and "
                         "the JSON carries warmup_in_flight=true")
    ap.add_argument("--rerank", type=int, default=1024,
                    help="exact re-rank candidate-pool size (pool_sweep: "
                         "512 leaves +0.002 delta, 1024 reaches 0.000 at "
                         "the same latency); 0 = off, -1 = wrapper auto")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    log = (lambda *a: print(*a, file=sys.stderr, flush=True)) if True else None

    if args.build_dev in ("auto", "cpu"):
        # make the host CPU backend available NEXT TO the chip backend
        # (must happen before first jax use; the image pins
        # JAX_PLATFORMS=axon)
        import os
        plats = os.environ.get("JAX_PLATFORMS", "")
        if plats and "cpu" not in plats:
            import jax
            jax.config.update("jax_platforms", plats + ",cpu")

    from rag_cobweb_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # the insert program is compile-heavy

    from rag_cobweb_tpu.bench.datasets import (
        synthetic_retrieval, synthetic_retrieval_hard)
    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.bench.metrics import evaluate_retrieval
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex

    gen = (synthetic_retrieval_hard if args.dataset == "hard"
           else synthetic_retrieval)
    data = gen(args.corpus_size, args.queries, args.dim)
    log(f"[bench] corpus {data.corpus_embs.shape}, "
        f"queries {data.query_embs.shape} ({data.name})")

    t0 = time.perf_counter()
    whitener = PCAICAWhiteningModel.fit(
        data.corpus_embs,
        pca_dim=(args.pca_dim if args.pca_dim < 1 else int(args.pca_dim)),
        ica_max_iter=500, seed=0, ica_sample_size=10000,
    )
    log(f"[bench] PCA+ICA fit: {time.perf_counter()-t0:.1f}s "
        f"-> dim {whitener.dim_out}")
    rerank = None if args.rerank == -1 else args.rerank
    # wrapper-owned whitening: RAW embeddings in, tree + pool in whitened
    # space, exact re-rank in RAW space (core/wrapper.py CobwebIndex)
    corpus = data.corpus_embs
    queries = data.query_embs

    n_lanes = args.vforest
    if n_lanes < 0:
        n_lanes = 32 if args.corpus_size >= 10000 else 1
    compile_s = 0.0
    warm_done = None   # auto mode: the background chip-warmup event

    build_dev = args.build_dev if n_lanes > 1 else "tpu"
    if n_lanes > 1:
        cap = 4 * len(corpus) + 16
        if build_dev == "auto":
            # kick the chip insert-program compile in a background thread
            # against a throwaway same-shape forest; with a warm
            # persistent cache it returns in seconds (-> true chip build),
            # cold it keeps compiling in the background (seeding the cache
            # for the next run) while the CPU backend builds the tree now
            import threading
            warm_done = threading.Event()  # noqa: F811 (rebinding outer)

            def _warm_chip():
                from rag_cobweb_tpu.parallel.vforest import VForest
                wf = VForest(TreeConfig(dim=whitener.dim_out),
                             n_subtrees=n_lanes,
                             capacity_per_tree=max(1024, cap // n_lanes))
                wf.warmup_insert_programs(len(corpus))
                warm_done.set()

            t0 = time.perf_counter()
            threading.Thread(target=_warm_chip, daemon=True).start()
            warm_done.wait(args.warm_wait)
            compile_s = time.perf_counter() - t0
            build_dev = "tpu" if warm_done.is_set() else "cpu"
            if build_dev == "tpu":
                log(f"[bench] chip insert-program warmup (cache-warm): "
                    f"{compile_s:.1f}s")
            else:
                log(f"[bench] chip insert program not ready after "
                    f"{args.warm_wait:.0f}s (cold cache / compile "
                    f"service) -> CPU-backend build; the chip compile "
                    f"continues in the background and seeds the "
                    f"persistent cache for the next run")
        db = CobwebIndex(
            config=TreeConfig(dim=whitener.dim_out),
            capacity=cap, n_subtrees=n_lanes, whitener=whitener,
            build_device=("cpu" if build_dev == "cpu" else None),
        )
        if build_dev == "cpu":
            t0 = time.perf_counter()
            db.forest.warmup_insert_programs(len(corpus))
            cpu_compile = time.perf_counter() - t0
            compile_s += cpu_compile
            log(f"[bench] cpu insert-program warmup: {cpu_compile:.1f}s")
        elif args.build_dev != "auto" and not args.no_warmup:
            compile_s = db.forest.warmup_insert_programs(len(corpus))
            log(f"[bench] insert-program warmup (compile): {compile_s:.1f}s")
        t0 = time.perf_counter()
        db.add_sentences([None] * len(corpus), corpus)
        build_s = time.perf_counter() - t0
        rate = len(corpus) / build_s
        if build_dev == "cpu":
            import jax
            t0 = time.perf_counter()
            db.promote_build_device()
            jax.block_until_ready(db.forest.state.counts)
            log(f"[bench] state promoted to chip: "
                f"{time.perf_counter()-t0:.1f}s")
    else:
        # single-tree path: two stages so steady-state is visible
        warm_n = min(2048, len(corpus))
        t0 = time.perf_counter()
        db = CobwebIndex(
            corpus=None, corpus_embeddings=corpus[:warm_n],
            config=TreeConfig(dim=whitener.dim_out),
            capacity=4 * len(corpus) + 16, whitener=whitener,
        )
        warm_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        if len(corpus) > warm_n:
            db.add_sentences([None] * (len(corpus) - warm_n),
                             corpus[warm_n:])
        steady_s = max(time.perf_counter() - t0, 1e-9)
        build_s = warm_s + steady_s
        rate = (len(corpus) - warm_n) / steady_s if \
            len(corpus) > warm_n else warm_n / warm_s
        compile_s = warm_s
    log(f"[bench] tree build: {build_s:.1f}s ({rate:.0f} inserts/s"
        + (f"; compile/warmup {compile_s:.1f}s excluded" if n_lanes > 1
           else f", first {min(2048, len(corpus))} incl. compile")
        + ")")

    # index build (flatten + blocked) happens inside the evaluator's
    # untimed warmup call; time it here explicitly for visibility
    t0 = time.perf_counter()
    db.query_ids(queries[:8], args.k, rerank=rerank)
    index_s = time.perf_counter() - t0
    log(f"[bench] index build + engine warmup: {index_s:.1f}s")

    # contention guard (ADVICE r4): in --build-dev auto with a COLD cache
    # the background chip-warmup thread is still compiling/executing insert
    # programs — the remote compile service serializes and a concurrent
    # compile-heavy drive polluted a 1M benchmark 4x (CLAUDE.md round-2).
    # Give it a bounded second window to drain before the timed serving
    # eval, then record whether it was still in flight so polluted runs
    # are identifiable in the artifact.
    warmup_in_flight = False
    if warm_done is not None and not warm_done.is_set():
        t0 = time.perf_counter()
        log(f"[bench] background chip warmup still compiling — waiting up "
            f"to {args.eval_warm_wait:.0f}s before the timed eval")
        warm_done.wait(args.eval_warm_wait)
        warmup_in_flight = not warm_done.is_set()
        log(f"[bench] waited {time.perf_counter()-t0:.1f}s; "
            f"warmup_in_flight={warmup_in_flight}")

    # the exact flat scan doubles as the relay-weather CONTROL: in
    # degraded windows every latency through the relay inflates 3-7x
    # (RESULTS.md round-4 distribution), so if the control exceeds ~3x
    # its clean-relay ceiling (~0.10-0.19 ms/q at c=10k) the whole
    # measurement is re-taken once
    flat = FlatIndex(data.corpus_embs, metric="l2")
    for attempt in range(2):
        res = evaluate_retrieval(
            "Cobweb PCA+ICA Fast (TPU)",
            lambda q, k: db.query_ids(q, k, rerank=rerank),
            queries, data.target_ids, args.k, batch_size=args.batch,
        )
        log(f"[bench] cobweb: recall@10={res.get('recall@10'):.4f} "
            f"latency={res['avg_latency_ms']:.3f} ms/query "
            f"({res['qps']:.0f} qps)")

        exact = evaluate_retrieval(
            "Exact flat (TPU)", lambda q, k: flat.search(q, k),
            data.query_embs, data.target_ids, args.k, batch_size=args.batch,
        )
        log(f"[bench] exact:  recall@10={exact.get('recall@10'):.4f} "
            f"latency={exact['avg_latency_ms']:.3f} ms/query")
        if exact["avg_latency_ms"] < 0.60 * args.corpus_size / 10000 \
                or attempt:
            break
        log("[bench] exact control degraded (relay weather) — "
            "re-measuring once")

    # small-batch honesty probe (VERDICT r4 #7): the headline is
    # batch-amortized; the per-dispatch relay floor (~25-30 ms) dominates
    # tiny batches, so report B=1 and B=32 explicitly beside it.  Median of
    # 7 distinct single-batch round trips, compile excluded via warmup.
    small = {}
    for bs in (1, 32):
        if len(queries) < bs:
            continue
        np.asarray(db.query_ids(queries[:bs], args.k, rerank=rerank))
        lats = []
        for i in range(7):
            off = (i * 131) % (len(queries) - bs + 1)
            chunk = np.ascontiguousarray(queries[off:off + bs])
            t1 = time.perf_counter()
            np.asarray(db.query_ids(chunk, args.k, rerank=rerank))
            lats.append(time.perf_counter() - t1)
        small[bs] = 1000.0 * float(np.median(lats))
        log(f"[bench] B={bs} served latency: {small[bs]:.2f} ms/batch "
            f"({small[bs]/bs:.3f} ms/query)")

    ref_latency_ms = 53.1    # BASELINE.md: Cobweb PCA+ICA Fast, QQP c=10000
    ref_recall = 0.906       # reference cobweb on QQP roberta c=10000
    ref_exact_recall = 0.913  # reference FAISS exact, same artifact
    ours_ms = res["avg_latency_ms"]
    delta = exact.get("recall@10", 0.0) - res.get("recall@10", 0.0)
    print(json.dumps({
        "metric": "cobweb_pca_ica_fast_query_latency_c10000",
        "value": round(ours_ms, 4),
        "unit": "ms/query",
        "vs_baseline": round(ref_latency_ms / ours_ms, 2),
        "dataset": data.name,
        "recall@10": round(res.get("recall@10", 0.0), 4),
        "exact_recall@10": round(exact.get("recall@10", 0.0), 4),
        "recall_delta_vs_exact": round(delta, 4),
        "ref_recall_delta_vs_exact": round(ref_exact_recall - ref_recall, 4),
        "ref_recall@10": ref_recall,
        # weather control: the exact flat scan's latency THROUGH THE SAME
        # relay in the same run — relay-degraded windows inflate every
        # latency 3-7x (RESULTS.md round-4 distribution), so the
        # cobweb/exact ratio is the environment-normalized reading
        "exact_latency_ms": round(exact["avg_latency_ms"], 4),
        "latency_vs_exact": round(
            ours_ms / max(exact["avg_latency_ms"], 1e-9), 3),
        "build_inserts_per_s": round(rate, 1),
        "build_total_s": round(build_s, 1),
        "build_device": build_dev,
        "compile_warmup_s": round(compile_s, 1),
        "index_build_s": round(index_s, 1),
        "qps": round(res["qps"], 1),
        # per-dispatch relay floor honesty: B=1/B=32 served latency
        # (ms per QUERY; B=1 is dominated by the ~25-30 ms dispatch floor)
        "b1_latency_ms": round(small[1], 3) if 1 in small else None,
        "b32_latency_ms": (round(small[32] / 32, 3)
                           if 32 in small else None),
        # true only when a cold-cache background chip compile was STILL
        # running during the timed eval (compile service serializes ->
        # latency may be inflated; see --eval-warm-wait)
        "warmup_in_flight": warmup_in_flight,
    }))


if __name__ == "__main__":
    main()
