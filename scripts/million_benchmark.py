#!/usr/bin/env python
"""1M-vector end-to-end run: forest build + the PRODUCT serving path
(``CobwebIndex.query_ids`` — Pallas fused sweep + stored-embedding exact
re-rank, the same engine ``predict_fast`` serves) compared against the
raw engine variants (XLA blocked f32/bf16) and exact flat at 500k / 1M
sentences on one chip, with roofline accounting per engine.

The reference tops out at c=40000 (215 ms/query CPU, BASELINE.md); this
is the 25x-corpus regime round-1 asked to demonstrate.  Round-3 changes:
the fastest engine is measured FROM THE WRAPPER (VERDICT r2 #2), recall
runs on the calibrated hard distribution by default (VERDICT r2 #1), and
each engine row carries MFU / HBM-utilization columns (VERDICT r2 #3).
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
    p.add_argument("--size", type=int, default=1_000_000)
    p.add_argument("--checkpoints", type=str, default="500000,1000000")
    p.add_argument("--queries", type=int, default=1000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--pca-dim", type=float, default=128,
                   help="int dim or variance fraction (<1)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--vforest", type=int, default=256)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--rerank", type=int, default=512)
    p.add_argument("--dataset", choices=["hard", "easy"], default="hard")
    p.add_argument("--no-blocked", action="store_true",
                   help="skip the blocked-index ablation rows (the fused "
                        "engine is the serving path; the bf16 blocked "
                        "replica is ~2.3 GB/1M rows and OOMs at 2M)")
    p.add_argument("--cache-size", type=int, default=None,
                   help="generate/load the whitened cache at this corpus "
                        "size (>= --size) so one big cache serves several "
                        "run sizes; checkpoints slice it")
    p.add_argument("--raw-store", action="store_true",
                   help="wrapper-owned whitening mode: the index takes RAW "
                        "embeddings (CobwebIndex(whitener=...)), the tree + "
                        "candidate pool run in whitened space, and the "
                        "final re-rank keys on the stored RAW vectors — "
                        "removes the whitening loss from the served "
                        "ranking (bench.py measures delta 0.000 vs raw "
                        "exact at c=10k).  Uses a separate raw cache "
                        "(corpus + queries + pickled whitener)")
    p.add_argument("--score-budget", type=float, default=None,
                   help="override wrapper fused_score_budget (GB): fewer "
                        "query chunks per sweep when HBM headroom allows")
    p.add_argument("--backstop", type=int, default=-1,
                   help="whitened-proximity backstop pool size for the "
                        "product engine (-1 = wrapper auto: on at scale "
                        "in --raw-store mode; 0 = off; N = explicit)")
    p.add_argument("--slots-per-sentence", type=float, default=2.0,
                   help="forest node-slot capacity per sentence (nodes/"
                        "sentence measured ~1.25 on the hard set at 1M; "
                        "1.5 recovers ~2.2 GB of state at 4M — mind the "
                        "2x grow transient if a lane overflows)")
    p.add_argument("--fused-only", action="store_true",
                   help="skip the flat PredictionIndex build too (implies "
                        "--no-blocked): the fused + exact-re-rank serving "
                        "path is flat-free (stats-free fused build from "
                        "the forest state), and at 4M the flat (D, N) "
                        "stats arrays alone are ~5 GB next to a ~9 GB "
                        "forest state")
    p.add_argument("--score-dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="materialized sweep-score dtype (wrapper "
                        "fused_score_dtype).  bf16 halves the dominant "
                        "(B, Sp) score HBM term; with the grouped pool "
                        "(which replaced the approx_max_k partial reduce "
                        "whose bf16 lowering was slow) this is worth "
                        "re-measuring at 8M")
    p.add_argument("--compress-stats", action="store_true",
                   help="cast forest means/m2s to bf16 AFTER the build "
                        "(at-rest compression, ~halves the state — the "
                        "8M enabler; see VForest.compress_stats)")
    p.add_argument("--emb-bf16", action="store_true",
                   help="bf16 exact re-rank store (halves the stored-"
                        "embedding HBM; distances still computed f32)")
    p.add_argument("--offload-state", action="store_true",
                   help="move the forest state to host after the serving "
                        "index is built (fused-only serving never reads "
                        "it; at 8M the state is ~13 GB of the chip)")
    p.add_argument("--gen-only", action="store_true",
                   help="write the whitened data cache and exit (lets the "
                        "single-core generation run ahead of timed builds)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rag_cobweb_tpu.bench.datasets import (
        synthetic_retrieval, synthetic_retrieval_hard)
    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.bench.metrics import evaluate_retrieval
    from rag_cobweb_tpu.bench import roofline as rl
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core import index as index_mod
    from rag_cobweb_tpu.core.wrapper import CobwebIndex
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel

    sizes = sorted(int(s) for s in args.checkpoints.split(","))
    sizes = [s for s in sizes if s <= args.size]
    pca_dim = args.pca_dim if args.pca_dim < 1 else int(args.pca_dim)
    cache_size = args.cache_size or args.size
    assert cache_size >= args.size

    def gen_data():
        t0 = time.perf_counter()
        if args.dataset == "hard":
            data = synthetic_retrieval_hard(
                cache_size, args.queries, args.dim,
                n_clusters=max(256, cache_size // 1024))
        else:
            data = synthetic_retrieval(
                cache_size, args.queries, args.dim,
                n_clusters=max(1024, cache_size // 256))
        print(f"[1m] synthetic data {data.corpus_embs.shape}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        wh = PCAICAWhiteningModel.fit(
            data.corpus_embs[:100_000], pca_dim=pca_dim,
            ica_max_iter=300, ica_sample_size=20000,
        )
        print(f"[1m] whiten fit -> dim {wh.dim_out}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        return data, wh

    def transform_dev(wh, X, chunk=131072):
        # transform on device in chunks (host matmul is single-core)
        outs = []
        for s in range(0, len(X), chunk):
            outs.append(np.asarray(
                wh.transform_jit(jnp.asarray(X[s:s+chunk]))))
        return np.concatenate(outs)

    # single-core synthetic generation + whitening cost ~15 min at 1M;
    # cache the arrays (reference embedding-cache pattern,
    # benchmark_utils.py:143-168).  --raw-store keeps RAW corpus/queries +
    # the pickled whitener (the wrapper whitens; the exact re-rank keys on
    # the stored raw rows); the default cache keeps whitened arrays only.
    whitener = None
    if args.raw_store:
        import pickle
        cache = (f"/tmp/mb_cache_raw_{args.dataset}_s{cache_size}"
                 f"_q{args.queries}_d{args.dim}_p{pca_dim}.npz")
        if os.path.exists(cache):
            t0 = time.perf_counter()
            with np.load(cache) as z:
                corpus_feed, queries_feed = z["corpus"], z["queries"]
                target_ids = z["target_ids"]
                whitener = pickle.loads(z["whitener_pickle"].tobytes())
            print(f"[1m] cached raw data {corpus_feed.shape}: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
        else:
            data, whitener = gen_data()
            corpus_feed = np.asarray(data.corpus_embs, np.float32)
            queries_feed = np.asarray(data.query_embs, np.float32)
            target_ids = data.target_ids
            np.savez(cache, corpus=corpus_feed, queries=queries_feed,
                     target_ids=target_ids,
                     whitener_pickle=np.frombuffer(
                         pickle.dumps(whitener), np.uint8))
        if not args.gen_only:
            # whitened views for the ablation engines + the whitened-exact
            # ceiling row (~15 s at 1M through the relay, once)
            t0 = time.perf_counter()
            corpus_w = transform_dev(whitener, corpus_feed[:args.size])
            queries_w = transform_dev(whitener, queries_feed)
            print(f"[1m] whitened views {corpus_w.shape}: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
    else:
        cache = (f"/tmp/mb_cache_{args.dataset}_s{cache_size}"
                 f"_q{args.queries}_d{args.dim}_p{pca_dim}.npz")
        if os.path.exists(cache):
            t0 = time.perf_counter()
            with np.load(cache) as z:
                corpus_w, queries_w = z["corpus_w"], z["queries_w"]
                target_ids = z["target_ids"]
            print(f"[1m] cached whitened data {corpus_w.shape}: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
        else:
            data, wh = gen_data()
            t0 = time.perf_counter()
            corpus_w = transform_dev(wh, data.corpus_embs)
            queries_w = transform_dev(wh, data.query_embs)
            target_ids = data.target_ids
            print(f"[1m] whiten transform -> {corpus_w.shape}: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            np.savez(cache, corpus_w=corpus_w, queries_w=queries_w,
                     target_ids=target_ids)
        corpus_feed, queries_feed = corpus_w, queries_w

    if args.gen_only:
        print(f"[1m] gen-only: cache ready at {cache}", flush=True)
        return

    K = args.vforest
    D = corpus_w.shape[1]           # tree (whitened) dim
    D_store = corpus_feed.shape[1]  # store dim (raw encoder dim if --raw-store)
    chunk = K * 128
    slots = int(args.slots_per_sentence * args.size)
    db = CobwebIndex(config=TreeConfig(dim=D),
                     capacity=K * max(2048, slots // K + 64),
                     n_subtrees=K, seed=0, whitener=whitener)
    if args.emb_bf16:
        db.emb_store_dtype = "bfloat16"
    if args.score_dtype:
        db.fused_score_dtype = args.score_dtype
    if args.backstop >= 0:
        db.backstop_pool = args.backstop
    if args.score_budget:
        db.fused_score_budget = int(args.score_budget * (1 << 30))
    t0 = time.perf_counter()
    # budgets=(24,): pre-compile the first escalation rung too — at 1M+
    # the deep-descent fraction crosses the 8% ladder threshold and the
    # 24-step program would otherwise compile MID-BUILD through the
    # remote compile service (minutes of stall when the service is slow)
    db.forest.warmup_insert_programs(chunk, budgets=(24,))
    print(f"[1m] insert-program warmup: {time.perf_counter()-t0:.1f}s",
          flush=True)

    def drain_async_errors():
        # a CAUGHT device OOM (graceful ablation-row degradation) can
        # leave deferred errors from already-enqueued ops: they surface
        # at the NEXT dispatch (both 4M attempts died at the first
        # post-checkpoint add's key split).  Dispatch+sync tiny ops until
        # one comes back clean.
        for _ in range(8):
            try:
                jnp.zeros(8).block_until_ready()
                return
            except Exception:
                time.sleep(2)

    results = []
    inserted = 0
    for size in sizes:
        t0 = time.perf_counter()
        while inserted < size:
            n = min(chunk, size - inserted)
            batch = corpus_feed[inserted:inserted + n]
            for attempt in range(3):
                try:
                    db.add_sentences([None] * n, batch)
                    break
                except Exception as e:
                    if attempt == 2:
                        raise
                    print(f"[1m] add retry after {type(e).__name__}",
                          flush=True)
                    drain_async_errors()
                    # the jit executable cache pins device buffers (incl.
                    # captured constants) for every program the eval
                    # compiled; dropping it frees them (re-compiles go
                    # through the persistent compile cache)
                    jax.clear_caches()
                    time.sleep(10)
            inserted += n
        build_s = time.perf_counter() - t0
        prev = results[-1]["size"] if results else 0
        rate = (size - prev) / build_s if build_s > 0 else 0

        if args.compress_stats:
            t0 = time.perf_counter()
            db.compress_stats()
            jax.block_until_ready(db.forest.state.means)
            print(f"[1m] stats compressed to bf16: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)

        if args.fused_only:
            args.no_blocked = True
        os.environ["RAG_COBWEB_TPU_INDEX_TIMING"] = "1"
        t0 = time.perf_counter()
        # --fused-only: the serving path never touches the flat index
        # (wrapper._engine_topk; exact re-rank keys on the emb store) —
        # ablation rows pass idx=None and _rerank_step stays flat-free
        flat = None if args.fused_only else db._flat_pred_index()
        flat_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        # the blocked index is ablation-only since the fused engine became
        # the serving default; at 2M its bf16 replica alone is ~4.6 GB, so
        # --no-blocked drops it (and the rows that need it) to keep HBM for
        # the forest + fused + stored-embedding working set
        bidx = None if args.no_blocked else db._blocked_index()
        blocked_s = time.perf_counter() - t0
        os.environ.pop("RAG_COBWEB_TPU_INDEX_TIMING", None)
        t0 = time.perf_counter()
        fidx = db._fused_index()
        fidx.c.block_until_ready()
        fused_s = time.perf_counter() - t0
        if args.offload_state:
            # serve-only: fused serving never reads the state; freeing it
            # is what fits 8M serving (emb stores + score workspace) on
            # one chip.  Only sensible with --fused-only (the flat/blocked
            # builds would re-upload it).
            t0 = time.perf_counter()
            db.offload_state()
            print(f"[1m] state offloaded to host: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
        row_extra = {"fused_build_s": round(fused_s, 2),
                     "fused_index_mb": round(
                         fidx.GT.nbytes / 1e6 + fidx.c.nbytes / 1e6, 1)}
        print(f"[1m] fused index build {fused_s:.1f}s "
              f"({row_extra['fused_index_mb']} MB) — serving needs only "
              f"flatten+fused; the blocked build below is ablation-only",
              flush=True)
        try:
            print(f"[1m] pre-eval device bytes "
                  f"{sum(a.nbytes for a in jax.live_arrays())/1e9:.2f} GB",
                  flush=True)
        except Exception:
            pass
        blk = ("no-blocked" if bidx is None else
               f"blocked {blocked_s:.1f}s (NB={bidx.ivt_b.shape[0]} "
               f"M={bidx.ivt_b.shape[1]})")
        nodes = "fused-only" if flat is None else f"nodes {flat.num_nodes}"
        print(f"[1m] c={size}: build {build_s:.1f}s ({rate:.0f}/s), "
              f"flatten {flat_s:.1f}s, {blk}, {nodes}",
              flush=True)

        mask = target_ids < size
        q = queries_feed[mask]   # store space: RAW if --raw-store
        gold = target_ids[mask]

        def split_spaces(qb):
            # ablation engines sweep in TREE (whitened) space; the exact
            # re-rank keys on STORE space.  Without a whitener both are
            # the same batch (q_store=None -> _rerank_step reuses q).
            dev = jnp.asarray(qb)
            if db.whitener is None:
                return dev, None
            return db._whiten_device(dev), dev

        row = {"size": size, "insert_rate": round(rate, 1),
               "build_s": round(build_s, 1),
               "flatten_s": round(flat_s, 2),
               "blocked_build_s": round(blocked_s, 2), **row_extra}

        # relay-weather control (VERDICT r4 #5): a tiny exact scan in
        # STORE space measured inside every row's window; clean batch
        # latency = the ~30 ms dispatch floor, so >90 ms marks a degraded
        # relay and evaluate_retrieval re-measures that row once
        ctrl = FlatIndex(corpus_feed[:min(size, 10000)], metric="l2")

        def ctrl_fn(qb, k):
            return ctrl.search_device(qb, k)

        def run_eval(name, fn, model=None, required=False, q_eval=None):
            # ablation rows degrade gracefully on HBM exhaustion (the
            # product row is required); keeps large-batch runs crash-safe
            if not required:
                try:
                    return _run_eval_inner(name, fn, model, q_eval)
                except Exception as e:
                    print(f"[1m]   {name}: skipped "
                          f"({type(e).__name__})", flush=True)
                    drain_async_errors()
                    return
            return _run_eval_inner(name, fn, model, q_eval)

        def _run_eval_inner(name, fn, model=None, q_eval=None):
            # the control shares the measured fn's query space; rows with
            # a custom q_eval (whitened-space baselines) skip it rather
            # than scan a mismatched-dim corpus
            r = evaluate_retrieval(name, fn,
                                   q if q_eval is None else q_eval,
                                   gold, args.k, batch_size=args.batch,
                                   control_fn=(ctrl_fn if q_eval is None
                                               else None),
                                   control_threshold_ms=90.0)
            row[f"{name}_recall@{args.k}"] = round(
                r.get(f"recall@{args.k}", 0.0), 4)
            row[f"{name}_ms"] = round(r["avg_latency_ms"], 4)
            row[f"{name}_batch_ms"] = round(r["batch_latency_ms"], 2)
            row[f"{name}_qps"] = round(r["qps"], 1)
            if "control_batch_ms" in r:
                row[f"{name}_control_batch_ms"] = round(
                    r["control_batch_ms"], 2)
                row[f"{name}_vs_control"] = round(
                    r["latency_vs_control"], 2)
                if r.get("control_requeued"):
                    row[f"{name}_control_requeued"] = True
            msg = (f"[1m]   {name}: recall@{args.k} "
                   f"{row[f'{name}_recall@{args.k}']} "
                   f"{row[f'{name}_ms']} ms/q")
            if model is not None:
                rep = model.report(r["batch_latency_ms"] / 1e3, args.batch)
                row[f"{name}_mfu_pct"] = rep["mfu_pct"]
                row[f"{name}_hbm_pct"] = rep["hbm_pct"]
                row[f"{name}_bound"] = rep["bound"]
                row[f"{name}_roofline_frac"] = rep["roofline_frac"]
                msg += (f" ({rep['bound']}-bound, MFU {rep['mfu_pct']}%, "
                        f"HBM {rep['hbm_pct']}%, "
                        f"{rep['roofline_frac']:.2f}x roofline)")
            print(msg, flush=True)

        # THE PRODUCT PATH: wrapper dispatch — bf16 FUSED sweep (one
        # [q,q^2] @ (2D,S) GEMM) + approx candidate pool +
        # stored-embedding EXACT re-rank.  Modeled END-TO-END (sweep +
        # whiten + backstop + row-rate-bounded re-rank gather), not as the
        # sweep alone — VERDICT r3 #6
        Sp_f = db._fused_index().num_slots
        bs_sz = db._backstop_k(args.rerank, size)
        run_eval("product_query_ids",
                 lambda qb, k: db.query_ids(qb, k, rerank=args.rerank),
                 rl.product_path_model(
                     args.batch, Sp_f, D, args.rerank, D_store,
                     d_raw=(D_store if args.raw_store else 0),
                     backstop=bs_sz),
                 required=True)

        # ablation: backstop OFF (path-score pool only) — isolates what
        # the whitened-proximity backstop pool buys at this scale
        if bs_sz:
            def no_backstop(qb, k):
                old = db.backstop_pool
                db.backstop_pool = 0
                try:
                    return db.query_ids(qb, k, rerank=args.rerank)
                finally:
                    db.backstop_pool = old
            run_eval("product_nobackstop", no_backstop,
                     rl.product_path_model(
                         args.batch, Sp_f, D, args.rerank, D_store,
                         d_raw=(D_store if args.raw_store else 0),
                         backstop=0))

        # ablation: the product path with a 2x re-rank pool — extends the
        # recall-vs-pool curve (tuning_sweep.py measures it at 100k) to
        # this scale; if recall moves, the auto pool size is undersized
        run_eval("product_rerank2x",
                 lambda qb, k: db.query_ids(qb, k, rerank=2 * args.rerank),
                 rl.product_path_model(
                     args.batch, Sp_f, D, 2 * args.rerank, D_store,
                     d_raw=(D_store if args.raw_store else 0),
                     backstop=db._backstop_k(2 * args.rerank, size)))

        # ablation: the round-3 blocked engine (bf16 blocked sweep +
        # approx pool + exact re-rank) — what the fused association saves
        def bf16_blocked_approx(qb, k):
            qw, qs = split_spaces(qb)
            cs, cand = index_mod.blocked_query_topk(
                bidx, qw, max(k, args.rerank), approx=True,
                recall_target=db.approx_recall_target)
            return db._rerank_step(flat, qw, cand, cs, k, q_store=qs)[1]

        if bidx is not None:
            run_eval("bf16_blocked_approx_rerank", bf16_blocked_approx,
                     rl.model_for_blocked_index(bidx, args.batch,
                                                fused=False))
        del bf16_blocked_approx

        # ablation: fused sweep with the EXACT top-pool epilogue — what
        # approx_max_k is worth on the fused scores at this scale.  The
        # exact sort materializes a (B, S) f32 workspace — skip where that
        # alone approaches HBM (it OOM'd at B=2048 x 500k next to the
        # forest + blocked replicas)
        def fused_exact_epilogue(qb, k):
            qw, qs = split_spaces(qb)
            cs, cand = index_mod.fused_query_topk(
                db._fused_index(), qw, max(k, args.rerank))
            return db._rerank_step(flat, qw, cand, cs, k, q_store=qs)[1]

        if args.batch * size > 512_000_000:
            print("[1m]   fused_exact_epilogue_rerank: skipped "
                  "(B x S exact-sort workspace too large)", flush=True)
        else:
            run_eval("fused_exact_epilogue_rerank", fused_exact_epilogue,
                     rl.model_for_fused_index(db._fused_index(), args.batch))
        del fused_exact_epilogue

        # gate the exact-flat baselines by device footprint, not a row
        # count: the whitened corpus at 2M x 128 f32 is ~1 GB, fine once
        # --no-blocked frees the blocked replicas
        if size * D * 4 <= 1_600_000_000:
            try:  # corpus device_put can OOM next to the forest at 1M
                flat_base = FlatIndex(corpus_w[:size], metric="l2")
            except Exception as e:
                print(f"[1m]   flat_exact_whitened: skipped "
                      f"({type(e).__name__})", flush=True)
                drain_async_errors()
            else:
                run_eval("flat_exact_whitened",
                         lambda qb, k: flat_base.search_device(qb, k),
                         rl.exact_flat_model(args.batch, size, D),
                         q_eval=queries_w[mask])
                del flat_base
        # --raw-store: the served ranking's TRUE ceiling — exact flat over
        # the raw stored rows (what the wrapper's raw-space re-rank
        # approaches when the gold lands in the candidate pool)
        if args.raw_store and size * D_store * 4 <= 3_400_000_000:
            try:
                flat_raw = FlatIndex(corpus_feed[:size], metric="l2")
            except Exception as e:
                print(f"[1m]   flat_exact_raw: skipped "
                      f"({type(e).__name__})", flush=True)
                drain_async_errors()
            else:
                run_eval("flat_exact_raw",
                         lambda qb, k: flat_raw.search_device(qb, k),
                         rl.exact_flat_model(args.batch, size, D_store))
                del flat_raw

        # f32 comparison rows (the pre-bf16 serving formulation), built on
        # demand and freed after; at 1M the f32 index is ~5.4 GB next to
        # the bf16 one — degrade gracefully if HBM can't hold both
        try:
            if args.no_blocked:
                raise MemoryError("--no-blocked")
            b32 = db._blocked_index(exact=True)

            def f32_approx(qb, k):
                qw, qs = split_spaces(qb)
                cs, cand = index_mod.blocked_query_topk(
                    b32, qw, max(k, args.rerank), approx=True,
                    recall_target=db.approx_recall_target)
                return db._rerank_step(flat, qw, cand, cs, k, q_store=qs)[1]

            run_eval("xla_f32_approx_rerank", f32_approx,
                     rl.model_for_blocked_index(b32, args.batch,
                                                fused=False))
            del f32_approx, b32
        except Exception as e:  # HBM exhaustion: skip, keep results
            print(f"[1m]   f32 rows skipped ({type(e).__name__})",
                  flush=True)
            drain_async_errors()
        db._blocked_f32 = None
        # drop this checkpoint's index replicas BEFORE the next insert
        # phase: the forest state realloc at 1M needs headroom, and the
        # (bf16 blocked + fused + stored-embedding) replicas of the 500k
        # checkpoint otherwise stay alive through locals/wrapper caches
        # (this OOM'd the B=2048 run during the second 500k of inserts)
        del bidx, flat, fidx, ctrl
        db._invalidate_index()
        db._emb_dev_cache = None
        # the flatten diff snapshot keeps DEVICE copies of children/parent
        # (~0.6 GB at 4M); freeing it costs one full struct re-sync at the
        # next index build but gives the next insert phase every byte
        db.forest._struct_snap = None
        db.forest._struct_host = None
        import gc
        gc.collect()
        try:
            live = sorted(((a.nbytes,) + (tuple(a.shape), str(a.dtype))
                           for a in jax.live_arrays()), reverse=True)
            print(f"[1m] post-eval device residue "
                  f"{sum(x[0] for x in live)/1e9:.2f} GB; "
                  f"top {live[:5]}", flush=True)
        except Exception:
            pass
        results.append(row)
        print(json.dumps(row), flush=True)
        if args.out:  # partial write per checkpoint (crash-safe)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
