#!/usr/bin/env python
"""Serving-chunk pipelining probe at 1M (VERDICT r4 #2).

The recorded 1M/B=1024 product path ran at 0.407 of its sequential
stage-sum roofline.  Two hypotheses, measured here on one build:

  1. **In-program epilogue cost** — the approx_max_k partial reduce over
     (B, 1.5M) scores measured ~30 of ~40 ms of the sweep (wrapper
     fused_score_dtype note).  A/B: the strided two-level pool
     (index.grouped_pool_topk, new default above 2^18 columns) vs
     approx_max_k, plus an isolated per-stage breakdown (sweep+pool /
     exact re-rank / raw gather) to pin where each ms goes.
  2. **Cross-chunk program overlap** — splitting the fused program into
     two (sweep -> re-rank) and dispatching chunk i+1's sweep before
     chunk i's re-rank would only help if the device overlaps queued
     programs; one v5e TensorCore is expected to serialize them.  A/B:
     one-program vs split-interleaved dispatch at equal results.

Writes outputs/pipeline_probe_1m.json.
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/mb_cache_hard_s4000000_q4096"
                                        "_d768_p128.npz")
    ap.add_argument("--size", type=int, default=1_000_000)
    ap.add_argument("--vforest", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--pool", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--probes", type=int, default=5)
    ap.add_argument("--out", default="outputs/pipeline_probe_1m.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rag_cobweb_tpu.bench import roofline as rl
    from rag_cobweb_tpu.core import index as index_mod
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex

    with np.load(args.cache) as z:
        corpus = z["corpus_w"][: args.size]
        queries = z["queries_w"]
    D = corpus.shape[1]
    print(f"[probe] corpus {corpus.shape} queries {queries.shape}",
          flush=True)

    K = args.vforest
    db = CobwebIndex(config=TreeConfig(dim=D),
                     capacity=K * max(2048, int(1.6 * args.size) // K + 64),
                     n_subtrees=K, seed=0)
    t0 = time.perf_counter()
    db.forest.warmup_insert_programs(K * 128, budgets=(24,))
    print(f"[probe] warmup {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    chunk = K * 128
    for s in range(0, args.size, chunk):
        db.add_sentences([None] * len(corpus[s:s + chunk]),
                         corpus[s:s + chunk])
    build_s = time.perf_counter() - t0
    print(f"[probe] build {build_s:.1f}s "
          f"({args.size/build_s:.0f}/s)", flush=True)

    fidx = db._fused_index()
    emb = db._emb_device()
    Sp = fidx.num_slots
    pv = jnp.float32(db.cfg.prior_var)
    B, pool, k = args.batch, args.pool, args.k
    print(f"[probe] Sp={Sp} slots, pool={pool}, B={B}", flush=True)

    nq = len(queries)

    def probe(fn, n=None, rotate=True):
        """Median wall seconds of n synced dispatches over DISTINCT
        rotated query chunks (relay dedupe lesson)."""
        n = n or args.probes
        lats = []
        for i in range(n):
            off = ((i * 131) % (nq - B + 1)) if rotate else 0
            qb = np.ascontiguousarray(queries[off:off + B])
            t1 = time.perf_counter()
            jax.block_until_ready(fn(qb))
            lats.append(time.perf_counter() - t1)
        return float(np.median(lats)), lats

    rows = {}

    def record(name, fn, warm=True):
        if warm:
            jax.block_until_ready(fn(queries[:B]))
        med, lats = probe(fn)
        rows[name] = {"batch_ms": round(1e3 * med, 2),
                      "ms_per_query": round(1e3 * med / B, 4),
                      "all_ms": [round(1e3 * x, 1) for x in lats]}
        print(f"[probe] {name}: {1e3*med:.1f} ms/batch "
              f"({1e3*med/B:.4f} ms/q)", flush=True)
        return med

    # ---- the product one-program path (grouped pool: new default) ----
    def product(qb):
        return db.query_ids(qb, k, rerank=pool)
    t_grouped = record("one_program_grouped_pool", product)

    # ---- A/B: approx_max_k pool (the round-4 path).  recall_target is a
    # static jit arg, so a distinct value forces a fresh trace through the
    # OLD branch via a temporarily raised grouped threshold.
    saved = index_mod._GROUPED_POOL_MIN_COLS
    index_mod._GROUPED_POOL_MIN_COLS = 1 << 40
    db.approx_recall_target = 0.9501
    t_approx = record("one_program_approx_max_k", product)
    index_mod._GROUPED_POOL_MIN_COLS = saved
    db.approx_recall_target = 0.95

    # recall sanity: the two pools against each other
    ids_g = np.asarray(db.query_ids(queries[:B], k, rerank=pool))
    db.approx_recall_target = 0.9501
    index_mod._GROUPED_POOL_MIN_COLS = 1 << 40
    ids_a = np.asarray(db.query_ids(queries[:B], k, rerank=pool))
    index_mod._GROUPED_POOL_MIN_COLS = saved
    db.approx_recall_target = 0.95
    rows["pool_top10_overlap"] = float(np.mean([
        len(set(a) & set(b)) / k for a, b in zip(ids_g.tolist(),
                                                 ids_a.tolist())]))
    print(f"[probe] grouped vs approx top-{k} overlap "
          f"{rows['pool_top10_overlap']:.4f}", flush=True)

    # pool-quality referee: both approximate pools vs the EXACT top-k
    # pool (identical exact re-rank downstream, so differences are pure
    # pool membership)
    db.approx_pool = False
    ids_e = np.asarray(db.query_ids(queries[:B], k, rerank=pool))
    db.approx_pool = True

    def ovl(a, b):
        return float(np.mean([len(set(x) & set(y)) / k
                              for x, y in zip(a.tolist(), b.tolist())]))

    rows["grouped_vs_exactpool"] = ovl(ids_g, ids_e)
    rows["approx_vs_exactpool"] = ovl(ids_a, ids_e)
    print(f"[probe] vs exact pool: grouped "
          f"{rows['grouped_vs_exactpool']:.4f} approx "
          f"{rows['approx_vs_exactpool']:.4f}", flush=True)

    # ---- split two-program path, interleaved across 4 sub-chunks ----
    sub = B // 4

    def sweep(qd):
        return index_mod.fused_query_topk(
            fidx, qd, pool, approx=True,
            recall_target=db.approx_recall_target,
            score_dtype=db.fused_score_dtype)

    def rerank(qd, cs, cand):
        return index_mod.exact_rerank(emb, qd, cand, cs, k, pv)

    def split_interleaved(qb):
        qd = jnp.asarray(qb)
        pend, outs = None, []
        for s in range(0, B, sub):
            qc = qd[s:s + sub]
            cs, cand = sweep(qc)        # dispatch sweep(i)
            if pend is not None:
                outs.append(rerank(*pend))   # then re-rank(i-1)
            pend = (qc, cs, cand)
        outs.append(rerank(*pend))
        return [o[1] for o in outs]

    def split_sequential(qb):
        qd = jnp.asarray(qb)
        outs = []
        for s in range(0, B, sub):
            qc = qd[s:s + sub]
            cs, cand = sweep(qc)
            outs.append(rerank(qc, cand=cand, cs=cs)[1])
        return outs

    def one_program_subchunks(qb):
        qd = jnp.asarray(qb)
        return [index_mod.fused_query_rerank(
            fidx, emb, qd[s:s + sub], qd[s:s + sub], k, pool,
            approx=True, recall_target=db.approx_recall_target,
            score_dtype=db.fused_score_dtype, prior_var=pv)[1]
            for s in range(0, B, sub)]

    record("split_interleaved_4x", split_interleaved)
    record("split_sequential_4x", split_sequential)
    record("one_program_4x_subchunks", one_program_subchunks)

    # ---- stage isolation (B at once) ----
    record("stage_sweep_pool_only", lambda qb: sweep(jnp.asarray(qb)))

    qd0 = jnp.asarray(queries[:B])
    cs0, cand0 = jax.block_until_ready(sweep(qd0))

    record("stage_rerank_only",
           lambda qb: rerank(jnp.asarray(qb), cs0, cand0))

    # emb passed as an ARGUMENT: a closure constant ships the whole store
    # to the remote compile service (HTTP 413 — CLAUDE.md r3 lesson)
    gather = jax.jit(lambda e, c: jnp.sum(e[c], axis=(1, 2)))
    record("stage_gather_only", lambda qb: gather(emb, cand0))

    # ---- small-batch honesty sweep (VERDICT r4 #7, 1M half): the
    # ~25-30 ms relay dispatch floor dominates tiny batches ----
    for bs in (1, 32, 256):
        jax.block_until_ready(db.query_ids(queries[:bs], k, rerank=pool))
        lats = []
        for i in range(7):
            off = (i * 131) % (nq - bs + 1)
            qb = np.ascontiguousarray(queries[off:off + bs])
            t1 = time.perf_counter()
            jax.block_until_ready(db.query_ids(qb, k, rerank=pool))
            lats.append(time.perf_counter() - t1)
        med = float(np.median(lats))
        rows[f"b{bs}_latency"] = {"batch_ms": round(1e3 * med, 2),
                                  "ms_per_query": round(1e3 * med / bs, 4)}
        print(f"[probe] B={bs}: {1e3*med:.2f} ms/batch "
              f"({1e3*med/bs:.4f} ms/q)", flush=True)

    # ---- roofline composite ----
    model = rl.product_path_model(B, Sp, D, pool, D,
                                  gt_dtype_bytes=fidx.GT.dtype.itemsize)
    for name in ("one_program_grouped_pool", "one_program_approx_max_k"):
        rep = model.report(rows[name]["batch_ms"] / 1e3, B)
        rows[name]["roofline_frac"] = rep["roofline_frac"]
        rows[name]["bound"] = rep["bound"]
    rows["model_min_ms"] = round(1e3 * model.min_time_s(), 2)
    rows["config"] = {"size": args.size, "Sp": int(Sp), "D": int(D),
                      "batch": B, "pool": pool, "k": k,
                      "build_s": round(build_s, 1),
                      "gt_dtype": str(fidx.GT.dtype)}

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps({k: v for k, v in rows.items()
                      if not isinstance(v, dict) or "all_ms" not in v},
                     default=str), flush=True)
    print(f"[probe] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
