#!/usr/bin/env python
"""1M-vector end-to-end run: vforest build + flat-forest index + the three
fast query engines (XLA gather, blocked MXU, Pallas fused kernel) compared
at 500k / 1M sentences on one chip.

The reference tops out at c=40000 (215 ms/query CPU, BASELINE.md); this is
the 25x-corpus regime VERDICT round-1 asked to demonstrate (ROADMAP #3:
the Pallas kernel's block-streaming advantage grows with S because the XLA
path writes the (B, S) score matrix to HBM and reads it back for top_k).
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
    p.add_argument("--pca-dim", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--vforest", type=int, default=256)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--rerank", type=int, default=256)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rag_cobweb_tpu.bench.datasets import synthetic_retrieval
    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.bench.metrics import evaluate_retrieval
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core import index as index_mod
    from rag_cobweb_tpu.ops.pallas_query import pallas_blocked_topk
    from rag_cobweb_tpu.parallel.vforest import VForest
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel

    on_tpu = jax.devices()[0].platform != "cpu"
    sizes = sorted(int(s) for s in args.checkpoints.split(","))
    sizes = [s for s in sizes if s <= args.size]

    # single-core synthetic generation + whitening cost ~15 min at 1M;
    # cache the whitened arrays (reference embedding-cache pattern,
    # benchmark_utils.py:143-168)
    cache = (f"/tmp/mb_cache_s{args.size}_q{args.queries}_d{args.dim}"
             f"_p{args.pca_dim}.npz")
    if os.path.exists(cache):
        t0 = time.perf_counter()
        with np.load(cache) as z:
            corpus_w, queries_w = z["corpus_w"], z["queries_w"]
            target_ids = z["target_ids"]
        print(f"[1m] cached whitened data {corpus_w.shape}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    else:
        t0 = time.perf_counter()
        data = synthetic_retrieval(args.size, args.queries, args.dim,
                                   n_clusters=max(1024, args.size // 256))
        target_ids = data.target_ids
        print(f"[1m] synthetic data {data.corpus_embs.shape}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)

        t0 = time.perf_counter()
        wh = PCAICAWhiteningModel.fit(
            data.corpus_embs[:100_000], pca_dim=args.pca_dim,
            ica_max_iter=300, ica_sample_size=20000,
        )
        # transform on device in chunks (host matmul is single-core)
        def transform_dev(X, chunk=131072):
            outs = []
            for s in range(0, len(X), chunk):
                outs.append(np.asarray(
                    wh.transform_jit(jnp.asarray(X[s:s+chunk]))))
            return np.concatenate(outs)
        corpus_w = transform_dev(data.corpus_embs)
        queries_w = transform_dev(data.query_embs)
        print(f"[1m] whiten fit+transform -> {corpus_w.shape}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        np.savez(cache, corpus_w=corpus_w, queries_w=queries_w,
                 target_ids=target_ids)

    K = args.vforest
    vf = VForest(TreeConfig(dim=corpus_w.shape[1]), n_subtrees=K,
                 capacity_per_tree=max(2048, (2 * args.size) // K + 64),
                 seed=0)
    results = []
    inserted = 0
    for size in sizes:
        t0 = time.perf_counter()
        chunk = K * 128
        while inserted < size:
            n = min(chunk, size - inserted)
            vf.add(corpus_w[inserted:inserted + n])
            inserted += n
        build_s = time.perf_counter() - t0
        prev = results[-1]["size"] if results else 0
        rate = (size - prev) / build_s if build_s > 0 else 0

        t0 = time.perf_counter()
        flat = vf.flat_index()
        flat_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        bidx = index_mod.build_blocked_index(flat)
        blocked_s = time.perf_counter() - t0
        print(f"[1m] c={size}: build {build_s:.1f}s ({rate:.0f}/s), "
              f"flatten {flat_s:.1f}s, blocked {blocked_s:.1f}s, "
              f"nodes {flat.num_nodes}", flush=True)

        mask = target_ids < size
        q = queries_w[mask]
        gold = target_ids[mask]

        def xla_blocked(qb, k):
            _, ids = index_mod.blocked_query_topk_rerank(
                bidx, flat, jnp.asarray(qb), k, rerank=args.rerank)
            return ids

        def pallas_fast(qb, k):
            # pallas sweep emits per-block candidates; re-rank by leaf lp
            from rag_cobweb_tpu.ops.pallas_query import (
                NEG, pallas_fits_vmem)
            if not pallas_fits_vmem(bidx, len(qb), 16):
                return xla_blocked(qb, k)  # kernel block would OOM VMEM
            cs, cand = pallas_blocked_topk(bidx, jnp.asarray(qb),
                                           max(k, args.rerank),
                                           interpret=not on_tpu, block_k=16)
            cs = jnp.where(cs > NEG / 2, cs, -jnp.inf)  # padding -> -inf
            return index_mod._leaf_lp_rerank(
                flat, jnp.asarray(qb), cand.astype(jnp.int32), cs, k)[1]

        row = {"size": size, "insert_rate": round(rate, 1),
               "build_s": round(build_s, 1),
               "flatten_s": round(flat_s, 2),
               "blocked_build_s": round(blocked_s, 2)}
        evals = [("xla_blocked_rerank", xla_blocked, q, gold),
                 ("pallas_rerank", pallas_fast, q, gold)]
        if size <= 1_100_000:
            flat_base = FlatIndex(corpus_w[:size], metric="l2")
            evals.append(("flat_exact_whitened",
                          lambda qb, k: flat_base.search(qb, k), q, gold))
        def run_eval(name, fn, qq, gg):
            r = evaluate_retrieval(name, fn, qq, gg, args.k,
                                   batch_size=args.batch)
            row[f"{name}_recall@{args.k}"] = round(
                r.get(f"recall@{args.k}", 0.0), 4)
            row[f"{name}_ms"] = round(r["avg_latency_ms"], 4)
            row[f"{name}_batch_ms"] = round(r["batch_latency_ms"], 2)
            row[f"{name}_qps"] = round(r["qps"], 1)
            print(f"[1m]   {name}: recall@{args.k} "
                  f"{row[f'{name}_recall@{args.k}']} "
                  f"{row[f'{name}_ms']} ms/q", flush=True)

        for name, fn, qq, gg in evals:
            run_eval(name, fn, qq, gg)

        # bf16 sweep + f32 leaf-lp re-rank: half the HBM traffic of the
        # dominant term; built after the f32 evals (and replacing the f32
        # blocked index) to stay inside HBM at 1M
        del bidx
        bidx16 = index_mod.build_blocked_index(flat, dtype=jnp.bfloat16)

        def xla_bf16(qb, k):
            _, ids = index_mod.blocked_query_topk_rerank(
                bidx16, flat, jnp.asarray(qb), k, rerank=args.rerank)
            return ids

        run_eval("xla_blocked_bf16_rerank", xla_bf16, q, gold)
        del bidx16
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
