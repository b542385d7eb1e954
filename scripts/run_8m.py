#!/usr/bin/env python
"""8M sentences on ONE v5e chip: the two-epoch build (VERDICT r4 #1).

A single 8M-slot insert program cannot fit: XLA pads the in-loop
``(K, cap, F=16)`` children temp to F=128 tiles (measured: 5.49G padded
vs 0.80G unpadded, 17.8G total vs the chip's 15.75G — /tmp/run8m.log).
Instead of fighting the compiler's layout, this script builds the corpus
as TWO sequential 4M half-forests — each comfortably in HBM — and
composes their serving indexes:

  per half:  f32 build -> bf16 stats compression -> stats-free fused
             index (bf16 GT half, ~2.15G) -> GT to host -> free state
  serving:   concatenated (2D, SpA+SpB) fused index + ONE bf16 whitened
             embedding store; candidate positions remap to global
             sentence ids inside the same jitted program as the sweep
             and exact re-rank.

Ranking semantics are unchanged: the fused sweep scores every sentence
by its own tree's path scores (lane calibration is the same leaf-lp rule
VForest uses across its lanes — two forests are just more lanes), and
the final ranking comes from the exact stored-embedding re-rank, which
is corpus-global and tree-free.  This is also exactly the MeshVForest
layout's single-chip degeneration (N shards on one device, sequential in
time), so the scale row exercises the real multi-chip composition rule.

Writes outputs/million_r5_8m.json.
"""

import argparse
import functools
import gc
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
    ap.add_argument("--cache", default="/tmp/mb_cache_hard_s8000000_q4096"
                                        "_d768_p128.npz")
    ap.add_argument("--size", type=int, default=8_000_000)
    ap.add_argument("--halves", type=int, default=2)
    ap.add_argument("--vforest", type=int, default=512)
    ap.add_argument("--slots-per-sentence", type=float, default=1.4)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--pool", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--score-budget", type=float, default=4.0,
                    help="GB budget for the (Bc, Sp) score matrix")
    ap.add_argument("--backstop", type=int, default=192,
                    help="whitened-proximity backstop pool straight off "
                         "the (whitened) re-rank store — closes the pool-"
                         "membership gap (4M: +0.027 recall); 0 = off")
    ap.add_argument("--gt-cache", default="/tmp/run8m_gt_{h}.npz",
                    help="per-half fused-index cache: skip the ~8 min "
                         "half build when present (serving iteration)")
    ap.add_argument("--out", default="outputs/million_r5_8m.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from rag_cobweb_tpu.bench import roofline as rl
    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.bench.metrics import evaluate_retrieval
    from rag_cobweb_tpu.core import index as index_mod
    from rag_cobweb_tpu.core import tree as tree_mod
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.parallel.vforest import VForest

    t0 = time.perf_counter()
    with np.load(args.cache) as z:
        corpus = z["corpus_w"][: args.size]
        queries = z["queries_w"]
        target_ids = z["target_ids"]
    D = corpus.shape[1]
    print(f"[8m] cache {corpus.shape} / {queries.shape}: "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    K = args.vforest
    H = args.halves
    half = -(-args.size // H)
    cfg = TreeConfig(dim=D)
    chunk = K * 128

    def hbm_gb():
        try:
            return round(sum(a.nbytes for a in jax.live_arrays()) / 1e9, 2)
        except Exception:
            return -1.0

    halves_meta = []
    gt_parts, c_parts, valid_parts, sp_parts = [], [], [], []
    for h in range(H):
        lo, hi = h * half, min((h + 1) * half, args.size)
        gpath = args.gt_cache.format(h=h)
        if os.path.exists(gpath):
            with np.load(gpath) as z:
                gt_parts.append(z["GT"].view(ml_dtypes.bfloat16))
                c_parts.append(z["c"])
                valid_parts.append(z["valid"])
            sp_parts.append(gt_parts[-1].shape[1])
            halves_meta.append({"half": h, "rows": hi - lo,
                                "from_cache": gpath})
            print(f"[8m] half {h}: fused index from cache {gpath}",
                  flush=True)
            continue
        cap_lane = tree_mod.align_capacity(
            max(2048, int(args.slots_per_sentence * (hi - lo)) // K + 64))
        forest = VForest(cfg, n_subtrees=K, capacity_per_tree=cap_lane,
                         seed=h)
        t0 = time.perf_counter()
        forest.warmup_insert_programs(chunk, budgets=(24,))
        warm_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for s in range(lo, hi, chunk):
            forest.add(corpus[s:s + min(chunk, hi - s)])
        build_s = time.perf_counter() - t0
        rate = (hi - lo) / build_s
        print(f"[8m] half {h}: build {build_s:.1f}s ({rate:.0f}/s, warmup "
              f"{warm_s:.1f}s), hbm {hbm_gb()} GB", flush=True)

        t0 = time.perf_counter()
        forest.compress_stats()
        jax.block_until_ready(forest.state.means)
        comp_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        fidx = forest.fused_index(dtype=jnp.bfloat16)
        fidx.c.block_until_ready()
        fuse_s = time.perf_counter() - t0
        print(f"[8m] half {h}: compress {comp_s:.1f}s, fused "
              f"{fuse_s:.1f}s ({fidx.GT.nbytes/1e9:.2f} GB GT), "
              f"hbm {hbm_gb()} GB", flush=True)

        gt_parts.append(np.asarray(jax.device_get(fidx.GT)))
        c_parts.append(np.asarray(jax.device_get(fidx.c)))
        valid_parts.append(np.asarray(jax.device_get(fidx.valid)))
        sp_parts.append(int(fidx.GT.shape[1]))
        np.savez(gpath, GT=gt_parts[-1].view(np.uint16),
                 c=c_parts[-1], valid=valid_parts[-1])
        halves_meta.append({"half": h, "rows": hi - lo,
                            "insert_rate": round(rate, 1),
                            "build_s": round(build_s, 1),
                            "warmup_s": round(warm_s, 1),
                            "compress_s": round(comp_s, 1),
                            "fused_build_s": round(fuse_s, 1)})
        del fidx, forest
        gc.collect()
        jax.clear_caches()
        print(f"[8m] half {h} released: hbm {hbm_gb()} GB", flush=True)

    # ---- composed serving index ----
    spA = sp_parts[0]
    GT = jnp.asarray(np.concatenate(gt_parts, axis=1))
    c = jnp.asarray(np.concatenate(c_parts))
    valid = jnp.asarray(np.concatenate(valid_parts))
    del gt_parts, c_parts, valid_parts
    gc.collect()
    fidx = index_mod.FusedIndex(GT=GT, c=c, valid=valid)
    Sp = int(GT.shape[1])

    # one bf16 whitened store for the exact re-rank, padded so every
    # remapped candidate id (incl. half-B pad slots, masked -inf) is a
    # valid row
    emb_rows = max(args.size, half + sp_parts[-1]) + 8
    emb_host = np.zeros((emb_rows, D), ml_dtypes.bfloat16)
    emb_host[: args.size] = corpus.astype(ml_dtypes.bfloat16)
    emb = jnp.asarray(emb_host)
    del emb_host
    gc.collect()
    pv = jnp.float32(cfg.prior_var)
    bs_k = args.backstop
    # the whitened store IS the re-rank store here (whitened-cache mode),
    # so the proximity backstop runs straight off ``emb``
    half_n2 = 0.5 * jnp.sum(jnp.square(emb.astype(jnp.float32)), axis=1)
    n_valid = jnp.asarray(args.size, jnp.int32)
    print(f"[8m] serving index: GT {GT.nbytes/1e9:.2f} GB + emb "
          f"{emb.nbytes/1e9:.2f} GB, hbm {hbm_gb()} GB", flush=True)

    B, pool, k = args.batch, args.pool, args.k
    score_row = Sp * 4 * (2 if bs_k else 1)
    bmax = max(32, int(args.score_budget * (1 << 30)) // score_row)
    if bmax < B:
        bmax = 1 << (bmax.bit_length() - 1)
    print(f"[8m] Sp={Sp}, serve chunk {min(bmax, B)}, backstop {bs_k}",
          flush=True)

    @functools.partial(jax.jit,
                       static_argnames=("k", "c", "bs", "spa", "offb"))
    def serve_chunk(fidx, emb, half_n2, q, k: int, c: int, bs: int,
                    spa: int, offb: int):
        cs, pos = index_mod.fused_query_topk(fidx, q, c, approx=True,
                                             recall_target=0.95,
                                             score_dtype="float32")
        gids = jnp.where(pos < spa, pos, pos - spa + offb)
        if bs:
            bcs, bcand = index_mod.backstop_topk(emb, half_n2, q, bs,
                                                 n_valid, approx=True)
            gids, cs = index_mod.union_candidates(gids, cs, bcand, bcs)
        return index_mod.exact_rerank(emb, q, gids, cs, k, pv)

    def serve(qb, kk):
        qd = jnp.asarray(np.asarray(qb, np.float32))
        n = qd.shape[0]
        outs = []
        for s in range(0, n, bmax):
            qc = qd[s:s + bmax]
            m = qc.shape[0]
            if m < bmax and n > bmax:
                qc = jnp.concatenate(
                    [qc, jnp.zeros((bmax - m, D), qc.dtype)])
            _, ids = serve_chunk(fidx, emb, half_n2, qc, kk, pool, bs_k,
                                 spA, half)
            outs.append(ids[:m])
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

    ctrl = FlatIndex(corpus[:10000], metric="l2")
    res = evaluate_retrieval(
        "product_8m", serve, queries, target_ids, k,
        batch_size=B, control_fn=lambda q, kk: ctrl.search_device(q, kk),
        control_threshold_ms=90.0)
    print(f"[8m] product: recall@{k}={res.get(f'recall@{k}'):.4f} "
          f"{res['avg_latency_ms']:.4f} ms/q ({res['qps']:.0f} qps), "
          f"control {res['control_batch_ms']:.1f} ms/batch", flush=True)

    model = rl.product_path_model(min(B, bmax), Sp, D, pool, D,
                                  gt_dtype_bytes=2, backstop=bs_k)
    rep = model.report(res["batch_latency_ms"] / 1e3 / max(B // bmax, 1),
                       min(B, bmax))

    small = {}
    for bs in (1, 32, 256):
        np.asarray(serve(queries[:bs], k))
        lats = []
        for i in range(7):
            off = (i * 131) % (len(queries) - bs + 1)
            t1 = time.perf_counter()
            np.asarray(serve(queries[off:off + bs], k))
            lats.append(time.perf_counter() - t1)
        small[f"b{bs}_batch_ms"] = round(1e3 * float(np.median(lats)), 2)
        print(f"[8m] B={bs}: {small[f'b{bs}_batch_ms']} ms/batch",
              flush=True)

    row = {"size": args.size, "halves": halves_meta, "Sp": Sp,
           "pool": pool, "backstop": bs_k,
           "gt_gb": round(GT.nbytes / 1e9, 2),
           "emb_gb": round(emb.nbytes / 1e9, 2),
           "hbm_serving_gb": hbm_gb(),
           f"recall@{k}": round(res.get(f"recall@{k}", 0.0), 4),
           "ms_per_query": round(res["avg_latency_ms"], 4),
           "batch_ms": round(res["batch_latency_ms"], 2),
           "qps": round(res["qps"], 1),
           "control_batch_ms": round(res["control_batch_ms"], 2),
           "latency_vs_control": round(res["latency_vs_control"], 2),
           "control_requeued": res.get("control_requeued", False),
           "roofline": rep, **small}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(row, f, indent=2)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
