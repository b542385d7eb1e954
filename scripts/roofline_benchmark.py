"""Roofline / MFU sweep: per-engine achieved FLOPs & HBM bandwidth vs the
v5e peaks, across batch sizes (VERDICT r2 #3: quantify whether the engine
latencies are hardware-bound or leaving 10x on the table).

Engines: exact flat GEMM, XLA blocked sweep, Pallas fused sweep, beam,
leaf-lp re-rank — each timed with a median-of-5 synchronous batch round
trip at B in {32 .. 4096}, then reported against its analytic cost model
(bench/roofline.py).

Usage:
  python scripts/roofline_benchmark.py --corpus-size 100000 \
      --batches 32,256,1024,4096 [--out outputs/roofline_100k.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps: int = 8):
    """(pipelined_ms, sync_ms, out): pipelined = reps async dispatches,
    one final block — the engine's THROUGHPUT cost, which is what the
    roofline models bound.  sync = median single dispatch+block — the
    LATENCY a lone caller sees, floored at ~30 ms by the host<->device
    relay on this rig regardless of engine (do not read it as device
    time)."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        jax.block_until_ready(o)
    pipelined = (time.perf_counter() - t0) / reps
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(pipelined), float(np.median(ts)), out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-size", type=int, default=100000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--pca-dim", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--rerank", type=int, default=512)
    p.add_argument("--lanes", type=int, default=64)
    p.add_argument("--batches", type=str, default="32,256,1024,4096")
    p.add_argument("--beam-width", type=int, default=64)
    p.add_argument("--skip-beam", action="store_true")
    p.add_argument("--dataset", choices=["hard", "easy"], default="hard")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    from rag_cobweb_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from rag_cobweb_tpu.bench.datasets import (
        synthetic_retrieval, synthetic_retrieval_hard)
    from rag_cobweb_tpu.bench import roofline as rl
    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex
    from rag_cobweb_tpu.core import index as index_mod
    from rag_cobweb_tpu.ops import pallas_query as pq

    gen = (synthetic_retrieval_hard if args.dataset == "hard"
           else synthetic_retrieval)
    n_q = 4096
    data = gen(args.corpus_size, min(n_q, args.corpus_size // 4), args.dim)
    log(f"[roofline] corpus {data.corpus_embs.shape} ({data.name})")
    wh = PCAICAWhiteningModel.fit(data.corpus_embs, pca_dim=args.pca_dim,
                                  ica_max_iter=500, seed=0,
                                  ica_sample_size=10000)
    corpus_w = wh.transform(data.corpus_embs)
    queries_w = wh.transform(data.query_embs)
    D = corpus_w.shape[1]

    db = CobwebIndex(config=TreeConfig(dim=D),
                     capacity=4 * len(corpus_w) + 16,
                     n_subtrees=args.lanes)
    db.forest.warmup_insert_programs(len(corpus_w))
    t0 = time.perf_counter()
    db.add_sentences([None] * len(corpus_w), corpus_w)
    log(f"[roofline] build: {time.perf_counter() - t0:.1f}s")
    flat = db._flat_pred_index()
    bidx = db._blocked_index()
    NB, M, _ = bidx.ivt_b.shape
    TS = bidx.W.shape[2]
    N = flat.num_nodes
    S = flat.num_sentences
    log(f"[roofline] NB={NB} M={M} TS={TS} N={N}")

    fi = FlatIndex(corpus_w, metric="l2")
    on_tpu = jax.devices()[0].platform != "cpu"

    rows = []
    for B in [int(x) for x in args.batches.split(",")]:
        q = jnp.asarray(np.resize(queries_w, (B, D)).astype(np.float32))

        ms, sync_ms, _ = timed(lambda qq: fi.search_device(qq, args.k), q)
        rows.append(dict(rl.exact_flat_model(B, len(corpus_w), D)
                         .report(ms, B), sync_ms=round(sync_ms, 3)))

        ms, sync_ms, _ = timed(lambda qq: index_mod.blocked_query_topk(
            bidx, qq, args.k), q)
        rows.append(dict(rl.model_for_blocked_index(bidx, B, fused=False)
                         .report(ms, B), sync_ms=round(sync_ms, 3)))

        fidx = db._fused_index()
        ms, sync_ms, _ = timed(lambda qq: index_mod.fused_query_topk(
            fidx, qq, args.rerank, approx=True), q)
        r = dict(rl.model_for_fused_index(fidx, B).report(ms, B),
                 sync_ms=round(sync_ms, 3))
        r["engine"] = f"fused_flat_{jnp.dtype(fidx.GT.dtype).name}"
        rows.append(r)

        try:
            ms, sync_ms, _ = timed(lambda qq: pq.pallas_blocked_topk_tiled(
                bidx, qq, args.rerank, interpret=not on_tpu,
                block_k=db.pallas_block_k), q)
            r = dict(rl.model_for_blocked_index(bidx, B, fused=True)
                     .report(ms, B), sync_ms=round(sync_ms, 3))
            r["engine"] = "pallas_fused_tiled"
            rows.append(r)
        except ValueError as e:
            log(f"[roofline] tiled pallas skipped at B={B}: {e}")

        if pq.pallas_fits_vmem(bidx, B, db.pallas_block_k):
            ms, sync_ms, _ = timed(lambda qq: pq.pallas_blocked_topk(
                bidx, qq, max(args.k, args.rerank),
                interpret=not on_tpu, block_k=db.pallas_block_k), q)
            rows.append(dict(rl.model_for_blocked_index(bidx, B, fused=True)
                             .report(ms, B), sync_ms=round(sync_ms, 3)))
        else:
            ms, sync_ms, _ = timed(lambda qq: db._pallas_topk(
                bidx, flat, qq, args.k, args.rerank), q)
            r = dict(rl.model_for_blocked_index(bidx, B, fused=True)
                     .report(ms, B), sync_ms=round(sync_ms, 3))
            r["engine"] = "pallas_fused_chunked"
            rows.append(r)

        ms, sync_ms, _ = timed(lambda qq: index_mod._leaf_lp_rerank(
            flat, qq, jnp.zeros((B, args.rerank), jnp.int32),
            jnp.zeros((B, args.rerank), jnp.float32), args.k), q)
        rows.append(dict(rl.leaf_rerank_model(B, args.rerank, D)
                         .report(ms, B), sync_ms=round(sync_ms, 3)))

        if not args.skip_beam:
            bmidx = db.forest.beam_index()
            depth = -(-max(db.forest._beam_depth, 1) // 4) * 4
            W = max(args.beam_width, args.lanes)
            C = min(64 * max(1, -(-4 * W // 64)), W * 16)
            ms, sync_ms, _ = timed(lambda qq: index_mod.beam_pack_topk(
                bmidx, qq, args.k, beam_width=args.beam_width,
                max_depth=depth, n_roots=args.lanes), q)
            m = rl.beam_pack_model(
                B, depth, C, D, pack_bytes=bmidx.pack.dtype.itemsize)
            rows.append(dict(m.report(ms, B), sync_ms=round(sync_ms, 3)))

        for r in rows[-7:]:
            log(f"[roofline] B={B} {r['engine']}: {r['measured_ms']} ms "
                f"(min {r['roofline_min_ms']} ms, {r['bound']}-bound, "
                f"MFU {r['mfu_pct']}%, HBM {r['hbm_pct']}%)")

    out = {"corpus_size": args.corpus_size, "dim": D, "NB": NB, "M": M,
           "TS": TS, "nodes": N, "sentences": S, "rows": rows}
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
