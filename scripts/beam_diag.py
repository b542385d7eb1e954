#!/usr/bin/env python
"""Forest-beam recall diagnostic: where is recall lost?

Decomposes forest beam recall into
  1. ROUTING coverage: is the gold sentence's lane among the query's
     top-L selected lanes?  (content routing only — round-robin probes
     every lane)
  2. BEAM leaf coverage: does the gold sid appear anywhere in the
     expanded beam pool (before the final top-k cut)?
  3. final recall@k.

Usage: python scripts/beam_diag.py --corpus-size 10000 --routing content
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-size", type=int, default=10000)
    p.add_argument("--queries", type=int, default=500)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--pca-dim", type=float, default=0.96)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--lanes", type=int, default=64)
    p.add_argument("--widths", type=str, default="4,8,16")
    p.add_argument("--probe-lanes", type=str, default="4,8,16,0")
    p.add_argument("--routing", choices=["round_robin", "content"],
                   default="content")
    p.add_argument("--dataset", choices=["hard", "easy"], default="easy")
    args = p.parse_args()

    from rag_cobweb_tpu.bench.datasets import (
        synthetic_retrieval, synthetic_retrieval_hard)
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    gen = (synthetic_retrieval_hard if args.dataset == "hard"
           else synthetic_retrieval)
    data = gen(args.corpus_size, args.queries, args.dim)
    gold = data.target_ids
    wm = PCAICAWhiteningModel.fit(
        data.corpus_embs[:100_000],
        pca_dim=(args.pca_dim if args.pca_dim < 1 else int(args.pca_dim)),
        ica_max_iter=500, seed=0, ica_sample_size=10000)
    cw = np.asarray(wm.transform(data.corpus_embs), np.float32)
    qw = np.asarray(wm.transform(data.query_embs), np.float32)

    def recall(ids):
        ids = np.asarray(ids)[:, :args.k]
        return float(np.mean([g in row for g, row in zip(gold, ids)]))

    db = CobwebIndex(config=TreeConfig(dim=cw.shape[1]),
                     capacity=4 * len(cw) + 16, n_subtrees=args.lanes,
                     routing=args.routing)
    db.forest.warmup_insert_programs(len(cw))
    t0 = time.perf_counter()
    db.add_sentences([None] * len(cw), cw)
    log(f"[diag] build {time.perf_counter()-t0:.1f}s "
        f"({args.routing}, {args.lanes} lanes)")
    f = db.forest

    # lane of every sentence (from shard_of)
    lane_of_sid = np.asarray(f.shard_of, np.int64)
    lane_sizes = np.bincount(lane_of_sid, minlength=f.K)
    log(f"[diag] lane sizes: min {lane_sizes.min()} "
        f"mean {lane_sizes.mean():.0f} max {lane_sizes.max()}")

    probe_list = [int(x) for x in args.probe_lanes.split(",")]
    for L in probe_list:
        Lp = f.K if L == 0 else L
        sel = f.select_lanes(qw, Lp)                       # (B, Lp)
        hit = np.mean([lane_of_sid[g] in row for g, row in zip(gold, sel)])
        log(f"[diag] routing coverage L={Lp}: gold-lane hit {hit:.4f}")

    from rag_cobweb_tpu.core import index as index_mod
    bidx = f.beam_index()
    md = -(-max(f._beam_depth, 1) // 4) * 4
    for W in [int(x) for x in args.widths.split(",")]:
        for L in probe_list:
            Lp = f.K if L == 0 else L
            roots = None
            n_lanes = f.K
            if Lp < f.K:
                n_lanes = Lp
                roots = np.asarray(f.select_lanes(qw, Lp), np.int32)
            B = len(qw)
            q = np.asarray(qw, np.float32)
            scores, leaves = index_mod.beam_pack_topk_lanes(
                bidx, np.asarray(q), args.k, lane_width=W, max_depth=md,
                n_lanes=n_lanes,
                roots=None if roots is None else np.asarray(roots))
            # pool coverage: expand ALL surviving leaves to sids
            M = np.asarray(leaves).shape[1]
            pool = index_mod.leaf_runs_to_sids(
                bidx.leaf_sentence_start, bidx.leaf_sentence_count,
                bidx.sentence_order, leaves, scores, min(4 * M, 512))
            pool = np.asarray(pool)
            cov = np.mean([g in row for g, row in zip(gold, pool)])
            ids = index_mod.leaf_runs_to_sids(
                bidx.leaf_sentence_start, bidx.leaf_sentence_count,
                bidx.sentence_order, leaves, scores, args.k)
            r = recall(np.asarray(ids))
            log(f"[diag] W={W} L={Lp}: pool-coverage {cov:.4f} "
                f"recall@{args.k} {r:.4f}")


if __name__ == "__main__":
    main()
