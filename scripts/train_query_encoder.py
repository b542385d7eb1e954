#!/usr/bin/env python
"""Cobweb-supervised query-encoder training CLI (reference
src/training/cobweb_query_train.py): build a whitened Cobweb index over
passages, then train a projection head with CE over differentiable leaf
scores.  Hermetic by default (synthetic embeddings)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-size", type=int, default=2000)
    p.add_argument("--queries", type=int, default=400)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--pca-dim", type=int, default=96)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--save-dir", type=str,
                   default="models/cobweb_query_encoder")
    p.add_argument("--corpus-embeddings", type=str, default=None)
    p.add_argument("--query-embeddings", type=str, default=None)
    p.add_argument("--gold-rows", type=str, default=None)
    args = p.parse_args()

    from rag_cobweb_tpu.bench.datasets import synthetic_retrieval
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex
    from rag_cobweb_tpu.training.query_train import CobwebQueryTrainer
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel

    if args.corpus_embeddings:
        corpus = np.load(args.corpus_embeddings)
        queries = np.load(args.query_embeddings)
        gold = np.load(args.gold_rows)
    else:
        data = synthetic_retrieval(args.corpus_size, args.queries, args.dim)
        corpus, queries, gold = (data.corpus_embs, data.query_embs,
                                 data.target_ids)

    whitener = PCAICAWhiteningModel.fit(corpus, pca_dim=args.pca_dim,
                                        ica_max_iter=500)
    corpus_w = whitener.transform(corpus)
    db = CobwebIndex(corpus=None, corpus_embeddings=corpus_w,
                     config=TreeConfig(dim=corpus_w.shape[1]))

    tr = CobwebQueryTrainer(db, in_dim=queries.shape[1], lr=args.lr)
    print("before:", tr.evaluate(queries, gold))
    tr.fit(queries, gold, epochs=args.epochs, batch_size=args.batch_size,
           save_dir=args.save_dir, log_every=1)
    print("after:", tr.evaluate(queries, gold))


if __name__ == "__main__":
    main()
