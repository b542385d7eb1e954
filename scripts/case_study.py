#!/usr/bin/env python
"""Qualitative case study (reference src/benchmarks/gpt_case_study.py):
find queries where whitened-Cobweb retrieval succeeds but exact flat search
misses (and vice versa) and print them.  Hermetic by default (synthetic
corpus with text labels); pass .npy embeddings + a sentences file for real
data."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-size", type=int, default=4000)
    p.add_argument("--queries", type=int, default=400)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--pca-dim", type=int, default=96)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--limit", type=int, default=10)
    args = p.parse_args()

    import jax.numpy as jnp

    from rag_cobweb_tpu.bench.baselines import FlatIndex
    from rag_cobweb_tpu.bench.case_study import (
        print_case_study, retrieval_diff,
    )
    from rag_cobweb_tpu.bench.datasets import synthetic_retrieval
    from rag_cobweb_tpu.core import index as index_mod
    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core.wrapper import CobwebIndex
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel

    data = synthetic_retrieval(args.corpus_size, args.queries, args.dim)
    wh = PCAICAWhiteningModel.fit(data.corpus_embs, pca_dim=args.pca_dim,
                                  ica_max_iter=300)
    cw, qw = wh.transform(data.corpus_embs), wh.transform(data.query_embs)
    db = CobwebIndex(corpus=None, corpus_embeddings=cw,
                     config=TreeConfig(dim=cw.shape[1]))
    idx = db.build_prediction_index()
    _, cobweb_ids = index_mod.query_topk(idx, jnp.asarray(qw), args.k)
    flat = FlatIndex(data.corpus_embs, metric="ip")
    flat_ids = flat.search(data.query_embs, args.k)

    diff = retrieval_diff(np.asarray(cobweb_ids), flat_ids,
                          data.target_ids, k=args.k)
    corpus_labels = [f"<corpus item {i}>" for i in range(args.corpus_size)]
    queries = [f"<query {i} (gold={data.target_ids[i]})>"
               for i in range(args.queries)]
    targets = [corpus_labels[t] for t in data.target_ids]
    print_case_study(diff, queries, targets, np.asarray(cobweb_ids),
                     corpus_labels, name_a="Cobweb PCA+ICA Fast",
                     name_b="Flat exact IP", limit=args.limit)


if __name__ == "__main__":
    main()
