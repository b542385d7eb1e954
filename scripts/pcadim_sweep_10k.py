"""Whitening-dim sweep at c=10k hard-mode: the engine serves at the
whitened-exact ceiling (pool_sweep_10k), so the headline recall delta
is set by pca_dim's information loss.  Find the fraction whose ceiling
matches raw exact."""
import sys
import numpy as np

sys.path.insert(0, ".")
from rag_cobweb_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from rag_cobweb_tpu.bench.datasets import synthetic_retrieval_hard
from rag_cobweb_tpu.bench.baselines import FlatIndex
from rag_cobweb_tpu.bench.metrics import evaluate_retrieval
from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.wrapper import CobwebIndex

data = synthetic_retrieval_hard(10000, 1000, 768)
flat = FlatIndex(data.corpus_embs, metric="l2")
ex = evaluate_retrieval("exact-raw", lambda q, k: flat.search(q, k),
                        data.query_embs, data.target_ids, 10,
                        batch_size=1024)
print(f"exact(raw): recall@10={ex['recall@10']:.4f}", flush=True)

for frac in (0.98, 0.99, 0.995):
    wh = PCAICAWhiteningModel.fit(data.corpus_embs, pca_dim=frac,
                                  ica_max_iter=500, seed=0,
                                  ica_sample_size=10000)
    cw = wh.transform(data.corpus_embs); qw = wh.transform(data.query_embs)
    flatw = FlatIndex(cw, metric="l2")
    exw = evaluate_retrieval("exact-w", lambda q, k: flatw.search(q, k),
                             qw, data.target_ids, 10, batch_size=1024)
    db = CobwebIndex(config=TreeConfig(dim=cw.shape[1]),
                     capacity=4 * len(cw) + 16, n_subtrees=32)
    db.forest.warmup_insert_programs(len(cw))
    db.add_sentences([None] * len(cw), cw)
    db.query_ids(qw[:8], 10, rerank=1024)
    r = evaluate_retrieval("cobweb", lambda q, k: db.query_ids(q, k,
                                                               rerank=1024),
                           qw, data.target_ids, 10, batch_size=1024)
    print(f"frac={frac} dim={cw.shape[1]}: exact_w={exw['recall@10']:.4f} "
          f"cobweb={r['recall@10']:.4f} "
          f"delta_vs_raw={ex['recall@10']-r['recall@10']:+.4f} "
          f"{r['avg_latency_ms']:.3f} ms/q", flush=True)
    del db
