"""Recall-delta vs rerank-pool sweep at the headline scale (hard-mode
c=10k, PCA+ICA 0.96): where does the cobweb-vs-exact delta close, and
what does the pool cost in latency?  Run standalone on the TPU."""
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
wh = PCAICAWhiteningModel.fit(data.corpus_embs, pca_dim=0.96,
                              ica_max_iter=500, seed=0,
                              ica_sample_size=10000)
cw = wh.transform(data.corpus_embs); qw = wh.transform(data.query_embs)
print(f"dim {cw.shape[1]}", flush=True)

flat = FlatIndex(data.corpus_embs, metric="l2")
ex = evaluate_retrieval("exact-raw", lambda q, k: flat.search(q, k),
                        data.query_embs, data.target_ids, 10,
                        batch_size=1024)
print(f"exact(raw): recall@10={ex['recall@10']:.4f} "
      f"{ex['avg_latency_ms']:.3f} ms/q", flush=True)
flatw = FlatIndex(cw, metric="l2")
exw = evaluate_retrieval("exact-whitened", lambda q, k: flatw.search(q, k),
                         qw, data.target_ids, 10, batch_size=1024)
print(f"exact(whitened): recall@10={exw['recall@10']:.4f}", flush=True)

db = CobwebIndex(config=TreeConfig(dim=cw.shape[1]),
                 capacity=4 * len(cw) + 16, n_subtrees=32)
db.forest.warmup_insert_programs(len(cw))
db.add_sentences([None] * len(cw), cw)

for pool in (512, 1024, 2048, 4096):
    for approx in (True, False):
        db.approx_pool = approx
        db.query_ids(qw[:8], 10, rerank=pool)  # warm the program
        r = evaluate_retrieval(
            f"pool{pool}a{int(approx)}",
            lambda q, k: db.query_ids(q, k, rerank=pool),
            qw, data.target_ids, 10, batch_size=1024)
        print(f"pool={pool:5d} approx={int(approx)}: "
              f"recall@10={r['recall@10']:.4f} "
              f"delta={ex['recall@10']-r['recall@10']:+.4f} "
              f"{r['avg_latency_ms']:.3f} ms/q", flush=True)
