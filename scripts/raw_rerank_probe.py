"""Probe: whitened fused pool + RAW-embedding exact re-rank.
Coverage of the raw gold in the whitened top-P pool bounds the
achievable recall; if coverage ~1, recall@10 -> raw-exact 0.906."""
import sys
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from rag_cobweb_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from rag_cobweb_tpu.bench.datasets import synthetic_retrieval_hard
from rag_cobweb_tpu.bench.baselines import FlatIndex
from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.wrapper import CobwebIndex

data = synthetic_retrieval_hard(10000, 1000, 768)
wh = PCAICAWhiteningModel.fit(data.corpus_embs, pca_dim=0.96,
                              ica_max_iter=500, seed=0,
                              ica_sample_size=10000)
cw = wh.transform(data.corpus_embs); qw = wh.transform(data.query_embs)

db = CobwebIndex(config=TreeConfig(dim=cw.shape[1]),
                 capacity=4 * len(cw) + 16, n_subtrees=32)
db.forest.warmup_insert_programs(len(cw))
db.add_sentences([None] * len(cw), cw)

corpus_raw = jnp.asarray(data.corpus_embs)
q_raw = jnp.asarray(data.query_embs)
gold = data.target_ids

for P in (256, 1024, 4096):
    ids = np.asarray(db.query_ids(qw, P, rerank=0))          # (T, P) pool
    cov = float((ids == gold[:, None]).any(1).mean())
    # raw-L2 exact re-rank of the pool
    cand = jnp.asarray(ids)                                   # (T, P)
    ce = corpus_raw[cand]                                     # (T, P, D)
    d = jnp.sum(jnp.square(ce - q_raw[:, None, :]), axis=-1)
    top = jnp.take_along_axis(cand, jnp.argsort(d, axis=1)[:, :10], axis=1)
    rec = float((np.asarray(top) == gold[:, None]).any(1).mean())
    print(f"P={P:5d}: pool_coverage={cov:.4f} raw_rerank_recall@10={rec:.4f}",
          flush=True)
