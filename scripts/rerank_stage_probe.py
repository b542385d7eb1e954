"""Stage-level timing of the raw-rerank serving path at c=10000:
(1) device whitening, (2) fused sweep + approx pool, (3) jitted exact
raw re-rank.  Fencing per CLAUDE.md: distinct-batch dispatch + d2h
drain (block_until_ready is not a fence through the relay; identical
dispatches dedupe)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rag_cobweb_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from rag_cobweb_tpu.bench.datasets import synthetic_retrieval_hard
from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.wrapper import CobwebIndex
from rag_cobweb_tpu.core import index as index_mod

C = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
POOL = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
data = synthetic_retrieval_hard(C, 1000, 768)
wh = PCAICAWhiteningModel.fit(data.corpus_embs, pca_dim=0.96,
                              ica_max_iter=500, seed=0,
                              ica_sample_size=10000)

db = CobwebIndex(config=TreeConfig(dim=wh.dim_out),
                 capacity=4 * C + 16, n_subtrees=32, whitener=wh)
db.forest.warmup_insert_programs(C)
db.add_sentences([None] * C, data.corpus_embs)
db.query_ids(data.query_embs[:8], 10, rerank=POOL)  # warm everything

q_raw_all = [jnp.asarray(data.query_embs + 0.001 * i) for i in range(8)]
emb = db._emb_device()
fidx = db._fused_index()
pv = jnp.float32(db.cfg.prior_var)


def timeit(name, fn, reps=8):
    outs = [fn(i) for i in range(2)]          # warm compile
    for o in outs:
        jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [fn(i) for i in range(reps)]       # distinct batches
    drain = [np.asarray(jax.tree_util.tree_leaves(o)[0][:1])
             for o in outs]                   # d2h fence
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.2f} ms/batch  "
          f"{dt*1e6/1000:7.1f} us/q", flush=True)
    return dt


timeit("whiten (transform_jit)", lambda i: db._whiten_device(
    np.asarray(q_raw_all[i % 8])))

qw_all = [db._whiten_device(np.asarray(q)) for q in q_raw_all]
for q in qw_all:
    jax.block_until_ready(q)

timeit("fused sweep + approx pool", lambda i: db._fused_chunked(
    fidx, qw_all[i % 8], POOL, approx=db.approx_pool,
    score_dtype=db.fused_score_dtype))

pools = [db._fused_chunked(fidx, qw, POOL, approx=db.approx_pool,
                           score_dtype=db.fused_score_dtype)
         for qw in qw_all]
pools = [(jax.block_until_ready(cs), jax.block_until_ready(cd))
         for cs, cd in pools]

timeit("exact raw rerank (jitted)", lambda i: index_mod.exact_rerank(
    emb, q_raw_all[i % 8], pools[i % 8][1].astype(jnp.int32),
    pools[i % 8][0], 10, pv))

timeit("full query_ids", lambda i: db.query_ids(
    np.asarray(q_raw_all[i % 8]), 10, rerank=POOL))
