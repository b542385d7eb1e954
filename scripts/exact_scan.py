#!/usr/bin/env python
"""Chunked exact flat scan over a million-benchmark cache: the exact-search
recall ceiling at scales where the one-shot FlatIndex (corpus-resident +
full (B, S) score sort) no longer fits HBM next to a live forest.

Streams the corpus through the chip in row chunks, scoring each chunk by
monotone-L2 (q.x - 0.5||x||^2) and folding a running top-k on device; only
the final (B, k) ids come back to the host.  Used for the 4M delta-vs-exact
story (outputs/million_r4_4m_only.json has no exact row — the flat
ablations skip themselves at this scale).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True,
                    help="mb_cache_*.npz (whitened: corpus_w/queries_w)")
    ap.add_argument("--size", type=int, default=None,
                    help="corpus prefix size (default: full cache)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=131072)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    with np.load(args.cache) as z:
        corpus = z["corpus_w"] if "corpus_w" in z else z["corpus"]
        queries = z["queries_w"] if "queries_w" in z else z["queries"]
        target_ids = z["target_ids"]
    n = args.size or len(corpus)
    corpus = corpus[:n]
    mask = target_ids < n
    queries = queries[mask]
    gold = target_ids[mask]
    print(f"[exact] corpus {corpus.shape}, queries {queries.shape}",
          flush=True)

    B, k = len(queries), args.k
    qd = jnp.asarray(queries)

    @functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(2, 3))
    def fold(chunk, q, best_s, best_i, k: int, base):
        s = jnp.matmul(q, chunk.T,
                       precision=jax.lax.Precision.HIGHEST) \
            - 0.5 * jnp.sum(jnp.square(chunk), axis=1)[None, :]
        cs, ci = jax.lax.top_k(s, k)
        cat_s = jnp.concatenate([best_s, cs], axis=1)
        cat_i = jnp.concatenate([best_i, ci + base], axis=1)
        ns, pos = jax.lax.top_k(cat_s, k)
        return ns, jnp.take_along_axis(cat_i, pos, axis=1)

    best_s = jnp.full((B, k), -jnp.inf)
    best_i = jnp.full((B, k), -1, jnp.int32)
    t0 = time.perf_counter()
    for s in range(0, n, args.chunk):
        rows = corpus[s:s + args.chunk]
        if len(rows) < args.chunk:
            rows = np.concatenate(
                [rows, np.full((args.chunk - len(rows), rows.shape[1]),
                               1e30, rows.dtype)])
        best_s, best_i = fold(jnp.asarray(rows), qd, best_s, best_i,
                              k, jnp.int32(s))
    ids = np.asarray(best_i)
    dt = time.perf_counter() - t0
    recall = float(np.mean([g in row for g, row in zip(gold, ids)]))
    print(f"[exact] recall@{k} = {recall:.4f}  "
          f"({dt:.1f}s scan, {1e3 * dt / B:.4f} ms/q streamed)", flush=True)


if __name__ == "__main__":
    main()
