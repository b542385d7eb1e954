#!/usr/bin/env python
"""Derive million-benchmark caches from ONE big raw cache.

The 4M raw cache (scripts/million_benchmark.py --raw-store --gen-only)
holds RAW corpus/queries + the pickled whitener; this script derives from
it, without re-running the ~1 h single-core synthetic generation:

  * the WHITENED cache at any size <= the raw size (device-chunked
    transform — the layout million_benchmark.py loads without
    --raw-store), and/or
  * sliced RAW caches at smaller sizes (corpus prefix slice; target ids
    past the slice are masked by the benchmark's own `target_ids < size`
    eval guard).
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
    ap.add_argument("--raw-cache", required=True,
                    help="mb_cache_raw_*.npz produced by --raw-store "
                         "--gen-only")
    ap.add_argument("--whitened-out", default=None,
                    help="write the whitened cache here (mb_cache_<...>.npz"
                         " naming)")
    ap.add_argument("--whitened-size", type=int, default=None,
                    help="corpus prefix size for the whitened cache "
                         "(default: full)")
    ap.add_argument("--raw-slice-out", default=None,
                    help="write a sliced raw cache here")
    ap.add_argument("--raw-slice-size", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=131072)
    args = ap.parse_args()

    import pickle

    import jax.numpy as jnp

    t0 = time.perf_counter()
    with np.load(args.raw_cache) as z:
        corpus = z["corpus"]
        queries = z["queries"]
        target_ids = z["target_ids"]
        wh_blob = z["whitener_pickle"].tobytes()
    whitener = pickle.loads(wh_blob)
    print(f"[derive] loaded {corpus.shape} raw cache "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    if args.raw_slice_out:
        n = args.raw_slice_size or len(corpus)
        t0 = time.perf_counter()
        np.savez(args.raw_slice_out, corpus=corpus[:n], queries=queries,
                 target_ids=target_ids,
                 whitener_pickle=np.frombuffer(wh_blob, np.uint8))
        print(f"[derive] raw slice {n} -> {args.raw_slice_out} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)

    if args.whitened_out:
        n = args.whitened_size or len(corpus)

        def transform_dev(X):
            outs = []
            for s in range(0, len(X), args.chunk):
                outs.append(np.asarray(
                    whitener.transform_jit(jnp.asarray(X[s:s + args.chunk]))
                ))
            return np.concatenate(outs)

        t0 = time.perf_counter()
        corpus_w = transform_dev(corpus[:n])
        queries_w = transform_dev(queries)
        print(f"[derive] whitened {corpus_w.shape} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
        np.savez(args.whitened_out, corpus_w=corpus_w, queries_w=queries_w,
                 target_ids=target_ids)
        print(f"[derive] -> {args.whitened_out}", flush=True)


if __name__ == "__main__":
    main()
