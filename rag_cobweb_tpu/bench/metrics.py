"""Retrieval metrics engine (reference benchmark_utils.evaluate_retrieval
:619-832).

The reference fans out one query at a time over a ``multiprocessing.Pool``
(:737-820) because its retrieval is CPU-bound per query; here the retrieval
itself is batched on device, so the metrics reduce to vectorized numpy over
the (B, K) retrieved-id matrix — no process pool, no per-query error
plumbing.  Metric definitions preserved: recall@k / MRR@k / nDCG@k for
k in {2, 3, 5, 10, 20, 50, 100} capped at top_k (:619-661), plus total
``time_taken`` and mean ``avg_latency_ms``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

K_VALUES = (2, 3, 5, 10, 20, 50, 100)  # reference benchmark_utils.py:621


def ranks_of_targets(retrieved_ids: np.ndarray,
                     target_ids: np.ndarray) -> np.ndarray:
    """1-based rank of each query's gold id within its retrieved row;
    0 where absent.  retrieved_ids: (B, K) (-1 padding ok), target_ids: (B,)."""
    hits = retrieved_ids == target_ids[:, None]
    any_hit = hits.any(axis=1)
    first = hits.argmax(axis=1) + 1
    return np.where(any_hit, first, 0)


def retrieval_metrics(retrieved_ids: np.ndarray, target_ids: np.ndarray,
                      top_k: int,
                      k_values: Sequence[int] = K_VALUES) -> dict:
    """recall@k / MRR@k / nDCG@k with a single gold per query (the QQP and
    MS-MARCO setups both have exactly one target passage)."""
    ranks = ranks_of_targets(np.asarray(retrieved_ids),
                             np.asarray(target_ids))
    out: dict = {"num_queries": int(len(ranks))}
    for k in k_values:
        if k > top_k:
            continue
        in_k = (ranks > 0) & (ranks <= k)
        out[f"recall@{k}"] = float(in_k.mean())
        out[f"mrr@{k}"] = float(np.where(in_k, 1.0 / np.maximum(ranks, 1),
                                         0.0).mean())
        # single-relevant nDCG: DCG = 1/log2(1+rank), IDCG = 1
        out[f"ndcg@{k}"] = float(
            np.where(in_k, 1.0 / np.log2(1.0 + np.maximum(ranks, 1)),
                     0.0).mean()
        )
    return out


def evaluate_retrieval(name: str, retrieve_fn, query_embs: np.ndarray,
                       target_ids: np.ndarray, top_k: int,
                       batch_size: int = 256,
                       k_values: Sequence[int] = K_VALUES,
                       warmup: bool = True,
                       control_fn=None,
                       control_threshold_ms: Optional[float] = None) -> dict:
    """Run ``retrieve_fn(query_batch, top_k) -> (B, top_k) ids`` over all
    queries, timing per batch; returns the metrics dict + timing fields
    (reference :822-832 aggregation).

    ``control_fn`` (optional): a second retriever — typically a SMALL
    exact flat scan whose clean-relay latency is the ~30 ms dispatch floor
    — probed in the SAME measurement window as the relay-weather CONTROL.
    Degraded relay windows inflate every latency 3-7x (RESULTS.md round-4
    distribution), so the artifact carries ``control_batch_ms`` /
    ``control_ms`` and the environment-normalized ``latency_vs_control``
    ratio.  When ``control_threshold_ms`` (per BATCH, ms — the floor
    dominates a small control so this is batch-size-robust; ~90 ms marks
    a >3x-degraded relay) is set and the control exceeds it, the whole
    timed measurement is re-taken ONCE (``control_requeued`` records
    that) — the bench.py weather logic moved to where every timed
    artifact gets it (VERDICT r4 #5)."""
    import time

    B = len(query_embs)
    if warmup and B:  # exclude compile time from latency (jit warm-up)
        np.asarray(retrieve_fn(query_embs[:min(batch_size, B)], top_k))
        if control_fn is not None:
            np.asarray(control_fn(query_embs[:min(batch_size, B)], top_k))

    def batches():
        for s in range(0, B, batch_size):
            chunk = query_embs[s:s + batch_size]
            n = len(chunk)
            if n < batch_size and B > batch_size:
                # pad ragged tail to the bucketed shape -> no recompile
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - n,) + chunk.shape[1:],
                                     chunk.dtype)]
                )
            yield s, n, chunk

    def probe_latency(fn, n_probes=5):
        # latency: synchronous single-batch round trips over DISTINCT
        # batches (median).  Dispatching the SAME chunk repeatedly
        # understates real serving latency: identical uploads dedupe
        # through the device relay (scripts/transfer_probe.py measured
        # repeat-uploads ~free), so each probe rotates the query set by a
        # different offset — same bucketed shape, different buffer
        # content, no recompile.
        bs = min(batch_size, B) if B else 0
        lats = []
        for i in range(n_probes):
            if bs == 0:
                break
            idx = (np.arange(bs) + (i * B) // n_probes) % B
            lat_chunk = np.ascontiguousarray(query_embs[idx])
            t1 = time.perf_counter()
            np.asarray(fn(lat_chunk, top_k))
            lats.append(time.perf_counter() - t1)
        return float(np.median(lats)) if lats else 0.0

    def measure_once():
        # throughput: dispatch every batch asynchronously (jax queues
        # device work), sync once at the end — how a serving pipeline
        # would run.  Per-batch failures degrade to empty results instead
        # of killing the whole evaluation (reference
        # benchmark_utils.py:753-820 keeps a per-query error fallback in
        # its process pool).
        all_ids = np.full((B, top_k), -1, np.int64)
        results = []
        errors = 0
        t0 = time.perf_counter()
        for s, n, chunk in batches():
            try:
                results.append((s, n, retrieve_fn(chunk, top_k)))
            except Exception as e:  # pragma: no cover - defensive
                errors += 1
                print(f"[evaluate_retrieval] batch at {s} failed: {e!r}")
                results.append((s, n, None))
        host_results = [
            (s, n, np.asarray(ids)[:n] if ids is not None
             else np.full((n, top_k), -1, np.int64))
            for s, n, ids in results
        ]
        elapsed = time.perf_counter() - t0
        for s, n, ids in host_results:
            all_ids[s:s + n, : ids.shape[1]] = ids
        batch_latency = probe_latency(retrieve_fn)
        control_latency = (probe_latency(control_fn, n_probes=3)
                           if control_fn is not None else None)
        return all_ids, elapsed, errors, batch_latency, control_latency

    requeued = False
    for attempt in range(2):
        all_ids, elapsed, errors, batch_latency, control_latency = \
            measure_once()
        if (control_fn is None or control_threshold_ms is None or attempt
                or 1000.0 * control_latency <= control_threshold_ms):
            break
        requeued = True
        print(f"[evaluate_retrieval] control batch "
              f"{1000.0 * control_latency:.1f} ms exceeds threshold "
              f"{control_threshold_ms:.1f} (relay weather) — "
              f"re-measuring once", flush=True)

    out = retrieval_metrics(all_ids, target_ids, top_k, k_values)
    out["method"] = name
    if errors:
        out["failed_batches"] = errors
    out["time_taken"] = elapsed
    out["avg_latency_ms"] = 1000.0 * elapsed / max(B, 1)
    out["batch_latency_ms"] = 1000.0 * batch_latency
    out["qps"] = B / elapsed if elapsed > 0 else float("inf")
    if control_fn is not None:
        bs = min(batch_size, B) if B else 1
        out["control_batch_ms"] = 1000.0 * control_latency
        out["control_ms"] = 1000.0 * control_latency / max(bs, 1)
        out["latency_vs_control"] = (
            batch_latency / control_latency if control_latency else
            float("inf"))
        if control_threshold_ms is not None:
            out["control_requeued"] = requeued
    return out


def print_metrics_table(results: Sequence[dict],
                        out_path: Optional[str] = None,
                        k_values: Sequence[int] = K_VALUES,
                        top_k: int = 100) -> str:
    """Pretty table appended to a results file (reference
    print_metrics_table :836-868, tabulate 'grid' style output format so the
    reference's table-parsing report tooling keeps working)."""
    try:
        from tabulate import tabulate
    except ImportError:  # pragma: no cover
        tabulate = None

    ks = [k for k in k_values if k <= top_k]
    header = ["method"] + [f"recall@{k}" for k in ks] + \
        [f"mrr@{k}" for k in ks] + [f"ndcg@{k}" for k in ks] + \
        ["avg_latency_ms", "qps"]
    rows = []
    for r in results:
        rows.append(
            [r.get("method", "?")]
            + [f"{r.get(f'recall@{k}', float('nan')):.4f}" for k in ks]
            + [f"{r.get(f'mrr@{k}', float('nan')):.4f}" for k in ks]
            + [f"{r.get(f'ndcg@{k}', float('nan')):.4f}" for k in ks]
            + [f"{r.get('avg_latency_ms', float('nan')):.3f}",
               f"{r.get('qps', float('nan')):.1f}"]
        )
    if tabulate is not None:
        table = tabulate(rows, headers=header, tablefmt="grid")
    else:
        table = "\n".join(
            ["\t".join(header)] + ["\t".join(map(str, r)) for r in rows]
        )
    if out_path:
        with open(out_path, "a") as f:
            f.write(table + "\n\n")
    return table
