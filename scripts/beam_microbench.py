"""Microbenchmark of beam-expansion scoring formulations on the TPU.

The forest beam (VERDICT r2 missing #5 / ROADMAP #3) spends its time in
the per-level child expansion: score (B, W*F) candidate nodes against the
query batch.  The production formulation is two f32 row-gathers of the
(N, D) stat tables (core/index.beam_search_topk node_lp).  This script
times that against candidate reformulations at matched shapes so kernel
work targets the measured bottleneck instead of a guess:

  gather2xf32   two f32 gathers (production today)
  gather1xbf16  one gather of an interleaved bf16 (N, 2D) table
  block_slice   contiguous first-child block gather (start + arange(F))
                exploiting the BFS layout (children of a node are
                contiguous in compact order)
  lanes_vmap    gather2xf32 vmapped over K lanes (the vforest shape)

Usage: python scripts/beam_microbench.py [--n 100000] [--d 456] [--b 128]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rag_cobweb_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


RT_MS = 30.0  # measured axon relay round-trip; subtracted from timings


def timeit(fn, *args, iters=3):
    """Each fn returns a SCALAR (forces the whole scan to execute on
    fetch); relay round-trip is subtracted.  block_until_ready does not
    actually wait through the axon relay and identical dispatches are
    deduped, so: one warm-up fetch, then time call+fetch per iter."""
    _ = np.asarray(fn(*args))      # warm (compile)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return max(best - RT_MS, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=456)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--w", type=int, default=32)
    ap.add_argument("--f", type=int, default=16)
    ap.add_argument("--k-lanes", type=int, default=8)
    ap.add_argument("--levels", type=int, default=96)
    args = ap.parse_args()
    N, D, B, W, F = args.n, args.d, args.b, args.w, args.f
    rng = np.random.default_rng(0)

    movt = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    ivt = jnp.asarray(rng.uniform(0.5, 2.0, size=(N, D)).astype(np.float32))
    const = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    inter = jnp.concatenate([movt, -0.5 * ivt], axis=1).astype(jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    qq = jnp.concatenate([q, jnp.square(q)], axis=1)
    nodes = jnp.asarray(rng.integers(0, N, size=(B, W * F)).astype(np.int32))
    starts = jnp.asarray(rng.integers(0, N - F, size=(B, W)).astype(np.int32))

    L = args.levels

    # Each level body does gather -> score -> top_k -> derive the next
    # frontier from the WINNERS (data-dependent), exactly like real beam —
    # a loop-invariant carry would let XLA hoist the gather out of the
    # scan and time nothing.

    @jax.jit
    def gather2xf32(ivt, movt, const, nodes, q):
        def lvl(c, lv):
            nds, qb = c
            iv = ivt[nds]
            mv = movt[nds]
            x = qb[:, None, :]
            s = (jnp.sum(x * mv, -1) - 0.5 * jnp.sum(jnp.square(x) * iv, -1)
                 + const[nds])
            top, ids = jax.lax.top_k(s, W)
            win = jnp.take_along_axis(nds, ids, 1)          # (B, W)
            nxt = ((win[:, :, None] * 7 + lv
                    + jnp.arange(F, dtype=jnp.int32)) % N).reshape(B, W * F)
            return (nxt, qb), top
        (_, _), ss = jax.lax.scan(lvl, (nodes, q), jnp.arange(L))
        return jnp.sum(ss)

    @jax.jit
    def gather1xbf16(inter, const, nodes, qq):
        def lvl(c, lv):
            nds, qqb = c
            t = inter[nds]                       # (B, WF, 2D) bf16
            s = jax.lax.dot_general(
                qqb.astype(jnp.bfloat16), t,
                (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + const[nds]
            top, ids = jax.lax.top_k(s, W)
            win = jnp.take_along_axis(nds, ids, 1)
            nxt = ((win[:, :, None] * 7 + lv
                    + jnp.arange(F, dtype=jnp.int32)) % N).reshape(B, W * F)
            return (nxt, qqb), top
        (_, _), ss = jax.lax.scan(lvl, (nodes, qq), jnp.arange(L))
        return jnp.sum(ss)

    @jax.jit
    def block_slice(inter, const, starts, qq):
        ar = jnp.arange(F, dtype=jnp.int32)

        def lvl(c, lv):
            st, qqb = c
            idx = (st[:, :, None] + ar).reshape(B, W * F)
            t = inter[idx]
            s = jax.lax.dot_general(
                qqb.astype(jnp.bfloat16), t,
                (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + const[idx]
            top, ids = jax.lax.top_k(s, W)
            win = jnp.take_along_axis(idx, ids, 1)
            nxt = (win * 5 + lv) % (N - F)
            return (nxt, qqb), top
        (_, _), ss = jax.lax.scan(lvl, (starts, qq), jnp.arange(L))
        return jnp.sum(ss)

    KL = args.k_lanes
    ivt_l = jnp.tile(ivt[None], (KL, 1, 1))
    movt_l = jnp.tile(movt[None], (KL, 1, 1))
    const_l = jnp.tile(const[None], (KL, 1))

    @jax.jit
    def lanes_vmap(ivt_l, movt_l, const_l, nodes, q):
        def one(iv_t, mv_t, cs):
            def lvl(c, lv):
                nds, qb = c
                iv = iv_t[nds]
                mv = mv_t[nds]
                x = qb[:, None, :]
                s = (jnp.sum(x * mv, -1)
                     - 0.5 * jnp.sum(jnp.square(x) * iv, -1) + cs[nds])
                top, ids = jax.lax.top_k(s, W)
                win = jnp.take_along_axis(nds, ids, 1)
                nxt = ((win[:, :, None] * 7 + lv
                        + jnp.arange(F, dtype=jnp.int32)) % N
                       ).reshape(B, W * F)
                return (nxt, qb), top
            (_, _), ss = jax.lax.scan(lvl, (nodes, q), jnp.arange(L))
            return jnp.sum(ss)
        return jnp.sum(jax.vmap(one)(ivt_l, movt_l, const_l))

    bytes_g2 = L * B * W * F * D * 4 * 2 / 1e9
    bytes_g1 = L * B * W * F * 2 * D * 2 / 1e9
    print(f"shapes: N={N} D={D} B={B} W={W} F={F} L={L}; "
          f"gather2xf32 {bytes_g2:.2f} GB, bf16 {bytes_g1:.2f} GB "
          f"(roofline @819GB/s: {bytes_g2/819*1e3:.1f} / "
          f"{bytes_g1/819*1e3:.1f} ms)", flush=True)
    for name, fn, a in [
        ("gather2xf32", gather2xf32, (ivt, movt, const, nodes, q)),
        ("gather1xbf16", gather1xbf16, (inter, const, nodes, qq)),
        ("block_slice", block_slice, (inter, const, starts, qq)),
    ]:
        ms = timeit(fn, *a)
        print(f"{name:14s} {ms:8.2f} ms  ({ms/B*1e3:7.1f} us/query)",
              flush=True)
    ms = timeit(lanes_vmap, ivt_l, movt_l, const_l, nodes, q, iters=2)
    print(f"{'lanes_vmap':14s} {ms:8.2f} ms  x{KL} lanes "
          f"({ms/B*1e3:7.1f} us/query)", flush=True)


if __name__ == "__main__":
    main()
