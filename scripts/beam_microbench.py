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
import time

import numpy as np

from rag_cobweb_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=456)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--w", type=int, default=32)
    ap.add_argument("--f", type=int, default=16)
    ap.add_argument("--k-lanes", type=int, default=8)
    ap.add_argument("--levels", type=int, default=12)
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

    @jax.jit
    def gather2xf32(nodes, q):
        def lvl(c, _):
            nds, qb = c
            iv = ivt[nds]
            mv = movt[nds]
            x = qb[:, :, None] if False else qb[:, None, :]
            s = (jnp.sum(x * mv, -1) - 0.5 * jnp.sum(jnp.square(x) * iv, -1)
                 + const[nds])
            return (nds, qb), s
        (_, _), ss = jax.lax.scan(lvl, (nodes, q), jnp.arange(L))
        return ss

    @jax.jit
    def gather1xbf16(nodes, qq):
        def lvl(c, _):
            nds, qqb = c
            t = inter[nds]                       # (B, WF, 2D) bf16
            s = jax.lax.dot_general(
                qqb.astype(jnp.bfloat16), t,
                (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            # batched dg: qq (B, 2D) x t (B, WF, 2D) -> (B, WF)
            return (nds, qqb), s + const[nds]
        (_, _), ss = jax.lax.scan(lvl, (nodes, qq), jnp.arange(L))
        return ss

    @jax.jit
    def block_slice(starts, qq):
        ar = jnp.arange(F, dtype=jnp.int32)

        def lvl(c, _):
            st, qqb = c
            idx = (st[:, :, None] + ar).reshape(B, W * F)
            t = inter[idx]
            s = jax.lax.dot_general(
                qqb.astype(jnp.bfloat16), t,
                (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return (st, qqb), s + const[idx]
        (_, _), ss = jax.lax.scan(lvl, (starts, qq), jnp.arange(L))
        return ss

    KL = args.k_lanes
    ivt_l = jnp.broadcast_to(ivt[None], (KL,) + ivt.shape)
    movt_l = jnp.broadcast_to(movt[None], (KL,) + movt.shape)
    const_l = jnp.broadcast_to(const[None], (KL,) + const.shape)

    @jax.jit
    def lanes_vmap(nodes, q):
        def one(iv_t, mv_t, cs):
            def lvl(c, _):
                nds, qb = c
                iv = iv_t[nds]
                mv = mv_t[nds]
                x = qb[:, None, :]
                s = (jnp.sum(x * mv, -1)
                     - 0.5 * jnp.sum(jnp.square(x) * iv, -1) + cs[nds])
                return (nds, qb), s
            (_, _), ss = jax.lax.scan(lvl, (nodes, q), jnp.arange(L))
            return ss
        return jax.vmap(one)(ivt_l, movt_l, const_l)

    bytes_g2 = L * B * W * F * D * 4 * 2 / 1e9
    bytes_g1 = L * B * W * F * 2 * D * 2 / 1e9
    print(f"shapes: N={N} D={D} B={B} W={W} F={F} L={L}; "
          f"gather2xf32 {bytes_g2:.2f} GB, bf16 {bytes_g1:.2f} GB "
          f"(roofline @819GB/s: {bytes_g2/819*1e3:.1f} / "
          f"{bytes_g1/819*1e3:.1f} ms)", flush=True)
    for name, fn, a in [
        ("gather2xf32", gather2xf32, (nodes, q)),
        ("gather1xbf16", gather1xbf16, (nodes, qq)),
        ("block_slice", block_slice, (starts, qq)),
    ]:
        ms = timeit(fn, *a)
        print(f"{name:14s} {ms:8.2f} ms  ({ms/B*1e3:7.1f} us/query)",
              flush=True)
    ms = timeit(lanes_vmap, nodes, q, iters=5)
    print(f"{'lanes_vmap':14s} {ms:8.2f} ms  x{KL} lanes "
          f"({ms/B*1e3:7.1f} us/query)", flush=True)


if __name__ == "__main__":
    main()
