"""Probe: does the fused-sweep epilogue (+bias, valid mask) cost HBM time,
or does XLA fuse it into the GEMM?  Compares the served form against a
stripped GEMM-only form and a folded form (bias carries -inf padding, no
mask) at 1M-slot shapes on the real chip.

Decides ROADMAP #1's "fold the bias into the GEMM epilogue / skip the
valid mask" — measure before changing the serving path.

RESULT (v5e, B=1024 x 1M slots, k=512, warm): served 13.80 ms/batch,
folded 13.89, stripped 13.75 — the epilogue is FREE (XLA fuses +bias and
where(valid) into the GEMM).  Serving path left unchanged; see
RESULTS.md round-3 fused section.
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax
import jax.numpy as jnp

from rag_cobweb_tpu.core.index import FusedIndex, fused_query_topk


@functools.partial(jax.jit, static_argnames=("k",))
def topk_gemm_only(GT, q, k):
    qq = jnp.concatenate([q, jnp.square(q)], axis=1).astype(GT.dtype)
    s = jnp.matmul(qq, GT, preferred_element_type=jnp.float32)
    return jax.lax.approx_max_k(s, k, recall_target=0.95)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_folded(GT, c, q, k):
    """Bias add only; padding already carries -3e38 in c (no mask)."""
    qq = jnp.concatenate([q, jnp.square(q)], axis=1).astype(GT.dtype)
    s = jnp.matmul(qq, GT, preferred_element_type=jnp.float32) + c[None, :]
    return jax.lax.approx_max_k(s, k, recall_target=0.95)


def bench(fn, qs, iters=5):
    """``block_until_ready`` is NOT a fence through the axon relay and
    identical dispatches are deduped (see scripts/beam_microbench.py), so:
    dispatch ``iters`` DISTINCT query batches, fence with one scalar d2h
    fetch of the last output (device executes in-order), subtract the one
    relay round-trip."""
    out = fn(qs[0])
    np.asarray(out[0][:1, :1])  # warm (compile) + fence
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(qs[1 + i])
    np.asarray(out[0][:1, :1])
    total = (time.perf_counter() - t0) * 1e3
    return max(total - 30.0, 0.0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--k", type=int, default=512)
    args = p.parse_args()

    S, D, B = args.slots, args.dim, args.batch
    Sp = -(-S // 2048) * 2048
    rng = np.random.default_rng(0)
    GT = jnp.asarray(rng.standard_normal((2 * D, Sp)), jnp.bfloat16)
    c = jnp.asarray(rng.standard_normal((Sp,)), jnp.float32)
    c_folded = c.at[S:].set(-3e38)
    valid = jnp.arange(Sp, dtype=jnp.int32) < S
    qs = [jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
          for _ in range(6)]
    fidx = FusedIndex(GT=GT, c=c, valid=valid)

    served = bench(
        lambda q: fused_query_topk(fidx, q, args.k, approx=True), qs)
    gemm = bench(lambda q: topk_gemm_only(GT, q, args.k), qs)
    folded = bench(lambda q: topk_folded(GT, c_folded, q, args.k), qs)
    print(f"Sp={Sp} D={D} B={B} k={args.k} (ms/batch, warm, 5-run mean)")
    print(f"  served  (GEMM + bias + mask + approx): {served:8.2f}")
    print(f"  folded  (GEMM + bias(-inf pad) + approx): {folded:8.2f}")
    print(f"  stripped(GEMM + approx, no epilogue): {gemm:8.2f}")


if __name__ == "__main__":
    main()
