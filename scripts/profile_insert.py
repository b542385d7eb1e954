#!/usr/bin/env python
"""Insert-path microprofiler: isolates where vforest round time goes.

Times, on the real chip (or CPU with --cpu):
  * vinsert_rounds at several K (round time vs lane count),
  * descend-only vs apply-only variants,
  * retry frequency (descents deeper than the scan budget) at a given
    tree size, and the cost of one _insert_one_lane state round-trip.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--cap", type=int, default=8192)
    p.add_argument("--rounds", type=int, default=64)
    p.add_argument("--prefill", type=int, default=128,
                   help="instances per lane inserted before timing")
    p.add_argument("--ks", type=str, default="64,256")
    args = p.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        import jax
        jax.config.update("jax_platforms", "cpu")
    from rag_cobweb_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import functools

    from rag_cobweb_tpu.core.config import TreeConfig
    from rag_cobweb_tpu.core import tree as tree_mod
    from rag_cobweb_tpu.parallel import vforest as vf_mod

    cfg = TreeConfig(dim=args.dim)
    D = args.dim
    R = args.rounds
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=3.0, size=(64, D)).astype(np.float32)

    def data(n):
        c = rng.integers(0, 64, size=n)
        return (centers[c] + 0.3 * rng.normal(size=(n, D))
                ).astype(np.float32)

    @functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
    def descend_only(st, xs, keys, cfg, max_steps=16):
        def body(r, acc):
            dbufs, steps, leaves = jax.vmap(
                lambda s, x, k: tree_mod._descend_collect_scan(
                    s, x, k, cfg, max_steps=max_steps)
            )(st, xs[:, r], keys[:, r])
            return acc + jnp.sum(steps)
        return jax.lax.fori_loop(0, xs.shape[1], body, jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def rounds_with_steps(st, xs, keys, cfg):
        """vinsert_rounds + total steps + retry count (leaves == -1)."""
        st, leaves = vf_mod.vinsert_rounds(st, xs, keys, cfg)
        return st, leaves

    for K in (int(x) for x in args.ks.split(",")):
        st0 = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[tree_mod.init_state(args.cap, D, cfg.max_fanout)
              for _ in range(K)])
        keyfn = lambda n: jax.random.split(
            jax.random.PRNGKey(1), K * n).reshape(K, n, -1)
        # prefill so the timed rounds descend a realistic tree
        xs_p = jnp.asarray(data(K * args.prefill).reshape(
            K, args.prefill, D).transpose(0, 1, 2))
        st, leaves = vf_mod.vinsert_rounds(st0, xs_p, keyfn(args.prefill),
                                           cfg)
        jax.block_until_ready(st)
        n_retry_p = int((np.asarray(leaves) < 0).sum())

        xs = jnp.asarray(data(K * R).reshape(K, R, D))
        keys = keyfn(R)

        # full rounds (insert + apply)
        st1, leaves = vf_mod.vinsert_rounds(st, xs, keys, cfg)
        jax.block_until_ready(st1)  # compile warm
        t0 = time.perf_counter()
        st2, leaves2 = vf_mod.vinsert_rounds(st1, xs, keys, cfg)
        jax.block_until_ready(st2)
        full_s = time.perf_counter() - t0
        n_retry = int((np.asarray(leaves2) < 0).sum())

        # descend only
        s = descend_only(st, xs, keys, cfg)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        s = descend_only(st, xs, keys, cfg)
        jax.block_until_ready(s)
        desc_s = time.perf_counter() - t0

        # one-lane exact retry round-trip cost
        t0 = time.perf_counter()
        st3, leaf = vf_mod._insert_one_lane(
            st1, jnp.asarray(0, jnp.int32), xs[0, 0], keys[0, 0], cfg)
        jax.block_until_ready(st3)
        retry1_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        st3, leaf = vf_mod._insert_one_lane(
            st3, jnp.asarray(1, jnp.int32), xs[1, 0], keys[1, 0], cfg)
        jax.block_until_ready(st3)
        retry1 = time.perf_counter() - t0

        print(f"K={K:4d} cap={args.cap} R={R}: "
              f"full {full_s*1e3:8.1f} ms ({full_s/R*1e3:6.2f} ms/round, "
              f"{K*R/full_s:7.0f} ins/s) | descend-only "
              f"{desc_s*1e3:8.1f} ms | retries prefill={n_retry_p} "
              f"timed={n_retry} | 1-lane exact retry {retry1*1e3:.1f} ms "
              f"(cold {retry1_cold*1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
