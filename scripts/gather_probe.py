#!/usr/bin/env python
"""Row-gather rate probe: XLA gather vs a Pallas manual-DMA kernel.

The exact re-rank's candidate gather is the product path's bound at the
measured ~21M rows/s XLA gather rate (roofline.V5E_GATHER_ROWS_PER_S;
row-width independent).  This probe asks whether a hand-pipelined Pallas
kernel — per-row async copies HBM→VMEM with N buffers in flight, distance
computed in the shadow of the DMAs — can beat that rate before any
integration work is spent (ROADMAP #4).

Prints one line per (engine, D): rows/s and ms per (B, C) gather+reduce.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--cand", type=int, default=512)
    ap.add_argument("--dims", type=str, default="128,768")
    ap.add_argument("--nbuf", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, B, C, NBUF = args.corpus, args.batch, args.cand, args.nbuf
    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnames=())
    def xla_gather_l2(emb, q, cand):
        x = emb[cand]                                   # (B, C, D)
        return jnp.sum(jnp.square(q[:, None, :] - x), -1)

    def make_pallas(D, CB=8):
        NB = C // CB            # candidate blocks per query (C % CB == 0)

        def body(cand_ref, q_ref, emb_ref, out_ref, scratch, sems):
            b = pl.program_id(0)

            def start_block(buf, blk):
                # CB per-row DMAs into this buffer (unrolled, all in flight)
                for j in range(CB):
                    pltpu.make_async_copy(
                        emb_ref.at[pl.ds(cand_ref[b, blk * CB + j], 1), :],
                        scratch.at[buf, pl.ds(j, 1), :],
                        sems.at[buf, j],
                    ).start()

            def wait_block(buf, blk):
                for j in range(CB):
                    pltpu.make_async_copy(
                        emb_ref.at[pl.ds(cand_ref[b, blk * CB + j], 1), :],
                        scratch.at[buf, pl.ds(j, 1), :],
                        sems.at[buf, j],
                    ).wait()

            for blk in range(NB):               # static unroll
                start_block(0, blk)
                wait_block(0, blk)
                rows = scratch[0, :, :]                         # (CB, D)
                d2 = jnp.sum(jnp.square(q_ref[b, :][None, :] - rows), -1)
                out_ref[b, pl.ds(blk * CB, CB)] = d2

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),     # q, whole
                pl.BlockSpec(memory_space=pltpu.ANY),      # emb in HBM
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, CB, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, CB)),
            ],
        )
        return pl.pallas_call(
            body, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        )

    for D in (int(d) for d in args.dims.split(",")):
        emb = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        cands = [jnp.asarray(rng.integers(0, S, size=(B, C), dtype=np.int32))
                 for _ in range(args.reps)]

        ref = np.asarray(xla_gather_l2(emb, q, cands[0]))
        t0 = time.perf_counter()
        for cand in cands:                             # distinct dispatches
            r = xla_gather_l2(emb, q, cand)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / args.reps
        print(f"[gather] D={D} xla:    {B*C/dt/1e6:7.1f}M rows/s "
              f"({1e3*dt:.2f} ms / {B}x{C})", flush=True)

        try:
            pk = make_pallas(D)
            out = np.asarray(pk(cands[0], q, emb))
            err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
            assert err < 1e-4, f"pallas mismatch rel={err}"
            t0 = time.perf_counter()
            for cand in cands:
                r = pk(cand, q, emb)
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / args.reps
            print(f"[gather] D={D} pallas: {B*C/dt/1e6:7.1f}M rows/s "
                  f"({1e3*dt:.2f} ms / {B}x{C}, CB=8)", flush=True)
        except Exception as e:
            print(f"[gather] D={D} pallas: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
