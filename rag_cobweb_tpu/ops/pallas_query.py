"""Pallas TPU kernel for the blocked Cobweb query.

Fuses, per sentence block: the two node log-prob GEMMs, the dense local
path-weight matmul, and an iterative top-k extraction — all in VMEM.  The
(B, S) score matrix never touches HBM (the XLA path writes it out and reads
it back for ``lax.top_k``: 2 * B * S * 4 bytes of traffic, ~2 GB per
256-query batch at one million sentences).  The kernel streams the per-block
index arrays (Pallas double-buffers the grid automatically) and emits only
(NB, B, K) candidates, merged by one tiny ``lax.top_k`` afterwards.

Falls back to the pure-XLA path (core/index.blocked_query_topk) when Pallas
is unavailable (CPU tests run interpret=True).

FUSED-form kernels (pallas_fused_topk / pallas_fused_group_topk) score the
per-sentence coefficient GEMM (core/index.FusedIndex) with in-VMEM pool
extraction.  Measured at B=1024 x 1M (v5e, bf16 index): XLA approx pool
42-52 ms/batch; pallas_fused block_k=8 48 ms; group-max per_group=1
39 ms (exact-512 pool containment 0.969, top-10 1.000), per_group=2
53 ms (containment 0.999).  The extraction is VPU-bound (~4.5 ms per
max+mask round over the (B, TSF) tile) and XLA's approx_max_k
partial-reduce is equally good, so the XLA fused path stays the serving
default and these kernels remain selectable engines — the measurement
is the artifact (they also bound what a hand kernel can win here: <10%).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_cobweb_tpu.core.index import BlockedIndex, FusedIndex

NEG = -3e38  # python literal: jnp constants can't be captured by kernels


def _kernel(q_ref, q2_ref, ivt_ref, movt_ref, const_ref, w_ref, valid_ref,
            out_s_ref, out_t_ref, *, k: int):
    """One sentence block: scores = ((q @ movt^T) - 0.5 (q^2 @ ivt^T) + c) @ W,
    then k rounds of max-extraction."""
    q = q_ref[:]                       # (B, D) — pre-cast to the slab dtype
    q2 = q2_ref[:]
    movt = movt_ref[0]                 # (M, D)
    ivt = ivt_ref[0]
    const = const_ref[0]               # (1, M) laid out 2D for TPU
    w = w_ref[0]                       # (M, TS)
    valid = valid_ref[0]               # (1, TS)

    dn = (((1,), (1,)), ((), ()))      # contract D with D
    # f32 slabs: HIGHEST keeps f32 on the MXU (default bf16 shifts scores
    # enough to flip top-k ties).  bf16 slabs: one-pass MXU contraction
    # with f32 accumulation — HIGHEST here would force the 6-pass f32
    # emulation and throw away the bf16 serving index's entire speedup
    # (the approx pool + exact re-rank downstream make the sweep's bf16
    # jitter harmless, same contract as core/index.blocked_scores).
    f32 = movt.dtype == jnp.float32
    prec = (jax.lax.Precision.HIGHEST if f32
            else jax.lax.Precision.DEFAULT)
    nlp = jax.lax.dot_general(q, movt, dn, precision=prec,
                              preferred_element_type=jnp.float32)
    nlp = nlp - 0.5 * jax.lax.dot_general(
        q2, ivt, dn, precision=prec, preferred_element_type=jnp.float32
    )
    nlp = nlp + const                   # (B, M) f32

    scores = jnp.dot(nlp.astype(w.dtype), w, precision=prec,
                     preferred_element_type=jnp.float32)  # (B, TS)
    scores = jnp.where(valid > 0, scores, NEG)

    B, TS = scores.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, TS), 1)
    for i in range(k):                  # k is small and static
        m = jnp.max(scores, axis=1)
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        out_s_ref[0, :, i] = m
        out_t_ref[0, :, i] = a
        scores = jnp.where(lane == a[:, None], NEG, scores)


VMEM_BUDGET = 14 * 2**20  # conservative slice of the 16 MB scoped limit


def pallas_vmem_estimate(bidx: BlockedIndex, n_queries: int,
                         block_k: int) -> int:
    """Per-invocation VMEM footprint of ``pallas_blocked_topk``:
    double-buffered per-block input streams + resident query tiles +
    kernel stack scratch.  Scratch counts BOTH (B, M) dot results (the
    two GEMM partials are live simultaneously before the subtraction)
    and three (B, TS) tiles (scores, the iota lane map, and the masked
    copy the iterative top-k rewrites) — calibrated against an observed
    scoped-vmem OOM: B=1000, M=896, TS=512, D=128 allocated 21.82 MB
    (this formula: ~20.4 MB + tile padding).  Callers fall back to the
    XLA blocked path or chunk the query batch when this exceeds
    ``VMEM_BUDGET``."""
    NB, M, D = bidx.ivt_b.shape
    TS = bidx.W.shape[2]
    B = n_queries
    itemsize = bidx.ivt_b.dtype.itemsize
    per_block = (2 * M * D + M * TS) * itemsize * 2  # dbl-buffered streams
    per_block += (M + TS) * 4 * 2
    resident = 2 * B * D * itemsize                   # q, q^2 (slab dtype)
    scratch = 2 * B * M * 4 + 3 * B * TS * 4          # nlp x2, scores x3
    outs = 2 * B * block_k * 4 * 2                    # dbl-buffered outputs
    return per_block + resident + scratch + outs


def pallas_fits_vmem(bidx: BlockedIndex, n_queries: int,
                     block_k: int) -> bool:
    return pallas_vmem_estimate(bidx, n_queries, block_k) <= VMEM_BUDGET


# --------------------------------------------------------------------------
# v2: 2D grid (sentence blocks x query tiles).  The v1 kernel streamed all
# NB blocks once per VMEM-sized query chunk, so a B=4096 batch re-read the
# whole blocked index (1-5 GB) B/chunk times across separate dispatches.
# Here the QUERY TILE is the fastest grid dimension: Pallas re-fetches an
# input only when its block index changes, so each sentence block's
# (M, D)/(M, TS) slabs stay resident in VMEM while every query tile visits
# them — the index streams HBM exactly ONCE per batch, and the whole sweep
# is one dispatch.
# --------------------------------------------------------------------------

def _kernel_v2(q_ref, q2_ref, ivt_ref, movt_ref, const_ref, w_ref,
               valid_ref, out_s_ref, out_t_ref, *, k: int):
    _kernel(q_ref, q2_ref, ivt_ref, movt_ref, const_ref, w_ref, valid_ref,
            out_s_ref, out_t_ref, k=k)


def _v2_tile(bidx: BlockedIndex, block_k: int) -> int:
    """Largest power-of-two query tile whose scratch + resident block slabs
    fit the VMEM budget (>= 64; 0 when even 64 doesn't fit)."""
    NB, M, D = bidx.ivt_b.shape
    TS = bidx.W.shape[2]
    itemsize = bidx.ivt_b.dtype.itemsize
    per_block = (2 * M * D + M * TS) * itemsize * 2   # dbl-buffered slabs
    per_block += (M + TS) * 4 * 2
    tb = 512
    while tb >= 64:
        scratch = 2 * tb * M * 4 + 3 * tb * TS * 4
        resident = 2 * tb * D * itemsize * 2          # q, q^2 (dbl-buf)
        outs = 2 * tb * block_k * 4 * 2
        if per_block + scratch + resident + outs <= VMEM_BUDGET:
            return tb
        tb //= 2
    return 0


@functools.partial(jax.jit, static_argnames=("k", "interpret", "block_k"))
def pallas_blocked_topk_tiled(bidx: BlockedIndex, queries: jnp.ndarray,
                              k: int, interpret: bool = False,
                              block_k: int = 16):
    """One-dispatch full-batch sweep: (B, D) -> (scores, sids) (B, k).

    Grid (NB, B/TB) with the query tile innermost; per-block candidates
    (``block_k`` max+mask rounds) merge via one approx/exact top-k.
    """
    NB, M, D = bidx.ivt_b.shape
    TS = bidx.W.shape[2]
    B = queries.shape[0]
    kk = min(block_k or k, TS)
    TB = _v2_tile(bidx, kk)
    if TB == 0:
        raise ValueError("no VMEM-fitting query tile")
    BT = -(-B // TB)
    Bp = BT * TB
    if Bp != B:
        queries = jnp.concatenate(
            [queries, jnp.zeros((Bp - B, D), queries.dtype)])

    # squares in f32, then ONE cast to the slab dtype (the kernel's dots
    # contract bf16 x bf16 one-pass with f32 accumulation)
    q2 = jnp.square(queries).astype(bidx.ivt_b.dtype)
    queries = queries.astype(bidx.ivt_b.dtype)
    const2d = bidx.const_b[:, None, :]                    # (NB, 1, M)
    valid2d = bidx.valid[:, None, :].astype(jnp.float32)  # (NB, 1, TS)

    out_s, out_t = pl.pallas_call(
        functools.partial(_kernel_v2, k=kk),
        grid=(NB, BT),
        in_specs=[
            pl.BlockSpec((TB, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, TS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, kk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, kk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, Bp, kk), jnp.float32),
            jax.ShapeDtypeStruct((NB, Bp, kk), jnp.int32),
        ],
        interpret=interpret,
    )(queries, q2, bidx.ivt_b, bidx.movt_b, const2d, bidx.W, valid2d)

    cand_s = jnp.transpose(out_s, (1, 0, 2)).reshape(Bp, NB * kk)[:B]
    cand_t = jnp.transpose(out_t, (1, 0, 2)).reshape(Bp, NB * kk)[:B]
    block_of = jnp.repeat(jnp.arange(NB, dtype=jnp.int32), kk)[None, :]
    kf = min(k, NB * kk)
    if kf < NB * kk and not interpret:
        # candidate POOL for the exact re-rank: approximate selection is
        # free where the exact sort costs ~NB*kk*k compares per query
        top, pos = jax.lax.approx_max_k(cand_s, kf, recall_target=0.95)
    else:
        top, pos = jax.lax.top_k(cand_s, kf)
    slot = jnp.take_along_axis(cand_t, pos, axis=1)
    blk = jnp.take_along_axis(jnp.broadcast_to(block_of, cand_t.shape),
                              pos, axis=1)
    sids = bidx.sid_of_slot[blk, slot]
    return top, sids


# --------------------------------------------------------------------------
# FUSED-form kernel: candidate pool straight from the per-sentence
# coefficient GEMM (core/index.FusedIndex), never materializing the (B, S)
# score matrix in HBM.  The XLA fused pool path writes the f32 scores out
# and approx_max_k reads them back (8.2 GB round-trip at B=1024 x 1M) and
# its partial-reduce runs ~30 of the ~42 ms pool stage; here each (2D, TSF)
# coefficient slab is loaded into VMEM ONCE per batch (query tile is the
# fast grid axis), scored, and reduced to kappa per-slab candidates
# in-place.  The merged (B, NS*kappa) pool feeds the same exact re-rank.
# --------------------------------------------------------------------------

TSF = 2048  # S-slab width = core/index._FUSED_ROW_BUCKET (always divides Sp)


def _fused_kernel(qq_ref, gt_ref, c_ref, valid_ref, out_s_ref, out_p_ref,
                  *, kappa: int):
    """One (query tile, S-slab) cell: scores = qq @ gt + c, masked, then
    ``kappa`` max+mask extraction rounds emitting GLOBAL sentence ids."""
    qq = qq_ref[:]                       # (TB, 2D) slab dtype
    gt = gt_ref[:]                       # (2D, TSF) slab dtype
    cc = c_ref[:]                        # (1, TSF) f32
    valid = valid_ref[:]                 # (1, TSF) f32

    f32 = gt.dtype == jnp.float32
    prec = (jax.lax.Precision.HIGHEST if f32
            else jax.lax.Precision.DEFAULT)
    scores = jnp.dot(qq, gt, precision=prec,
                     preferred_element_type=jnp.float32)   # (TB, TSF)
    scores = jnp.where(valid > 0, scores + cc, NEG)

    base = pl.program_id(0) * TSF        # global row of this slab
    TB = scores.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, TSF), 1)
    for i in range(kappa):               # kappa is small and static
        m = jnp.max(scores, axis=1)
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        out_s_ref[0, :, i] = m
        out_p_ref[0, :, i] = base + a
        scores = jnp.where(lane == a[:, None], NEG, scores)


def _fused_group_kernel(qq_ref, gt_ref, c_ref, valid_ref,
                        out_s_ref, out_p_ref, *, per_group: int):
    """Group-max extraction: the per-round max+mask loop costs ~3 full
    passes over (TB, TSF) PER candidate (measured ~4.5 ms/round at
    B=1024 x 1M — it dominates the kernel).  Instead emit the top
    ``per_group`` rows of every 128-lane GROUP in 2 passes each: the
    merged pool then holds NS * (TSF/128) * per_group candidates whose
    coverage loss is bounded to >per_group winners inside one 128-row
    window (adjacent sentence ids)."""
    qq = qq_ref[:]                       # (TB, 2D)
    gt = gt_ref[:]                       # (2D, TSF)
    cc = c_ref[:]                        # (1, TSF) f32
    valid = valid_ref[:]                 # (1, TSF) f32

    f32 = gt.dtype == jnp.float32
    prec = (jax.lax.Precision.HIGHEST if f32
            else jax.lax.Precision.DEFAULT)
    scores = jnp.dot(qq, gt, precision=prec,
                     preferred_element_type=jnp.float32)   # (TB, TSF)
    scores = jnp.where(valid > 0, scores + cc, NEG)

    TB = scores.shape[0]
    NG = TSF // 128
    s3 = scores.reshape(TB, NG, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, NG, 128), 2)
    base = pl.program_id(0) * TSF
    goff = jax.lax.broadcasted_iota(jnp.int32, (TB, NG), 1) * 128
    for i in range(per_group):
        m = jnp.max(s3, axis=2)                            # (TB, NG)
        a = jnp.argmax(s3, axis=2).astype(jnp.int32)
        out_s_ref[0, :, i * NG:(i + 1) * NG] = m
        out_p_ref[0, :, i * NG:(i + 1) * NG] = base + goff + a
        if i + 1 < per_group:
            s3 = jnp.where(lane == a[:, :, None], NEG, s3)


def _fused_tile(dtype_bytes: int, kappa: int, live: int = 3) -> int:
    """Largest power-of-two query tile fitting the VMEM budget: the
    dbl-buffered (2D, TSF) slab + qq tile + ``live`` concurrent (TB, TSF)
    f32 score-sized buffers (scores + iota/mask working copies — the
    mask-free group kernel at per_group=1 needs only one) + dbl-buffered
    outputs.  Bigger TB = fewer grid steps (each step carries fixed
    sequencing overhead at NS ~ 500 slabs)."""
    per_slab = 256 * TSF * dtype_bytes * 2 + 2 * TSF * 4 * 2
    tb = 1024
    while tb >= 64:
        scratch = live * tb * TSF * 4
        resident = tb * 256 * dtype_bytes * 2
        outs = 2 * tb * kappa * 4 * 2
        if per_slab + scratch + resident + outs <= VMEM_BUDGET:
            return tb
        tb //= 2
    return 0


@functools.partial(jax.jit, static_argnames=("k", "interpret", "block_k"))
def pallas_fused_topk(fidx: FusedIndex, queries: jnp.ndarray, k: int,
                      interpret: bool = False, block_k: int = 16):
    """Candidate pool from the fused index: (B, D) -> (scores, sids),
    both (B, k).  ``block_k`` candidates are extracted per (query, S-slab)
    in VMEM; the pool merge keeps the best ``k`` of the NS * block_k.

    Per-slab extraction bounds coverage: a query whose true top-k
    CONCENTRATES inside one 2048-row slab keeps only ``block_k`` of them
    (the hard set's near-duplicate groups are adjacent sentence ids).
    The exact re-rank downstream needs pool MEMBERSHIP of the gold row
    only — calibrate ``block_k`` against measured pool recall."""
    TwoD, Sp = fidx.GT.shape
    assert Sp % TSF == 0, "FusedIndex rows are padded to the 2048 bucket"
    NS = Sp // TSF
    B, D = queries.shape
    kappa = min(block_k, TSF)
    TB = _fused_tile(fidx.GT.dtype.itemsize, kappa)
    if TB == 0:
        raise ValueError("no VMEM-fitting query tile")
    BT = -(-B // TB)
    Bp = BT * TB
    if Bp != B:
        queries = jnp.concatenate(
            [queries, jnp.zeros((Bp - B, D), queries.dtype)])

    q = queries.astype(jnp.float32)
    qq = jnp.concatenate([q, jnp.square(q)], axis=1).astype(fidx.GT.dtype)
    c2d = fidx.c[None, :]                                  # (1, Sp)
    valid2d = fidx.valid[None, :].astype(jnp.float32)      # (1, Sp)

    out_s, out_p = pl.pallas_call(
        functools.partial(_fused_kernel, kappa=kappa),
        grid=(NS, BT),                    # query tile innermost: each GT
        in_specs=[                        # slab streams HBM once per batch
            pl.BlockSpec((TB, TwoD), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TwoD, TSF), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TSF), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TSF), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, kappa), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, kappa), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NS, Bp, kappa), jnp.float32),
            jax.ShapeDtypeStruct((NS, Bp, kappa), jnp.int32),
        ],
        interpret=interpret,
    )(qq, fidx.GT, c2d, valid2d)

    cand_s = jnp.transpose(out_s, (1, 0, 2)).reshape(Bp, NS * kappa)[:B]
    cand_p = jnp.transpose(out_p, (1, 0, 2)).reshape(Bp, NS * kappa)[:B]
    kf = min(k, NS * kappa)
    if kf < NS * kappa and not interpret:
        top, pos = jax.lax.approx_max_k(cand_s, kf, recall_target=0.95)
    else:
        top, pos = jax.lax.top_k(cand_s, kf)
    sids = jnp.take_along_axis(cand_p, pos, axis=1)
    return top, sids


@functools.partial(jax.jit, static_argnames=("k", "interpret", "per_group"))
def pallas_fused_group_topk(fidx: FusedIndex, queries: jnp.ndarray, k: int,
                            interpret: bool = False, per_group: int = 2):
    """Group-max fused pool: (B, D) -> (scores, sids) (B, k), pool drawn
    from the top ``per_group`` of every 128 adjacent sentence rows (see
    ``_fused_group_kernel``)."""
    TwoD, Sp = fidx.GT.shape
    assert Sp % TSF == 0
    NS = Sp // TSF
    NG = TSF // 128
    B, D = queries.shape
    # live=3 (NOT 1 at per_group=1): the bigger TB=1024 tile it would
    # allow measured SLOWER (46 vs 39 ms at B=1024 x 1M) — the extraction
    # is VPU-bound, not grid-overhead-bound
    TB = _fused_tile(fidx.GT.dtype.itemsize, per_group * NG)
    if TB == 0:
        raise ValueError("no VMEM-fitting query tile")
    BT = -(-B // TB)
    Bp = BT * TB
    if Bp != B:
        queries = jnp.concatenate(
            [queries, jnp.zeros((Bp - B, D), queries.dtype)])

    q = queries.astype(jnp.float32)
    qq = jnp.concatenate([q, jnp.square(q)], axis=1).astype(fidx.GT.dtype)
    c2d = fidx.c[None, :]
    valid2d = fidx.valid[None, :].astype(jnp.float32)
    KO = per_group * NG

    out_s, out_p = pl.pallas_call(
        functools.partial(_fused_group_kernel, per_group=per_group),
        grid=(NS, BT),
        in_specs=[
            pl.BlockSpec((TB, TwoD), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TwoD, TSF), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TSF), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TSF), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, KO), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, KO), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NS, Bp, KO), jnp.float32),
            jax.ShapeDtypeStruct((NS, Bp, KO), jnp.int32),
        ],
        interpret=interpret,
    )(qq, fidx.GT, c2d, valid2d)

    cand_s = jnp.transpose(out_s, (1, 0, 2)).reshape(Bp, NS * KO)[:B]
    cand_p = jnp.transpose(out_p, (1, 0, 2)).reshape(Bp, NS * KO)[:B]
    kf = min(k, NS * KO)
    if kf < NS * KO and not interpret:
        top, pos = jax.lax.approx_max_k(cand_s, kf, recall_target=0.95)
    else:
        top, pos = jax.lax.top_k(cand_s, kf)
    sids = jnp.take_along_axis(cand_p, pos, axis=1)
    return top, sids


@functools.partial(jax.jit, static_argnames=("k", "interpret", "block_k"))
def pallas_blocked_topk(bidx: BlockedIndex, queries: jnp.ndarray, k: int,
                        interpret: bool = False, block_k: int = 0):
    """(B, D) queries -> (scores (B, k), sentence ids (B, k)).

    ``block_k``: per-block candidates the kernel extracts (default = k).
    The in-kernel extraction is k sequential max+mask rounds, so when a
    large candidate pool is wanted for downstream re-ranking, a small
    ``block_k`` (e.g. 16) with k = pool size is much faster — the merged
    pool still holds NB * block_k candidates."""
    NB, M, D = bidx.ivt_b.shape
    TS = bidx.W.shape[2]
    B = queries.shape[0]
    kk = min(block_k or k, TS)

    q2 = jnp.square(queries).astype(bidx.ivt_b.dtype)
    queries = queries.astype(bidx.ivt_b.dtype)
    const2d = bidx.const_b[:, None, :]            # (NB, 1, M)
    valid2d = bidx.valid[:, None, :].astype(jnp.float32)  # (NB, 1, TS)

    out_s, out_t = pl.pallas_call(
        functools.partial(_kernel, k=kk),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((B, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, TS), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, kk), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, kk), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, B, kk), jnp.float32),
            jax.ShapeDtypeStruct((NB, B, kk), jnp.int32),
        ],
        interpret=interpret,
    )(queries, q2, bidx.ivt_b, bidx.movt_b, const2d, bidx.W, valid2d)

    # merge the per-block candidates: (B, NB*kk) -> top-k
    cand_s = jnp.transpose(out_s, (1, 0, 2)).reshape(B, NB * kk)
    cand_t = jnp.transpose(out_t, (1, 0, 2)).reshape(B, NB * kk)
    block_of = jnp.repeat(jnp.arange(NB, dtype=jnp.int32), kk)[None, :]
    top, pos = jax.lax.top_k(cand_s, min(k, NB * kk))
    slot = jnp.take_along_axis(cand_t, pos, axis=1)
    blk = jnp.take_along_axis(jnp.broadcast_to(block_of, cand_t.shape),
                              pos, axis=1)
    sids = bidx.sid_of_slot[blk, slot]
    return top, sids
