"""Within-tree tensor parallelism: one prediction index sharded over a mesh.

The forest (parallel/forest.py) shards *trees*; this module shards ONE
tree's query index when its matrices exceed a single device's HBM
(SURVEY.md §2c, row "Tensor parallelism": "shard node-statistics matrices
over ICI when a single forest shard exceeds HBM").  At 1M+ sentences the
HBM ceiling is the pair of (D, N) GEMM-term matrices and the (S, P) path
arrays; both are split here:

  * node statistics ``inv_var_T`` / ``mu_over_var_T`` are sharded along
    **D** — the contraction dimension of the scoring GEMMs.  Each device
    computes a partial (B, N) node-log-prob from its D-slice and a
    ``psum`` over ICI completes the reduction (classic TP: shard the
    contraction, all-reduce the partials).
  * the per-sentence path arrays are sharded along **S** — each device
    path-sums and top-k's only its own sentence rows, and an
    ``all_gather`` of (B, k) candidates + a final merge produces the
    global top-k.  Only k candidates per shard cross the interconnect.

Per-device memory: (2·D·N)/K stats + (2·S·P)/K paths — K× headroom over
the single-chip layout with two collectives per query batch.

The reference has no equivalent (100% single-device torch); the role being
filled is CobwebWrapper.cobweb_predict_indexed (:210-265) at sizes where
its dense caches (:187-203) cannot fit one device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_cobweb_tpu.core.index import PredictionIndex


class TPIndex(NamedTuple):
    """Device-sharded prediction index (leading axis = mesh shard)."""

    ivt: jnp.ndarray        # (K, D/K, N)  inv_var_T sharded along D
    movt: jnp.ndarray       # (K, D/K, N)
    const: jnp.ndarray      # (N,) replicated (per-node scalar term)
    paths: jnp.ndarray      # (K, S/K, P)  path rows sharded along S
    path_weights: jnp.ndarray  # (K, S/K, P)
    sid: jnp.ndarray        # (K, S/K) local row -> global sentence id, -1 pad
    leaf: jnp.ndarray       # (K, S/K) local row -> leaf compact node idx
    emb: jnp.ndarray        # (K, S/K, Dp) stored embeddings sharded along S
    #                         (zeros-sized (K, S/K, 0) when not provided)

    @property
    def n_shards(self) -> int:
        return self.ivt.shape[0]


def shard_index(index: PredictionIndex, n_shards: int,
                embeddings=None) -> TPIndex:
    """Split a built PredictionIndex into ``n_shards`` TP shards (host-side
    reshapes; arrays are placed onto the mesh by ``tp_query_topk``).

    ``embeddings``: optional (S, D) stored corpus vectors — enables the
    EXACT cross-shard re-rank (candidates re-keyed by true L2 to the
    stored row, globally calibrated, so the merged ordering equals the
    single-device exact re-rank; the leaf-lp fallback key ties same-leaf
    near-duplicates)."""
    ivt = np.asarray(index.inv_var_T)
    movt = np.asarray(index.mu_over_var_T)
    D, N = ivt.shape
    Dp = -(-D // n_shards) * n_shards
    if Dp != D:
        # zero-padding the contraction dim adds exact zeros to the psum
        pad = ((0, Dp - D), (0, 0))
        ivt = np.pad(ivt, pad)   # inv_var pad 0 contributes 0 to q^2 . ivt
        movt = np.pad(movt, pad)
    ivt = ivt.reshape(n_shards, Dp // n_shards, N)
    movt = movt.reshape(n_shards, Dp // n_shards, N)

    paths = np.asarray(index.paths)
    pw = np.asarray(index.path_weights)
    S, Pd = paths.shape
    Sp = -(-S // n_shards) * n_shards
    sid = np.arange(S, dtype=np.int32)
    plen = (paths >= 0).sum(1)
    leaf = paths[np.arange(S), np.maximum(plen - 1, 0)].astype(np.int32)
    if Sp != S:
        paths = np.pad(paths, ((0, Sp - S), (0, 0)), constant_values=-1)
        pw = np.pad(pw, ((0, Sp - S), (0, 0)))
        sid = np.pad(sid, (0, Sp - S), constant_values=-1)
        leaf = np.pad(leaf, (0, Sp - S))
    if embeddings is not None:
        emb = np.asarray(embeddings, np.float32)
        if emb.shape[1] != Dp:   # match the query's D padding
            emb = np.pad(emb, ((0, 0), (0, Dp - emb.shape[1])))
        if Sp != S:
            emb = np.pad(emb, ((0, Sp - S), (0, 0)))
        emb = emb.reshape(n_shards, Sp // n_shards, Dp)
    else:
        emb = np.zeros((n_shards, Sp // n_shards, 0), np.float32)
    return TPIndex(
        ivt=jnp.asarray(ivt), movt=jnp.asarray(movt),
        const=jnp.asarray(index.const),
        paths=jnp.asarray(paths.reshape(n_shards, Sp // n_shards, Pd)),
        path_weights=jnp.asarray(pw.reshape(n_shards, Sp // n_shards, Pd)),
        sid=jnp.asarray(sid.reshape(n_shards, Sp // n_shards)),
        leaf=jnp.asarray(leaf.reshape(n_shards, Sp // n_shards)),
        emb=jnp.asarray(emb),
    )


def place(tpidx: TPIndex, mesh: Mesh, axis: str = "shard") -> TPIndex:
    """Put each shard's arrays on its mesh device (leading axis sharded)."""
    def spec(a):
        if a is tpidx.const:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
    return TPIndex(*[
        jax.device_put(a, spec(a)) for a in tpidx
    ])


@functools.lru_cache(maxsize=None)
def _tp_query(mesh: Mesh, axis: str, k: int, rerank: int):
    """shard_map'd TP query: partial GEMM over the local D-slice, psum,
    local path-sum + top-k over the local S rows, all_gather merge.

    ``rerank`` > 0 re-ranks each shard's candidates by leaf log-prob
    before the merge (core/index._leaf_lp_rerank semantics) so the merge
    key is calibrated across shards.
    """

    def per_shard(tpidx: TPIndex, q):
        hi = jax.lax.Precision.HIGHEST
        ivt = tpidx.ivt[0]          # (D/K, N) — local slab
        movt = tpidx.movt[0]
        dsl = ivt.shape[0]
        i = jax.lax.axis_index(axis)
        q_local = jax.lax.dynamic_slice_in_dim(q, i * dsl, dsl, 1)  # (B, D/K)
        partial = (
            jnp.matmul(q_local, movt, precision=hi)
            - 0.5 * jnp.matmul(jnp.square(q_local), ivt, precision=hi)
        )                                                   # (B, N) partial
        nlp = jax.lax.psum(partial, axis) + tpidx.const[None, :]

        paths = tpidx.paths[0]                              # (S/K, P)
        pw = tpidx.path_weights[0]
        sid = tpidx.sid[0]
        safe = jnp.maximum(paths, 0)
        scores = jnp.zeros((q.shape[0], paths.shape[0]), jnp.float32)
        for p in range(paths.shape[1]):
            scores = scores + nlp[:, safe[:, p]] * pw[:, p][None, :]
        scores = jnp.where(sid[None, :] >= 0, scores, -jnp.inf)
        kk = min(max(k, rerank), scores.shape[1])
        top, rows = jax.lax.top_k(scores, kk)               # (B, kk)
        gids = sid[rows]
        if rerank and tpidx.emb.shape[-1] > 0:
            # EXACT re-rank key: -||q - x||^2 on the stored rows —
            # globally calibrated, so the all_gather merge ordering
            # equals the single-device exact re-rank
            x = tpidx.emb[0][rows]                          # (B, kk, Dp)
            d2 = jnp.sum(jnp.square(q[:, None, :] - x), -1)
            top = jnp.where(jnp.isfinite(top), -d2, -jnp.inf)
        elif rerank:
            leaves = tpidx.leaf[0][rows]                    # (B, kk)
            lp = jnp.take_along_axis(nlp, leaves, axis=1)
            top = jnp.where(jnp.isfinite(top), lp, -jnp.inf)
        all_top = jax.lax.all_gather(top, axis)             # (K, B, kk)
        all_gids = jax.lax.all_gather(gids, axis)
        K, B, kk2 = all_top.shape
        merged = jnp.transpose(all_top, (1, 0, 2)).reshape(B, K * kk2)
        mids = jnp.transpose(all_gids, (1, 0, 2)).reshape(B, K * kk2)
        fin, pos = jax.lax.top_k(merged, min(k, K * kk2))
        return fin, jnp.take_along_axis(mids, pos, axis=1)

    f = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(TPIndex(ivt=P(axis), movt=P(axis), const=P(),
                          paths=P(axis), path_weights=P(axis), sid=P(axis),
                          leaf=P(axis), emb=P(axis)), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f)


# ---------------------------------------------------------------------------
# fused-form TP: the (2D, S) coefficient matrix sharded along S
# ---------------------------------------------------------------------------

class TPFusedIndex(NamedTuple):
    """Fused index (core/index.FusedIndex) sharded along S (leading axis =
    mesh shard).  Each device holds a (2D, S/K) column slab plus its bias
    and sentence ids; queries replicate.

    vs the stats-sharded ``TPIndex``: no (B, N) ``psum`` — the fused
    coefficients already folded the node dimension away, so the only
    collective is the all_gather of (B, kk) per-shard candidates.  ICI
    traffic drops from O(B·N) to O(K·B·kk) per batch, and per-device HBM
    is (2D·S)/K with no replicated node statistics at all."""

    GT: jnp.ndarray    # (K, 2D, S/K) serving-dtype column slabs
    c: jnp.ndarray     # (K, S/K) f32 bias
    sid: jnp.ndarray   # (K, S/K) local column -> global sentence id, -1 pad
    emb: jnp.ndarray   # (K, S/K, D) stored embeddings ((K, S/K, 0) if none)

    @property
    def n_shards(self) -> int:
        return self.GT.shape[0]


def shard_fused_index(fidx, n_shards: int, embeddings=None) -> TPFusedIndex:
    """Split a built FusedIndex into ``n_shards`` column slabs (host-side
    reshapes; placement happens in ``TPFusedPredictionIndex``)."""
    GT = np.asarray(fidx.GT)
    c = np.asarray(fidx.c)
    valid = np.asarray(fidx.valid)
    TwoD, Sp = GT.shape
    Spp = -(-Sp // n_shards) * n_shards
    sid = np.where(valid, np.arange(Sp, dtype=np.int32), -1)
    if Spp != Sp:
        GT = np.pad(GT, ((0, 0), (0, Spp - Sp)))
        c = np.pad(c, (0, Spp - Sp))
        sid = np.pad(sid, (0, Spp - Sp), constant_values=-1)
    GT = GT.reshape(TwoD, n_shards, Spp // n_shards).transpose(1, 0, 2)
    if embeddings is not None:
        emb = np.asarray(embeddings, np.float32)
        S, D = emb.shape
        emb = np.pad(emb, ((0, Spp - S), (0, 0)))
        emb = emb.reshape(n_shards, Spp // n_shards, D)
    else:
        emb = np.zeros((n_shards, Spp // n_shards, 0), np.float32)
    return TPFusedIndex(
        GT=jnp.asarray(np.ascontiguousarray(GT)),
        c=jnp.asarray(c.reshape(n_shards, Spp // n_shards)),
        sid=jnp.asarray(sid.reshape(n_shards, Spp // n_shards)),
        emb=jnp.asarray(emb),
    )


@functools.lru_cache(maxsize=None)
def _tp_fused_query(mesh: Mesh, axis: str, k: int, rerank: int,
                    approx: bool, lo_prec: bool):
    """shard_map'd fused query: local [q, q^2] @ slab GEMM + bias, local
    (approx-)top-kk over the slab columns, optional exact re-rank on the
    local stored rows, then ONE all_gather merge of (B, kk) candidates."""

    def per_shard(tpidx: TPFusedIndex, q):
        GT = tpidx.GT[0]                        # (2D, S/K) local slab
        c = tpidx.c[0]
        sid = tpidx.sid[0]
        prec = (jax.lax.Precision.DEFAULT if lo_prec
                else jax.lax.Precision.HIGHEST)
        qq = jnp.concatenate([q, jnp.square(q)], axis=1).astype(GT.dtype)
        s = jnp.matmul(qq, GT, precision=prec,
                       preferred_element_type=jnp.float32) + c[None, :]
        s = jnp.where(sid[None, :] >= 0, s, -jnp.inf)
        kk = min(max(k, rerank), s.shape[1])
        if approx and kk < s.shape[1]:
            top, rows = jax.lax.approx_max_k(s, kk, recall_target=0.95)
        else:
            top, rows = jax.lax.top_k(s, kk)
        gids = sid[rows]
        if rerank and tpidx.emb.shape[-1] > 0:
            # exact, globally calibrated merge key: -||q - x||^2
            x = tpidx.emb[0][rows]              # (B, kk, D)
            d2 = jnp.sum(jnp.square(q[:, None, :] - x), -1)
            top = jnp.where(jnp.isfinite(top), -d2, -jnp.inf)
        all_top = jax.lax.all_gather(top, axis)     # (K, B, kk)
        all_gids = jax.lax.all_gather(gids, axis)
        K, B, kk2 = all_top.shape
        merged = jnp.transpose(all_top, (1, 0, 2)).reshape(B, K * kk2)
        mids = jnp.transpose(all_gids, (1, 0, 2)).reshape(B, K * kk2)
        fin, pos = jax.lax.top_k(merged, min(k, K * kk2))
        return fin, jnp.take_along_axis(mids, pos, axis=1)

    f = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(TPFusedIndex(GT=P(axis), c=P(axis), sid=P(axis),
                               emb=P(axis)), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f)


class TPFusedPredictionIndex:
    """Fused index sharded along S over a mesh (query facade).

    The serving-scale TP engine: per-device memory (2D·S)/K, zero
    replicated node state, one small all_gather per batch.  ``rerank``
    with stored ``embeddings`` reproduces the single-device
    fused-pool + exact re-rank ordering exactly (the re-rank key is
    global L2, computed shard-locally on the owning shard's rows)."""

    def __init__(self, fidx, mesh: Mesh, axis: str = "shard",
                 embeddings=None):
        self.mesh = mesh
        self.axis = axis
        self.n_shards = int(mesh.devices.size)
        t = shard_fused_index(fidx, self.n_shards, embeddings)

        def put(a):
            sp = NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
            return jax.device_put(a, sp)

        self.tpidx = TPFusedIndex(*[put(a) for a in t])
        self.lo_prec = t.GT.dtype != jnp.float32

    def query_topk(self, queries, k: int, rerank: int = 0,
                   approx: bool = False):
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        fn = _tp_fused_query(self.mesh, self.axis, k, rerank,
                             approx, self.lo_prec)
        scores, gids = fn(self.tpidx, q)
        return np.asarray(scores), np.asarray(gids)


class TPPredictionIndex:
    """One tree's prediction index sharded over a mesh (query facade)."""

    def __init__(self, index: PredictionIndex, mesh: Mesh,
                 axis: str = "shard", embeddings=None):
        """``embeddings``: optional (S, D) stored corpus vectors — enables
        the exact cross-shard re-rank (see ``shard_index``)."""
        self.mesh = mesh
        self.axis = axis
        self.n_shards = int(mesh.devices.size)
        self.tpidx = place(shard_index(index, self.n_shards, embeddings),
                           mesh, axis)

    def query_topk(self, queries, k: int, rerank: int = 0):
        q = np.atleast_2d(np.asarray(queries, np.float32))
        # Stats were zero-padded along D to Dp = K * (D/K slab); the query
        # must be padded to match or the clamped dynamic_slice for the last
        # shards re-reads earlier columns and double-counts them (the padded
        # q columns hit the zero-padded stat rows, contributing exactly 0).
        Dp = self.n_shards * int(self.tpidx.ivt.shape[1])
        if q.shape[1] != Dp:
            q = np.pad(q, ((0, 0), (0, Dp - q.shape[1])))
        q = jnp.asarray(q)
        fn = _tp_query(self.mesh, self.axis, k, rerank)
        scores, gids = fn(self.tpidx, q)
        return np.asarray(scores), np.asarray(gids)
