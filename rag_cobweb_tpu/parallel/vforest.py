"""Single-device vmapped forest: K Cobweb subtrees inserted in parallel.

The Cobweb descent is inherently sequential per tree (every decision depends
on the stats the previous instance updated), so single-tree insert
throughput is latency-bound.  This module multiplies throughput ~K-fold on
ONE chip by maintaining K independent subtrees (stacked TreeState, leading
axis K) and inserting one instance per subtree per step via ``jax.vmap``
over the delta-form descent (core/tree.py Delta): under vmap the branchy
step becomes selects over tiny delta descriptors, not whole-state copies.

Queries reuse the forest merge (parallel/forest.py): per-lane Cobweb path
ranking, cross-lane candidates merged by leaf log-probability — all in one
device computation (no collectives needed on a single chip).

Recall parity with the single tree is validated in tests/test_vforest.py;
the forest-of-subtrees is also exactly the per-device layout the mesh
forest shards, so a VForest lane count composes with mesh sharding.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.core import tree as tree_mod
from rag_cobweb_tpu.ops.gaussian import batched_node_log_probs
from rag_cobweb_tpu.parallel.forest import StackedIndex, build_stacked_index


_MAX_STEPS = 16  # scan trip count; descents needing more retry exactly


@jax.jit
def _struct_changed(children, parent, snap_children, snap_parent):
    """(K, cap) mask of nodes whose structure rows differ from the last
    host-mirror sync snapshot."""
    return (jnp.any(children != snap_children, axis=-1)
            | (parent != snap_parent))


@jax.jit
def _gather_struct_rows(children, parent, lanes, nodes):
    """Gather the (bucket-padded) changed structure rows on device —
    one small d2h instead of the full (K, cap, F) tables."""
    return children[lanes, nodes], parent[lanes, nodes]


def _vinsert_round(st, xs_r, keys_r, cfg: TreeConfig,
                   mask: Optional[jnp.ndarray] = None,
                   max_steps: int = _MAX_STEPS):
    """One vmapped round: every lane runs the scan-structured read-only
    descent against the frozen stacked state (core/tree.py
    ``_descend_collect_scan`` — no per-lane scatters), then ALL lanes'
    deltas replay in one batched last-writer-wins scatter pass
    (``_apply_dbuf_batched``).  Lanes whose descent did not finish within
    the scan budget (leaf == -1) are suppressed entirely — the caller
    retries them in deeper-budget waves."""
    dbufs, steps, leaves = jax.vmap(
        lambda s, x, k: tree_mod._descend_collect_scan(
            s, x, k, cfg, max_steps=max_steps)
    )(st, xs_r, keys_r)
    ok = leaves >= 0
    if mask is not None:
        ok = ok & mask
    steps = jnp.where(ok, steps, 0)   # suppressed lanes replay nothing
    st = jax.vmap(tree_mod._apply_dbuf_batched)(st, dbufs, steps)
    st = jax.vmap(tree_mod._alloc_bookkeeping)(st, dbufs, steps)
    return st, jnp.where(ok, leaves, -1)


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
def vinsert_rounds(st, xs: jnp.ndarray, keys: jax.Array, cfg: TreeConfig,
                   n_rounds=None, max_steps: int = _MAX_STEPS):
    """Insert xs[:, r] into subtree lane k for round r < n_rounds.

    st: stacked TreeState (leading axis K); xs: (K, R, D); keys: (K, R, 2).
    ``n_rounds`` may be a traced scalar so callers can pad R to a bucketed
    shape and reuse one compiled program across ragged adds.
    Returns (state, leaf idx (K, R), -1 where a descent must be retried).
    """
    K, R, D = xs.shape
    if n_rounds is None:
        n_rounds = R

    def body(r, carry):
        st, leaves = carry
        st, leaf = _vinsert_round(st, xs[:, r], keys[:, r], cfg,
                                  max_steps=max_steps)
        return st, leaves.at[:, r].set(leaf)

    leaves0 = jnp.full((K, R), -1, jnp.int32)
    return jax.lax.fori_loop(0, jnp.minimum(n_rounds, R), body,
                             (st, leaves0))


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"),
                   donate_argnums=(0,))
def vinsert_rounds_masked(st, xs: jnp.ndarray, keys: jax.Array,
                          mask: jnp.ndarray, cfg: TreeConfig,
                          n_rounds=None, max_steps: int = _MAX_STEPS):
    """Per-round-masked variant of ``vinsert_rounds`` (mask: (K, R) bool).
    One jit call runs ALL rounds for a packed (possibly ragged) stream set
    — at scale 15-25%% of descents exceed the primary scan budget, and
    dispatching a masked round per wave from the host paid a ~60 ms relay
    round-trip each.  ``n_rounds`` may be a traced scalar so callers can
    pad R to a bucketed shape without paying for the empty rounds.

    The input state is DONATED: every production caller immediately
    rebinds ``self.state`` to the result, and without donation the
    program's output state is a second full (K, cap, D) replica — at
    K=512 the 2M-corpus state is ~4.5 GB and the 2-replica peak is what
    capped single-chip corpora at ~2M sentences.  Callers must treat
    the passed-in state as consumed (on CPU donation is a no-op and the
    input stays valid — tests still run there)."""
    K, R, D = xs.shape
    if n_rounds is None:
        n_rounds = R

    def body(r, carry):
        st, leaves = carry
        st, leaf = _vinsert_round(st, xs[:, r], keys[:, r], cfg,
                                  mask=mask[:, r], max_steps=max_steps)
        return st, leaves.at[:, r].set(leaf)

    leaves0 = jnp.full((K, R), -1, jnp.int32)
    return jax.lax.fori_loop(0, jnp.minimum(n_rounds, R), body,
                             (st, leaves0))


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
def vinsert_masked_round(st, xs: jnp.ndarray, keys: jax.Array,
                         mask: jnp.ndarray, cfg: TreeConfig,
                         max_steps: int = _MAX_STEPS):
    """One round where only ``mask``ed lanes insert (the ragged remainder,
    and — with ``max_steps=_DEEP_STEPS`` — the batched retry waves for
    descents the normal scan budget truncated)."""
    return _vinsert_round(st, xs, keys, cfg, mask=mask, max_steps=max_steps)


_DEEP_STEPS = 48  # retry-wave scan budget (covers ~all mature descents)
# Single bucketed retry-wave width: every deep-retry call shares ONE
# (K, _RETRY_W, D) program shape regardless of how many descents the
# primary budget truncated (chunked into multiple waves when a lane has
# more pendings).  The old power-of-2 ladder (4/8/16/32) compiled four
# distinct programs through the remote compile service — most of the
# round-3 warmup tail (BENCH_r03: four retry waves, ~30 s on top of the
# primary program).  n_rounds is dynamic, so a wide-but-short wave costs
# only the (negligible) padded h2d, not extra device rounds.
_RETRY_W = 32
# Exact-path scan cap.  MUST comfortably exceed any reachable descent
# depth: content routing concentrates whole near-duplicate groups into
# one lane, whose fringe chains produce descents FAR past _DEEP_STEPS
# (measured: 100k hard corpus -> hundreds of >48-step descents; with the
# old 48-step exact path those inserts silently returned leaf=-1 and the
# sentences became unretrievable — the flat-index build then failed with
# "sentences map to dead tree nodes").
_EXACT_STEPS = 256


@jax.jit
def _centroid_scores(q: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """(B, D) queries x (K, D) lane centroids -> (B, K) proximity scores
    (negative half squared L2, up to the per-query constant): the router's
    nearest-centroid rule and the beam's lane-selection rule share this."""
    return (jnp.matmul(q, c.T, precision=jax.lax.Precision.HIGHEST)
            - 0.5 * jnp.sum(jnp.square(c), axis=1)[None, :])


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"),
                   donate_argnums=(0,))
def _insert_one_lane(st, lane, x, key, cfg: TreeConfig,
                     max_steps: int = _EXACT_STEPS):
    """Exact-path insert of one instance into one lane of the stacked
    state (fallback for descents deeper than the scan budget).  The
    state is donated (same rationale as ``vinsert_rounds_masked``: the
    caller rebinds ``self.state``, and the pathological-retry path must
    not hold a second full state replica at 2M+ scale)."""
    lane_st = jax.tree.map(lambda a: a[lane], st)
    lane_st, leaf = tree_mod._insert_one(lane_st, x, key, cfg,
                                         max_steps=max_steps)
    st = jax.tree.map(lambda a, v: a.at[lane].set(v), st, lane_st)
    return st, leaf


@functools.partial(jax.jit, static_argnames=("k", "beam_width", "max_depth"))
def _vforest_beam(idx: StackedIndex, q: jnp.ndarray, k: int,
                  beam_width: int, max_depth: int):
    """Per-lane batched beam search (core/index.beam_search_topk vmapped
    over the lane axis).  Returns (scores, leaf nodes) of shape (K, B, Wk);
    scores are leaf log-probs — calibrated identically across lanes, so the
    host merge can interleave lanes by score."""

    def per_lane(inv, mov, const, paths, pw, children, lstart, lcount,
                 sorder):
        pidx = index_mod.PredictionIndex(
            inv_var_T=inv, mu_over_var_T=mov, const=const, paths=paths,
            path_weights=pw, children=children, leaf_sentence_start=lstart,
            leaf_sentence_count=lcount, sentence_order=sorder,
        )
        return index_mod.beam_search_topk(
            pidx, q, k, beam_width=beam_width, max_depth=max_depth
        )

    return jax.vmap(per_lane)(
        idx.inv_var_T, idx.mu_over_var_T, idx.const, idx.paths,
        idx.path_weights, idx.children, idx.leaf_sentence_start,
        idx.leaf_sentence_count, idx.sentence_order,
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _beam_expand_device(scores, leaves, lane_of, starts, counts, sorder,
                        gsid, k: int):
    """Device-side ranked leaf-run expansion: flatten all lanes'
    candidates, sort by score, and fill the (B, k) output by locating
    each output slot's source candidate with a row-wise searchsorted over
    the cumulative run lengths — the host Python double loop over
    B x (K*Wk) candidates this replaces was the production forest-beam
    merge cost (VERDICT r2 weak #6).

    scores/leaves: (K, B, Wk) from ``_vforest_beam``; returns (B, k)
    global sentence ids, -1 padded."""
    K, B, Wk = scores.shape
    flat_s = jnp.transpose(scores, (1, 0, 2)).reshape(B, K * Wk)
    flat_l = jnp.transpose(leaves, (1, 0, 2)).reshape(B, K * Wk)
    order = jnp.argsort(-flat_s, axis=1, stable=True)
    s_sorted = jnp.take_along_axis(flat_s, order, 1)
    l_sorted = jnp.take_along_axis(flat_l, order, 1)
    lanes = lane_of[order]                                # (B, C)
    ok = (l_sorted >= 0) & jnp.isfinite(s_sorted) & (s_sorted > -3e38 / 2)
    safe_leaf = jnp.maximum(l_sorted, 0)
    s0 = starts[lanes, safe_leaf]
    c = jnp.where(ok & (s0 >= 0), counts[lanes, safe_leaf], 0)
    cum = jnp.cumsum(c, axis=1)                           # inclusive
    off = cum - c                                         # exclusive
    t = jnp.arange(k, dtype=jnp.int32)
    j = jax.vmap(
        lambda row: jnp.searchsorted(row, t, side="right")
    )(cum).astype(jnp.int32)                              # (B, k)
    C = c.shape[1]
    valid = j < C
    jc = jnp.minimum(j, C - 1)
    within = t[None, :] - jnp.take_along_axis(off, jc, 1)
    pos = jnp.take_along_axis(s0, jc, 1) + within
    lane_sel = jnp.take_along_axis(lanes, jc, 1)
    sid_local = sorder[lane_sel, jnp.maximum(pos, 0)]
    out = gsid[lane_sel, sid_local]
    valid = valid & (jnp.take_along_axis(c, jc, 1) > 0)
    return jnp.where(valid, out, -1)


def vforest_beam_topk(idx: StackedIndex, q: jnp.ndarray, k: int,
                      beam_width: int = 32, max_depth: int = 16
                      ) -> np.ndarray:
    """Cross-lane beam retrieval: per-lane beams, merged by leaf log-prob,
    leaf sentence runs expanded to the first k GLOBAL sentence ids per
    query — beams, merge, and expansion all in one device computation.
    Returns (B, k) ids, -1 padded."""
    scores, leaves = _vforest_beam(idx, q, k, beam_width, max_depth)
    K = scores.shape[0]
    Wk = scores.shape[2]
    lane_of = jnp.repeat(jnp.arange(K, dtype=jnp.int32), Wk)
    out = _beam_expand_device(
        scores, leaves, lane_of, idx.leaf_sentence_start,
        idx.leaf_sentence_count, idx.sentence_order, idx.global_sid, k)
    return np.asarray(out)


@functools.partial(jax.jit, static_argnames=("n_global",))
def vforest_rank_scores(idx: StackedIndex, q: jnp.ndarray, n_global: int
                        ) -> jnp.ndarray:
    """Differentiable per-GLOBAL-sentence path scores over all lanes:
    (B, D) -> (B, n_global).  The forest-mode equivalent of
    core/index.rank_scores — per-lane scoring scattered to global sentence
    ids (each global id lives in exactly one lane)."""

    def per_lane(inv, mov, const, paths, pw, valid):
        nlp = batched_node_log_probs(q, inv, mov, const)
        scores = index_mod.path_scores_from_nlp(paths, pw, nlp)
        return jnp.where(valid[None, :], scores, -jnp.inf)

    lane_scores = jax.vmap(per_lane)(
        idx.inv_var_T, idx.mu_over_var_T, idx.const, idx.paths,
        idx.path_weights, idx.sentence_valid,
    )                                                   # (K, B, S)
    B = q.shape[0]
    flat = jnp.transpose(lane_scores, (1, 0, 2)).reshape(B, -1)
    gsid = idx.global_sid.reshape(-1)
    safe = jnp.where(gsid >= 0, gsid, n_global)
    out = jnp.full((B, n_global), -jnp.inf, flat.dtype)
    return out.at[:, safe].set(flat, mode="drop")


@functools.partial(jax.jit, static_argnames=("k",))
def _vforest_query(idx: StackedIndex, q: jnp.ndarray, k: int):
    """Per-lane path-ranked top-k, merged across lanes by leaf log-prob
    (same calibration as the mesh forest, parallel/forest.py)."""

    def per_lane(inv, mov, const, paths, pw, valid, leaf_node, gsid):
        nlp = batched_node_log_probs(q, inv, mov, const)       # (B, N)
        scores = index_mod.path_scores_from_nlp(paths, pw, nlp)
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        kk = min(k, scores.shape[1])
        _, rows = jax.lax.top_k(scores, kk)                    # (B, kk)
        gids = gsid[rows]
        leaf_lp = jnp.take_along_axis(
            nlp, leaf_node[rows].reshape(q.shape[0], kk), axis=1
        )
        return jnp.where(gids >= 0, leaf_lp, -jnp.inf), gids

    lp, gids = jax.vmap(per_lane)(
        idx.inv_var_T, idx.mu_over_var_T, idx.const, idx.paths,
        idx.path_weights, idx.sentence_valid, idx.leaf_node, idx.global_sid,
    )                                                           # (K, B, kk)
    K, B, kk = lp.shape
    merged = jnp.transpose(lp, (1, 0, 2)).reshape(B, K * kk)
    merged_ids = jnp.transpose(gids, (1, 0, 2)).reshape(B, K * kk)
    top, pos = jax.lax.top_k(merged, min(k, K * kk))
    return top, jnp.take_along_axis(merged_ids, pos, axis=1)


class VForest:
    """K-subtree forest on one device (same API surface as CobwebForest)."""

    def __init__(self, cfg: TreeConfig, n_subtrees: int = 16,
                 capacity_per_tree: int = 4096, seed: int = 0,
                 routing: str = "round_robin", device=None):
        """``routing``:

        * ``"round_robin"`` (default, the reference-parity layout): lane =
          global id % K — every lane is a uniform random subsample, so
          cross-lane query merges must visit EVERY lane (internal-node
          scores cannot arbitrate between statistically identical lanes).
        * ``"content"``: lane = nearest lane centroid (power-of-two-choices
          balanced).  Lanes specialize to regions of embedding space, so
          beam queries descend only the L nearest lanes
          (``beam_topk(lanes_per_query=L)``) — the per-level gather bill
          drops K/L x.  Centroids initialize by a short k-means on the
          first batch and track their lane's running mean thereafter.
          This is the content-sharded layout a multi-chip mesh forest
          routes by as well (queries fan out to few shards, not all).
        """
        if routing not in ("round_robin", "content"):
            raise ValueError(f"unknown routing {routing!r}")
        # ``device``: pin the forest STATE and all insert programs to a
        # specific jax device — the cold-start escape hatch: the TPU
        # remote-compile of the descent program costs minutes cold, while
        # the CPU backend compiles it in seconds, so a build can run on
        # jax.devices("cpu")[0] and then ``to_device()`` onto the chip for
        # serving (all serving indexes are built from the state arrays, so
        # they land on the chip either way after promotion).  None =
        # default backend (the chip).
        self._device = device
        if routing == "content" and cfg.absorb_depth == 0:
            # Content routing concentrates whole near-duplicate groups in
            # one lane, whose fringe chains reach depth 96+ on the hard
            # corpus (RESULTS.md): beam cost explodes and descents blow
            # every scan budget.  Depth-bounded leaf absorb (chain
            # compaction, TreeConfig.absorb_depth) bounds the damage;
            # pass an explicit absorb_depth to override the default.
            import dataclasses as _dc
            cfg = _dc.replace(cfg, absorb_depth=24)
        self.cfg = cfg
        self.K = n_subtrees
        self.routing = routing
        self._centroids: Optional[np.ndarray] = None   # (K, D) host f32
        self._centroids_dev = None                     # device copy cache
        self._route_count = np.zeros(n_subtrees, np.int64)
        self._lane_total = np.zeros(n_subtrees, np.int64)
        self._route_rng = np.random.default_rng(seed ^ 0x5EED)
        # Allocate the stacked (K, cap, ...) state DIRECTLY: stacking K
        # per-tree init_state copies held a 2x transient on device (both
        # the K separates and the stacked replica alive at once), which
        # OOM'd the ctor at K=512 x 4M sentences (~8.5 GB state).  Every
        # lane's init is the same constant fill (tree.init_state), so the
        # one-shot form is exact.
        cap = tree_mod.align_capacity(capacity_per_tree)
        K, D, F = n_subtrees, cfg.dim, cfg.max_fanout
        NULL = tree_mod.NULL
        with self._dev_ctx():
            self.state = tree_mod.TreeState(
                counts=jnp.zeros((K, cap), jnp.float32),
                means=jnp.zeros((K, cap, D), jnp.float32),
                m2s=jnp.zeros((K, cap, D), jnp.float32),
                parent=jnp.full((K, cap), NULL, jnp.int32),
                children=jnp.full((K, cap, F), NULL, jnp.int32),
                n_children=jnp.zeros((K, cap), jnp.int32),
                root=jnp.zeros((K,), jnp.int32),
                n_alloc=jnp.ones((K,), jnp.int32),
                free_stack=jnp.full((K, cap), NULL, jnp.int32),
                free_top=jnp.zeros((K,), jnp.int32),
            )
            self._key = jax.random.PRNGKey(seed)
        self.n_sentences = 0
        self.shard_of: list[int] = []
        self.local_sid: list[int] = []
        self._leaf_of_local: list[list[int]] = [
            [] for _ in range(n_subtrees)
        ]
        self._stacked_index: Optional[StackedIndex] = None
        self._flat_index = None
        self._beam_idx = None    # packed BeamIndex over _flat_index
        self._beam_src = None    # the flat index _beam_idx was built from
        # incrementally-synced HOST mirror of the structure arrays
        # (children/parent/root): flatten needs them on host for the BFS
        # numbering, and a full device_get is ~16 s at 1M through the
        # relay; instead a device diff against the last-sync snapshot
        # fetches only the touched rows (inserts touch O(path) nodes)
        self._struct_snap = None     # (children, parent) device copies
        self._struct_host = None     # (children, parent, root) numpy
        # adaptive primary scan budget: starts at _MAX_STEPS, escalates
        # (16 -> 24 -> 32 -> 48) when the EMA of the deep-descent fraction
        # exceeds 8% — a deeper scan costs ~linearly more per round but
        # beats paying a retry pass for a fifth of the instances
        self._budget = _MAX_STEPS
        self._deep_frac = 0.0
        # host-side upper bound on any lane's allocated-node count (root
        # = 1; each insert allocates at most 2 fresh nodes) — lets
        # _ensure_capacity avoid a per-add device fetch
        self._alloc_hi = 1

    def _dev_ctx(self):
        """Context manager placing array CREATION ops on the pinned build
        device (no-op when unpinned; jitted programs follow their operands
        either way)."""
        import contextlib
        return (jax.default_device(self._device)
                if self._device is not None else contextlib.nullcontext())

    def to_device(self, device=None):
        """Migrate the forest state to ``device`` (None = the default
        backend, i.e. the chip) — the promotion step after a CPU-pinned
        cold-start build.  Serving-index builds read ``self.state``, so
        everything downstream lands on the target device."""
        target = device if device is not None else jax.devices()[0]
        self.state = jax.device_put(self.state, target)
        self._key = jax.device_put(self._key, target)
        self._device = device
        # cross-device caches/snapshots are stale after migration
        self._struct_snap = None
        self._centroids_dev = None

    def compress_stats(self, dtype=None):
        """AT-REST stats compression: cast means/m2s to bf16 in place
        (donated — no second full-state replica at 8M scale).  means+m2s
        are ~92% of the state bytes (6.3 GB of 6.8 GB f32 at 4M), so this
        roughly halves the resident state — the HBM headroom that lets the
        8M fused-index build (GT ~6 GB) coexist with the state on one v5e.

        Compression is AFTER-build by design: bf16 STORAGE during Welford
        accumulation silently freezes node statistics once per-insert
        increments fall under the bf16 rounding threshold (count >~512 —
        measured in tests/test_compress.py::test_bf16_welford_accumulation
        _breaks), whereas one rounding of the final statistics shifts
        scores by ~2^-9 relative.  Further ``add`` calls still WORK on a
        compressed state (the descent math upcasts and re-rounds on write,
        and new insert programs compile for the bf16 state shape) but pay
        that accumulation bias — compress at a build/serve boundary.
        Downstream index builds (fused / flatten / blocked) read the
        compressed stats and upcast in-kernel."""
        import ml_dtypes  # noqa: F401  (bf16 numpy views downstream)

        dtype = jnp.bfloat16 if dtype is None else jnp.dtype(dtype)
        st = self.state
        if st.means.dtype == dtype:
            return

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _cast(a):
            return a.astype(dtype)

        self.state = st._replace(means=_cast(st.means),
                                 m2s=_cast(st.m2s))
        self._centroids_dev = None

    def offload_state(self):
        """Move the whole forest state to HOST memory and drop the device
        replica — the serve-only step after the serving index is built
        (fused-only serving reads GT/c/valid + the embedding stores, never
        the state).  At 8M the f32 state is ~13 GB of the 16 GB chip; the
        index build + serving working set needs that space.  Further adds/
        index rebuilds re-upload lazily via jnp.asarray (numpy state
        arrays are valid jax inputs), so this is transparent to
        correctness — it trades a re-upload for HBM headroom."""
        self.state = jax.tree.map(
            lambda a: np.asarray(jax.device_get(a)), self.state)
        self._struct_snap = None
        self._centroids_dev = None

    def warmup_insert_programs(self, n_total: int,
                               budgets: tuple = ()) -> float:
        """Pre-compile the insert programs an ``add(n_total)`` will hit,
        against a THROWAWAY state with identical shapes — so a timed build
        measures insert throughput, not the remote compile service (the
        round-2 headline recorded 283 s of cold compile inside
        ``build_total_s``).  Executes at most one real round per program
        (n_rounds=1 on zero vectors into the throwaway state).

        ``n_total``: the number of vectors the caller will add in one
        batch.  ``budgets``: extra primary scan budgets to warm beyond the
        current adaptive one.  Returns the wall seconds spent."""
        import time as _time

        import sys as _sys
        import time as _t2

        t0 = _time.perf_counter()

        def _log(what):
            print(f"[warmup] {what} ({_time.perf_counter()-t0:.0f}s)",
                  file=_sys.stderr, flush=True)

        K = self.K
        D = self.cfg.dim
        R_full = -(-n_total // K)   # ceil: add() buckets by the MAX lane
        Rb = max(8, 1 << (R_full - 1).bit_length()) if R_full else 8
        # grow NOW so the real add sees the same (already-grown) shapes
        self._ensure_capacity(R_full + 1)
        # Warm against the REAL state: the masks are all-off (pad deltas
        # are no-ops), so the output state is semantically identical to the
        # input and we simply REBIND self.state to it each call.  The
        # program donates its input state (donate_argnums), so XLA aliases
        # input->output and warmup peaks at ~1 full state replica — a
        # throwaway copy used to hold a 3rd replica and OOM'd the chip at
        # K=512 x 2M sentences (state ~4.5 GB).  Rebinding is mandatory
        # under donation: the passed-in buffers are consumed on TPU.
        with self._dev_ctx():
            keys = jax.random.split(jax.random.PRNGKey(0), K * Rb).reshape(
                K, Rb, -1)
            zeros = jnp.zeros((K, Rb, D), jnp.float32)
            for budget in {self._budget, *budgets}:
                self.state, _ = vinsert_rounds_masked(
                    self.state, zeros, keys, jnp.zeros((K, Rb), bool),
                    self.cfg, n_rounds=jnp.asarray(1, jnp.int32),
                    max_steps=budget)
                jax.block_until_ready(self.state.counts)
                _log(f"masked rounds Rb={Rb} budget={budget}")
            # the (single) deep retry-wave program: _RETRY_W-wide, all-off
            # mask
            if Rb >= _RETRY_W:
                rz, rk = zeros[:, :_RETRY_W], keys[:, :_RETRY_W]
            else:
                rz = jnp.zeros((K, _RETRY_W, D), jnp.float32)
                rk = jax.random.split(
                    jax.random.PRNGKey(1),
                    K * _RETRY_W).reshape(K, _RETRY_W, -1)
            self.state, _ = vinsert_rounds_masked(
                self.state, rz, rk, jnp.zeros((K, _RETRY_W), bool), self.cfg,
                n_rounds=jnp.asarray(1, jnp.int32), max_steps=_DEEP_STEPS)
            jax.block_until_ready(self.state.counts)
        _log(f"retry wave W={_RETRY_W}")
        return _time.perf_counter() - t0

    def _sync_host_structure(self):
        """Refresh the host mirror of (children, parent, root) by fetching
        only rows the device diff marks changed since the last sync (full
        fetch on first use or after capacity growth).  Returns the numpy
        (children (K, cap, F), parent (K, cap), root (K,)) triple."""
        st = self.state
        if (self._struct_host is None or self._struct_snap is None
                or self._struct_snap[0].shape != st.children.shape):
            ch = np.array(jax.device_get(st.children))
            pa = np.array(jax.device_get(st.parent))
        else:
            changed = np.asarray(_struct_changed(
                st.children, st.parent, *self._struct_snap))
            ch, pa = self._struct_host[0], self._struct_host[1]
            lanes, nodes = np.nonzero(changed)
            n = lanes.size
            if n:
                # bucket the row count so the gather program is reused
                nb = max(256, 1 << (n - 1).bit_length())
                lp = np.zeros((nb,), np.int32)
                np_ = np.zeros((nb,), np.int32)
                lp[:n] = lanes
                np_[:n] = nodes
                with self._dev_ctx():
                    ch_rows, pa_rows = _gather_struct_rows(
                        st.children, st.parent, jnp.asarray(lp),
                        jnp.asarray(np_))
                ch[lanes, nodes] = np.asarray(ch_rows)[:n]
                pa[lanes, nodes] = np.asarray(pa_rows)[:n]
        root = np.array(jax.device_get(st.root))
        self._struct_host = (ch, pa, root)
        self._struct_snap = (jnp.copy(st.children), jnp.copy(st.parent))
        return self._struct_host

    def _ensure_capacity(self, rounds: int):
        """Grow every lane's node arrays when the next rounds could
        overflow (worst case 2 fresh nodes per insert per lane).

        Uses the HOST-tracked allocation upper bound ``_alloc_hi`` instead
        of fetching ``max(n_alloc)`` from the device: the per-add scalar
        fetch was a synchronous relay round trip on every batch (measured
        30 s when the relay degrades — it became the entire build cost)."""
        st = self.state
        cap = st.counts.shape[1]
        needed = self._alloc_hi + 2 * rounds + 8
        if needed <= cap:
            return
        # The pure worst-case bound (2 fresh nodes per insert) overshoots
        # the REAL allocation ~1.6x (measured ~1.25 nodes/sentence on the
        # hard set), so at scale it crosses cap long before the state is
        # actually full — and the grow below holds a 2x transient that
        # OOM'd every 4M attempt (r3 and r4: all died mid-build right
        # where cumulative 2*inserts crossed cap).  Before paying that,
        # refresh the bound from the device (one tiny scalar fetch, only
        # on this rare path) and re-check.
        self._alloc_hi = int(jax.device_get(jnp.max(st.n_alloc)))
        needed = self._alloc_hi + 2 * rounds + 8
        if needed <= cap:
            return
        new_cap = tree_mod.align_capacity(max(needed, 2 * cap))
        pad = new_cap - cap
        K, D, F = st.counts.shape[0], st.means.shape[2], st.children.shape[2]

        def grow(a, fill):
            shape = (K, pad) + a.shape[2:]
            with self._dev_ctx():
                return jnp.concatenate(
                    [a, jnp.full(shape, fill, a.dtype)], axis=1)

        self.state = st._replace(
            counts=grow(st.counts, 0.0), means=grow(st.means, 0.0),
            m2s=grow(st.m2s, 0.0), parent=grow(st.parent, -1),
            children=grow(st.children, -1),
            n_children=grow(st.n_children, 0),
            free_stack=grow(st.free_stack, -1),
        )

    # ------------------------------------------------------------------ #
    # content routing                                                    #
    # ------------------------------------------------------------------ #
    def _lane_scores(self, x: np.ndarray,
                     centroids: Optional[np.ndarray] = None) -> np.ndarray:
        """(B, K) centroid-proximity scores on device (bucketed B so ragged
        batches reuse one compiled program).  ``centroids`` overrides the
        router state (used for the root-mean fallback)."""
        x = np.asarray(x, np.float32)
        B = len(x)
        Bb = max(256, 1 << (B - 1).bit_length()) if B > 1 else 256
        xp = np.zeros((Bb, x.shape[1]), np.float32)
        xp[:B] = x
        if centroids is not None:
            c_dev = jnp.asarray(centroids)
        else:
            if self._centroids_dev is None:
                self._centroids_dev = jnp.asarray(self._centroids)
            c_dev = self._centroids_dev
        s = _centroid_scores(jnp.asarray(xp), c_dev)
        return np.asarray(s)[:B]

    def _init_centroids(self, x: np.ndarray):
        """Short k-means over the first routed batch (k-means needs no
        labels; 3 Lloyd iterations suffice for routing-grade centroids)."""
        K, rng = self.K, self._route_rng
        B = len(x)
        if B >= K:
            idx = rng.choice(B, K, replace=False)
            c = np.array(x[idx], np.float32)
        else:
            idx = rng.choice(B, K, replace=True)
            c = np.array(x[idx], np.float32)
            c += 1e-3 * rng.standard_normal(c.shape).astype(np.float32)
        self._centroids = c
        self._centroids_dev = None
        for _ in range(3):
            assign = np.argmax(self._lane_scores(x), axis=1)
            sums = np.zeros_like(c)
            cnt = np.zeros(K, np.int64)
            np.add.at(sums, assign, x)
            np.add.at(cnt, assign, 1)
            upd = cnt > 0
            c[upd] = sums[upd] / cnt[upd, None]
            self._centroids = c
            self._centroids_dev = None

    @staticmethod
    def _cumcount(g: np.ndarray, K: int) -> np.ndarray:
        """Rank of each element among earlier elements with the same value
        (vectorized groupby-cumcount)."""
        o = np.argsort(g, kind="stable")
        gs = g[o]
        starts = np.searchsorted(gs, np.arange(K))
        out = np.empty(len(g), np.int64)
        out[o] = np.arange(len(g)) - starts[gs]
        return out

    # per-lane load cap, as a multiple of the mean lane load.  2.0 keeps
    # spill DEPTH small (spills stay within each point's top few lanes)
    # at the cost of up to 2x state-array memory for a fully skewed
    # stream; 1.3 measurably pushed whole clusters into arbitrary lanes
    # and capped query-time top-L lane coverage at ~0.88 (L=8, 10k easy).
    route_cap_factor: float = 2.0

    def _route_lanes(self, x: np.ndarray) -> np.ndarray:
        """Nearest-centroid lane assignment under a per-lane load cap
        (``route_cap_factor`` x mean + margin — skewed batches would
        otherwise blow per-lane capacity and the per-round insert
        packing), fully vectorized (a per-row host loop here cost 13.7 s
        at B=10k — more than the whole device insert).  Spills are
        CONTENT-LOCAL: a row that misses its nearest lane walks its own
        centroid ranking (2nd, 3rd, ... nearest with room), so query-time
        ``select_lanes`` top-L probing still covers it — dealing spills
        into least-loaded lanes (the old pass 3) made them unreachable
        and capped forest-beam recall at the routing hit rate.
        Centroids track their lane's running mean."""
        K = self.K
        B = len(x)
        if self._centroids is None:
            self._init_centroids(x)
        s = self._lane_scores(x)
        if K == 1:
            return np.zeros(B, np.int32)
        rows = np.arange(B)
        top2 = np.argpartition(-s, 1, axis=1)[:, :2]
        swap = s[rows, top2[:, 0]] < s[rows, top2[:, 1]]
        top2[swap] = top2[swap][:, ::-1]
        load = self._lane_total.copy()
        total_after = int(load.sum()) + B
        cap = int(self.route_cap_factor * total_after / K) + 16
        room = np.maximum(cap - load, 0)

        lane_of = np.full(B, -1, np.int32)
        # pass 1: rows with the most to lose (largest 1st-vs-2nd margin)
        # claim their nearest lane first
        margin = s[rows, top2[:, 0]] - s[rows, top2[:, 1]]
        ordr = np.argsort(-margin, kind="stable")
        lane1 = top2[ordr, 0]
        take1 = self._cumcount(lane1, K) < room[lane1]
        lane_of[ordr[take1]] = lane1[take1]
        room = room - np.bincount(lane1[take1], minlength=K)
        # pass 2: spilled rows try their second-nearest lane
        rem = ordr[~take1]
        if rem.size:
            lane2 = top2[rem, 1]
            take2 = self._cumcount(lane2, K) < room[lane2]
            lane_of[rem[take2]] = lane2[take2]
            room = room - np.bincount(lane2[take2], minlength=K)
            rem = rem[~take2]
        # pass 3: remaining rows walk their own centroid ranking (3rd,
        # 4th, ... nearest lane with room) so spills stay content-local
        if rem.size:
            ranks = np.argsort(-s[rem], axis=1)          # (R, K)
            left = np.arange(rem.size)
            for r in range(2, K):
                if left.size == 0:
                    break
                lane_r = ranks[left, r]
                take = self._cumcount(lane_r, K) < room[lane_r]
                sel = left[take]
                lane_of[rem[sel]] = lane_r[take]
                room = room - np.bincount(lane_r[take], minlength=K)
                left = left[~take]
            if left.size:   # cap exhausted everywhere: least-loaded
                lane_order = np.argsort(-room)
                slots = np.repeat(lane_order,
                                  np.maximum(room, 0)[lane_order])
                if slots.size < left.size:
                    slots = np.concatenate([
                        slots, np.tile(np.argsort(load),
                                       -(-(left.size - slots.size) // K))])
                lane_of[rem[left]] = slots[:left.size]
        load += np.bincount(lane_of, minlength=K)
        self._lane_total = load
        # running-mean centroid update (exact mean of all routed rows)
        sums = np.zeros_like(self._centroids)
        cnt = np.zeros(K, np.int64)
        np.add.at(sums, lane_of, x)
        np.add.at(cnt, lane_of, 1)
        tot = self._route_count + cnt
        upd = cnt > 0
        self._centroids[upd] += (
            sums[upd] - cnt[upd, None] * self._centroids[upd]
        ) / tot[upd, None]
        self._route_count = tot
        self._centroids_dev = None
        return lane_of

    def select_lanes(self, queries: np.ndarray, n_lanes: int) -> np.ndarray:
        """Per-query top-``n_lanes`` lanes by centroid proximity (B, L).

        Forests without router state (round-robin, or loaded checkpoints
        predating routing) fall back to each lane's ROOT mean — the lane's
        exact running mean — as its centroid; for round-robin lanes these
        are statistically identical, so an explicit lane cut there trades
        recall for latency knowingly rather than crashing."""
        L = min(n_lanes, self.K)
        cent = None
        if self._centroids is None:
            cent = np.asarray(jax.device_get(
                self.state.means[jnp.arange(self.K), self.state.root]
            ), np.float32)
        s = self._lane_scores(np.atleast_2d(queries), centroids=cent)
        if L >= self.K:
            return np.broadcast_to(
                np.arange(self.K, dtype=np.int32), (len(s), self.K)).copy()
        return np.argpartition(-s, L - 1, axis=1)[:, :L].astype(np.int32)

    def add(self, embeddings: np.ndarray) -> np.ndarray:
        """Batched insert; one vmapped round inserts up to K instances
        (one per lane).  Lane assignment: round-robin (default) or
        content routing (``routing="content"``).  Phase wall-times of the
        last call land in ``self.last_add_phases`` (diagnostic)."""
        import time as _time
        _ph = self.last_add_phases = {}
        _t0 = _time.perf_counter()

        def _mark(name):
            nonlocal _t0
            jax.block_until_ready(self.state.counts)
            t = _time.perf_counter()
            _ph[name] = _ph.get(name, 0.0) + (t - _t0)
            _t0 = t

        embeddings = np.asarray(embeddings, np.float32)
        B = len(embeddings)
        K = self.K
        gids = np.arange(self.n_sentences, self.n_sentences + B)
        if self.routing == "content":
            lane_of = self._route_lanes(embeddings)
        else:
            lane_of = gids % K
        _mark("route")

        if B == 0:
            return gids

        # pack per-lane streams into the (K, Rb, D) round tensor with ONE
        # vectorized scatter (stable sort by lane -> contiguous runs);
        # round-robin lanes differ by at most 1 round, content-routed
        # lanes by the (slack-bounded) batch skew — the mask covers both
        lens = np.bincount(lane_of, minlength=K)
        R_max = int(lens.max())
        Rb = max(8, 1 << (R_max - 1).bit_length())
        self._ensure_capacity(R_max + 1)
        order = np.argsort(lane_of, kind="stable")
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        lanes_sorted = lane_of[order]
        pos = np.arange(B) - starts[lanes_sorted]   # rank within lane
        D = self.cfg.dim
        xs_t = np.zeros((K, Rb, D), np.float32)
        mask_t = np.zeros((K, Rb), bool)
        xs_t[lanes_sorted, pos] = embeddings[order]
        mask_t[lanes_sorted, pos] = True
        self._key, sub = jax.random.split(self._key)
        all_keys = jax.random.split(sub, K * Rb).reshape(K, Rb, -1)

        def retry(leaves, xs_kr, keys_kr, valid):
            """Retry descents the primary scan budget truncated: pack the
            pending instances per lane and run ALL retry rounds in ONE
            ``vinsert_rounds_masked`` call with the 48-step budget (at
            scale 15-25%% of mature-tree descents exceed 16 steps; both
            the old per-instance exact path — a whole-stacked-state copy,
            60-90 ms each — and one-masked-round-per-wave host dispatch
            were the dominant build cost).  Escalates the primary budget
            when the deep fraction stays high."""
            need = (leaves < 0) & valid
            n_deep = int(need.sum())
            self._deep_frac = 0.7 * self._deep_frac + 0.3 * (
                n_deep / max(int(valid.sum()), 1))
            if self._deep_frac > 0.08 and self._budget < _DEEP_STEPS:
                # escalate along the standard ladder; non-standard budgets
                # (checkpoints, tests) jump straight to the wave budget
                self._budget = {16: 24, 24: 32, 32: 48}.get(
                    self._budget, _DEEP_STEPS)
            if not n_deep:
                return
            keys_np = np.asarray(keys_kr)
            pend = need.sum(1)
            R2 = int(pend.max())
            D = xs_kr.shape[2]
            pend_idx = [np.nonzero(need[s])[0] for s in range(K)]
            # ONE bucketed program shape for every wave (see _RETRY_W);
            # a lane with more than _RETRY_W pendings runs extra waves
            for w0 in range(0, R2, _RETRY_W):
                xs2 = np.zeros((K, _RETRY_W, D), np.float32)
                keys2 = np.zeros((K, _RETRY_W, keys_np.shape[2]),
                                 keys_np.dtype)
                mask2 = np.zeros((K, _RETRY_W), bool)
                src = np.zeros((K, _RETRY_W), np.int64)
                wave_max = 0
                for s in range(K):
                    idx = pend_idx[s][w0:w0 + _RETRY_W]
                    if len(idx):
                        xs2[s, :len(idx)] = xs_kr[s, idx]
                        keys2[s, :len(idx)] = keys_np[s, idx]
                        mask2[s, :len(idx)] = True
                        src[s, :len(idx)] = idx
                        wave_max = max(wave_max, len(idx))
                if not wave_max:
                    break
                with self._dev_ctx():
                    self.state, leaf2 = vinsert_rounds_masked(
                        self.state, jnp.asarray(xs2), jnp.asarray(keys2),
                        jnp.asarray(mask2), self.cfg,
                        n_rounds=jnp.asarray(wave_max, jnp.int32),
                        max_steps=_DEEP_STEPS,
                    )
                leaf2 = np.asarray(leaf2)
                rows, cols = np.nonzero(mask2 & (leaf2 >= 0))
                leaves[rows, src[rows, cols]] = leaf2[rows, cols]
                # pathological >_DEEP_STEPS descents: exact path, one-off,
                # with the _EXACT_STEPS cap (deep near-dup fringe chains)
                for s, c in np.argwhere(mask2 & (leaf2 < 0)):
                    with self._dev_ctx():
                        self.state, lf = _insert_one_lane(
                            self.state, jnp.asarray(int(s), jnp.int32),
                            jnp.asarray(xs2[s, c]), jnp.asarray(keys2[s, c]),
                            self.cfg,
                        )
                    if int(lf) < 0:
                        # never record -1: the sentence would silently
                        # become unretrievable (and flat-index builds
                        # reject it)
                        raise RuntimeError(
                            f"insert descent exceeded _EXACT_STEPS="
                            f"{_EXACT_STEPS} in lane {int(s)} — raise the "
                            f"cap")
                    leaves[s, src[s, c]] = int(lf)

        _mark("assemble")

        # ONE bucketed masked multi-round call covers the whole batch
        # (previously: an unmasked primary block + two tail branches —
        # three program families and an extra device dispatch per add)
        with self._dev_ctx():
            self.state, leaves = vinsert_rounds_masked(
                self.state, jnp.asarray(xs_t), jnp.asarray(all_keys),
                jnp.asarray(mask_t), self.cfg,
                n_rounds=jnp.asarray(R_max, jnp.int32),
                max_steps=self._budget,
            )
        # np.array (copy): jax->numpy views are read-only and the
        # exact-path retry writes back into this buffer
        leaves = np.array(leaves)
        self._alloc_hi += 2 * R_max
        _mark("primary_rounds")
        retry(leaves, xs_t, all_keys, mask_t)
        _mark("retry")

        # vectorized bookkeeping: sentence gid -> (lane, slot in lane)
        base = np.asarray([len(l) for l in self._leaf_of_local])
        pos_of = np.empty(B, np.int64)
        pos_of[order] = pos
        self.shard_of.extend(int(s) for s in lane_of)
        self.local_sid.extend((base[lane_of] + pos_of).tolist())
        for s in range(K):
            if lens[s]:
                self._leaf_of_local[s].extend(
                    int(l) for l in leaves[s, :lens[s]])
        self.n_sentences += B
        self._stacked_index = None
        self._flat_index = None
        _ph["bookkeeping"] = _time.perf_counter() - _t0
        return gids

    def build_index(self) -> StackedIndex:
        if self._stacked_index is None:
            self._stacked_index = build_stacked_index(
                self.cfg, jax.device_get(self.state), self._leaf_of_local,
                self.shard_of, self.local_sid, self.n_sentences,
            )
            self._flat_index = None
        return self._stacked_index

    def flat_index(self) -> "index_mod.PredictionIndex":
        """The whole forest flattened to one PredictionIndex over global
        sentence ids — drives the blocked-MXU / Pallas / re-rank query
        engines at scale.

        Built DIRECTLY from the stacked state via the multi-root vectorized
        BFS (core/index.build_flat_forest_index): one pass over all lanes
        at once, instead of K per-lane index builds + pad/stack/flatten
        (which cost ~470 s at 500k sentences / 256 lanes)."""
        if getattr(self, "_flat_index", None) is None:
            # pass the DEVICE state: build_flat_forest_index fetches only
            # children/parent for the host structure pass and keeps the
            # stats in HBM (a full device_get here is ~2.6 GB d2h at 1M)
            st = self.state
            leaf_global = self._leaf_global()
            on_device = (isinstance(st.means, jax.Array)
                         and st.means.size >= (1 << 24)
                         and next(iter(st.means.devices())).platform
                         != "cpu")
            host_struct = (self._sync_host_structure()
                           if on_device else None)
            self._flat_index = index_mod.build_flat_forest_index(
                self.cfg, st, leaf_global, host_struct=host_struct)
        return self._flat_index

    def _leaf_global(self) -> np.ndarray:
        """(S,) global leaf slot per sentence: ``lane * cap + local_leaf``
        — the sentence->leaf map every flat/fused builder consumes."""
        cap = int(self.state.counts.shape[1])
        n_local = max((len(l) for l in self._leaf_of_local), default=0)
        leaf_mat = np.full((self.K, max(n_local, 1)), -1, np.int64)
        for s, lst in enumerate(self._leaf_of_local):
            leaf_mat[s, :len(lst)] = lst
        shard = np.asarray(self.shard_of, np.int64)
        local = np.asarray(self.local_sid, np.int64)
        return shard * cap + leaf_mat[shard, local]

    def fused_index(self, dtype=jnp.float32) -> "index_mod.FusedIndex":
        """FusedIndex over the CURRENT forest, built STATS-FREE straight
        from the stacked state (core/index.build_fused_from_state): no
        flatten, no ``(D, N_nodes)`` stats arrays — the serving-index
        build whose HBM working set stays one sentence block next to the
        resident state.  Scores match
        ``build_fused_index(self.flat_index())`` (same association).

        Not cached here: the wrapper owns fused-index caching and
        invalidation (CobwebIndex._fused_index)."""
        chase = 32
        if self.cfg.absorb_depth:
            # chains are depth-bounded by the leaf-absorb compaction;
            # start the scan just above the bound to avoid one escalation
            chase = max(chase, self.cfg.absorb_depth + 8)
        return index_mod.build_fused_from_state(
            self.cfg, self.state, self._leaf_global(), dtype=dtype,
            chase_depth=chase)

    def query_topk(self, queries: np.ndarray, k: int):
        idx = self.build_index()
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        scores, gids = _vforest_query(idx, q, k)
        return np.asarray(scores), np.asarray(gids)

    def beam_index(self) -> "index_mod.BeamIndex":
        """Packed BeamIndex over the FLAT forest index (cached; rebuilt
        whenever the flat index is)."""
        idx = self.flat_index()
        if self._beam_idx is None or self._beam_src is not idx:
            self._beam_idx = index_mod.build_beam_index(idx)
            self._beam_src = idx
            self._beam_depth = int(np.asarray(
                (idx.paths >= 0).sum(-1)).max(initial=1))
        return self._beam_idx

    def beam_topk(self, queries: np.ndarray, k: int, beam_width: int = 16,
                  max_depth: Optional[int] = None,
                  lane_fair: bool = True,
                  lanes_per_query: Optional[int] = None) -> np.ndarray:
        """Cross-lane beam retrieval -> (B, k) global sentence ids.

        ONE packed beam over the flat multi-root index (lane roots are
        compact rows [0, K)).  ``lane_fair=True`` (default) keeps
        ``beam_width`` paths alive PER LANE to the leaves and merges by
        calibrated leaf log-prob — on hard distributions internal-node
        scores cannot arbitrate across lanes, and the global beam's
        lane pruning collapses recall (0.505 vs 0.9+ at 100k hard).
        ``lane_fair=False`` runs the global beam (one width across the
        whole forest): ~K times cheaper, for latency-critical serving on
        easy/separated corpora.

        ``max_depth=None`` (default) scans to the forest's ACTUAL depth —
        clamping to a fixed default would make leaves below the clamp
        silently unretrievable once trees grow deep.  Pass an explicit
        ``max_depth`` only to trade recall for latency.

        ``lanes_per_query``: content-routed forests descend only each
        query's L nearest lanes (by centroid proximity) — K/L x cheaper
        per level at matched per-lane width.  ``None`` = auto: 8 when
        ``routing="content"``, every lane otherwise (round-robin lanes are
        statistically identical, so skipping any loses recall)."""
        bidx = self.beam_index()
        # round the scan depth up to a multiple of 4 so a deepening forest
        # reuses a handful of compiled beam programs instead of one per depth
        md = -(-max(self._beam_depth, 1) // 4) * 4
        if max_depth is not None:
            md = min(max_depth, md)
        qh = np.atleast_2d(np.asarray(queries, np.float32))
        B = qh.shape[0]
        if lanes_per_query is None:
            lanes_per_query = min(self.K, 8) \
                if self.routing == "content" else self.K
        L = min(lanes_per_query, self.K)
        sel = None
        if lane_fair and L < self.K:
            sel = self.select_lanes(qh, L)             # (B, L) lane ids
        # memory-bounded query chunk: XLA materializes the per-level
        # (chunk*L, C, 2D) gathered candidate rows before the dot — cap
        # that buffer at ~1 GB and pad the ragged tail so every chunk
        # reuses ONE compiled program
        Wl = beam_width
        C = min(16 * max(1, -(-4 * Wl // 16)), Wl * 16)
        bytes_per_q = ((L * C) if lane_fair else C) \
            * bidx.pack.shape[1] * bidx.pack.dtype.itemsize
        chunk = int(1 << 30) // max(bytes_per_q, 1)
        chunk = max(64, (chunk // 64) * 64)   # 64-quantized: chunk shape
        chunk = min(chunk, -(-B // 64) * 64)  # is the compile key
        outs = []
        for s0 in range(0, B, chunk):
            qc = qh[s0:s0 + chunk]
            n = qc.shape[0]
            if n < chunk:
                qc = np.concatenate(
                    [qc, np.zeros((chunk - n, qc.shape[1]), np.float32)])
            q = jnp.asarray(qc)
            if lane_fair:
                roots = None
                if sel is not None:
                    rc = sel[s0:s0 + chunk]
                    if rc.shape[0] < chunk:
                        rc = np.concatenate([
                            rc, np.full((chunk - rc.shape[0], L), -1,
                                        np.int32)])
                    roots = jnp.asarray(rc)
                scores, leaves = index_mod.beam_pack_topk_lanes(
                    bidx, q, k, lane_width=Wl, max_depth=md,
                    n_lanes=L, roots=roots)
            else:
                scores, leaves = index_mod.beam_pack_topk(
                    bidx, q, k, beam_width=Wl, max_depth=md,
                    n_roots=self.K)
            ids = index_mod.leaf_runs_to_sids(
                bidx.leaf_sentence_start, bidx.leaf_sentence_count,
                bidx.sentence_order, leaves, scores, k)
            outs.append(np.asarray(ids)[:n])
        return np.concatenate(outs)

    def rank_scores(self, queries) -> jnp.ndarray:
        """Differentiable (B, n_sentences) global path scores."""
        idx = self.build_index()
        q = jnp.asarray(jnp.atleast_2d(queries))
        return vforest_rank_scores(idx, q, self.n_sentences)

    def max_depth(self) -> int:
        idx = self.build_index()
        return int(np.asarray((idx.paths >= 0).sum(-1)).max(initial=0))

    # ------------------------------------------------------------------ #
    # persistence (npz; forest analog of CobwebTree.save_npz)            #
    # ------------------------------------------------------------------ #
    def save_npz(self, path: str, **extra_arrays):
        import json as _json
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        st = jax.device_get(self.state)
        n_local = np.asarray([len(l) for l in self._leaf_of_local])
        leaf_mat = np.full((self.K, max(int(n_local.max(initial=0)), 1)),
                           -1, np.int64)
        for s, lst in enumerate(self._leaf_of_local):
            leaf_mat[s, :len(lst)] = lst
        routing_arrays = {"__routing__": np.asarray(self.routing)}
        if self._centroids is not None:
            routing_arrays.update(
                __centroids__=self._centroids,
                __route_count__=self._route_count,
                __lane_total__=self._lane_total,
            )
        np.savez_compressed(
            path,
            __forest__=np.asarray(self.K),
            __cfg__=np.frombuffer(
                _json.dumps(self.cfg.to_json_dict()).encode(), dtype=np.uint8
            ),
            __key__=np.asarray(self._key),
            n_sentences=np.asarray(self.n_sentences),
            shard_of=np.asarray(self.shard_of, np.int64),
            local_sid=np.asarray(self.local_sid, np.int64),
            leaf_of_local=leaf_mat,
            n_local=n_local,
            **routing_arrays,
            **{f"st_{k}": v for k, v in st._asdict().items()},
            **extra_arrays,
        )

    @classmethod
    def load_npz(cls, path: str):
        """Restore a forest checkpoint; returns (vforest, extras dict)."""
        import json as _json

        with np.load(path, allow_pickle=True) as data:
            cfg = TreeConfig.from_json_dict(
                _json.loads(bytes(data["__cfg__"]).decode())
            )
            K = int(data["__forest__"])
            st = tree_mod.TreeState(**{
                k: jnp.asarray(data[f"st_{k}"])
                for k in tree_mod.TreeState._fields
            })
            routing = (str(data["__routing__"])
                       if "__routing__" in data.files else "round_robin")
            vf = cls(cfg, n_subtrees=K,
                     capacity_per_tree=st.counts.shape[1],
                     routing=routing)
            vf.state = st
            if "__centroids__" in data.files:
                vf._centroids = np.asarray(data["__centroids__"],
                                           np.float32)
                vf._route_count = np.asarray(data["__route_count__"],
                                             np.int64)
                vf._lane_total = np.asarray(data["__lane_total__"],
                                            np.int64)
            vf._alloc_hi = int(np.asarray(data["st_n_alloc"]).max())
            vf._key = jnp.asarray(data["__key__"])
            vf.n_sentences = int(data["n_sentences"])
            vf.shard_of = [int(x) for x in data["shard_of"]]
            vf.local_sid = [int(x) for x in data["local_sid"]]
            n_local = data["n_local"]
            leaf_mat = data["leaf_of_local"]
            vf._leaf_of_local = [
                [int(x) for x in leaf_mat[s, : int(n_local[s])]]
                for s in range(K)
            ]
            known = {f"st_{k}" for k in tree_mod.TreeState._fields} | {
                "__forest__", "__cfg__", "__key__", "n_sentences",
                "shard_of", "local_sid", "leaf_of_local", "n_local",
                "__routing__", "__centroids__", "__route_count__",
                "__lane_total__",
            }
            extras = {k: data[k] for k in data.files if k not in known}
        return vf, extras
