"""Prediction index: batched query scoring over the whole tree at once.

TPU-native generalization of the reference's "fast" path
(CobwebWrapper.build_prediction_index :91-208, cobweb_predict_indexed
:210-265, cobweb_rank_scores :267-294):

  * node statistics are compacted to dense ``(N_live, D)`` mean/var arrays
    (the reference walks the pointer graph; we gather from the flat tree);
  * the sparse COO leaf-path matrix becomes a dense padded ``(S, P)`` array
    of node indices + per-hop weights (trees are shallow, so padding is
    cheap — SURVEY.md §7 hard-part 5);
  * per-query scoring is two MXU GEMMs (see ops/gaussian.node_log_prob_terms)
    and the path-sum is P gathers instead of ``torch.sparse.mm``;
  * queries are *batched* end-to-end — the reference loops one query at a
    time through a process pool (benchmark_utils.py:737-820); here a (B, D)
    batch is one device computation ending in ``lax.top_k``.

Also provides the batched beam-search query (the TPU analog of the
reference's best-first tree search, CobwebTorchTree._cobweb_categorize
:235-289) which scales O(depth * beam * fanout) instead of O(N).
"""

from __future__ import annotations

import functools
import os
import time
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class _PhaseTimer:
    """Env-gated (RAG_COBWEB_TPU_INDEX_TIMING=1) phase timing for the
    index builders — the 1M-scale flatten/blocked costs are multi-phase
    and this is how they get attributed."""

    def __init__(self, tag: str):
        self.on = os.environ.get("RAG_COBWEB_TPU_INDEX_TIMING") == "1"
        self.tag = tag
        self.t = time.perf_counter()

    def lap(self, name: str, sync=None):
        if not self.on:
            return
        if sync is not None:
            jax.block_until_ready(sync)
        now = time.perf_counter()
        print(f"[{self.tag}] {name}: {now - self.t:.2f}s", flush=True)
        self.t = now

from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.ops.gaussian import batched_node_log_probs

DEFAULT_LEVEL_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)  # CobwebWrapper.py:155

# Host copies of the structure arrays (paths/weights/sentence_order) of
# device-resident PredictionIndexes, keyed by the device paths array:
# build_blocked_index needs them on host, and re-downloading what the
# builder just uploaded costs ~36 s at 1M through the device relay.
_HOST_STRUCT: dict = {}


def _register_host_struct(key_arr, paths, weights, order):
    import weakref

    # Register the finalizer BEFORE caching, and cache only if it took:
    # without guaranteed eviction, a GC'd array's id can be recycled by a
    # NEW paths array and build_blocked_index would silently consume the
    # wrong tree's structure.  If the array type ever stops supporting
    # weakrefs we simply skip the cache (blocked builds fall back to
    # re-downloading — slow but correct).
    k = id(key_arr)
    try:
        weakref.finalize(key_arr, _HOST_STRUCT.pop, k, None)
    except TypeError:
        return
    _HOST_STRUCT[k] = (paths, weights, order)


class PredictionIndex(NamedTuple):
    """Device-resident query index (rebuilt after tree mutations)."""

    inv_var_T: jnp.ndarray      # (D, N) precomputed GEMM terms
    mu_over_var_T: jnp.ndarray  # (D, N)
    const: jnp.ndarray          # (N,)
    paths: jnp.ndarray          # (S, P) compact node idx along root->leaf, -1 pad
    path_weights: jnp.ndarray   # (S, P) level_weight[d]/path_len, 0 on padding
    # beam-search arrays (compact numbering, BFS order):
    children: jnp.ndarray       # (N, F) compact child idx, -1 pad
    leaf_sentence_start: jnp.ndarray  # (N,) first sid of leaf's sentence run, -1
    leaf_sentence_count: jnp.ndarray  # (N,)
    sentence_order: jnp.ndarray  # (S,) sids grouped by leaf (run-length layout)

    @property
    def num_nodes(self) -> int:
        return self.const.shape[0]

    @property
    def num_sentences(self) -> int:
        return self.paths.shape[0]


def build_index(
    tree: CobwebTree,
    leaf_of_sentence: np.ndarray,
    level_weights: Sequence[float] = DEFAULT_LEVEL_WEIGHTS,
    pad_depth_to: int = 4,
    as_numpy: bool = False,
) -> PredictionIndex:
    """Compact the live tree + derive per-sentence root->leaf paths.

    ``leaf_of_sentence[s]`` is the tree node index of sentence s's leaf.
    Path derivation is vectorized parent-pointer chasing (no Python per-node
    loop): depth comes from repeated gather of ``parent``.
    Mirrors CobwebWrapper.build_prediction_index :110-203 (BFS numbering,
    level weights normalized by path length, prior-var for empty nodes).
    """
    st = jax.tree.map(np.asarray, tree.state)
    return _build_index_from_arrays(
        tree.cfg, st.children, st.parent, st.counts, st.means, st.m2s,
        np.asarray([int(st.root)], np.int32), leaf_of_sentence,
        level_weights, pad_depth_to, as_numpy,
    )


def build_flat_forest_index(
    cfg,
    stacked_state,
    leaf_of_sentence_global: np.ndarray,
    level_weights: Sequence[float] = DEFAULT_LEVEL_WEIGHTS,
    pad_depth_to: int = 4,
    as_numpy: bool = False,
    host_struct=None,
) -> PredictionIndex:
    """ONE PredictionIndex over a whole K-lane stacked forest state.

    Lane l's node ids are offset by ``l * capacity`` and the multi-root BFS
    numbers every lane's live nodes in one pass — the O(K) per-lane index
    builds + pad/stack/concat of the old flatten path collapse into the
    same handful of vectorized numpy ops ``build_index`` uses for one tree
    (measured: 468 s -> seconds at 500k sentences / 256 lanes).

    ``leaf_of_sentence_global[s]`` is ``lane * capacity + local_leaf``.
    Like ``merge_stacked_to_flat``, the result drives every flat query
    engine but NOT ``beam_search_topk`` (no single root).

    When the state lives on an accelerator, node STATISTICS never come to
    host: only children/parent (~5% of the state bytes) are fetched for
    the structure pass, and ``_compact_stats_device`` derives the GEMM
    terms in HBM (device_get of a 256-lane 1M-vector forest's means/m2s
    through the device relay costs minutes; measured flatten 267 s ->
    ~30 s at 500k).
    """
    pt = _PhaseTimer("flat")
    means = stacked_state.means
    on_device = (not as_numpy and isinstance(means, jax.Array)
                 and means.size >= (1 << 24)
                 and next(iter(means.devices())).platform != "cpu")
    if on_device:
        if host_struct is not None:
            # incrementally-synced host mirror (VForest._sync_host_structure)
            # — the full device_get below costs ~16 s at 1M via the relay
            children_h, parent_h, root_h = host_struct
        else:
            children_h = np.asarray(jax.device_get(stacked_state.children))
            parent_h = np.asarray(jax.device_get(stacked_state.parent))
            root_h = np.asarray(jax.device_get(stacked_state.root))
        K, cap = parent_h.shape
        device_stats = (
            jnp.reshape(stacked_state.counts, (K * cap,)),
            jnp.reshape(stacked_state.means, (K * cap, -1)),
            jnp.reshape(stacked_state.m2s, (K * cap, -1)),
        )
        pt.lap("device_get children/parent + reshape")
    else:
        st = jax.tree.map(np.asarray, stacked_state)
        children_h, parent_h, root_h = st.children, st.parent, st.root
        K, cap = st.counts.shape
        device_stats = None
    offs = (np.arange(K, dtype=np.int32) * cap)[:, None, None]
    children = np.where(children_h >= 0, children_h + offs, np.int32(-1))
    children = np.asarray(children.reshape(K * cap, -1), np.int32)
    parent = np.where(parent_h >= 0, parent_h + offs[:, :, 0],
                      np.int32(-1))
    parent = np.asarray(parent.reshape(K * cap), np.int32)
    roots = np.asarray(np.arange(K, dtype=np.int32) * cap + root_h,
                       np.int32)
    if device_stats is None:
        counts_f = st.counts.reshape(K * cap)
        means_f = st.means.reshape(K * cap, -1)
        m2s_f = st.m2s.reshape(K * cap, -1)
    else:
        counts_f = means_f = m2s_f = None
    # sentence_order must group leaves LANE-MAJOR and subtree-contiguous:
    # the multi-root BFS numbers nodes level-interleaved across lanes, so
    # ordering by compact id would make every ~512-sentence block of the
    # blocked index span many subtrees — the per-block unique-node count
    # (and with it the padded M of ALL blocks) explodes.  The DFS
    # (lexicographic-path) layout in _build_index_from_arrays handles both.
    return _build_index_from_arrays(
        cfg, children, parent, counts_f, means_f, m2s_f,
        roots, leaf_of_sentence_global, level_weights, pad_depth_to,
        as_numpy,
        device_stats=device_stats,
    )


@functools.partial(jax.jit, static_argnames=("acuity", "prior_var"))
def _compact_stats_device(counts, means, m2s, order, prior_var: float,
                          acuity: bool):
    """Device-side stats compaction: gather live rows by ``order`` (-1 =
    padding) and derive the GEMM terms without the stats ever leaving HBM.
    The host-side flatten of a 256-lane 1M-sentence forest otherwise
    device_gets ~2.6 GB of means/m2s through the relay (measured minutes);
    structure arrays (children/parent) are ~20x smaller.
    Returns (inv_var_T (D, Npad), mu_over_var_T (D, Npad), const (Npad,));
    padding columns carry -3e38 const so they can never win a top-k."""
    safe = jnp.maximum(order, 0)
    c = counts[safe]
    mu = means[safe]
    m2 = m2s[safe]
    sc = jnp.where(c > 0, c, 1.0)[:, None]
    ml = m2 / sc
    if acuity:
        v = jnp.maximum(ml, prior_var)
    else:
        v = ml + prior_var
    v = jnp.where(c[:, None] > 0, v, prior_var)
    inv = 1.0 / v
    mov = mu * inv
    const = -0.5 * (jnp.sum(jnp.square(mu) * inv, axis=-1)
                    + jnp.sum(jnp.log(v), axis=-1))
    pad = order < 0
    inv = jnp.where(pad[:, None], 1.0, inv)
    mov = jnp.where(pad[:, None], 0.0, mov)
    const = jnp.where(pad, jnp.float32(-3e38), const)
    return inv.T, mov.T, const


_NODE_BUCKET = 65536  # live-node padding quantum for the device stats path
_SENT_BUCKET = 65536  # sentence padding quantum for the device struct path


@functools.partial(jax.jit, static_argnames=("P",))
def _derive_paths_device(parent_compact, leaf_compact, P: int, lw):
    """Device-side root->leaf path derivation: the parent chase is a
    P-step ``lax.scan`` of (S,)-gathers in HBM instead of the host numpy
    loop (the 1M flatten's 32-126 s run-to-run-variable tail — host
    memory pressure on the (S, P) chains arrays; on device the whole
    pass is milliseconds).  ``leaf_compact`` rows < 0 are padding.

    Returns (paths (S, P) root->leaf -1-padded, weights (S, P),
    path_len (S,))."""
    def step(cur, _):
        nxt = jnp.where(cur >= 0, parent_compact[jnp.maximum(cur, 0)],
                        jnp.int32(-1))
        return nxt, cur

    _, chains = jax.lax.scan(step, leaf_compact, None, length=P)
    chains = chains.T                                   # (S, P) leaf->root
    plen = jnp.sum(chains >= 0, axis=1)
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    src = plen[:, None].astype(jnp.int32) - 1 - pos
    paths = jnp.where(
        src >= 0,
        jnp.take_along_axis(chains, jnp.maximum(src, 0), axis=1),
        jnp.int32(-1),
    )
    weights = jnp.where(
        paths >= 0,
        lw[None, :] / jnp.maximum(plen, 1)[:, None].astype(jnp.float32),
        0.0,
    ).astype(jnp.float32)
    return paths, weights, plen


# lexicographic-path sort depth for the DEVICE layout: successive stable
# argsorts cost one (S,) sort + gather per column, so the device path
# truncates to the first 12 path levels (the host numpy lexsort uses all).
# Sentences differing only below level 12 share a depth-12 subtree — the
# lex prefix already keeps that whole subtree contiguous, so truncation
# cannot spread a block across distant subtrees; the leaf-id pre-pass
# keeps same-leaf runs contiguous regardless.
_LEX_DEPTH = 12


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _leaf_layout_device(leaf_compact, paths, n_pad: int):
    """Device-side leaf run-length layout in DFS (lexicographic root->leaf
    path) order — see the host branch in ``_build_index_from_arrays`` for
    why lex order minimizes the blocked index's per-block node count.
    Implemented as successive stable argsorts from the least-significant
    path column up (radix style; a packed key overflows int32 at forest
    scale and x64 is disabled).  Padding rows (leaf < 0) sort to the end.
    Returns (sentence_order (S,), leaf_start (n_pad,), leaf_count)."""
    BIG = jnp.int32(np.iinfo(np.int32).max)
    valid = leaf_compact >= 0
    leaf_key = jnp.where(valid, leaf_compact, BIG)
    order = jnp.argsort(leaf_key, stable=True).astype(jnp.int32)
    P = paths.shape[1]
    for p in range(min(P, _LEX_DEPTH) - 1, -1, -1):
        key = jnp.where(valid, paths[:, p], BIG)
        order = order[jnp.argsort(key[order], stable=True).astype(jnp.int32)]
    sorted_leaves = leaf_compact[order]                  # (S,) -1 = pad
    S = order.shape[0]
    safe = jnp.where(sorted_leaves >= 0, sorted_leaves, n_pad)
    first = jnp.concatenate([
        jnp.ones((1,), bool), sorted_leaves[1:] != sorted_leaves[:-1]
    ]) & (sorted_leaves >= 0)
    leaf_start = jnp.full((n_pad + 1,), -1, jnp.int32).at[
        jnp.where(first, safe, n_pad)
    ].max(jnp.arange(S, dtype=jnp.int32), mode="drop")
    # .at[].max against -1 init: first occurrence index is the minimum,
    # but each leaf has exactly ONE first row, so max == that index
    leaf_count = jnp.zeros((n_pad + 1,), jnp.int32).at[safe].add(
        jnp.where(sorted_leaves >= 0, 1, 0), mode="drop")
    return order, leaf_start[:n_pad], leaf_count[:n_pad]


def _build_index_from_arrays(
    cfg, children, parent, counts_arr, means_arr, m2s_arr,
    roots: np.ndarray,
    leaf_of_sentence: np.ndarray,
    level_weights: Sequence[float] = DEFAULT_LEVEL_WEIGHTS,
    pad_depth_to: int = 4,
    as_numpy: bool = False,
    device_stats=None,
) -> PredictionIndex:
    """Shared core of ``build_index`` / ``build_flat_forest_index``: BFS
    numbering (from one root or K forest roots), vectorized parent-chase
    paths, stats compaction.  Sentence layout is DFS (lexicographic path)
    order — lane-major and subtree-contiguous by construction.
    ``device_stats`` = (counts, means, m2s) device arrays: stats never
    leave HBM (``_compact_stats_device``); only structure comes to host."""
    # --- BFS over live nodes -> compact numbering -------------------------
    # Level-synchronous vectorized BFS: each level is ONE fancy-index gather
    # of the children table (row-major ravel preserves the queue-BFS order:
    # parents in frontier order, siblings in slot order), so the host work
    # is O(max_depth) numpy ops instead of an O(N) Python loop — this is
    # what keeps index refresh sub-second at 100k+ sentences.
    levels = [np.asarray(roots, np.int32)]
    while True:
        kids = children[levels[-1]].ravel()
        kids = kids[kids >= 0]
        if kids.size == 0:
            break
        levels.append(np.asarray(kids, np.int32))
    order_arr = np.concatenate(levels)
    _pt = _PhaseTimer("idx")
    compact_of = np.full((children.shape[0],), -1, np.int32)
    compact_of[order_arr] = np.arange(len(order_arr), dtype=np.int32)
    _pt.lap("bfs+compact")

    n_live = len(order_arr)
    depths = np.concatenate([
        np.full((len(l),), d, np.int32) for d, l in enumerate(levels)
    ])
    max_depth = int(depths.max()) if n_live else 0
    P = max(1, -(-(max_depth + 1) // pad_depth_to) * pad_depth_to)

    # --- per-sentence root->leaf paths via parent chasing -----------------
    S = len(leaf_of_sentence)
    leaf_compact = compact_of[np.asarray(leaf_of_sentence, np.int32)]
    if np.any(leaf_compact < 0):
        bad = np.where(leaf_compact < 0)[0]
        raise ValueError(f"sentences {bad[:5]} map to dead tree nodes")
    parent_compact = np.full((n_live,), -1, np.int32)
    live_parents = parent[order_arr]
    has_parent = live_parents >= 0
    parent_compact[has_parent] = compact_of[live_parents[has_parent]]

    lw = np.ones((P,), np.float32)
    lw[: min(len(level_weights), P)] = np.asarray(
        list(level_weights)[:P], np.float32
    )

    device_struct = device_stats is not None and not as_numpy
    if device_struct:
        # the whole per-sentence structure pass runs in HBM: the host
        # numpy chase/reverse/argsort over (S, P) arrays was the 1M
        # flatten's 32-126 s run-to-run-variable tail (ROADMAP r2 #1);
        # uploads are a few MB (parent table + leaf/sort keys), and the
        # jitted programs are bucketed on S so repeated refreshes reuse
        # compiles.
        n_pad = -(-max(n_live, 1) // _NODE_BUCKET) * _NODE_BUCKET
        S_pad = -(-max(S, 1) // _SENT_BUCKET) * _SENT_BUCKET
        leaf_pad = np.full((S_pad,), -1, np.int32)
        leaf_pad[:S] = leaf_compact
        paths_d, weights_d, _ = _derive_paths_device(
            jnp.asarray(parent_compact), jnp.asarray(leaf_pad), P,
            jnp.asarray(lw))
        order_d, start_d, count_d = _leaf_layout_device(
            jnp.asarray(leaf_pad), paths_d, n_pad)
        paths = paths_d[:S]
        weights = weights_d[:S]
        sent_order = order_d[:S]
        leaf_start = start_d
        leaf_count = count_d
        _pt.lap("device paths+layout", sync=sent_order)
    else:
        # chase: row s = [leaf, parent(leaf), ..., root], then reverse
        chains = np.full((S, P), -1, np.int32)
        cur = leaf_compact.copy()
        for p in range(P):
            chains[:, p] = cur
            nxt = np.where(cur >= 0, parent_compact[np.maximum(cur, 0)], -1)
            cur = nxt
        path_len = (chains >= 0).sum(1)
        # reverse each row's valid prefix so paths run root->leaf
        rows = np.arange(S)[:, None]
        pos = np.arange(P)[None, :]
        src = path_len[:, None] - 1 - pos
        paths = np.where(src >= 0, chains[rows, np.maximum(src, 0)],
                         np.int32(-1))
        weights = np.where(
            paths >= 0, lw[None, :] / np.maximum(path_len, 1)[:, None], 0.0
        ).astype(np.float32)
        _pt.lap("paths+weights")

        # --- sentence run-length layout per leaf (for beam search) --------
        # DFS (lexicographic root->leaf path) order: same-leaf sentences
        # stay contiguous (identical paths) AND whole subtrees stay
        # contiguous at every depth — unlike compact-id order, which is
        # BFS/level-major and interleaves subtrees within a level, the lex
        # order minimizes the per-block unique-node count M of the blocked
        # index (measured at 100k/16 lanes: max M 843 -> 730, mean 767 ->
        # 704), which multiplies both the sweep's stats-GEMM FLOPs and its
        # HBM bytes.  Lane-majority is automatic (paths[:, 0] = lane root).
        sent_order = np.lexsort(
            tuple(paths[:, p] for p in range(P - 1, -1, -1))
        ).astype(np.int32)
        sorted_leaves = leaf_compact[sent_order]
        leaf_start = np.full((n_live,), -1, np.int32)
        leaf_count = np.zeros((n_live,), np.int32)
        uniq, starts, counts = np.unique(
            sorted_leaves, return_index=True, return_counts=True
        )
        leaf_start[uniq] = starts.astype(np.int32)
        leaf_count[uniq] = counts.astype(np.int32)

    # --- compact stats (host numpy, ONE upload) ---------------------------
    # these are elementwise over (N_live, D): doing them eagerly on device
    # costs a kernel compile per distinct N_live (ruinous when a forest
    # builds one index per lane through the slow remote compile service);
    # host numpy + a single device_put of the final arrays is faster at
    # every size measured (mirrors ops/gaussian.compute_var +
    # node_log_prob_terms exactly)
    if device_stats is not None:
        cd, md, m2d = device_stats
        n_pad = -(-max(n_live, 1) // _NODE_BUCKET) * _NODE_BUCKET
        order_pad = np.full((n_pad,), -1, np.int32)
        order_pad[:n_live] = order_arr
        inv_var, mu_over_var, const_h = _compact_stats_device(
            cd, md, m2d, jnp.asarray(order_pad),
            float(cfg.prior_var), bool(cfg.acuity_cutoff),
        )
        _pt.lap("device stats", sync=const_h)
    else:
        # transpose-first: ONE strided copy per stat array; every
        # elementwise pass below then runs on contiguous (D, N) rows, and
        # the final inv_var_T / mu_over_var_T need no second copy
        # (same-dtype .astype / trailing ascontiguousarray(x.T) each cost
        # seconds at 500k+ nodes)
        means = np.asarray(means_arr[order_arr].T, np.float32, order="C")
        m2s_T = np.ascontiguousarray(m2s_arr[order_arr].T)
        counts = counts_arr[order_arr]
        safe_count = np.where(counts > 0, counts, np.float32(1.0))[None, :]
        ml_var = m2s_T / safe_count
        if cfg.acuity_cutoff:
            vars_ = np.maximum(ml_var, np.float32(cfg.prior_var))
        else:
            vars_ = ml_var + np.float32(cfg.prior_var)
        vars_ = np.where(counts[None, :] > 0, vars_,
                         np.float32(cfg.prior_var))
        inv_var = 1.0 / vars_
        mu_over_var = means * inv_var
        const_h = -0.5 * (np.sum(np.square(means) * inv_var, axis=0)
                          + np.sum(np.log(vars_), axis=0))
    # compact children table
    kids = children[order_arr]  # (N_live, F) raw idx
    kids_compact = np.where(kids >= 0, compact_of[np.maximum(kids, 0)], -1).astype(
        np.int32
    )

    # ``as_numpy`` keeps the index host-side — for per-lane indexes that
    # are immediately re-stacked/flattened (forest builds), skipping the
    # per-lane device round trip
    _pt.lap("leaf layout + children")
    wrap = np.ascontiguousarray if as_numpy else jnp.asarray
    out_idx = PredictionIndex(
        inv_var_T=wrap(inv_var),
        mu_over_var_T=wrap(mu_over_var),
        const=wrap(const_h.astype(np.float32)),
        paths=wrap(paths),
        path_weights=wrap(weights),
        children=wrap(kids_compact),
        leaf_sentence_start=wrap(leaf_start),
        leaf_sentence_count=wrap(leaf_count),
        sentence_order=wrap(sent_order),
    )
    _pt.lap("wrap/upload", sync=None if as_numpy else out_idx.paths)
    if not as_numpy and not device_struct:
        # device_struct builds keep paths/weights/order in HBM only; the
        # blocked build consumes them there (_block_key_stage) instead of
        # from this host-copy cache
        _register_host_struct(out_idx.paths, paths, weights, sent_order)
    return out_idx


# ---------------------------------------------------------------------------
# indexed scoring (reference cobweb_predict_indexed / cobweb_rank_scores)
# ---------------------------------------------------------------------------

def path_scores_from_nlp(paths: jnp.ndarray, path_weights: jnp.ndarray,
                         nlp: jnp.ndarray) -> jnp.ndarray:
    """Weighted path-sum: (B, N) node log-probs -> (B, S) sentence scores."""
    P = paths.shape[1]
    safe_paths = jnp.maximum(paths, 0)  # (S, P)
    acc = jnp.zeros((nlp.shape[0], paths.shape[0]), jnp.float32)
    for p in range(P):  # P is small & static; XLA fuses the gathers
        acc = acc + nlp[:, safe_paths[:, p]] * path_weights[:, p][None, :]
    return acc


def rank_scores(index: PredictionIndex, queries: jnp.ndarray) -> jnp.ndarray:
    """Differentiable per-sentence path scores for a (B, D) query batch.

    Equivalent of CobwebWrapper.cobweb_rank_scores (:267-294): Gaussian
    log-prob of every node + weighted sum along each sentence's root->leaf
    path.  Returns (B, S).
    """
    nlp = batched_node_log_probs(
        queries, index.inv_var_T, index.mu_over_var_T, index.const
    )  # (B, N)
    return path_scores_from_nlp(index.paths, index.path_weights, nlp)


@functools.partial(jax.jit, static_argnames=("k",))
def query_topk(index: PredictionIndex, queries: jnp.ndarray, k: int,
               noise_key: Optional[jax.Array] = None):
    """Batched top-k retrieval: (B, D) -> (scores (B,k), sentence ids (B,k)).

    Reference adds ~1e-6 Gaussian noise to break ties before top-k
    (CobwebWrapper.py:244-257); pass ``noise_key`` to reproduce that.
    """
    scores = rank_scores(index, queries)
    if noise_key is not None:
        scores = scores + 1e-6 * jax.random.normal(noise_key, scores.shape)
    k = min(k, scores.shape[1])
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_scores, top_ids


def _sentence_leaf_nodes(index: PredictionIndex) -> jnp.ndarray:
    """(S,) compact node idx of each sentence's leaf (deepest path entry)."""
    plen = jnp.sum(index.paths >= 0, axis=1)
    return jnp.take_along_axis(
        index.paths, jnp.maximum(plen - 1, 0)[:, None], axis=1
    )[:, 0]


def _leaf_lp_rerank(index: PredictionIndex, queries: jnp.ndarray,
                    cand: jnp.ndarray, cand_scores: jnp.ndarray, k: int):
    """Re-rank (B, C) candidate sentences by their LEAF log-probability —
    the same key the beam search ranks by, which holds recall at scale
    where the weighted path-sum's upper levels wash out fine distinctions
    (measured: path-score recall@10 dips to ~0.98 at 100k while leaf-lp
    beam holds ~0.998).  Returns (scores (B, k), ids (B, k))."""
    leaf_of = _sentence_leaf_nodes(index)          # (S,)
    leaves = leaf_of[cand]                         # (B, C)
    ivt = index.inv_var_T.T[leaves]                # (B, C, D)
    movt = index.mu_over_var_T.T[leaves]
    cst = index.const[leaves]
    x = queries[:, None, :]
    lp = (jnp.sum(x * movt, -1) - 0.5 * jnp.sum(jnp.square(x) * ivt, -1)
          + cst)
    lp = jnp.where(jnp.isfinite(cand_scores), lp, -jnp.inf)
    top, pos = jax.lax.top_k(lp, k)
    return top, jnp.take_along_axis(cand, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("c", "approx",
                                             "recall_target"))
def backstop_topk(wemb: jnp.ndarray, half_norm2: jnp.ndarray,
                  queries: jnp.ndarray, c: int, n_valid: jnp.ndarray,
                  approx: bool = True, recall_target: float = 0.95):
    """Whitened-flat BACKSTOP candidate pool: top-``c`` sentences by exact
    L2 proximity in the compressed tree space, from one bf16 GEMM over the
    stored whitened rows + ``approx_max_k``.

    At 1M+ the fused path-score pool's misses are tree-placement outliers
    (VERDICT r3 #4: raw-store delta 0.0174 at 1M is POOL membership, and
    the pool-size curve is shallow — 2x pool bought only 0.002); a
    proximity pool in the same whitened space catches exactly those, and
    at ~1/12 the bytes of the raw flat scan it displaces (bf16 x
    compressed dim vs f32 x 768).  The union feeds the same exact
    stored-embedding re-rank, so ranking stays exact — the backstop only
    widens pool membership.

    wemb: (Sw, Dw) bf16 whitened store (zero padding past the live rows);
    half_norm2: (Sw,) f32 = 0.5*||row||^2; n_valid masks rows the serving
    index covers (pending/delta rows merge elsewhere).  Monotone in L2:
    q.w - 0.5||w||^2 = -0.5||q - w||^2 + const(q).  Returns
    (scores (B, c) f32, sentence ids (B, c))."""
    s = jnp.matmul(queries.astype(wemb.dtype), wemb.T,
                   preferred_element_type=jnp.float32) - half_norm2[None, :]
    col = jnp.arange(s.shape[1], dtype=jnp.int32)[None, :]
    s = jnp.where(col < n_valid, s, -jnp.inf)
    c = min(c, s.shape[1])
    if approx and c < s.shape[1]:
        if s.shape[1] >= _GROUPED_POOL_MIN_COLS and c <= s.shape[1] // _GROUP:
            # same two-level pool trick as fused_query_topk (the
            # approx_max_k partial reduce dominates at 1M+ columns)
            top, pos = grouped_pool_topk(s, c)
        else:
            top, pos = jax.lax.approx_max_k(s, c,
                                            recall_target=recall_target)
    else:
        top, pos = jax.lax.top_k(s, c)
    return top, pos


_UNION_SENTINEL = np.int32(2**31 - 1)


@jax.jit
def union_candidates(cand_a: jnp.ndarray, cs_a: jnp.ndarray,
                     cand_b: jnp.ndarray, cs_b: jnp.ndarray):
    """Merge two candidate pools into one (B, Ca+Cb) set with duplicate
    sentence ids masked to -inf (``exact_rerank``/``_leaf_lp_rerank`` drop
    non-finite-score entries), so a union pool can feed the standard
    re-rank step without ever ranking the same sentence twice.  Invalid
    entries (-inf scores) are first mapped to a sentinel id so they never
    collide with live ids; among duplicates the kept copy is the first in
    id-sorted order (scores of duplicates re-rank identically, so which
    copy survives is immaterial)."""
    a = jnp.where(jnp.isfinite(cs_a), cand_a.astype(jnp.int32),
                  _UNION_SENTINEL)
    b = jnp.where(jnp.isfinite(cs_b), cand_b.astype(jnp.int32),
                  _UNION_SENTINEL)
    cand = jnp.concatenate([a, b], axis=1)
    cs = jnp.concatenate([cs_a.astype(jnp.float32),
                          cs_b.astype(jnp.float32)], axis=1)
    order = jnp.argsort(cand, axis=1)
    cand_s = jnp.take_along_axis(cand, order, axis=1)
    cs_s = jnp.take_along_axis(cs, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(cand_s[:, :1], bool),
         cand_s[:, 1:] == cand_s[:, :-1]], axis=1)
    dead = dup | (cand_s == _UNION_SENTINEL)
    cs_s = jnp.where(dead, -jnp.inf, cs_s)
    cand_s = jnp.where(cand_s == _UNION_SENTINEL, 0, cand_s)
    return cand_s, cs_s


@functools.partial(jax.jit, static_argnames=("k",))
def exact_rerank(emb: jnp.ndarray, queries: jnp.ndarray,
                 cand: jnp.ndarray, cand_scores: jnp.ndarray, k: int,
                 prior_var: jnp.ndarray = jnp.float32(1.0)):
    """Re-rank (B, C) candidate sentences by the fresh-leaf closed form on
    their STORED embeddings — the exact formula ``pending_leaf_lp`` uses
    for not-yet-indexed rows, so stale-index merges stay calibrated:
        lp = -0.5 (||q - x||^2 / prior_var + D log prior_var)
    Monotone in exact L2 distance: whenever the gold is in the candidate
    pool, the final ranking equals exact whitened search.

    This fixes the leaf-lp re-rank's blind spot: sentences sharing a leaf
    (near-duplicates merged by the tree) get IDENTICAL leaf log-probs, so
    their relative order was arbitrary — on the hard benchmark the gold
    drowned among its planted dups (0.858 vs whitened-exact 0.915 at
    d=563).

    Jitted: the diff/square/reduce chain fuses into the gather's consumer
    so only the (B, C, D) gather output materializes (eager, the same
    chain round-tripped ~19 GB of HBM per 1k-query batch).  The diff form
    is kept over the dot form deliberately — near-duplicate margins are
    tiny relative to ||x||^2, and the dot form's cancellation loses them.
    Compiles are keyed on emb.shape, so callers keep the store capacity
    BUCKETED (wrapper._emb_device) — otherwise every add recompiles.

    emb: (S, D) stored corpus embeddings (rows past the valid count are
    never referenced: cand ids are < the live sentence count); returns
    (scores, ids) (B, k)."""
    x = emb[cand]                                   # (B, C, D)
    d2 = jnp.sum(jnp.square(queries[:, None, :] - x), -1)
    lp = -0.5 * (d2 / prior_var
                 + queries.shape[1] * jnp.log(prior_var))
    lp = jnp.where(jnp.isfinite(cand_scores), lp, -jnp.inf)
    top, pos = jax.lax.top_k(lp, k)
    return top, jnp.take_along_axis(cand, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "rerank"))
def query_topk_rerank(index: PredictionIndex, queries: jnp.ndarray, k: int,
                      rerank: int = 128):
    """Hybrid retrieval: path-score top-``rerank`` candidates, re-ranked by
    leaf log-prob, final top-k — fast-path latency with beam-path recall."""
    scores = rank_scores(index, queries)
    c = min(max(rerank, k), scores.shape[1])
    cand_scores, cand = jax.lax.top_k(scores, c)
    return _leaf_lp_rerank(index, queries, cand, cand_scores,
                           min(k, c))


@jax.jit
def pending_leaf_lp(queries: jnp.ndarray, vecs: jnp.ndarray,
                    valid: jnp.ndarray, prior_var: jnp.ndarray):
    """Leaf log-probability of not-yet-indexed (pending) sentences.

    A sentence inserted since the last index build sits in a fresh leaf
    with count 1, mean = its embedding and ML variance 0, so its leaf
    log-prob is EXACTLY the prior-variance Gaussian at the embedding —
    the same key ``_leaf_lp_rerank`` ranks indexed candidates by.  This
    closed form is what lets ``CobwebIndex`` serve queries from a stale
    index + exact pending scores instead of rebuilding per add.
    (B, D) x (Np, D) -> (B, Np); invalid rows -> -inf."""
    d2 = jnp.sum(jnp.square(queries[:, None, :] - vecs[None, :, :]), -1)
    lp = -0.5 * (d2 / prior_var
                 + queries.shape[1] * jnp.log(prior_var))
    return jnp.where(valid[None, :], lp, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("k",))
def delta_exact_topk(queries: jnp.ndarray, vecs: jnp.ndarray,
                     n_valid: jnp.ndarray, prior_var: jnp.ndarray, k: int):
    """Top-k of the fresh-leaf closed form over a consolidated DELTA
    segment (rows the flat/blocked indexes have not absorbed yet), in
    GEMM form: ``pending_leaf_lp`` materializes the (B, Np, D) broadcast,
    fine at Np<=4k but not for the 64k+ segment the tiered pending store
    holds — here d2 = ||q||^2 - 2 q.v + ||v||^2 rides one MXU matmul and
    peak memory is the (B, Np) score matrix.  Rows >= ``n_valid`` (the
    buffer's padding tail) score -inf.  Returns (scores, row indices)."""
    qn = jnp.sum(jnp.square(queries), axis=1, keepdims=True)
    vn = jnp.sum(jnp.square(vecs), axis=1)
    dot = jnp.matmul(queries, vecs.T, precision=jax.lax.Precision.HIGHEST)
    d2 = qn - 2.0 * dot + vn[None, :]
    D = queries.shape[1]
    lp = -0.5 * (d2 / prior_var + D * jnp.log(prior_var))
    valid = jnp.arange(vecs.shape[0]) < n_valid
    lp = jnp.where(valid[None, :], lp, -jnp.inf)
    return jax.lax.top_k(lp, k)


@jax.jit
def _append_rows(buf: jnp.ndarray, rows: jnp.ndarray, start: jnp.ndarray):
    """Write a (bucket-padded) slab of rows at ``start`` (the buffer's
    valid count).  The slab's zero padding lands in the invalid tail, so
    callers only must keep capacity >= start + slab (no clamp shift)."""
    return jax.lax.dynamic_update_slice(buf, rows, (start, 0))


# ---------------------------------------------------------------------------
# blocked (gather-free) indexed scoring — the MXU-native large-scale path
# ---------------------------------------------------------------------------

class BlockedIndex(NamedTuple):
    """Block-local dense formulation of the prediction index.

    Sentences are grouped into blocks of ``TS`` in BFS-leaf order, so each
    block's root->leaf paths touch a *small local set* of nodes (contiguous
    subtrees + the shared upper levels).  Per block we replicate those
    nodes' GEMM terms and densify the path weights, which turns the whole
    query into three batched matmuls:

        nlp[b, s, m]   = q[b] . movt[s, m] - 0.5 q^2[b] . ivt[s, m] + const[s, m]
        score[b, s, t] = sum_m nlp[b, s, m] * W[s, m, t]

    — pure MXU work, no gathers, O(S) total, unlike the (B, S) gather chain
    of ``rank_scores`` whose HBM traffic is P * B * S.  This is the path to
    1M+ leaves on a chip.
    """

    ivt_b: jnp.ndarray     # (NB, M, D)
    movt_b: jnp.ndarray    # (NB, M, D)
    const_b: jnp.ndarray   # (NB, M)
    W: jnp.ndarray         # (NB, M, TS) dense local path weights
    valid: jnp.ndarray     # (NB, TS) bool — padding rows
    sid_of_slot: jnp.ndarray  # (NB, TS) block slot -> original sentence id


def build_blocked_index(index: PredictionIndex, block_size: int = 512,
                        node_pad: int = 128,
                        dtype=jnp.float32) -> BlockedIndex:
    """Derive the blocked form from a built PredictionIndex (host-side
    structure work, device-side stats replication).

    ``dtype=jnp.bfloat16`` stores the replicated GEMM terms and path
    weights at half width — HALF the HBM traffic of the candidate sweep,
    the dominant cost at 500k+ sentences.  bf16 scores carry ~1e-2 relative
    error, so pair it with the leaf-lp re-rank (f32,
    ``blocked_query_topk_rerank``) which restores exact final ranking; the
    top-``rerank`` candidate pool absorbs sweep-level score jitter.
    """
    _pt = _PhaseTimer("blk")
    hs = _HOST_STRUCT.get(id(index.paths))
    if hs is None and isinstance(index.paths, jax.Array):
        # device-struct index (1M forest flatten): the whole blocked build
        # runs in HBM — per-block sort/unique/scatter as two jitted stages
        # (one scalar d2h fixes the static M) instead of downloading the
        # (S, P) structure through the relay and sorting on the host
        # (29 s batched unique at 1M, plus the d2h)
        return _build_blocked_index_device(index, block_size, node_pad,
                                           dtype, _pt)
    if hs is not None:
        paths, weights, order = hs
    else:
        paths = np.asarray(index.paths)
        weights = np.asarray(index.path_weights)
        order = np.asarray(index.sentence_order)   # sentences in leaf order
    _pt.lap("pull paths/weights/order")
    S, P = paths.shape
    TS = block_size
    NB = max(1, -(-S // TS))

    # pad the leaf-ordered sentence list to NB*TS and gather block paths —
    # everything below is batched numpy over ALL blocks at once (the
    # per-block Python loop with np.unique cost minutes at 1M sentences)
    order_pad = np.full((NB * TS,), -1, np.int64)
    order_pad[:S] = order
    valid = (order_pad >= 0).reshape(NB, TS)
    sid_of_slot = np.maximum(order_pad, 0).reshape(NB, TS)
    bp = np.where(valid.reshape(-1, 1), paths[np.maximum(order_pad, 0)[:, None],
                                              np.arange(P)[None, :]], -1)
    bw = np.where(valid.reshape(-1, 1),
                  weights[np.maximum(order_pad, 0)[:, None],
                          np.arange(P)[None, :]], 0.0)
    flat = bp.reshape(NB, TS * P).astype(np.int32)    # -1 = padding

    # batched per-block unique: sort each row, mark firsts, rank via cumsum
    SENT = np.iinfo(np.int32).max
    keyed = np.where(flat >= 0, flat, SENT)
    ord_idx = np.argsort(keyed, axis=1, kind="stable")
    skey = np.take_along_axis(keyed, ord_idx, 1)
    is_new = np.empty_like(skey, dtype=bool)
    is_new[:, 0] = skey[:, 0] != SENT
    is_new[:, 1:] = (skey[:, 1:] != skey[:, :-1]) & (skey[:, 1:] != SENT)
    local_sorted = np.cumsum(is_new, axis=1) - 1      # rank among uniques
    m_per_block = is_new.sum(1)
    max_m = int(m_per_block.max(initial=1))
    M = -(-max(max_m, 1) // node_pad) * node_pad

    # per-block unique node ids, padded to M (pad rows point at node 0 but
    # are never addressed by W, and their stats are overwritten below)
    nodes_pad = np.zeros((NB, M), np.int32)
    rows_b, cols_b = np.nonzero(is_new)
    nodes_pad[rows_b, local_sorted[rows_b, cols_b]] = skey[rows_b, cols_b]
    _pt.lap("batched unique")

    # local index of every (slot, hop) path entry, then ONE global
    # scatter-add into W
    local = np.empty_like(local_sorted)
    np.put_along_axis(local, ord_idx, np.maximum(local_sorted, 0), 1)
    local = local.reshape(NB, TS, P)
    ok = bp.reshape(NB, TS, P) >= 0
    on_device = (isinstance(index.inv_var_T, jax.Array)
                 and next(iter(index.inv_var_T.devices())).platform
                 != "cpu")
    if on_device:
        # build W in HBM from the small (NB, TS, P) pieces: uploading a
        # materialized (NB, M, TS) W is ~3 GB at 1M and the relay's
        # large-buffer h2d collapses (~19 MB/s measured -> 160 s);
        # local+weights are ~30x smaller
        W = _build_W_device(
            jnp.asarray(np.where(ok, local, -1).astype(np.int32)),
            jnp.asarray(bw.reshape(NB, TS, P)), M, TS)
    else:
        W = np.zeros((NB, M, TS), np.float32)
        blk_i, slot_i, hop_i = np.nonzero(ok)
        np.add.at(W, (blk_i, local[blk_i, slot_i, hop_i], slot_i),
                  bw.reshape(NB, TS, P)[blk_i, slot_i, hop_i])
    _pt.lap("W scatter", sync=W if on_device else None)

    pad_mask = np.arange(M)[None, :] >= m_per_block[:, None]
    if on_device:
        # stats stay in HBM: upload the (NB, M) node table and gather the
        # per-block replicas on device (the host round trip of the GEMM
        # terms costs minutes through the device relay at 1M scale)
        ivt_b, movt_b, const_b = _gather_blocked_stats_device(
            index.inv_var_T, index.mu_over_var_T, index.const,
            jnp.asarray(nodes_pad.astype(np.int32)),
            jnp.asarray(pad_mask), jnp.dtype(dtype).name,
        )
        _pt.lap("device gather", sync=const_b)
        out = BlockedIndex(
            ivt_b=ivt_b, movt_b=movt_b, const_b=const_b,
            W=W.astype(jnp.dtype(dtype)),
            valid=jnp.asarray(valid), sid_of_slot=jnp.asarray(sid_of_slot),
        )
        _pt.lap("W cast", sync=out.W)
        return out

    ivt = np.asarray(index.inv_var_T)               # (D, N)
    movt = np.asarray(index.mu_over_var_T)
    const = np.asarray(index.const)

    ivt_b = np.ascontiguousarray(ivt.T[nodes_pad])      # (NB, M, D)
    ivt_b[pad_mask] = 1.0
    movt_b = np.ascontiguousarray(movt.T[nodes_pad])
    movt_b[pad_mask] = 0.0
    const_b = const[nodes_pad]
    const_b[pad_mask] = 0.0

    return BlockedIndex(
        ivt_b=jnp.asarray(ivt_b, dtype), movt_b=jnp.asarray(movt_b, dtype),
        const_b=jnp.asarray(const_b), W=jnp.asarray(W, dtype),
        valid=jnp.asarray(valid), sid_of_slot=jnp.asarray(sid_of_slot),
    )


def _build_blocked_index_device(index: PredictionIndex, TS: int,
                                node_pad: int, dtype, _pt) -> BlockedIndex:
    """Fully device-resident blocked build (see build_blocked_index)."""
    S, P = index.paths.shape
    NB = max(1, -(-S // TS))
    order = index.sentence_order.astype(jnp.int32)
    pad = NB * TS - S
    if pad:
        order_pad = jnp.concatenate(
            [order, jnp.full((pad,), -1, jnp.int32)])
    else:
        order_pad = order
    bp, bw, ord_idx, skey, is_new, max_m = _block_key_stage(
        index.paths, index.path_weights, order_pad, TS)
    M = -(-max(int(max_m), 1) // node_pad) * node_pad  # one scalar d2h
    _pt.lap("device key stage")
    nodes_pad, local, pad_mask = _block_scatter_stage(
        bp, ord_idx, skey, is_new, M, TS)
    W = _build_W_device(local, bw.reshape(NB, TS, P), M, TS)
    ivt_b, movt_b, const_b = _gather_blocked_stats_device(
        index.inv_var_T, index.mu_over_var_T, index.const,
        nodes_pad, pad_mask, jnp.dtype(dtype).name)
    _pt.lap("device scatter+stats", sync=const_b)
    out = BlockedIndex(
        ivt_b=ivt_b, movt_b=movt_b, const_b=const_b,
        W=W.astype(jnp.dtype(dtype)),
        valid=(order_pad >= 0).reshape(NB, TS),
        sid_of_slot=jnp.maximum(order_pad, 0).reshape(NB, TS),
    )
    _pt.lap("W cast", sync=out.W)
    return out


@functools.partial(jax.jit, static_argnames=("TS",))
def _block_key_stage(paths, weights, order_pad, TS: int):
    """Device stage 1 of the blocked build: gather each block's sentence
    paths (leaf order), sort the keyed path entries per block, and mark
    first occurrences.  Returns the max per-block unique count as a
    traced scalar — the ONLY value the host needs (to fix the static M
    of stage 2)."""
    safe = jnp.maximum(order_pad, 0)
    valid = order_pad >= 0
    bp = jnp.where(valid[:, None], paths[safe], jnp.int32(-1))
    bw = jnp.where(valid[:, None], weights[safe], 0.0)
    P = paths.shape[1]
    NB = order_pad.shape[0] // TS
    flat = bp.reshape(NB, TS * P)
    SENT = jnp.int32(np.iinfo(np.int32).max)
    keyed = jnp.where(flat >= 0, flat, SENT)
    ord_idx = jnp.argsort(keyed, axis=1).astype(jnp.int32)
    skey = jnp.take_along_axis(keyed, ord_idx, 1)
    is_new = jnp.concatenate([
        (skey[:, :1] != SENT),
        (skey[:, 1:] != skey[:, :-1]) & (skey[:, 1:] != SENT),
    ], axis=1)
    m_per_block = jnp.sum(is_new, axis=1)
    return bp, bw, ord_idx, skey, is_new, jnp.max(m_per_block)


@functools.partial(jax.jit, static_argnames=("M", "TS"))
def _block_scatter_stage(bp, ord_idx, skey, is_new, M: int, TS: int):
    """Device stage 2: per-block unique node table (NB, M) + the local
    index of every (slot, hop) path entry, both via flat scatters."""
    NB = ord_idx.shape[0]
    P = bp.shape[1]
    local_sorted = jnp.cumsum(is_new, axis=1) - 1
    rows = jnp.arange(NB, dtype=jnp.int32)[:, None]
    tgt = jnp.where(is_new, jnp.minimum(local_sorted, M - 1), M)
    nodes_pad = jnp.zeros((NB, M + 1), jnp.int32).at[rows, tgt].set(
        skey, mode="drop")[:, :M]
    local = jnp.zeros_like(ord_idx).at[rows, ord_idx].set(
        jnp.maximum(local_sorted, 0).astype(jnp.int32))
    local = local.reshape(NB, TS, P)
    ok = bp.reshape(NB, TS, P) >= 0
    m_per_block = jnp.sum(is_new, axis=1)
    pad_mask = jnp.arange(M, dtype=jnp.int32)[None, :] >= \
        m_per_block[:, None]
    return nodes_pad, jnp.where(ok, local, jnp.int32(-1)), pad_mask


@functools.partial(jax.jit, static_argnames=("M", "TS"))
def _build_W_device(local, bw, M: int, TS: int):
    """Scatter-add the (NB, TS, P) per-hop path weights into the dense
    (NB, M, TS) block-local weight tensor, in HBM.  local == -1 drops."""
    NB = local.shape[0]
    b = jax.lax.broadcasted_iota(jnp.int32, local.shape, 0)
    t = jax.lax.broadcasted_iota(jnp.int32, local.shape, 1)
    ok = local >= 0
    idx = (b * M + jnp.maximum(local, 0)) * TS + t
    idx = jnp.where(ok, idx, NB * M * TS)
    W = jnp.zeros((NB * M * TS,), jnp.float32).at[idx.reshape(-1)].add(
        jnp.where(ok, bw, 0.0).reshape(-1), mode="drop")
    return W.reshape(NB, M, TS)


@functools.partial(jax.jit, static_argnames=("dtype",))
def _gather_blocked_stats_device(inv_T, mov_T, const, nodes_pad, pad_mask,
                                 dtype: str):
    dt = jnp.dtype(dtype)
    ivt_b = jnp.where(pad_mask[..., None], 1.0,
                      inv_T.T[nodes_pad]).astype(dt)
    movt_b = jnp.where(pad_mask[..., None], 0.0,
                       mov_T.T[nodes_pad]).astype(dt)
    const_b = jnp.where(pad_mask, 0.0, const[nodes_pad])
    return ivt_b, movt_b, const_b


def blocked_scores(bidx: BlockedIndex, queries: jnp.ndarray) -> jnp.ndarray:
    """(B, D) -> (B, NB, TS) path scores via three batched matmuls.

    f32 terms contract at HIGHEST precision (bf16 MXU passes flip top-k
    ties); bf16 terms (see ``build_blocked_index(dtype=...)``) contract
    natively with f32 accumulation — the approximate sweep a downstream
    re-rank makes exact."""
    lo = bidx.ivt_b.dtype != jnp.float32
    prec = jax.lax.Precision.DEFAULT if lo else jax.lax.Precision.HIGHEST
    q = queries.astype(bidx.ivt_b.dtype)
    nlp = (
        jnp.einsum("bd,smd->sbm", q, bidx.movt_b, precision=prec,
                   preferred_element_type=jnp.float32)
        - 0.5 * jnp.einsum("bd,smd->sbm", jnp.square(q), bidx.ivt_b,
                           precision=prec,
                           preferred_element_type=jnp.float32)
        + bidx.const_b[:, None, :]
    )                                                  # (NB, B, M)
    scores = jnp.einsum("sbm,smt->bst", nlp.astype(bidx.W.dtype), bidx.W,
                        precision=prec,
                        preferred_element_type=jnp.float32)
    return jnp.where(bidx.valid[None, :, :], scores, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("k", "approx", "recall_target"))
def blocked_query_topk(bidx: BlockedIndex, queries: jnp.ndarray, k: int,
                       approx: bool = False, recall_target: float = 0.95):
    """Batched top-k over the blocked scores -> (scores, sentence ids).

    ``approx=True`` selects with ``jax.lax.approx_max_k`` (TPU-native
    PartialReduce, ~0.95 expected per-element recall) instead of the exact
    sort — the right trade when the result is a CANDIDATE POOL feeding the
    exact re-rank (``_rerank_step``): the epilogue top-``rerank`` over the
    (B, NB*TS) score matrix is the dominant non-matmul cost of the blocked
    sweep at 100k+, and pool membership, not pool order, is all that
    matters downstream.  Exact callers (rerank=0 path-score serving, tests)
    keep the default."""
    scores = blocked_scores(bidx, queries)
    B, NB, TS = scores.shape
    flat = scores.reshape(B, NB * TS)
    k = min(k, NB * TS)
    if approx and k < NB * TS:
        top, pos = jax.lax.approx_max_k(flat, k, recall_target=recall_target)
    else:
        top, pos = jax.lax.top_k(flat, k)
    sids = bidx.sid_of_slot.reshape(-1)[pos]
    return top, sids


@functools.partial(jax.jit, static_argnames=("k", "rerank"))
def blocked_query_topk_rerank(bidx: BlockedIndex, index: PredictionIndex,
                              queries: jnp.ndarray, k: int,
                              rerank: int = 128):
    """Blocked MXU scoring for the candidate sweep + leaf-log-prob re-rank
    of the top-``rerank`` (see ``query_topk_rerank``)."""
    scores = blocked_scores(bidx, queries)
    B, NB, TS = scores.shape
    flat = scores.reshape(B, NB * TS)
    c = min(max(rerank, k), NB * TS)
    cand_scores, pos = jax.lax.top_k(flat, c)
    cand = bidx.sid_of_slot.reshape(-1)[pos].astype(jnp.int32)
    return _leaf_lp_rerank(index, queries, cand, cand_scores,
                           min(k, c))


# ---------------------------------------------------------------------------
# fused flat scoring — the corpus sweep as ONE (B, 2D) @ (2D, S) GEMM
# ---------------------------------------------------------------------------

class FusedIndex(NamedTuple):
    """Pre-associated per-sentence score coefficients.

    The path score is linear in the per-node log-prob terms, so the W
    contraction of the blocked form can be associated INTO the index:

        score[b, t] = sum_m nlp[b, m] W[m, t]
                    = q_b . A_t  -  0.5 q_b^2 . B_t  +  c_t
        A_t = sum_p w[t,p] * mu_over_var[paths[t,p]]
        B_t = sum_p w[t,p] * inv_var[paths[t,p]]
        c_t = sum_p w[t,p] * const[paths[t,p]]

    Stacking ``GT = [A | -0.5 B]^T`` (2D, S) turns the whole corpus sweep
    into one ``[q, q^2] @ GT`` matmul + bias — the same shape as the exact
    flat baseline (bench/baselines.py) but ranking by the COBWEB path
    score.  vs the blocked sweep (three batched einsums over (NB, M, ·)
    replicas): ~4.5x fewer FLOPs, ~4.5x less HBM per sweep, ~5x smaller
    index, and none of the block/node-replication build machinery.
    Scores are identical in exact arithmetic (only associativity moved),
    so it feeds the same approx-pool + exact re-rank pipeline.

    Row t IS sentence id t (no leaf ordering needed — there is no block
    locality to engineer).  Serving dtype bf16 pairs with the exact
    stored-embedding re-rank exactly like the bf16 blocked index.
    """

    GT: jnp.ndarray     # (2D, Sp) [A | -0.5 B]^T, serving dtype
    c: jnp.ndarray      # (Sp,) f32 bias, 0 on padding rows
    valid: jnp.ndarray  # (Sp,) bool — False on padding rows

    @property
    def num_slots(self) -> int:
        return self.c.shape[0]


_FUSED_ROW_BUCKET = 2048  # row-padding quantum (shape reuse across builds)


@functools.partial(jax.jit, static_argnames=("Sp", "dtype"))
def _build_fused_device(paths, weights, inv_T, mov_T, const,
                        Sp: int, dtype: str):
    """Accumulate the per-sentence coefficients with one (S,)-row gather
    per path hop (P is small; rows are gather-rate cheap next to the
    blocked build's batched-unique + W scatter).  f32 accumulation, cast
    to the serving dtype at the end."""
    S, P = paths.shape
    D = inv_T.shape[0]
    movt = mov_T.T                                     # (N, D)
    ivt = inv_T.T

    def hop(p, acc):
        A, Bm, c = acc
        ids = jax.lax.dynamic_index_in_dim(paths, p, axis=1, keepdims=False)
        w = jax.lax.dynamic_index_in_dim(weights, p, axis=1, keepdims=False)
        ok = ids >= 0
        safe = jnp.maximum(ids, 0)
        wm = jnp.where(ok, w, 0.0)
        A = A + wm[:, None] * movt[safe]
        Bm = Bm + wm[:, None] * ivt[safe]
        c = c + wm * const[safe]
        return A, Bm, c

    A, Bm, c = jax.lax.fori_loop(
        0, P, hop,
        (jnp.zeros((S, D), jnp.float32), jnp.zeros((S, D), jnp.float32),
         jnp.zeros((S,), jnp.float32)))
    G = jnp.concatenate([A, -0.5 * Bm], axis=1)        # (S, 2D)
    GT = jnp.zeros((2 * D, Sp), jnp.dtype(dtype)).at[:, :S].set(
        G.T.astype(jnp.dtype(dtype)))
    cp = jnp.zeros((Sp,), jnp.float32).at[:S].set(c)
    valid = jnp.arange(Sp, dtype=jnp.int32) < S
    return GT, cp, valid


def build_fused_index(index: PredictionIndex,
                      dtype=jnp.float32) -> FusedIndex:
    """Derive the fused form from a built PredictionIndex — one jitted
    device pass over the path hops; no host structure work at all."""
    S = index.paths.shape[0]
    Sp = -(-max(S, 1) // _FUSED_ROW_BUCKET) * _FUSED_ROW_BUCKET
    GT, c, valid = _build_fused_device(
        jnp.asarray(index.paths), jnp.asarray(index.path_weights),
        jnp.asarray(index.inv_var_T), jnp.asarray(index.mu_over_var_T),
        jnp.asarray(index.const), Sp, jnp.dtype(dtype).name)
    return FusedIndex(GT=GT, c=c, valid=valid)


@functools.partial(jax.jit,
                   static_argnames=("P", "prior_var", "acuity", "dtype"))
def _fused_block_from_state(counts, means, m2s, parent, leaf_block, lw,
                            P: int, prior_var: float, acuity: bool,
                            dtype: str):
    """ONE sentence block of the stats-free fused build: chase each leaf's
    parent chain in GLOBAL state-id space (lane * cap + local), derive the
    per-node GEMM terms ON THE FLY from the raw forest statistics, and
    accumulate the fused coefficients — the ``(D, N_nodes)``
    inv_var/mu_over_var arrays of the flatten path are never materialized
    (at 4M sentences they alone are ~8 GB of HBM next to an ~8.6 GB forest
    state).  Per-node math mirrors ``_compact_stats_device`` exactly;
    weights mirror the flatten's ``lw[level]/path_len`` (chains run
    leaf->root, so the level of hop p is ``plen - 1 - p`` — the weighted
    SUM is order-free).

    Returns ``(G (2D, Bs) dtype, c (Bs,) f32, done bool)`` where ``done``
    is False iff some chain did not reach a root within ``P`` hops (the
    caller escalates P).  ``leaf_block`` rows < 0 are padding (zero
    coefficients)."""
    K, cap, D = means.shape
    cf = jnp.reshape(counts, (K * cap,))
    mf = jnp.reshape(means, (K * cap, D))
    m2f = jnp.reshape(m2s, (K * cap, D))
    pf = jnp.reshape(parent, (K * cap,))

    def step(cur, _):
        lane = jnp.where(cur >= 0, cur // cap, 0)
        loc = pf[jnp.maximum(cur, 0)]
        nxt = jnp.where((cur >= 0) & (loc >= 0), loc + lane * cap,
                        jnp.int32(-1))
        return nxt, cur

    cur, chains = jax.lax.scan(step, leaf_block.astype(jnp.int32), None,
                               length=P)
    chains = chains.T                                    # (Bs, P) leaf->root
    done = jnp.all(cur < 0)
    plen = jnp.sum(chains >= 0, axis=1).astype(jnp.int32)
    inv_plen = jnp.where(plen > 0,
                         1.0 / jnp.maximum(plen, 1).astype(jnp.float32), 0.0)

    def hop(p, acc):
        A, Bm, c = acc
        ids = jax.lax.dynamic_index_in_dim(chains, p, axis=1, keepdims=False)
        ok = ids >= 0
        safe = jnp.maximum(ids, 0)
        cnt = cf[safe]
        mu = mf[safe]
        m2 = m2f[safe]
        sc = jnp.where(cnt > 0, cnt, 1.0)[:, None]
        ml = m2 / sc
        if acuity:
            v = jnp.maximum(ml, prior_var)
        else:
            v = ml + prior_var
        v = jnp.where(cnt[:, None] > 0, v, prior_var)
        inv = 1.0 / v
        mov = mu * inv
        cns = -0.5 * (jnp.sum(jnp.square(mu) * inv, axis=-1)
                      + jnp.sum(jnp.log(v), axis=-1))
        lvl = jnp.clip(plen - 1 - p, 0, P - 1)
        w = jnp.where(ok, lw[lvl] * inv_plen, 0.0)
        A = A + w[:, None] * mov
        Bm = Bm + w[:, None] * inv
        c = c + w * cns
        return A, Bm, c

    Bs = leaf_block.shape[0]
    A, Bm, c = jax.lax.fori_loop(
        0, P, hop,
        (jnp.zeros((Bs, D), jnp.float32), jnp.zeros((Bs, D), jnp.float32),
         jnp.zeros((Bs,), jnp.float32)))
    G = jnp.concatenate([A, -0.5 * Bm], axis=1)          # (Bs, 2D)
    return G.T.astype(jnp.dtype(dtype)), c, done


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _fused_write_block(GT, c, Gb, cb, start):
    """Write one block's coefficients into the preallocated fused arrays
    (donated: XLA updates in place — no second GT replica at scale)."""
    GT = jax.lax.dynamic_update_slice(GT, Gb, (0, start))
    c = jax.lax.dynamic_update_slice(c, cb, (start,))
    return GT, c


def build_fused_from_state(cfg, stacked_state, leaf_global: np.ndarray,
                           level_weights: Sequence[float]
                           = DEFAULT_LEVEL_WEIGHTS,
                           dtype=jnp.float32,
                           block: int = 1 << 19,
                           chase_depth: int = 32) -> FusedIndex:
    """FusedIndex straight from a stacked forest state — the STATS-FREE
    build: no PredictionIndex, no BFS numbering, no ``(D, N_nodes)``
    stats arrays.  Equivalent (same scores) to
    ``build_fused_index(build_flat_forest_index(...))`` but its device
    working set is one sentence block at a time next to the resident
    state, which is what lets a 4M-sentence forest build its serving
    index inside one v5e chip's HBM.

    ``leaf_global[s]`` is ``lane * cap + local_leaf`` (as in
    ``build_flat_forest_index``); ``chase_depth`` is the starting parent-
    chase scan budget, doubled automatically until every chain reaches a
    root.  Matches the reference's prediction-index scoring
    (CobwebWrapper.py:91-208) through the same fused association as
    ``build_fused_index``."""
    pt = _PhaseTimer("fused-state")
    S = int(len(leaf_global))
    Bs = int(min(block, max(_FUSED_ROW_BUCKET,
                            -(-max(S, 1) // _FUSED_ROW_BUCKET)
                            * _FUSED_ROW_BUCKET)))
    Bs = -(-Bs // _FUSED_ROW_BUCKET) * _FUSED_ROW_BUCKET
    n_blocks = -(-max(S, 1) // Bs)
    Sp = n_blocks * Bs
    leaf_pad = np.full((Sp,), -1, np.int64)
    leaf_pad[:S] = np.asarray(leaf_global, np.int64)
    # leaf ids are lane*cap + local: int32 is safe up to 2^31 slots
    # (K=512 x cap 16k = 8.4M at 4M sentences — far below); assert anyway
    if Sp and leaf_pad.max(initial=-1) >= np.iinfo(np.int32).max:
        raise ValueError("forest slot ids overflow int32")
    leaf_pad = leaf_pad.astype(np.int32)

    st = stacked_state
    D = int(st.means.shape[-1])
    P = max(8, -(-int(chase_depth) // 8) * 8)
    GT = jnp.zeros((2 * D, Sp), jnp.dtype(dtype))
    c = jnp.zeros((Sp,), jnp.float32)
    s0 = 0
    while s0 < Sp:
        lw = np.ones((P,), np.float32)
        lw[: min(len(level_weights), P)] = np.asarray(
            list(level_weights)[:P], np.float32)
        Gb, cb, done = _fused_block_from_state(
            st.counts, st.means, st.m2s, st.parent,
            jnp.asarray(leaf_pad[s0:s0 + Bs]), jnp.asarray(lw),
            P, float(cfg.prior_var), bool(cfg.acuity_cutoff),
            jnp.dtype(dtype).name)
        if not bool(done):          # chain deeper than the scan: escalate
            P *= 2
            continue
        GT, c = _fused_write_block(GT, c, Gb, cb,
                                   jnp.asarray(s0, jnp.int32))
        s0 += Bs
    valid = (jnp.arange(Sp, dtype=jnp.int32) < S)
    pt.lap("blocks", sync=c)
    return FusedIndex(GT=GT, c=c, valid=valid)


def fused_scores(fidx: FusedIndex, queries: jnp.ndarray,
                 score_dtype: str = "float32") -> jnp.ndarray:
    """(B, D) -> (B, Sp) path scores via one GEMM.  f32 indexes contract
    at HIGHEST precision (exact path-score ORDER contract); bf16 indexes
    contract natively with f32 accumulation — the approximate sweep the
    downstream exact re-rank makes exact.

    ``score_dtype``: dtype of the MATERIALIZED (B, Sp) score matrix.
    The sweep is HBM-bound and at scale the score round-trip dominates
    the coefficient stream itself (B=1024 x 1M: 8.2 GB write+read f32
    vs 0.5 GB of GT) — emitting bf16 scores (f32 GEMM accumulation; the
    cast fuses into the GEMM epilogue) halves that term.  Only valid
    for candidate-POOL selection: bf16 shuffles near-ties, the exact
    re-rank restores final order."""
    lo = fidx.GT.dtype != jnp.float32
    prec = jax.lax.Precision.DEFAULT if lo else jax.lax.Precision.HIGHEST
    q = queries.astype(jnp.float32)
    qq = jnp.concatenate([q, jnp.square(q)], axis=1).astype(fidx.GT.dtype)
    s = jnp.matmul(qq, fidx.GT, precision=prec,
                   preferred_element_type=jnp.float32) + fidx.c[None, :]
    s = jnp.where(fidx.valid[None, :], s, -jnp.inf)
    return s.astype(jnp.dtype(score_dtype))


# Column count above which the pool-selection paths would switch from
# jax.lax.approx_max_k to the strided two-level reduction below.
# MEASURED NEGATIVE RESULT (pipeline_probe r5, 1M/B=1024): the grouped
# formulation lowers ~1.5x SLOWER end-to-end than approx_max_k (130.5 vs
# 84.8 ms/batch) in BOTH the max+argmax and the packed-uint single-max
# variants, even though its pool quality is measurably better
# (overlap-vs-exact-pool 0.933 vs approx's 0.842) — the strided
# middle-axis reduction over the GEMM output forces a bad layout on this
# compiler.  Disabled by default (threshold unreachable); kept selectable
# for other backends and as the recorded alternative.
_GROUPED_POOL_MIN_COLS = 1 << 62
_GROUP = 16


def grouped_pool_topk(scores: jnp.ndarray, k: int, group: int = _GROUP):
    """Candidate-POOL top-k via a strided two-level reduction.

    Pass 1 views the (B, Sp) scores as ``group`` interleaved column
    blocks — column i of the reduced matrix covers ids
    ``{i, i + Sp/g, i + 2*Sp/g, ...}`` — and takes max+argmax over the
    block axis (ONE streaming pass, no sorting network).  Pass 2 runs the
    ordinary top-k on the ``group``-times-smaller reduced matrix and maps
    winners back through the argmax.

    Pool-membership contract (NOT an exact top-k): a true top-k id is
    dropped only when a strictly higher-scoring id shares its strided
    group — probability ~rank/(Sp/g) per candidate (~1e-3 at 1M for the
    ranks that matter), measured overlap vs exact top-k > 0.995.  The
    STRIDE matters: near-duplicate clusters sit on ADJACENT sentence ids
    (insert order), so contiguous grouping would collapse whole dup
    groups into one survivor — exactly the ids the hard regime needs in
    the pool.  Downstream exact re-rank restores final order, same as
    the approx_max_k path it replaces."""
    B, Sp = scores.shape
    g = group
    while Sp % g:       # Sp is _FUSED_ROW_BUCKET-aligned; degrade safely
        g //= 2
    if g <= 1 or k >= Sp // g:
        return jax.lax.top_k(scores, min(k, Sp))
    cols = Sp // g
    view = scores.astype(jnp.float32).reshape(B, g, cols)
    # Pass 1 is a PLAIN max over a packed uint32 key — NOT max+argmax:
    # the variadic (value, index) reduce lowered ~70 ms slower than the
    # whole approx_max_k it was replacing (probe round-5 run 1), and the
    # f32 top-k in pass 2 must not be lax.top_k either (full sorting
    # network, the r3 "top_k costs 5x the matmuls" lesson; probe run 2).
    # Pack: monotone-map f32 -> uint32 (sign-flip trick), zero the low
    # log2(g) mantissa bits (relative error 2^-19 — irrelevant for pool
    # selection), put the group-member index j there; one uint max then
    # recovers BOTH the (quantized) max score and its member.  A second
    # plain f32 max feeds pass 2's approx_max_k with clean floats (the
    # two sibling reduces fuse into one streaming pass over the scores).
    u = jax.lax.bitcast_convert_type(view, jnp.uint32)
    neg = (u >> 31) == 1
    u = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))
    jbits = jnp.uint32(g - 1)
    j = jax.lax.broadcasted_iota(jnp.uint32, (B, g, cols), 1)
    packed = (u & ~jbits) | j
    pmax = jnp.max(packed, axis=1)                     # (B, cols)
    gmax = jnp.max(view, axis=1)                       # (B, cols) f32
    top, pos = jax.lax.approx_max_k(gmax, k, recall_target=0.95)
    jsel = (jnp.take_along_axis(pmax, pos, axis=1) & jbits).astype(
        jnp.int32)
    ids = jsel * cols + pos
    return top, ids


@functools.partial(jax.jit,
                   static_argnames=("k", "approx", "recall_target",
                                    "score_dtype"))
def fused_query_topk(fidx: FusedIndex, queries: jnp.ndarray, k: int,
                     approx: bool = False, recall_target: float = 0.95,
                     score_dtype: str = "float32"):
    """Batched top-k over the fused scores -> (scores, sentence ids).
    Positions ARE sentence ids (identity row order); ``approx`` selects
    the candidate pool approximately — ``grouped_pool_topk`` above
    ``_GROUPED_POOL_MIN_COLS`` columns (where approx_max_k's partial
    reduce dominates the whole sweep), ``jax.lax.approx_max_k`` below
    (see ``blocked_query_topk`` for when that is the right trade).
    ``score_dtype="bfloat16"`` halves the dominant HBM term at scale —
    pool-selection paths only (see ``fused_scores``); returned scores
    are upcast f32."""
    scores = fused_scores(fidx, queries, score_dtype)
    Sp = scores.shape[1]
    k = min(k, Sp)
    if approx and k < Sp:
        if Sp >= _GROUPED_POOL_MIN_COLS and k <= Sp // _GROUP:
            top, pos = grouped_pool_topk(scores, k)
        else:
            top, pos = jax.lax.approx_max_k(scores, k,
                                            recall_target=recall_target)
    else:
        top, pos = jax.lax.top_k(scores, k)
    return top.astype(jnp.float32), pos


@functools.partial(jax.jit,
                   static_argnames=("k", "c", "bs", "approx",
                                    "recall_target", "score_dtype"))
def fused_query_rerank(fidx: FusedIndex, emb: jnp.ndarray,
                       queries: jnp.ndarray, queries_store: jnp.ndarray,
                       k: int, c: int,
                       wemb: jnp.ndarray = None,
                       half_norm2: jnp.ndarray = None,
                       n_valid: jnp.ndarray = None,
                       bs: int = 0,
                       approx: bool = True, recall_target: float = 0.95,
                       score_dtype: str = "bfloat16",
                       prior_var: jnp.ndarray = jnp.float32(1.0)):
    """The WHOLE product serving path as ONE device program: fused sweep
    -> approx candidate pool [-> whitened-L2 backstop pool -> union] ->
    exact stored-embedding re-rank -> (B, k).

    One dispatch instead of three: through the network relay every
    synchronous program round trip costs ~25-30 ms of latency floor, so
    splitting sweep/backstop/re-rank across separate jit calls taxed every
    serving batch with extra floors (VERDICT r3 #6 — the e2e path measured
    19.5% of roofline while its pool stage alone ran at 65-75%).  The
    constituent jitted functions inline here; results are bitwise
    identical to the split dispatch."""
    cs, cand = fused_query_topk(fidx, queries, c, approx=approx,
                                recall_target=recall_target,
                                score_dtype=score_dtype)
    if bs:
        bcs, bcand = backstop_topk(wemb, half_norm2, queries, bs, n_valid,
                                   approx=approx,
                                   recall_target=recall_target)
        cand, cs = union_candidates(cand, cs, bcand, bcs)
    return exact_rerank(emb, queries_store, cand, cs, k, prior_var)


# ---------------------------------------------------------------------------
# beam-search query (reference best-first tree search, batched)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("beam_width", "max_depth", "k"))
def beam_search_topk(index: PredictionIndex, queries: jnp.ndarray,
                     k: int, beam_width: int = 64, max_depth: int = 16):
    """Fixed-width beam search down the tree for a (B, D) query batch.

    TPU analog of CobwebTorchTree._cobweb_categorize (:235-289): instead of a
    host heap with a node budget, keep the ``beam_width`` best nodes per
    level by diagonal-Gaussian log-prob (the same key the reference pushes to
    its heap, :273-285), expand children each step (``lax.scan`` over depth),
    and collect encountered leaves.  Cost O(depth * beam * fanout * D) per
    query — independent of corpus size.

    Returns (leaf_scores (B, Wk), leaf_nodes (B, Wk)) with Wk >= k candidate
    leaf *nodes* sorted by score; map to sentences via
    ``index.leaf_sentence_start/count``.
    """
    B = queries.shape[0]
    F = index.children.shape[1]
    W = beam_width

    def node_lp(node_ids):
        # (B, W) node ids -> (B, W) log-probs, via gathered GEMM terms
        # small W: direct gather + elementwise (vs full GEMM over all nodes)
        safe = jnp.maximum(node_ids, 0)
        ivt = index.inv_var_T.T[safe]        # (B, W, D)
        movt = index.mu_over_var_T.T[safe]   # (B, W, D)
        cst = index.const[safe]              # (B, W)
        x = queries[:, None, :]
        return (jnp.sum(x * movt, -1) - 0.5 * jnp.sum(jnp.square(x) * ivt, -1)
                + cst)

    NEG = jnp.float32(-3e38)

    root0 = jnp.zeros((B, 1), jnp.int32)  # compact root is 0 (BFS order)
    beam_nodes = jnp.concatenate(
        [root0, jnp.full((B, W - 1), -1, jnp.int32)], axis=1
    )
    beam_scores = jnp.where(beam_nodes >= 0, node_lp(beam_nodes), NEG)

    def mask_leaves(nodes, scores):
        """(nodes, scores) restricted to retrievable-leaf entries."""
        is_leaf = (nodes >= 0) & (
            index.leaf_sentence_count[jnp.maximum(nodes, 0)] > 0
        )
        return (jnp.where(is_leaf, nodes, -1),
                jnp.where(is_leaf, scores, NEG))

    def step(carry, depth):
        beam_nodes, beam_scores = carry
        # expand: (B, W, F) children
        safe = jnp.maximum(beam_nodes, 0)
        kids = jnp.where(
            (beam_nodes >= 0)[:, :, None], index.children[safe], -1
        ).reshape(B, W * F)
        kid_scores = jnp.where(kids >= 0, node_lp(kids), NEG)
        top, ids = jax.lax.top_k(kid_scores, W)
        new_nodes = jnp.take_along_axis(kids, ids, axis=1)
        new_nodes = jnp.where(top > NEG / 2, new_nodes, -1)
        # emit this level's leaves as a scan output (one segment per depth)
        # instead of re-sorting a running ring every level
        return (new_nodes, top), mask_leaves(new_nodes, top)

    root_leaf = mask_leaves(beam_nodes, beam_scores)  # degenerate tiny trees
    (beam_nodes, beam_scores), (seg_nodes, seg_scores) = jax.lax.scan(
        step, (beam_nodes, beam_scores), jnp.arange(max_depth)
    )
    all_nodes = jnp.concatenate(
        [jnp.transpose(seg_nodes, (1, 0, 2)).reshape(B, max_depth * W),
         root_leaf[0]], axis=1,
    )
    all_scores = jnp.concatenate(
        [jnp.transpose(seg_scores, (1, 0, 2)).reshape(B, max_depth * W),
         root_leaf[1]], axis=1,
    )
    leaf_cap = min(W * max_depth, W * max_depth // 2 + k)
    lscores, ids = jax.lax.top_k(all_scores, leaf_cap)
    leaves = jnp.take_along_axis(all_nodes, ids, axis=1)
    leaves = jnp.where(lscores > NEG / 2, leaves, -1)
    return lscores, leaves


def leaves_to_sentence_ids(index: PredictionIndex, leaf_nodes: np.ndarray,
                           k: int) -> np.ndarray:
    """Flatten ranked leaf nodes into the first k sentence ids per query.

    Host-side run-length expansion (the reference shuffles sids within a
    leaf, CobwebWrapper.py:455-456 — we keep insertion order, deterministic).
    Returns (B, k) sentence ids, -1 padded.
    """
    starts = np.asarray(index.leaf_sentence_start)
    counts = np.asarray(index.leaf_sentence_count)
    sorder = np.asarray(index.sentence_order)
    B = leaf_nodes.shape[0]
    out = np.full((B, k), -1, np.int64)
    # vectorized ragged prefix-take: per (query, candidate) compute how many
    # of the leaf's sentences still fit before k, then fill only the <= B*k
    # (row, candidate) pairs that contribute — the naive per-(B, candidate)
    # Python scan is ~30x more iterations at eval batch sizes
    safe = np.maximum(leaf_nodes, 0)
    ok = leaf_nodes >= 0
    c = np.where(ok & (starts[safe] >= 0), counts[safe], 0)  # (B, L)
    s = starts[safe]
    off = np.cumsum(c, axis=1) - c                            # exclusive
    take = np.clip(k - off, 0, c)
    rows, cols = np.nonzero(take > 0)
    for b, j in zip(rows.tolist(), cols.tolist()):
        t = take[b, j]
        o = off[b, j]
        out[b, o:o + t] = sorder[s[b, j]:s[b, j] + t]
    return out


# --------------------------------------------------------------------------- #
# Packed beam engine                                                          #
# --------------------------------------------------------------------------- #
#
# The original beam (``beam_search_topk``) gathers every beam node's FULL
# fanout-padded child slab — (B, W*F, D) rows, twice, in f32 — and the
# vforest wrapper vmapped that over K lanes.  Measured on the v5e
# (scripts/beam_microbench.py), TPU row-gathers are RATE-limited (~23M
# rows/s regardless of row bytes), so the padded slots (true fanout is
# 2-4, F is 16) and the second gather were 10x pure waste, and per-lane
# vmap scaled linearly in lanes.  The packed engine fixes all three:
#
#   * ONE interleaved stats table ``pack = [mu/var | -0.5/var]`` (N, 2D):
#     node score = dot([q, q^2], pack_row) + const — one gather, not two;
#   * VARIABLE-fanout expansion: children are CONTIGUOUS in the compact
#     BFS numbering (build_index levels-ravel construction), so the next
#     frontier is described by (first_child, n_children) runs and packed
#     into a fixed candidate budget C ~= W * avg_fanout by a row-wise
#     searchsorted over the run-length cumsum — only live children rows
#     are ever gathered;
#   * the FOREST is one beam, not K: the flat multi-root index (lanes =
#     compact rows [0, K)) makes cross-lane search a single beam whose
#     width focuses on the most promising lanes, instead of K vmapped
#     beams each paying the full gather rate.
#
# Reference role: CobwebTorchTree._cobweb_categorize heap search
# (CobwebTorchTree.py:235-289); this is the production engine for it —
# ``beam_search_topk`` stays as the budget-unlimited oracle.


class BeamIndex(NamedTuple):
    """Gather-optimal beam structures derived from a PredictionIndex."""

    pack: jnp.ndarray          # (N, 2D) [mu_over_var | -0.5*inv_var]
    const: jnp.ndarray         # (N,)
    child_start: jnp.ndarray   # (N,) first-child compact id, -1
    child_count: jnp.ndarray   # (N,)
    leaf_sentence_start: jnp.ndarray   # (N,)
    leaf_sentence_count: jnp.ndarray   # (N,)
    sentence_order: jnp.ndarray        # (S,)

    @property
    def num_nodes(self) -> int:
        return self.const.shape[0]


# beyond this node count the pack is stored bf16 (halves HBM: the pack is
# N x 2D); gathers are row-rate-limited so this costs no query time, and
# the exact re-rank restores f32 ordering on the final pool
_BEAM_PACK_BF16_NODES = 1 << 19


def build_beam_index(index: PredictionIndex,
                     pack_dtype=None) -> BeamIndex:
    """Derive the packed beam structures (one-time, on device).

    ``pack_dtype``: None = auto (f32, bf16 at >= 2^19 nodes).
    """
    children = index.children
    valid = children >= 0
    child_count = jnp.sum(valid, axis=1).astype(jnp.int32)
    # children of a node occupy CONSECUTIVE compact ids (BFS construction:
    # each level is the ravel of the previous level's children rows), so
    # the run start is the minimum valid entry
    big = jnp.int32(2**30)
    child_start = jnp.min(jnp.where(valid, children, big), axis=1)
    child_start = jnp.where(child_count > 0, child_start, -1).astype(jnp.int32)
    if pack_dtype is None:
        pack_dtype = (jnp.bfloat16 if index.const.shape[0]
                      >= _BEAM_PACK_BF16_NODES else jnp.float32)
    pack = jnp.concatenate(
        [index.mu_over_var_T.T, -0.5 * index.inv_var_T.T], axis=1
    ).astype(pack_dtype)
    return BeamIndex(
        pack=pack, const=index.const,
        child_start=child_start, child_count=child_count,
        leaf_sentence_start=index.leaf_sentence_start,
        leaf_sentence_count=index.leaf_sentence_count,
        sentence_order=index.sentence_order,
    )


def _runs_pack(starts, counts, budget: int):
    """Pack per-row (start, count) runs into ``budget`` consecutive slots.

    starts/counts: (B, W) -> (ids (B, budget) i32, valid (B, budget) bool).
    Row-wise searchsorted over the inclusive cumsum locates each output
    slot's source run; runs beyond the budget are truncated (rows are in
    beam-score order, so truncation drops the worst parents' children).
    """
    cum = jnp.cumsum(counts, axis=1)                     # (B, W) inclusive
    off = cum - counts
    t = jnp.arange(budget, dtype=jnp.int32)
    j = jax.vmap(
        lambda row: jnp.searchsorted(row, t, side="right")
    )(cum).astype(jnp.int32)                             # (B, budget)
    W = counts.shape[1]
    jc = jnp.minimum(j, W - 1)
    within = t[None, :] - jnp.take_along_axis(off, jc, 1)
    ids = jnp.take_along_axis(starts, jc, 1) + within
    valid = (j < W) & (t[None, :] < cum[:, -1:])
    return jnp.where(valid, ids, 0), valid


@functools.partial(jax.jit, static_argnames=(
    "k", "beam_width", "max_depth", "cand_budget", "n_roots"))
def beam_pack_topk(bidx: BeamIndex, queries: jnp.ndarray, k: int,
                   beam_width: int = 32, max_depth: int = 16,
                   cand_budget: int = 0, n_roots: int = 1):
    """Packed beam search -> (leaf_scores (B, M), leaf_nodes (B, M)).

    Scores are leaf log-probs (the reference heap key).  ``cand_budget``
    0 = auto (4 * effective width, multiple of 64).  ``n_roots``: the flat
    forest's lane roots are compact rows [0, n_roots); the root level is
    scored densely and the beam prunes lanes from there.
    """
    B = queries.shape[0]
    q = queries.astype(jnp.float32)
    qq = jnp.concatenate([q, jnp.square(q)], axis=1)     # (B, 2D)
    qq_c = qq.astype(bidx.pack.dtype)
    f32 = bidx.pack.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32 else None
    NEG = jnp.float32(-3e38)
    W = max(beam_width, n_roots)
    C = cand_budget or min(64 * max(1, -(-4 * W // 64)), W * 16)

    def score_rows(rows, cand):                          # (B, M, 2D) bf16/f32
        s = jax.lax.dot_general(
            qq_c, rows, (((1,), (2,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )
        return s + bidx.const[cand]

    # root level: dense over compact rows [0, n_roots)
    root_rows = jnp.broadcast_to(
        bidx.pack[:n_roots], (B, n_roots, bidx.pack.shape[1]))
    root_ids = jnp.broadcast_to(
        jnp.arange(n_roots, dtype=jnp.int32), (B, n_roots))
    root_s = score_rows(root_rows, root_ids)             # (B, n_roots)
    pad = W - n_roots
    nodes0 = jnp.concatenate(
        [root_ids, jnp.full((B, pad), -1, jnp.int32)], axis=1)
    scores0 = jnp.concatenate(
        [root_s, jnp.full((B, pad), NEG)], axis=1)

    def mask_leaves(nodes, scores):
        is_leaf = (nodes >= 0) & (
            bidx.leaf_sentence_count[jnp.maximum(nodes, 0)] > 0)
        return jnp.where(is_leaf, nodes, -1), jnp.where(is_leaf, scores, NEG)

    def step(nodes, _):
        safe = jnp.maximum(nodes, 0)
        st = bidx.child_start[safe]
        ct = jnp.where((nodes >= 0) & (st >= 0),
                       bidx.child_count[safe], 0)
        cand, valid = _runs_pack(st, ct, C)              # (B, C)
        s = jnp.where(valid, score_rows(bidx.pack[cand], cand), NEG)
        top, ids = jax.lax.top_k(s, W)
        new_nodes = jnp.where(
            top > NEG / 2, jnp.take_along_axis(cand, ids, 1), -1)
        return new_nodes, mask_leaves(new_nodes, top)

    root_leaf = mask_leaves(nodes0, scores0)             # single-node lanes
    _, (seg_nodes, seg_scores) = jax.lax.scan(
        step, nodes0, jnp.arange(max_depth))
    all_nodes = jnp.concatenate(
        [jnp.transpose(seg_nodes, (1, 0, 2)).reshape(B, max_depth * W),
         root_leaf[0]], axis=1)
    all_scores = jnp.concatenate(
        [jnp.transpose(seg_scores, (1, 0, 2)).reshape(B, max_depth * W),
         root_leaf[1]], axis=1)
    leaf_cap = min(all_scores.shape[1], max(2 * W, k))
    lscores, ids = jax.lax.top_k(all_scores, leaf_cap)
    leaves = jnp.take_along_axis(all_nodes, ids, axis=1)
    leaves = jnp.where(lscores > NEG / 2, leaves, -1)
    return lscores, leaves


@functools.partial(jax.jit, static_argnames=("k",))
def leaf_runs_to_sids(start, count, order, leaves, scores, k: int):
    """Ranked leaf runs -> first k sentence ids per query, on device.

    leaves (B, M) sorted desc by ``scores``; -1 invalid.  The device
    analog of ``leaves_to_sentence_ids`` (which stays for the host parity
    path) using the same searchsorted-over-cumsum expansion as
    ``_runs_pack``."""
    safe = jnp.maximum(leaves, 0)
    ok = (leaves >= 0) & jnp.isfinite(scores) & (scores > -3e38 / 2)
    s0 = jnp.where(ok, start[safe], -1)
    c = jnp.where(ok & (s0 >= 0), count[safe], 0)
    ids, valid = _runs_pack(jnp.maximum(s0, 0), c, k)
    sid = order[ids]
    return jnp.where(valid, sid, -1)


def beam_query_ids(bidx: BeamIndex, queries, k: int, beam_width: int = 32,
                   max_depth: int = 16, n_roots: int = 1,
                   cand_budget: int = 0) -> jnp.ndarray:
    """Packed beam -> (B, k) sentence ids (device array, -1 padded)."""
    q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
    scores, leaves = beam_pack_topk(
        bidx, q, k, beam_width=beam_width, max_depth=max_depth,
        cand_budget=cand_budget, n_roots=n_roots)
    return leaf_runs_to_sids(
        bidx.leaf_sentence_start, bidx.leaf_sentence_count,
        bidx.sentence_order, leaves, scores, k)


@functools.partial(jax.jit, static_argnames=(
    "k", "lane_width", "max_depth", "cand_budget", "n_lanes"))
def beam_pack_topk_lanes(bidx: BeamIndex, queries: jnp.ndarray, k: int,
                         lane_width: int = 16, max_depth: int = 16,
                         cand_budget: int = 0, n_lanes: int = 1,
                         roots: Optional[jnp.ndarray] = None):
    """LANE-FAIR packed beam over a flat multi-root forest index.

    The global beam (``beam_pack_topk``) prunes whole lanes on internal-
    node scores; on hard (overlapping-cluster) distributions those scores
    cannot arbitrate across lanes and recall collapses (measured 0.505 vs
    0.927 per-lane at 100k hard).  Here every lane keeps its own
    ``lane_width`` beam to the leaves — the cross-lane merge happens only
    at the calibrated leaf log-prob, like the per-lane vmapped beam this
    replaces, but the expansion is still ONE flat row-gather per level
    (vmapped per-lane gathers paid the gather rate once per lane).

    Frontier layout: (B, n_lanes, W_l) in the flat compact space; lane
    l's segment starts at its root (compact row l).  Candidate packing,
    scoring, and top-k run on the folded (B * n_lanes, ...) rows.
    Returns (leaf_scores (B, M), leaf_nodes (B, M)) merged across lanes.

    ``roots``: optional (B, n_lanes) PER-QUERY root set (compact lane-root
    rows; -1 = unused slot) — the content-routed forest's lane selection:
    each query descends only its L nearest lanes, cutting the per-level
    gather bill by K/L while the selected lanes keep full-width beams.
    ``None`` = every lane (rows [0, n_lanes)), the lane-fair default.
    """
    B = queries.shape[0]
    K, Wl = n_lanes, lane_width
    q = queries.astype(jnp.float32)
    qq = jnp.concatenate([q, jnp.square(q)], axis=1)
    qq_c = qq.astype(bidx.pack.dtype)
    f32 = bidx.pack.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32 else None
    NEG = jnp.float32(-3e38)
    # tight budget: ~4x per-lane width (avg fanout is 2-4; F=16 is the
    # pad), 16-multiple for top_k lane alignment.  XLA materializes the
    # (B*K, C, 2D) gathered rows before the dot, so every unused slot is
    # real HBM traffic, not just wasted gather rate.
    C = cand_budget or min(16 * max(1, -(-4 * Wl // 16)), Wl * 16)
    # per-lane query rows, folded: (B*K, 2D)
    qq_f = jnp.broadcast_to(qq_c[:, None, :], (B, K, qq_c.shape[1])
                            ).reshape(B * K, -1)

    def score_rows(rows, cand):                 # rows (R, M, 2D), cand (R, M)
        s = jax.lax.dot_general(
            qq_f, rows, (((1,), (2,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )
        return s + bidx.const[cand]

    # init: lane l's beam = [root_l, -1, ...] — roots are compact rows [0, K)
    if roots is None:
        roots_f = jnp.tile(jnp.arange(K, dtype=jnp.int32), B)   # (B*K,)
    else:
        roots_f = roots.astype(jnp.int32).reshape(B * K)
    nodes0 = jnp.full((B * K, Wl), -1, jnp.int32)
    nodes0 = nodes0.at[:, 0].set(roots_f)
    root_rows = bidx.pack[nodes0[:, :1].clip(0)]          # (B*K, 1, 2D)
    root_s = jnp.where(nodes0[:, :1] >= 0,
                       score_rows(root_rows, nodes0[:, :1]), NEG)
    scores0 = jnp.concatenate(
        [root_s, jnp.full((B * K, Wl - 1), NEG)], axis=1)

    def mask_leaves(nodes, scores):
        is_leaf = (nodes >= 0) & (
            bidx.leaf_sentence_count[jnp.maximum(nodes, 0)] > 0)
        return jnp.where(is_leaf, nodes, -1), jnp.where(is_leaf, scores, NEG)

    def step(nodes, _):
        safe = jnp.maximum(nodes, 0)
        st = bidx.child_start[safe]
        ct = jnp.where((nodes >= 0) & (st >= 0), bidx.child_count[safe], 0)
        cand, valid = _runs_pack(st, ct, C)               # (B*K, C)
        s = jnp.where(valid, score_rows(bidx.pack[cand], cand), NEG)
        top, ids = jax.lax.top_k(s, Wl)                   # per-lane top-k
        new_nodes = jnp.where(
            top > NEG / 2, jnp.take_along_axis(cand, ids, 1), -1)
        return new_nodes, mask_leaves(new_nodes, top)

    root_leaf = mask_leaves(nodes0, scores0)              # single-node lanes
    _, (seg_nodes, seg_scores) = jax.lax.scan(
        step, nodes0, jnp.arange(max_depth))
    # (depth, B*K, Wl) -> (B, depth*K*Wl) cross-lane flatten
    M = max_depth * K * Wl
    all_nodes = jnp.concatenate(
        [jnp.transpose(seg_nodes, (1, 0, 2)).reshape(B, M),
         root_leaf[0].reshape(B, K * Wl)], axis=1)
    all_scores = jnp.concatenate(
        [jnp.transpose(seg_scores, (1, 0, 2)).reshape(B, M),
         root_leaf[1].reshape(B, K * Wl)], axis=1)
    # k ranked leaves already yield >= k sentences (every run has >= 1);
    # the margin absorbs invalid slots without a (B, depth*K*Wl) sort
    leaf_cap = min(all_scores.shape[1], max(k + Wl, 64))
    lscores, ids = jax.lax.top_k(all_scores, leaf_cap)
    leaves = jnp.take_along_axis(all_nodes, ids, axis=1)
    leaves = jnp.where(lscores > NEG / 2, leaves, -1)
    return lscores, leaves
