"""Flat array-of-nodes Cobweb tree with a fully on-device insert path.

TPU-native redesign of the reference's pointer-graph tree
(CobwebTorchTree.py:17-401, CobwebTorchNode.py:9-805).  Design decisions
(SURVEY.md §7):

  * Structure-of-Arrays in device memory: ``counts[N]``, ``means[N,D]``,
    ``m2[N,D]``, ``parent[N]``, ``children[N,F]`` (fixed fanout F, -1
    sentinel), ``n_children[N]`` plus a free-list for node recycling.
  * The complete descend-and-restructure loop (reference
    ``CobwebTorchTree.cobweb`` :143-233) runs inside one jitted
    ``lax.while_loop`` — leaf exact-match, fringe split, and the four
    restructure operations are masked fixed-shape updates, so a whole batch
    of inserts executes as a single device computation
    (``lax.fori_loop`` over instances) with zero host round-trips.
  * Tie-breaks use a keyed PRNG (deterministic) instead of Python
    ``random()`` (CobwebTorchNode.py:362-368, 406).

The reference semantics are preserved op-for-op; the only intentional
divergences are (a) bounded fanout F with structural gating of ``new``/
``split`` when a block would overflow, and (b) deterministic tie-breaking.
"""

from __future__ import annotations

import functools
import json
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.ops import opscore
from rag_cobweb_tpu.ops.gaussian import (
    GaussStats,
    chan_merge,
    compute_var,
    welford_insert,
)

NULL = jnp.int32(-1)


class TreeState(NamedTuple):
    """Device-resident tree. N = node capacity, D = dim, F = max fanout."""

    counts: jnp.ndarray       # (N,)  f32
    means: jnp.ndarray        # (N,D) f32
    m2s: jnp.ndarray          # (N,D) f32
    parent: jnp.ndarray       # (N,)  i32, -1 for root / unallocated
    children: jnp.ndarray     # (N,F) i32, -1 sentinel
    n_children: jnp.ndarray   # (N,)  i32
    root: jnp.ndarray         # ()    i32
    n_alloc: jnp.ndarray      # ()    i32  high-water mark (root pre-allocated)
    free_stack: jnp.ndarray   # (N,)  i32
    free_top: jnp.ndarray     # ()    i32

    @property
    def capacity(self) -> int:
        return self.counts.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    @property
    def fanout(self) -> int:
        return self.children.shape[1]


def init_state(capacity: int, dim: int, fanout: int) -> TreeState:
    """Empty tree: root node allocated with count 0 (CobwebTorchTree.clear :43-50)."""
    return TreeState(
        counts=jnp.zeros((capacity,), jnp.float32),
        means=jnp.zeros((capacity, dim), jnp.float32),
        m2s=jnp.zeros((capacity, dim), jnp.float32),
        parent=jnp.full((capacity,), NULL, jnp.int32),
        children=jnp.full((capacity, fanout), NULL, jnp.int32),
        n_children=jnp.zeros((capacity,), jnp.int32),
        root=jnp.zeros((), jnp.int32),
        n_alloc=jnp.ones((), jnp.int32),
        free_stack=jnp.full((capacity,), NULL, jnp.int32),
        free_top=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# allocation helpers (free-list + high-water counter)
# ---------------------------------------------------------------------------

def _alloc(st: TreeState):
    """Pop a free slot (recycled by split) or take the next unused index."""
    use_free = st.free_top > 0
    free_idx = st.free_stack[jnp.maximum(st.free_top - 1, 0)]
    idx = jnp.where(use_free, free_idx, st.n_alloc)
    st = st._replace(
        n_alloc=jnp.where(use_free, st.n_alloc, st.n_alloc + 1),
        free_top=jnp.where(use_free, st.free_top - 1, st.free_top),
    )
    # Reset the slot.
    st = st._replace(
        counts=st.counts.at[idx].set(0.0),
        means=st.means.at[idx].set(0.0),
        m2s=st.m2s.at[idx].set(0.0),
        parent=st.parent.at[idx].set(NULL),
        children=st.children.at[idx].set(NULL),
        n_children=st.n_children.at[idx].set(0),
    )
    return st, idx


def _free(st: TreeState, idx) -> TreeState:
    return st._replace(
        free_stack=st.free_stack.at[st.free_top].set(idx),
        free_top=st.free_top + 1,
        parent=st.parent.at[idx].set(NULL),
        counts=st.counts.at[idx].set(0.0),
        n_children=st.n_children.at[idx].set(0),
        children=st.children.at[idx].set(NULL),
    )


def _node_stats(st: TreeState, idx) -> GaussStats:
    return GaussStats(st.counts[idx], st.means[idx], st.m2s[idx])


def _gather_stats(st: TreeState, idxs) -> GaussStats:
    """Gather a fanout block of child stats; invalid (-1) lanes read slot 0 but
    are masked by callers."""
    safe = jnp.maximum(idxs, 0)
    return GaussStats(st.counts[safe], st.means[safe], st.m2s[safe])


def _increment(st: TreeState, idx, x) -> TreeState:
    s = welford_insert(_node_stats(st, idx), x)
    return st._replace(
        counts=st.counts.at[idx].set(s.count),
        means=st.means.at[idx].set(s.mean),
        m2s=st.m2s.at[idx].set(s.m2),
    )


def _set_stats(st: TreeState, idx, s: GaussStats) -> TreeState:
    return st._replace(
        counts=st.counts.at[idx].set(s.count),
        means=st.means.at[idx].set(s.mean),
        m2s=st.m2s.at[idx].set(s.m2),
    )


def _compact_children(slots, keep_mask):
    """Stable-compact the kept child slots to the front, -1 padding after.

    Implemented as a stable argsort on (dropped, original position) — F is a
    handful of lanes, trivial for the VPU.
    """
    F = slots.shape[0]
    order = jnp.argsort(jnp.where(keep_mask, jnp.arange(F), F + jnp.arange(F)))
    return jnp.where(keep_mask[order], slots[order], NULL)


def _is_exact_match(st: TreeState, idx, x) -> jnp.ndarray:
    """CobwebTorchNode.is_exact_match (:652-666): leaf whose observed variance
    is ~0 and whose mean ~equals the instance (torch.isclose tolerances)."""
    count = st.counts[idx]
    safe_count = jnp.maximum(count, 1.0)
    std = jnp.sqrt(st.m2s[idx] / safe_count)
    zero_var = jnp.all(jnp.isclose(std, 0.0, rtol=1e-5, atol=1e-8))
    mean_match = jnp.all(jnp.isclose(x, st.means[idx], rtol=1e-5, atol=1e-8))
    return (count > 0) & zero_var & mean_match


# ---------------------------------------------------------------------------
# the descent loop (reference CobwebTorchTree.cobweb :143-233)
# ---------------------------------------------------------------------------

class _LoopCarry(NamedTuple):
    st: TreeState
    current: jnp.ndarray   # () i32
    done: jnp.ndarray      # () bool
    leaf: jnp.ndarray      # () i32
    key: jax.Array
    steps: jnp.ndarray     # () i32 safety counter


def _leaf_branch(c: _LoopCarry, x, cfg: TreeConfig) -> _LoopCarry:
    """current has no children: exact-match/empty absorb, else fringe split
    (reference :184-204)."""
    st, cur = c.st, c.current
    absorb = _is_exact_match(st, cur, x) | (st.counts[cur] == 0.0)

    def do_absorb(st):
        return _increment(st, cur, x), cur

    def do_fringe(st):
        # new parent P copies current's stats and takes its place; current and
        # a fresh leaf seeded by x become P's children; P absorbs x.
        st, p_new = _alloc(st)
        st = _set_stats(st, p_new, _node_stats(st, cur))
        old_parent = st.parent[cur]

        # splice: replace `cur` with `p_new` in old_parent's child list
        # (or reroot when cur was the root).
        def splice_parent(st):
            slots = st.children[old_parent]
            slots = jnp.where(slots == cur, p_new, slots)
            return st._replace(children=st.children.at[old_parent].set(slots))

        def reroot(st):
            return st._replace(root=p_new)

        st = jax.lax.cond(old_parent >= 0, splice_parent, reroot, st)
        st = st._replace(parent=st.parent.at[p_new].set(old_parent))
        st = st._replace(parent=st.parent.at[cur].set(p_new))
        st = _increment(st, p_new, x)

        st, leaf = _alloc(st)
        st = _set_stats(
            st, leaf, GaussStats(jnp.float32(1.0), x, jnp.zeros_like(x))
        )
        st = st._replace(
            parent=st.parent.at[leaf].set(p_new),
            children=st.children.at[p_new, 0].set(cur),
        )
        st = st._replace(
            children=st.children.at[p_new, 1].set(leaf),
            n_children=st.n_children.at[p_new].set(2),
        )
        return st, leaf

    st, leaf = jax.lax.cond(absorb, do_absorb, do_fringe, st)
    return c._replace(st=st, done=jnp.bool_(True), leaf=leaf)


def _internal_branch(c: _LoopCarry, x, cfg: TreeConfig) -> _LoopCarry:
    """Score the four ops on the current internal node and apply the winner
    (reference :207-231)."""
    st, cur = c.st, c.current
    F = st.fanout

    key = jax.random.fold_in(c.key, c.steps)
    k_two, k_op = jax.random.split(key)

    child_idx = st.children[cur]              # (F,)
    mask = child_idx >= 0
    children = _gather_stats(st, child_idx)
    parent = _node_stats(st, cur)

    tb = opscore.two_best_children(x, parent, children, mask, cfg, k_two)
    b1_node = child_idx[tb.best1]
    b2_node = jnp.where(tb.best2 >= 0, child_idx[jnp.maximum(tb.best2, 0)], NULL)

    gc_idx = st.children[b1_node]             # (F,)
    gc_mask = gc_idx >= 0
    grandchildren = _gather_stats(st, gc_idx)

    nc = st.n_children[cur]
    fanout_full = nc >= F
    split_fits = (nc - 1 + st.n_children[b1_node]) <= F

    if cfg.greedy:
        op = jnp.int32(opscore.OP_NEW)
    else:
        op, _ = opscore.best_operation(
            x, parent, children, mask, tb, grandchildren, gc_mask, cfg,
            k_op, fanout_full, split_fits,
        )

    def do_best(st):
        st = _increment(st, cur, x)
        return st, b1_node, jnp.bool_(False), NULL

    def do_new(st):
        st = _increment(st, cur, x)
        st, leaf = _alloc(st)
        st = _set_stats(
            st, leaf, GaussStats(jnp.float32(1.0), x, jnp.zeros_like(x))
        )
        st = st._replace(
            parent=st.parent.at[leaf].set(cur),
            children=st.children.at[cur, nc].set(leaf),
            n_children=st.n_children.at[cur].set(nc + 1),
        )
        return st, leaf, jnp.bool_(True), leaf

    def do_merge(st):
        # new node M absorbs best1+best2 stats (Chan merge), becomes their
        # parent, replaces them in cur's child list; descent continues at M
        # (reference CobwebTorchNode.merge :517-548).
        st = _increment(st, cur, x)
        st, m = _alloc(st)
        # M's stats are the pure Chan merge of best1+best2 — merge() does NOT
        # absorb x; the instance reaches M's subtree on the next loop iteration.
        s = chan_merge(_node_stats(st, b1_node), _node_stats(st, b2_node))
        st = _set_stats(st, m, s)
        st = st._replace(
            parent=st.parent.at[m].set(cur),
            children=st.children.at[m, 0].set(b1_node),
        )
        st = st._replace(
            children=st.children.at[m, 1].set(b2_node),
            n_children=st.n_children.at[m].set(2),
        )
        st = st._replace(
            parent=st.parent.at[b1_node].set(m),
        )
        st = st._replace(parent=st.parent.at[b2_node].set(m))
        keep = mask & (child_idx != b1_node) & (child_idx != b2_node)
        slots = _compact_children(child_idx, keep)
        slots = slots.at[nc - 2].set(m)
        st = st._replace(
            children=st.children.at[cur].set(slots),
            n_children=st.n_children.at[cur].set(nc - 1),
        )
        return st, m, jnp.bool_(False), NULL

    def do_split(st):
        # promote best1's children into cur, recycle best1, re-loop on cur
        # (reference CobwebTorchNode.split :593-609) — no increment.
        keep = mask & (child_idx != b1_node)
        slots = _compact_children(child_idx, keep)
        n_keep = nc - 1
        n_gc = st.n_children[b1_node]
        lane = jnp.arange(F)
        # append grandchildren after the kept slots
        gc_gathered = gc_idx[jnp.clip(lane - n_keep, 0, F - 1)]
        new_slots = jnp.where(
            lane < n_keep, slots,
            jnp.where(lane < n_keep + n_gc, gc_gathered, NULL),
        )
        st = st._replace(
            children=st.children.at[cur].set(new_slots),
            n_children=st.n_children.at[cur].set(n_keep + n_gc),
        )
        # re-parent grandchildren — masked lanes are routed out-of-bounds and
        # dropped so they can't clobber slot 0 with a stale value (scatter
        # order for duplicate indices is undefined).
        cap = st.parent.shape[0]
        gc_write = jnp.where(gc_mask, gc_idx, cap)
        st = st._replace(
            parent=st.parent.at[gc_write].set(cur, mode="drop")
        )
        st = _free(st, b1_node)
        return st, cur, jnp.bool_(False), NULL

    st, nxt, done, leaf = jax.lax.switch(
        op, [do_best, do_new, do_merge, do_split], st
    )
    return c._replace(st=st, current=nxt, done=done,
                      leaf=jnp.where(done, leaf, c.leaf))


def _insert_one(st: TreeState, x: jnp.ndarray, key: jax.Array,
                cfg: TreeConfig, max_steps: int = 256):
    """One full descent (reference ifit/cobweb).  Returns (state, leaf_idx)."""

    def cond(c: _LoopCarry):
        return (~c.done) & (c.steps < max_steps)

    def body(c: _LoopCarry):
        is_leaf = c.st.n_children[c.current] == 0
        c2 = jax.lax.cond(
            is_leaf,
            lambda cc: _leaf_branch(cc, x, cfg),
            lambda cc: _internal_branch(cc, x, cfg),
            c,
        )
        return c2._replace(steps=c2.steps + 1)

    init = _LoopCarry(
        st=st, current=st.root, done=jnp.bool_(False),
        leaf=NULL, key=key, steps=jnp.zeros((), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.st, out.leaf


@functools.partial(jax.jit, static_argnames=("cfg",))
def insert_batch(st: TreeState, xs: jnp.ndarray, keys: jax.Array,
                 n_valid: jnp.ndarray, cfg: TreeConfig):
    """Insert a batch of instances sequentially, entirely on device.

    This replaces the reference's per-item Python loop
    (CobwebWrapper.add_sentences :69-77) with ONE compiled computation:
    ``lax.fori_loop`` over instances, each running the full descent
    ``while_loop``.  ``xs`` may be padded to a bucketed shape;
    only the first ``n_valid`` rows are inserted (dynamic bound — the
    compiled program is reused across ragged batch sizes).
    Returns (new_state, leaf_indices (B,), -1 for padding rows).
    """
    B = xs.shape[0]

    def body(i, carry):
        st, leaves = carry
        st, leaf = _insert_one(st, xs[i], keys[i], cfg)
        return st, leaves.at[i].set(leaf)

    leaves0 = jnp.full((B,), NULL, jnp.int32)
    return jax.lax.fori_loop(0, jnp.minimum(n_valid, B), body, (st, leaves0))


@functools.partial(jax.jit, static_argnames=("cfg",))
def insert_one_jit(st: TreeState, x: jnp.ndarray, key: jax.Array,
                   cfg: TreeConfig):
    return _insert_one(st, x, key, cfg)


# ---------------------------------------------------------------------------
# host-side facade
# ---------------------------------------------------------------------------

class CobwebTree:
    """Host handle over the device-resident tree.

    API parity with CobwebTorchTree (ifit/categorize/dump_json/load_json),
    plus batched ``fit`` — the TPU-native bulk-build entry point.
    """

    def __init__(self, cfg: TreeConfig, capacity: int = 4096, seed: int = 0):
        self.cfg = cfg
        self.state = init_state(capacity, cfg.dim, cfg.max_fanout)
        self._key = jax.random.PRNGKey(seed)
        self.n_inserted = 0

    # -- capacity management ------------------------------------------------
    def _ensure_capacity(self, n_new: int):
        """Grow device arrays when the next batch could overflow.

        Worst case each insert allocates 2 nodes (fringe split) or 1-2
        (new/merge); reserve 2 per instance plus slack.
        """
        st = self.state
        needed = int(st.n_alloc) + 2 * n_new + 8
        if needed <= st.capacity:
            return
        new_cap = max(needed, st.capacity * 2)
        pad = new_cap - st.capacity
        self.state = TreeState(
            counts=jnp.concatenate([st.counts, jnp.zeros((pad,), jnp.float32)]),
            means=jnp.concatenate([st.means, jnp.zeros((pad, st.dim), jnp.float32)]),
            m2s=jnp.concatenate([st.m2s, jnp.zeros((pad, st.dim), jnp.float32)]),
            parent=jnp.concatenate([st.parent, jnp.full((pad,), NULL, jnp.int32)]),
            children=jnp.concatenate(
                [st.children, jnp.full((pad, st.fanout), NULL, jnp.int32)]
            ),
            n_children=jnp.concatenate(
                [st.n_children, jnp.zeros((pad,), jnp.int32)]
            ),
            root=st.root,
            n_alloc=st.n_alloc,
            free_stack=jnp.concatenate(
                [st.free_stack, jnp.full((pad,), NULL, jnp.int32)]
            ),
            free_top=st.free_top,
        )

    def _next_keys(self, n: int) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return jax.random.split(sub, n)

    # -- insertion ----------------------------------------------------------
    def ifit(self, x) -> int:
        """Insert one instance; returns its leaf node index (reference ifit :123-141)."""
        x = jnp.asarray(x, jnp.float32)
        self._ensure_capacity(1)
        key = self._next_keys(1)[0]
        self.state, leaf = insert_one_jit(self.state, x, key, self.cfg)
        self.n_inserted += 1
        return int(leaf)

    def fit(self, xs, batch_size: int = 2048) -> np.ndarray:
        """Bulk incremental build; returns the leaf index of every instance.

        Ragged final chunks are zero-padded to ``batch_size`` with a dynamic
        valid-count so the compiled insert program is reused across calls.
        """
        xs = np.asarray(xs, np.float32)
        leaves = np.empty((len(xs),), np.int32)
        for s in range(0, len(xs), batch_size):
            chunk = xs[s:s + batch_size]
            n = len(chunk)
            if n < batch_size and len(xs) > batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - n, xs.shape[1]), np.float32)]
                )
            self._ensure_capacity(n)
            keys = self._next_keys(len(chunk))
            self.state, lv = insert_batch(
                self.state, jnp.asarray(chunk), keys,
                jnp.asarray(n, jnp.int32), self.cfg,
            )
            leaves[s:s + n] = np.asarray(lv)[:n]
        self.n_inserted += len(xs)
        return leaves

    # -- inspection ---------------------------------------------------------
    def _host_arrays(self):
        st = self.state
        return jax.tree.map(np.asarray, st)

    def node_var(self, idx: int) -> np.ndarray:
        st = self.state
        return np.asarray(
            compute_var(st.m2s[idx], st.counts[idx], self.cfg)
        )

    def num_nodes(self) -> int:
        """Number of live nodes (reference CobwebTorchNode.num_concepts :725-739)."""
        return len(self.live_nodes())

    def live_nodes(self) -> list[int]:
        st = self._host_arrays()
        out = []
        stack = [int(st.root)]
        while stack:
            n = stack.pop()
            out.append(n)
            nc = int(st.n_children[n])
            for i in range(nc):
                stack.append(int(st.children[n, i]))
        return out

    def analyze_structure(self) -> dict:
        """Structure stats (reference CobwebTorchTree.analyze_structure :366-401)."""
        st = self._host_arrays()
        from collections import deque, defaultdict

        leaf_count = 0
        level_counts = defaultdict(int)
        fanout_hist = defaultdict(int)
        q = deque([(int(st.root), 0)])
        while q:
            n, lvl = q.popleft()
            level_counts[lvl] += 1
            nc = int(st.n_children[n])
            if nc == 0:
                leaf_count += 1
            else:
                fanout_hist[nc] += 1
                for i in range(nc):
                    q.append((int(st.children[n, i]), lvl + 1))
        return {
            "leaf_count": leaf_count,
            "level_counts": dict(level_counts),
            "fanout_histogram": dict(fanout_hist),
            "max_depth": max(level_counts) if level_counts else 0,
            "num_nodes": sum(level_counts.values()),
        }

    # -- categorize (host best-first; exact reference-parity path) ----------
    def categorize(self, x, max_nodes: int = 100_000,
                   retrieve_k: Optional[int] = None,
                   leaf_has_sentences=None, rng: Optional[np.random.Generator] = None):
        """Best-first search (reference _cobweb_categorize :235-289).

        Host-driven heap search over the (small) node array — kept for exact
        behavioral parity and tests; batched device queries live in
        ``core/index.py``.  ``leaf_has_sentences`` is an optional predicate
        (node_idx -> bool) marking retrievable leaves; defaults to "is leaf".
        Returns best node idx, or the list of retrieved leaf idxs when
        ``retrieve_k`` is set (in visit order, matching the reference's
        visit-order ranking, CobwebTorchTree.py:267-271).
        """
        import heapq

        st = self._host_arrays()
        x = np.asarray(x, np.float32)
        rng = rng or np.random.default_rng(0)
        cfg = self.cfg

        def lp(n):
            count = max(float(st.counts[n]), 1.0)
            var = st.m2s[n] / count
            if cfg.acuity_cutoff:
                var = np.maximum(var, cfg.prior_var)
            else:
                var = var + cfg.prior_var
            if float(st.counts[n]) <= 0:
                var = np.full_like(var, cfg.prior_var)
            d = x - st.means[n]
            return float(
                -0.5 * np.sum(np.log(var) + math.log(2 * math.pi) + d * d / var)
            )

        if leaf_has_sentences is None:
            leaf_has_sentences = lambda n: int(st.n_children[n]) == 0

        heap = [(-lp(int(st.root)), rng.random(), int(st.root))]
        best, best_score = int(st.root), -np.inf
        retrieved: list[int] = []
        visited = 0
        while heap:
            neg, _, cur = heapq.heappop(heap)
            score = -neg
            visited += 1
            if score > best_score:
                best, best_score = cur, score
            if visited >= max_nodes:
                break
            if int(st.n_children[cur]) == 0 and leaf_has_sentences(cur):
                retrieved.append(cur)
            if retrieve_k is not None and len(retrieved) == retrieve_k:
                break
            for i in range(int(st.n_children[cur])):
                ch = int(st.children[cur, i])
                heapq.heappush(heap, (-lp(ch), rng.random(), ch))
        if retrieve_k is None:
            return best
        return retrieved[:retrieve_k]

    # -- serialization (reference-compatible JSON schema) --------------------
    def dump_json(self, leaf_sentence_ids: Optional[dict] = None) -> str:
        """Nested {count, mean, meanSq, sentence_id, children} schema
        (CobwebTorchTree.dump_json :67-81, CobwebTorchNode.iterative_output_json
        :749-772) — iterative, no recursion."""
        st = self._host_arrays()
        leaf_sentence_ids = leaf_sentence_ids or {}

        def node_dict(n):
            return {
                "count": float(st.counts[n]),
                "mean": st.means[n].tolist(),
                "meanSq": st.m2s[n].tolist(),
                "sentence_id": leaf_sentence_ids.get(n, []),
                "children": [],
            }

        root_d = node_dict(int(st.root))
        stack = [(int(st.root), root_d)]
        while stack:
            n, d = stack.pop()
            for i in range(int(st.n_children[n])):
                ch = int(st.children[n, i])
                cd = node_dict(ch)
                d["children"].append(cd)
                stack.append((ch, cd))
        params = self.cfg.to_json_dict()
        params["root"] = root_d
        return json.dumps(params)

    def save_npz(self, path: str, **extra_arrays):
        """Fast binary checkpoint of the full flat state (the JSON schema is
        reference-compatible but impractical beyond ~10^4 nodes; this is the
        production path — one compressed npz, O(state) bytes)."""
        import json as _json
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        st = self._host_arrays()
        np.savez_compressed(
            path,
            __cfg__=np.frombuffer(
                _json.dumps(self.cfg.to_json_dict()).encode(), dtype=np.uint8
            ),
            n_inserted=np.asarray(self.n_inserted),
            **st._asdict(),
            **extra_arrays,
        )

    @classmethod
    def load_npz(cls, path: str, seed: int = 0):
        """Restore a binary checkpoint; returns (tree, dict_of_extra_arrays)."""
        import json as _json

        with np.load(path, allow_pickle=True) as data:
            cfg = TreeConfig.from_json_dict(
                _json.loads(bytes(data["__cfg__"]).decode())
            )
            fields = set(TreeState._fields)
            st = TreeState(**{k: jnp.asarray(data[k]) for k in fields})
            extras = {k: data[k] for k in data.files
                      if k not in fields | {"__cfg__", "n_inserted"}}
            n_inserted = int(data["n_inserted"])
        tree = cls(cfg, capacity=st.capacity, seed=seed)
        tree.state = st
        tree.n_inserted = n_inserted
        return tree, extras

    @classmethod
    def load_json(cls, json_string: str, seed: int = 0):
        """Rebuild the flat tree from the nested schema
        (CobwebTorchTree.load_json :94-121).  Returns (tree, leaf_sentence_ids)."""
        data = json.loads(json_string)
        cfg = TreeConfig.from_json_dict(data)
        # Count nodes first to size capacity.
        n_nodes = 0
        stack = [data["root"]]
        max_fanout = cfg.max_fanout
        while stack:
            d = stack.pop()
            n_nodes += 1
            max_fanout = max(max_fanout, len(d["children"]))
            stack.extend(d["children"])
        if max_fanout > cfg.max_fanout:
            import dataclasses
            cfg = dataclasses.replace(cfg, max_fanout=max_fanout)
        tree = cls(cfg, capacity=2 * n_nodes + 8, seed=seed)

        cap, dim, F = 2 * n_nodes + 8, cfg.dim, cfg.max_fanout
        counts = np.zeros((cap,), np.float32)
        means = np.zeros((cap, dim), np.float32)
        m2s = np.zeros((cap, dim), np.float32)
        parent = np.full((cap,), -1, np.int32)
        children = np.full((cap, F), -1, np.int32)
        n_children = np.zeros((cap,), np.int32)
        leaf_sids: dict[int, list[int]] = {}

        idx = 0
        stack = [(data["root"], -1)]
        while stack:
            d, par = stack.pop()
            n = idx
            idx += 1
            counts[n] = d["count"]
            means[n] = np.asarray(d["mean"], np.float32)
            m2s[n] = np.asarray(d["meanSq"], np.float32)
            parent[n] = par
            sids = d.get("sentence_id") or []
            if sids:
                leaf_sids[n] = list(sids)
            if par >= 0:
                children[par, n_children[par]] = n
                n_children[par] += 1
            # push children in reverse so they pop in order and get
            # consecutive indices left-to-right
            for c in reversed(d["children"]):
                stack.append((c, n))
        # NOTE: child slot assignment above appends in pop order; reversed
        # push keeps sibling order but their *own* subtrees interleave, which
        # is fine — slot order only affects iteration order, not semantics.

        tree.state = TreeState(
            counts=jnp.asarray(counts),
            means=jnp.asarray(means),
            m2s=jnp.asarray(m2s),
            parent=jnp.asarray(parent),
            children=jnp.asarray(children),
            n_children=jnp.asarray(n_children),
            root=jnp.zeros((), jnp.int32),
            n_alloc=jnp.asarray(idx, jnp.int32),
            free_stack=jnp.full((cap,), -1, jnp.int32),
            free_top=jnp.zeros((), jnp.int32),
        )
        tree.n_inserted = int(counts[0])
        return tree, leaf_sids
