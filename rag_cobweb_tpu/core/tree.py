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


def align_capacity(n: int) -> int:
    """Round a node capacity up to a TPU-tile-friendly size.

    Gathers/scatters on the (cap, D) state arrays degrade ~7x when cap is
    not sublane-aligned (measured 130 ms vs 18-25 ms per 256-lane vforest
    round at cap=7876 vs 7880/8192 on v5e): align to the f32 sublane tile
    (8), and to 256 once the array is large enough that the extra rows are
    noise."""
    q = 256 if n >= 2048 else 8
    return -(-int(n) // q) * q


def init_state(capacity: int, dim: int, fanout: int) -> TreeState:
    capacity = align_capacity(capacity)
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



def _node_stats(st: TreeState, idx) -> GaussStats:
    # upcast: the state MAY be stats-compressed (bf16 at rest, see
    # compress_stats) — all descent/scoring math stays f32
    return GaussStats(st.counts[idx],
                      st.means[idx].astype(jnp.float32),
                      st.m2s[idx].astype(jnp.float32))


def _gather_stats(st: TreeState, idxs) -> GaussStats:
    """Gather a fanout block of child stats; invalid (-1) lanes read slot 0 but
    are masked by callers."""
    safe = jnp.maximum(idxs, 0)
    return GaussStats(st.counts[safe],
                      st.means[safe].astype(jnp.float32),
                      st.m2s[safe].astype(jnp.float32))




def _compact_children(slots, keep_mask):
    """Stable-compact the kept child slots to the front, -1 padding after.

    Implemented as a stable argsort on (dropped, original position) — F is a
    handful of lanes, trivial for the VPU.
    """
    F = slots.shape[0]
    order = jnp.argsort(jnp.where(keep_mask, jnp.arange(F), F + jnp.arange(F)))
    return jnp.where(keep_mask[order], slots[order], NULL)



# ---------------------------------------------------------------------------
# the descent loop (reference CobwebTorchTree.cobweb :143-233)
# ---------------------------------------------------------------------------

class Delta(NamedTuple):
    """One descent step's effects as a small fixed-size descriptor.

    Each branch of the descent (absorb / fringe / best / new / merge /
    split) writes at most 3 node-stat rows, 2 children rows, F+3 parent
    pointers, and touches at most 2 fresh slots.  Encoding the step this
    way means (a) one batched scatter pass applies everything, and (b)
    under ``vmap`` the ``lax.switch`` selects between tiny descriptors
    instead of whole-state copies — which is what makes the K-way
    vmapped forest (parallel/vforest.py) efficient.
    Unused entries carry index -1 and are dropped by OOB-routing scatters.
    """

    stat_idx: jnp.ndarray    # (3,) i32
    stat_count: jnp.ndarray  # (3,) f32
    stat_mean: jnp.ndarray   # (3, D) f32
    stat_m2: jnp.ndarray     # (3, D) f32
    crow_idx: jnp.ndarray    # (3,) i32 children-row writes
    crow_vals: jnp.ndarray   # (3, F) i32
    crow_n: jnp.ndarray      # (3,) i32
    par_idx: jnp.ndarray     # (F+3,) i32
    par_val: jnp.ndarray     # (F+3,) i32
    root: jnp.ndarray        # () i32, -1 = unchanged
    free_node: jnp.ndarray   # () i32, -1 = none
    slots_used: jnp.ndarray  # () i32 in {0, 1, 2}
    slots_from_free: jnp.ndarray  # () i32 — how many used slots popped the
    #                               free stack (fixed at decision time so the
    #                               deferred replay reproduces allocation)
    next_current: jnp.ndarray  # () i32
    done: jnp.ndarray        # () bool
    leaf: jnp.ndarray        # () i32


def _empty_delta(cur, dim: int, fanout: int) -> Delta:
    return Delta(
        stat_idx=jnp.full((3,), NULL, jnp.int32),
        stat_count=jnp.zeros((3,), jnp.float32),
        stat_mean=jnp.zeros((3, dim), jnp.float32),
        stat_m2=jnp.zeros((3, dim), jnp.float32),
        crow_idx=jnp.full((3,), NULL, jnp.int32),
        crow_vals=jnp.full((3, fanout), NULL, jnp.int32),
        crow_n=jnp.zeros((3,), jnp.int32),
        par_idx=jnp.full((fanout + 3,), NULL, jnp.int32),
        par_val=jnp.full((fanout + 3,), NULL, jnp.int32),
        root=NULL,
        free_node=NULL,
        slots_used=jnp.zeros((), jnp.int32),
        slots_from_free=jnp.zeros((), jnp.int32),
        next_current=cur,
        done=jnp.bool_(False),
        leaf=NULL,
    )


class _View(NamedTuple):
    """Carried truth about the current node during a descent: everything a
    decision reads that this descent may already have modified (the big
    state is only updated after the descent in the deferred path)."""

    cur: jnp.ndarray        # () i32
    stats: GaussStats       # of cur
    row: jnp.ndarray        # (F,) children of cur
    n: jnp.ndarray          # () i32
    parent: jnp.ndarray     # () i32
    prev_row: jnp.ndarray   # (F,) children row of the node we came from
    prev_n: jnp.ndarray     # () i32


def _view_from_state(st: TreeState, cur) -> _View:
    return _View(
        cur=cur, stats=_node_stats(st, cur), row=st.children[cur],
        n=st.n_children[cur], parent=st.parent[cur],
        prev_row=jnp.full((st.fanout,), NULL, jnp.int32),
        prev_n=jnp.zeros((), jnp.int32),
    )


def _peek_slots_virtual(free_stack, free_top, n_alloc):
    """Reserve up to two fresh slots against *virtual* counters (the state
    arrays are not consulted for the counters — deferred descents carry
    them)."""
    s0 = jnp.where(free_top >= 1, free_stack[jnp.maximum(free_top - 1, 0)],
                   n_alloc)
    s1 = jnp.where(
        free_top >= 2, free_stack[jnp.maximum(free_top - 2, 0)],
        jnp.where(free_top >= 1, n_alloc, n_alloc + 1),
    )
    return jnp.stack([s0, s1])



class _NextView(NamedTuple):
    """Where the descent goes next.  ``from_state`` means the loop should
    gather the next node's truth from the state arrays (safe: the next node
    has not been modified by this descent); otherwise the fields are the
    carried truth (merge's virtual node M, or split's rewritten current)."""

    from_state: jnp.ndarray  # () bool
    view: _View


def _decide_leaf(view: _View, x, slots, cfg: TreeConfig,
                 fanout: int, depth=None):
    """Leaf: exact-match/empty absorb, else fringe split (reference
    CobwebTorchTree.py:184-204).  With ``cfg.absorb_depth`` > 0, a leaf
    reached at ``depth`` >= that bound also absorbs (chain compaction —
    see TreeConfig.absorb_depth)."""
    F, dim = fanout, x.shape[0]
    cur = view.cur
    count = view.stats.count
    safe_count = jnp.maximum(count, 1.0)
    std = jnp.sqrt(view.stats.m2 / safe_count)
    exact = (count > 0) \
        & jnp.all(jnp.isclose(std, 0.0, rtol=1e-5, atol=1e-8)) \
        & jnp.all(jnp.isclose(x, view.stats.mean, rtol=1e-5, atol=1e-8))
    absorb = exact | (count == 0.0)
    if cfg.absorb_depth and depth is not None:  # static config branch
        absorb = absorb | ((count > 0) & (depth >= cfg.absorb_depth))
    d = _empty_delta(cur, dim, F)

    inc = welford_insert(view.stats, x)      # absorb == fringe p_new math

    p_new, leaf = slots[0], slots[1]
    old_parent = view.parent
    spliced = jnp.where(view.prev_row == cur, p_new, view.prev_row)
    p_row = jnp.full((F,), NULL, jnp.int32).at[0].set(cur).at[1].set(leaf)

    def absorb_delta(_):
        return d._replace(
            stat_idx=d.stat_idx.at[0].set(cur),
            stat_count=d.stat_count.at[0].set(inc.count),
            stat_mean=d.stat_mean.at[0].set(inc.mean),
            stat_m2=d.stat_m2.at[0].set(inc.m2),
            done=jnp.bool_(True), leaf=cur,
        )

    def fringe_delta(_):
        has_parent = old_parent >= 0
        return d._replace(
            stat_idx=jnp.stack([p_new, leaf, NULL]),
            stat_count=jnp.stack([inc.count, jnp.float32(1.0), 0.0]),
            stat_mean=jnp.stack([inc.mean, x, jnp.zeros_like(x)]),
            stat_m2=jnp.stack([inc.m2, jnp.zeros_like(x),
                               jnp.zeros_like(x)]),
            crow_idx=jnp.stack([p_new,
                                jnp.where(has_parent, old_parent, NULL),
                                leaf]),
            crow_vals=jnp.stack([p_row, spliced,
                                 jnp.full((F,), NULL, jnp.int32)]),
            crow_n=jnp.stack([jnp.int32(2), view.prev_n, jnp.int32(0)]),
            par_idx=d.par_idx.at[0].set(p_new).at[1].set(cur)
                             .at[2].set(leaf),
            par_val=d.par_val.at[0].set(old_parent).at[1].set(p_new)
                             .at[2].set(p_new),
            root=jnp.where(has_parent, NULL, p_new),
            slots_used=jnp.int32(2),
            done=jnp.bool_(True), leaf=leaf,
        )

    delta = jax.lax.cond(absorb, absorb_delta, fringe_delta, None)
    nv = _NextView(from_state=jnp.bool_(False), view=view)  # done: unused
    return delta, nv


def _decide_internal(st: TreeState, view: _View, x, slots, key,
                     cfg: TreeConfig):
    """Internal node: score {best, new, merge, split} and describe the
    winner's effects (reference CobwebTorchTree.py:207-231).  Children and
    grandchildren stats come from the state arrays (nodes below the current
    one are untouched by this descent); the current node's truth comes from
    the carried view."""
    F, dim = st.fanout, st.means.shape[1]
    cur = view.cur
    k_two, k_op = jax.random.split(key)

    child_idx = view.row                      # (F,)
    mask = child_idx >= 0
    children = _gather_stats(st, child_idx)
    parent = view.stats

    tb = opscore.two_best_children(x, parent, children, mask, cfg, k_two)
    b1_node = child_idx[tb.best1]
    b2_node = jnp.where(tb.best2 >= 0,
                        child_idx[jnp.maximum(tb.best2, 0)], NULL)

    gc_idx = st.children[b1_node]             # (F,)
    gc_mask = gc_idx >= 0
    grandchildren = _gather_stats(st, gc_idx)

    nc = view.n
    n_gc_b1 = st.n_children[b1_node]
    fanout_full = nc >= F
    split_fits = (nc - 1 + n_gc_b1) <= F

    if cfg.greedy:
        op = jnp.int32(opscore.OP_NEW)
    else:
        op, _ = opscore.best_operation(
            x, parent, children, mask, tb, grandchildren, gc_mask, cfg,
            k_op, fanout_full, split_fits,
        )

    d0 = _empty_delta(cur, dim, F)
    inc = welford_insert(parent, x)
    new_node = slots[0]

    def with_cur_inc(d: Delta) -> Delta:
        return d._replace(
            stat_idx=d.stat_idx.at[0].set(cur),
            stat_count=d.stat_count.at[0].set(inc.count),
            stat_mean=d.stat_mean.at[0].set(inc.mean),
            stat_m2=d.stat_m2.at[0].set(inc.m2),
        )

    dummy_nv = _NextView(jnp.bool_(True), view)

    def do_best(_):
        d = with_cur_inc(d0)._replace(next_current=b1_node)
        nv = _NextView(
            from_state=jnp.bool_(True),
            view=view._replace(cur=b1_node, parent=cur,
                               prev_row=view.row, prev_n=view.n),
        )
        return d, nv

    def do_new(_):
        row = view.row.at[nc].set(new_node)
        d = with_cur_inc(d0)
        d = d._replace(
            stat_idx=d.stat_idx.at[1].set(new_node),
            stat_count=d.stat_count.at[1].set(1.0),
            stat_mean=d.stat_mean.at[1].set(x),
            crow_idx=d.crow_idx.at[0].set(cur).at[1].set(new_node),
            crow_vals=d.crow_vals.at[0].set(row),
            crow_n=d.crow_n.at[0].set(nc + 1).at[1].set(0),
            par_idx=d.par_idx.at[0].set(new_node),
            par_val=d.par_val.at[0].set(cur),
            slots_used=jnp.int32(1),
            done=jnp.bool_(True), leaf=new_node, next_current=new_node,
        )
        return d, dummy_nv

    def do_merge(_):
        m = new_node
        s = chan_merge(
            jax.tree.map(lambda a: a[tb.best1], children),
            jax.tree.map(lambda a: a[jnp.maximum(tb.best2, 0)], children),
        )
        keep = mask & (child_idx != b1_node) & (child_idx != b2_node)
        cur_row = _compact_children(child_idx, keep).at[nc - 2].set(m)
        m_row = jnp.full((F,), NULL, jnp.int32).at[0].set(b1_node) \
                                               .at[1].set(b2_node)
        d = with_cur_inc(d0)
        d = d._replace(
            stat_idx=d.stat_idx.at[1].set(m),
            stat_count=d.stat_count.at[1].set(s.count),
            stat_mean=d.stat_mean.at[1].set(s.mean),
            stat_m2=d.stat_m2.at[1].set(s.m2),
            crow_idx=jnp.stack([cur, m, NULL]),
            crow_vals=jnp.stack([cur_row, m_row,
                                 jnp.full((F,), NULL, jnp.int32)]),
            crow_n=jnp.stack([nc - 1, jnp.int32(2), jnp.int32(0)]),
            par_idx=d.par_idx.at[0].set(m).at[1].set(b1_node)
                             .at[2].set(b2_node),
            par_val=d.par_val.at[0].set(cur).at[1].set(m).at[2].set(m),
            slots_used=jnp.int32(1),
            next_current=m,
        )
        nv = _NextView(
            from_state=jnp.bool_(False),
            view=_View(cur=m, stats=s, row=m_row, n=jnp.int32(2),
                       parent=cur, prev_row=cur_row, prev_n=nc - 1),
        )
        return d, nv

    def do_split(_):
        keep = mask & (child_idx != b1_node)
        kept = _compact_children(child_idx, keep)
        n_keep = nc - 1
        n_gc = n_gc_b1
        lane = jnp.arange(F)
        gc_gathered = gc_idx[jnp.clip(lane - n_keep, 0, F - 1)]
        cur_row = jnp.where(
            lane < n_keep, kept,
            jnp.where(lane < n_keep + n_gc, gc_gathered, NULL),
        )
        par_idx = jnp.concatenate(
            [jnp.where(gc_mask, gc_idx, NULL),
             jnp.full((3,), NULL, jnp.int32)]
        )
        par_val = jnp.concatenate(
            [jnp.full((F,), cur, jnp.int32),
             jnp.full((3,), NULL, jnp.int32)]
        )
        d = d0._replace(   # no stat writes: split does not absorb x
            crow_idx=d0.crow_idx.at[0].set(cur),
            crow_vals=d0.crow_vals.at[0].set(cur_row),
            crow_n=d0.crow_n.at[0].set(n_keep + n_gc),
            par_idx=par_idx,
            par_val=par_val,
            free_node=b1_node,
            next_current=cur,
        )
        nv = _NextView(
            from_state=jnp.bool_(False),
            view=view._replace(row=cur_row, n=n_keep + n_gc),
        )
        return d, nv

    return jax.lax.switch(op, [do_best, do_new, do_merge, do_split], None)


def _apply_delta_data(st: TreeState, d: Delta) -> TreeState:
    """Commit one step's data writes (stats/rows/parents/root) with OOB-drop
    scatters; allocation bookkeeping is handled separately."""
    cap = st.counts.shape[0]
    sidx = jnp.where(d.stat_idx >= 0, d.stat_idx, cap)
    st = st._replace(
        counts=st.counts.at[sidx].set(d.stat_count, mode="drop"),
        means=st.means.at[sidx].set(
            d.stat_mean.astype(st.means.dtype), mode="drop"),
        m2s=st.m2s.at[sidx].set(
            d.stat_m2.astype(st.m2s.dtype), mode="drop"),
    )
    cidx = jnp.where(d.crow_idx >= 0, d.crow_idx, cap)
    st = st._replace(
        children=st.children.at[cidx].set(d.crow_vals, mode="drop"),
        n_children=st.n_children.at[cidx].set(d.crow_n, mode="drop"),
    )
    pidx = jnp.where(d.par_idx >= 0, d.par_idx, cap)
    st = st._replace(parent=st.parent.at[pidx].set(d.par_val, mode="drop"))
    return st._replace(root=jnp.where(d.root >= 0, d.root, st.root))


class _DeferredCarry(NamedTuple):
    view: _View
    vfree_top: jnp.ndarray
    vn_alloc: jnp.ndarray
    done: jnp.ndarray
    leaf: jnp.ndarray
    steps: jnp.ndarray
    dbuf: Delta                 # leading (max_steps,) axis on every field


def _descend_step(st: TreeState, c, x, key, cfg: TreeConfig):
    """One descent decision from the carried view.  Returns (delta, next
    small carry minus the delta buffer) — shared by the while_loop and scan
    drivers below."""
    F = st.fanout
    step_key = jax.random.fold_in(key, c.steps)
    slots = _peek_slots_virtual(st.free_stack, c.vfree_top, c.vn_alloc)
    is_leaf = c.view.n == 0
    # compute BOTH cases and select the small outputs: a lax.cond with a
    # (vmapped) batched predicate would broadcast every closed-over
    # constant — including the full state arrays — to one copy per lane
    d_leaf, nv_leaf = _decide_leaf(c.view, x, slots, cfg, F, depth=c.steps)
    d_int, nv_int = _decide_internal(st, c.view, x, slots, step_key, cfg)

    def pick(a, b):
        cond = jnp.reshape(is_leaf, (1,) * a.ndim) if a.ndim else is_leaf
        return jnp.where(cond, a, b)

    d = jax.tree.map(pick, d_leaf, d_int)
    nv = jax.tree.map(pick, nv_leaf, nv_int)
    from_free = jnp.minimum(d.slots_used, c.vfree_top)
    d = d._replace(slots_from_free=from_free)
    next_view = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(nv.from_state, (1,) * a.ndim), a, b
        ) if a.ndim else jnp.where(nv.from_state, a, b),
        _view_from_state(st, d.next_current)._replace(
            parent=nv.view.parent, prev_row=nv.view.prev_row,
            prev_n=nv.view.prev_n,
        ),
        nv.view,
    )
    next_c = c._replace(
        view=next_view,
        vfree_top=c.vfree_top - from_free,
        vn_alloc=c.vn_alloc + (d.slots_used - from_free),
        done=d.done,
        leaf=jnp.where(d.done, d.leaf, c.leaf),
        steps=c.steps + 1,
    )
    return d, next_c


def _init_small_carry(st: TreeState) -> "_DeferredCarry":
    return _DeferredCarry(
        view=_view_from_state(st, st.root), vfree_top=st.free_top,
        vn_alloc=st.n_alloc, done=jnp.bool_(False), leaf=NULL,
        steps=jnp.zeros((), jnp.int32), dbuf=None,
    )


def _descend_collect(st: TreeState, x: jnp.ndarray, key: jax.Array,
                     cfg: TreeConfig, max_steps: int = 48):
    """The read-only half of an insert: run the descent against a frozen
    state, carrying the current node's truth in a small _View, and record
    every step's Delta in a fixed buffer.
    Returns (delta buffer, steps used, leaf idx)."""
    F, dim = st.fanout, st.means.shape[1]

    def cond(c: _DeferredCarry):
        return (~c.done) & (c.steps < max_steps)

    def body(c: _DeferredCarry):
        d, next_c = _descend_step(st, c, x, key, cfg)
        dbuf = jax.tree.map(
            lambda buf, v: jax.lax.dynamic_update_index_in_dim(
                buf, v, c.steps, 0),
            c.dbuf, d,
        )
        return next_c._replace(dbuf=dbuf)

    # pad steps must stay NO-OP deltas (all index fields -1): broadcast the
    # empty delta, never zeros (index 0 would clobber the root on replay)
    zero_delta = _empty_delta(NULL, dim, F)
    dbuf0 = jax.tree.map(
        lambda v: jnp.broadcast_to(v, (max_steps,) + v.shape).copy(),
        zero_delta,
    )
    init = _init_small_carry(st)._replace(dbuf=dbuf0)
    out = jax.lax.while_loop(cond, body, init)
    return out.dbuf, out.steps, out.leaf


def _descend_collect_scan(st: TreeState, x: jnp.ndarray, key: jax.Array,
                          cfg: TreeConfig, max_steps: int = 16):
    """Scan-structured variant of ``_descend_collect`` for BATCHED use.

    Under ``vmap``, the while_loop version's per-lane
    ``dynamic_update_index_in_dim`` into the delta buffer lowers to TPU
    scatters — measured ~40x slower than the decide math itself.  Lanes
    advance in lockstep, so a ``lax.scan`` over a static step index stacks
    each step's delta natively (no scatter); finished lanes emit the no-op
    empty delta.  Always runs ``max_steps`` iterations — use small
    ``max_steps`` and route over-deep descents to the exact path.
    """
    F, dim = st.fanout, st.means.shape[1]
    empty = _empty_delta(NULL, dim, F)

    def body(c: _DeferredCarry, _):
        frozen = c.done
        d, next_c = _descend_step(st, c, x, key, cfg)

        def pick(a, b):
            cond = jnp.reshape(frozen, (1,) * a.ndim) if a.ndim else frozen
            return jnp.where(cond, a, b)

        emit = jax.tree.map(pick, empty, d)
        keep = jax.tree.map(pick, c, next_c)
        return keep, emit

    out, dbuf = jax.lax.scan(body, _init_small_carry(st), None,
                             length=max_steps)
    return dbuf, out.steps, out.leaf


def _alloc_bookkeeping(st: TreeState, dbuf: Delta, steps) -> TreeState:
    """Descent-consistent allocation commit: pops consume pre-descent stack
    entries top-down, in-descent frees land on top afterwards."""
    max_steps = dbuf.slots_used.shape[0]
    step_mask = jnp.arange(max_steps) < steps
    total_from_free = jnp.sum(jnp.where(step_mask, dbuf.slots_from_free, 0))
    total_bumps = jnp.sum(
        jnp.where(step_mask, dbuf.slots_used - dbuf.slots_from_free, 0)
    )
    frees = jnp.where(step_mask & (dbuf.free_node >= 0), dbuf.free_node,
                      NULL)
    is_free = frees >= 0
    new_top = st.free_top - total_from_free
    pos = new_top + jnp.cumsum(is_free.astype(jnp.int32)) - 1
    cap = st.counts.shape[0]
    return st._replace(
        free_stack=st.free_stack.at[
            jnp.where(is_free, pos, cap)
        ].set(frees, mode="drop"),
        free_top=new_top + jnp.sum(is_free.astype(jnp.int32)),
        n_alloc=st.n_alloc + total_bumps,
    )


def _apply_dbuf_batched(st: TreeState, dbuf: Delta, steps) -> TreeState:
    """Replay a whole delta buffer in ONE scatter pass per array family.

    Sequential replay (fori of ``_apply_delta_data``) issues ~6 small
    scatters per step — the per-op dispatch overhead dominates the insert
    path.  Replay order only matters for *duplicate* targets (a later step
    rewriting the same row), so a last-writer-wins dedupe over the tiny
    (steps x slots) index sets reproduces it exactly with ~6 scatters
    total.  Equivalent to the ordered replay by construction; structural
    parity with the oracle is asserted in tests/test_tree.py.
    """
    S = dbuf.slots_used.shape[0]
    cap = st.counts.shape[0]
    step_ok = jnp.arange(S) < steps

    def last_wins(idx2d, ok2d):
        """Flatten (S, K) targets in replay order; mask duplicates that a
        later write supersedes.  Returns flat scatter targets (cap = drop).
        """
        flat = jnp.where(ok2d, idx2d, -1).reshape(-1)
        n = flat.shape[0]
        pos = jnp.arange(n)
        later = (flat[None, :] == flat[:, None]) \
            & (pos[None, :] > pos[:, None]) & (flat[:, None] >= 0)
        dead = later.any(axis=1)
        return jnp.where((flat >= 0) & ~dead, flat, cap)

    ok = step_ok[:, None]
    si = last_wins(dbuf.stat_idx, ok)
    st = st._replace(
        counts=st.counts.at[si].set(dbuf.stat_count.reshape(-1),
                                    mode="drop"),
        means=st.means.at[si].set(
            dbuf.stat_mean.reshape(3 * S, -1).astype(st.means.dtype),
            mode="drop"),
        m2s=st.m2s.at[si].set(
            dbuf.stat_m2.reshape(3 * S, -1).astype(st.m2s.dtype),
            mode="drop"),
    )
    ci = last_wins(dbuf.crow_idx, ok)
    st = st._replace(
        children=st.children.at[ci].set(
            dbuf.crow_vals.reshape(3 * S, -1), mode="drop"),
        n_children=st.n_children.at[ci].set(
            dbuf.crow_n.reshape(-1), mode="drop"),
    )
    pi = last_wins(dbuf.par_idx, ok)
    st = st._replace(
        parent=st.parent.at[pi].set(dbuf.par_val.reshape(-1), mode="drop"),
    )
    r = jnp.where(step_ok & (dbuf.root >= 0), dbuf.root, -1)
    rpos = jnp.where(r >= 0, jnp.arange(S), -1)
    j = jnp.argmax(rpos)
    return st._replace(root=jnp.where(rpos[j] >= 0, r[j], st.root))


def _insert_one(st: TreeState, x: jnp.ndarray, key: jax.Array,
                cfg: TreeConfig, max_steps: int = 48):
    """One full descent (reference ifit/cobweb): collect deltas against the
    frozen state, then replay them in order (batched last-writer-wins
    scatter pass).  Returns (state, leaf_idx).

    A descent truncated by ``max_steps`` (leaf = -1) applies NOTHING —
    same contract as the vmapped rounds — so the caller's deeper-budget
    retry re-runs the whole insert without double-applying the partial
    path updates."""
    dbuf, steps, leaf = _descend_collect(st, x, key, cfg, max_steps)
    steps = jnp.where(leaf >= 0, steps, 0)
    st = _apply_dbuf_batched(st, dbuf, steps)
    return _alloc_bookkeeping(st, dbuf, steps), leaf


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
def insert_batch(st: TreeState, xs: jnp.ndarray, keys: jax.Array,
                 n_valid: jnp.ndarray, cfg: TreeConfig,
                 max_steps: int = 48):
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
        st, leaf = _insert_one(st, xs[i], keys[i], cfg, max_steps=max_steps)
        return st, leaves.at[i].set(leaf)

    leaves0 = jnp.full((B,), NULL, jnp.int32)
    return jax.lax.fori_loop(0, jnp.minimum(n_valid, B), body, (st, leaves0))


# Exact-path scan cap for over-deep descents (tight near-duplicate groups
# build fringe chains far past the 48-step batch budget; a truncated
# descent returns leaf=-1 and the sentence would silently vanish from
# every index).  256 covers any plausible chain; callers raise if not.
_EXACT_STEPS = 256


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
def insert_one_jit(st: TreeState, x: jnp.ndarray, key: jax.Array,
                   cfg: TreeConfig, max_steps: int = 48):
    return _insert_one(st, x, key, cfg, max_steps=max_steps)


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
        new_cap = align_capacity(max(needed, st.capacity * 2))
        pad = new_cap - st.capacity
        self.state = TreeState(
            counts=jnp.concatenate([st.counts, jnp.zeros((pad,), jnp.float32)]),
            means=jnp.concatenate(
                [st.means, jnp.zeros((pad, st.dim), st.means.dtype)]),
            m2s=jnp.concatenate(
                [st.m2s, jnp.zeros((pad, st.dim), st.m2s.dtype)]),
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
        if int(leaf) < 0:   # over-deep descent: retry with the exact cap
            self.state, leaf = insert_one_jit(self.state, x, key, self.cfg,
                                              max_steps=_EXACT_STEPS)
            if int(leaf) < 0:
                raise RuntimeError(
                    f"insert descent exceeded {_EXACT_STEPS} steps")
        self.n_inserted += 1
        return int(leaf)

    def fit(self, xs, batch_size: int = 2048, iterations: int = 1,
            randomize_first: bool = False, seed: int = 0) -> np.ndarray:
        """Bulk incremental build; returns the leaf index of every instance
        (of the final pass when ``iterations`` > 1 — old_code
        CobwebTorchTree.fit :204-235 semantics: optional shuffle of the
        first pass, repeated passes land on exact-match leaves).

        Ragged final chunks are zero-padded to ``batch_size`` with a dynamic
        valid-count so the compiled insert program is reused across calls.
        """
        xs = np.asarray(xs, np.float32)
        if iterations > 1 or randomize_first:
            order = np.arange(len(xs))
            if randomize_first:
                np.random.default_rng(seed).shuffle(order)
            leaves_last = None
            for it in range(iterations):
                pass_xs = xs[order] if it == 0 else xs
                got = self.fit(pass_xs, batch_size=batch_size)
                if it == 0:
                    inv = np.empty_like(order)
                    inv[order] = np.arange(len(order))
                    got = got[inv]
                leaves_last = got
            return leaves_last
        leaves = np.empty((len(xs),), np.int32)
        for s in range(0, len(xs), batch_size):
            chunk = xs[s:s + batch_size]
            n = len(chunk)
            # pad every chunk to a power-of-two bucket (the dynamic n_valid
            # bound skips padding rows) so arbitrary lengths reuse a handful
            # of compiled programs instead of recompiling per length
            bucket = min(batch_size, max(16, 1 << max(n - 1, 1).bit_length()))
            if n < bucket:
                chunk = np.concatenate(
                    [chunk, np.zeros((bucket - n, xs.shape[1]), np.float32)]
                )
            self._ensure_capacity(n)
            keys = self._next_keys(len(chunk))
            self.state, lv = insert_batch(
                self.state, jnp.asarray(chunk), keys,
                jnp.asarray(n, jnp.int32), self.cfg,
            )
            got = np.array(np.asarray(lv)[:n])
            deep = np.nonzero(got < 0)[0]
            for j in deep:
                # descent exceeded the batch budget (deep near-dup fringe
                # chains): exact path with the _EXACT_STEPS cap — NEVER
                # record -1 (the row would vanish from every index)
                self.state, lf = insert_one_jit(
                    self.state, jnp.asarray(chunk[j]), keys[j], self.cfg,
                    max_steps=_EXACT_STEPS)
                if int(lf) < 0:
                    raise RuntimeError(
                        f"insert descent exceeded {_EXACT_STEPS} steps")
                got[j] = int(lf)
            leaves[s:s + n] = got
        self.n_inserted += len(xs)
        return leaves

    # -- inspection ---------------------------------------------------------
    def _host_arrays(self):
        st = self.state
        st = jax.tree.map(np.asarray, st)
        if st.means.dtype != np.float32:   # stats-compressed state
            st = st._replace(means=st.means.astype(np.float32),
                             m2s=st.m2s.astype(np.float32))
        return st

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
                   retrieve_k: Optional[int] = None, greedy: bool = False,
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
            if greedy:  # keep only the best frontier (reference :261-262)
                heap = []
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
